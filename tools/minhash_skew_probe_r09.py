#!/usr/bin/env python
"""25x boilerplate-skew evidence for the REGISTERED text_minhash_lsh
under the r9 df-cap (_cap_banded: checkpointed band relation +
one-sided broadcast anti-join).

Corpus: documents (sf0.1) replicated 25x with per-replica word tags
(cross-replica shingles stay unique), except a 30% slice whose text is
ONE identical template — those docs share identical shingle sets,
hence identical band keys: 4 LSH buckets of ~37.5k docs each, i.e.
~7e8 candidate pairs per bucket if expanded. The capped (auto) arm
must complete with the hot buckets dropped; the cap-off arm records
its DNF/timeout under the same subprocess isolation as
tools/dupskew_probe.py.

Usage: python tools/minhash_skew_probe_r09.py [replicas] [boiler_frac]
Prints ONE JSON line; recorded in OPTIMIZATION_r09.md / BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = str(Path(__file__).resolve().parent.parent)
SRC = "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 25
BOILER_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
TIMEOUT_S = int(os.environ.get("DUPSKEW_TIMEOUT_S", "300"))

TEMPLATE = (
    "standard corporate disclaimer header applies to this document text "
    "please review the attached terms and retain a copy for your records"
)

_RUNNER = r"""
import json, statistics, sys, time
sys.path.insert(0, sys.argv[1])
out_dir, variant = sys.argv[2], sys.argv[3]
from pyspark.sql import functions as F
from vault_8_hive_spark.session import get_spark
from vault_8_hive_spark.queries.text import DF_CAP_CONF
spark = get_spark(app_name="minhash-skew-" + variant)
if variant == "off":
    spark.conf.set(DF_CAP_CONF, "off")
import shutil, tempfile
staged = tempfile.mkdtemp(prefix="minhash_skew_")
shutil.copytree(out_dir, staged + "/documents.parquet")
from vault_8_hive_spark.queries import all_queries
fn = all_queries()["text_minhash_lsh"].fn
t0 = time.perf_counter()
n = fn(spark, staged).count()
first = time.perf_counter() - t0
runs = []
for _ in range(2):
    t0 = time.perf_counter()
    fn(spark, staged).count()
    runs.append(time.perf_counter() - t0)
shutil.rmtree(staged, ignore_errors=True)
print(json.dumps({"pairs": n, "first_s": round(first, 2),
                  "sec": round(statistics.median(runs), 2)}))
"""


def build_corpus(out: str) -> None:
    from pyspark.sql import functions as F

    from vault_8_hive_spark.session import get_spark

    spark = get_spark(app_name="minhash-skew-build")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        spark.stop()
        return
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.count()
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    tagged = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
        F.when(
            F.col("doc_id") % int(1 / BOILER_FRAC) == 0,
            F.lit(TEMPLATE),  # identical text => identical band keys
        )
        .otherwise(
            F.concat(
                F.concat(F.lit("rep"), F.col("rep"), F.lit("tag ")),
                F.regexp_replace(
                    "text",
                    r"(\w+)",
                    F.concat(F.lit("r"), F.col("rep"), F.lit("$1")).cast(
                        "string"
                    ),
                ),
            )
        )
        .alias("text"),
        F.col("lang"),
        F.col("source"),
        F.col("n_chars"),
    )
    tagged.write.mode("overwrite").parquet(out)
    spark.stop()


def main() -> None:
    out = os.path.join(
        REPO, ".work", f"minhash_skew_x{REPLICAS}_f{int(BOILER_FRAC * 100)}"
    )
    build_corpus(out)

    results: dict[str, dict] = {}
    for variant in ("auto", "off"):
        try:
            r = subprocess.run(
                [sys.executable, "-c", _RUNNER, REPO, out, variant],
                capture_output=True,
                timeout=TIMEOUT_S,
            )
            if r.returncode != 0:
                err = r.stderr.decode(errors="replace")
                oom = "OutOfMemoryError" in err
                results[variant] = {
                    "status": "oom" if oom else "error", "tail": err[-200:],
                }
            else:
                last = r.stdout.decode().strip().splitlines()[-1]
                results[variant] = {"status": "ok", **json.loads(last)}
        except subprocess.TimeoutExpired:
            results[variant] = {"status": "timeout", "cap_s": TIMEOUT_S}
        print(f"{variant}: {results[variant].get('status')}",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "minhash_skew_probe",
        "replicas": REPLICAS,
        "boiler_frac": BOILER_FRAC,
        "results": results,
    }))


if __name__ == "__main__":
    main()
