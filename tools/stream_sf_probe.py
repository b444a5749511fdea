#!/usr/bin/env python
"""§3g-bis: the stateful streaming family at NATIVE sf1 — stream-stream
interval join + transformWithState replayed as true multi-batch file
streams over the sf1 corpus, timed against their DuckDB batch duals on
the same files AND value-compared (the streaming answers must equal the
batch oracle exactly, not just finish).

Why this exists: every other operator family has native-SF evidence
(BASELINE §3j); the stream-stream join/state family's at-scale numbers
rode the 25x replication probes (§3g) alone. This closes that asymmetry.

Usage: python tools/stream_sf_probe.py [sf_dir] [duck_timeout_s]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else "/root/repo/.work/sf1_native"
DUCK_TIMEOUT = int(sys.argv[2]) if len(sys.argv) > 2 else 600

# Per-query state-store sizing (the §3g-bis finding): a JVM stateful
# operator with a small result is CHECKPOINT-CHURN bound — 8 partitions
# beat 32 by 2.2x on the interval join — while a python
# transformWithState stage is ARROW/PYTHON-COMPUTE bound and wants one
# partition per core (32 beat 8 by 4.3x). Partition count must track
# the operator's bottleneck class, not a global streaming default.
QUERIES = {"stream_stream_join": 8, "stream_transform_with_state": None}

_DUCK_RUNNER = r"""
import json, sys, time, statistics
import duckdb
sf_dir, sql = sys.argv[1], sys.stdin.read()
conn = duckdb.connect()
conn.execute("SET enable_progress_bar = false")
for t in ("region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"):
    conn.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet*')"
    )
conn.execute(sql).df()  # warm
runs = []
for _ in range(3):
    t0 = time.perf_counter()
    conn.execute(sql).df()
    runs.append(time.perf_counter() - t0)
print(json.dumps(statistics.median(runs)))
"""


def duck_time(name: str, sql: str) -> tuple[float, str]:
    try:
        out = subprocess.run(
            [sys.executable, "-c", _DUCK_RUNNER, SF_DIR],
            input=sql.encode(),
            capture_output=True,
            timeout=DUCK_TIMEOUT,
        )
        if out.returncode != 0:
            tail = out.stderr.decode(errors="replace")[-300:]
            sys.stderr.write(f"{name}: duckdb failed: {tail}\n")
            return float(DUCK_TIMEOUT), "error"
        last = out.stdout.decode().strip().split()[-1]
        return float(json.loads(last)), "ok"
    except subprocess.TimeoutExpired:
        return float(DUCK_TIMEOUT), "timeout"


def main() -> None:
    from vault_8_hive_spark.catalog import optimize_tables
    from vault_8_hive_spark.oracle import compare, run_oracle
    from vault_8_hive_spark.queries import all_queries
    from vault_8_hive_spark.session import get_spark

    spark = get_spark(app_name="stream-sf-probe")
    optimize_tables(spark, SF_DIR, chunks=4)

    registry = all_queries()
    out: dict[str, dict] = {}
    for name, parts in QUERIES.items():
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(parts or spark.sparkContext.defaultParallelism),
        )
        q = registry[name]
        spdf = q.fn(spark, SF_DIR).toPandas()  # warm + capture for compare
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).toPandas()
            runs.append(time.perf_counter() - t0)
        spark_s = statistics.median(runs)
        duck_s, status = duck_time(name, q.oracle)
        rep = compare(name, spdf, run_oracle(q.oracle, SF_DIR))
        out[name] = {
            "spark_s": round(spark_s, 3),
            "duck_s": round(duck_s, 3),
            "duck_status": status,
            "ratio": round(spark_s / duck_s, 2) if duck_s > 0 else None,
            "rows": int(len(spdf)),
            "values_match": bool(rep.ok and rep.exact),
        }
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "stream_sf_probe", "sf_dir": SF_DIR,
                      "results": out}))


if __name__ == "__main__":
    main()
