#!/usr/bin/env python
"""waiting_suppliers attribution probe (round 8, VERDICT item 4).

The r6 BASELINE note blamed the query's native-sf1 3.35x (vs 1.78x at
25x) on "sf1-native's random 4-lines/order draw shrinking per-order
combining". Measured, that explanation is FALSE: both corpora have the
identical distribution (avg 4.08 lines/order, distinct-supplier pairs /
lines = 1.0 in each — duckdb, round 8). The competing hypothesis is a
fixed Spark floor: the plan's cost is dominated by its stage/shuffle
constant, so Spark's absolute barely moves across 0.6M -> 6M -> 15M
input lines while DuckDB's scales ~linearly — the ratio then worsens as
the corpus SHRINKS, with no plan defect at all.

This probe times the registered waiting_suppliers on three corpora
spanning 25x in input size, plus the DuckDB oracle on the same files,
and prints one JSON line. Interpretation: spark_s ~flat + duck_s ~linear
=> floor attribution confirmed (record in BASELINE §3j-bis, drop the
combining note); spark_s scaling with input => real per-row gap, go
find it in the plan.

Usage: python tools/ws_floor_probe.py [corpus_dir ...]
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

CORPORA = sys.argv[1:] or [
    "/root/testdata/sf0.1",
    "/root/repo/.work/sf1_native",
    "/root/repo/.work/scale_probe_x25",
]

_DUCK_RUNNER = r"""
import json, sys, time, statistics
import duckdb
sf_dir, sql = sys.argv[1], sys.stdin.read()
conn = duckdb.connect()
conn.execute("SET enable_progress_bar = false")
import os
for t in ("region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"):
    p = f"{sf_dir}/{t}.parquet"
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    conn.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
conn.execute(sql).df()  # warm
runs = []
for _ in range(3):
    t0 = time.perf_counter()
    conn.execute(sql).df()
    runs.append(time.perf_counter() - t0)
print(json.dumps(statistics.median(runs)))
"""


def duck_time(sf_dir: str, sql: str) -> float | None:
    out = subprocess.run(
        [sys.executable, "-c", _DUCK_RUNNER, sf_dir],
        input=sql.encode(),
        capture_output=True,
        timeout=600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr.decode(errors="replace")[-300:] + "\n")
        return None
    return float(json.loads(out.stdout.decode().strip().split()[-1]))


def main() -> None:
    from vault_8_hive_spark.catalog import optimize_tables
    from vault_8_hive_spark.queries import all_queries
    from vault_8_hive_spark.session import get_spark

    spark = get_spark(app_name="ws-floor-probe")
    q = all_queries()["waiting_suppliers"]
    results = {}
    for sf in CORPORA:
        sf = os.path.abspath(sf)
        optimize_tables(spark, sf, chunks=4)
        n_lines = spark.read.parquet(f"{sf}/lineitem.parquet*").count()
        q.fn(spark, sf).collect()  # warm
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            q.fn(spark, sf).collect()
            runs.append(time.perf_counter() - t0)
        spark_s = statistics.median(runs)
        duck_s = duck_time(sf, q.oracle)
        results[os.path.basename(sf)] = {
            "lines": n_lines,
            "spark_s": round(spark_s, 3),
            "duck_s": round(duck_s, 3) if duck_s else None,
            "ratio": round(spark_s / duck_s, 2) if duck_s else None,
        }
        print(f"{sf}: {results[os.path.basename(sf)]}", file=sys.stderr, flush=True)
    print(json.dumps({"metric": "ws_floor_probe", "results": results}))


if __name__ == "__main__":
    main()
