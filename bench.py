#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect). A warmup run of
the flagship primes the JVM/parquet footer caches so the numbers measure
the engine, not JVM startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from vault_8_hive_spark.queries import all_queries
    from vault_8_hive_spark.session import get_spark

    spark = get_spark(app_name="vault-8-hive-bench", cpus=cpus)
    registry = all_queries()
    bench_set = {n: q for n, q in sorted(registry.items()) if q.bench}

    # Warmup: prime JVM, codegen, parquet footers (not counted).
    next(iter(bench_set.values())).fn(spark, sf_dir).collect()

    per: dict[str, float] = {}
    for name, q in bench_set.items():
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).collect()
        per[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(per.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": per,
                "sf": sf,
                "n_queries": len(per),
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
