#!/usr/bin/env python
"""Bucketed-layout probe: what does the bucketed (exchange-free) join
actually buy once the shuffle it avoids is non-trivial?

Replicates orders x R and customer x R with matched key offsets to
.work/bucket_probe_r{R} in BOTH layouts — plain parquet and a 32-bucket
CLUSTERED BY (custkey) SORTED BY (custkey) table pair — then times the
same orders<->customer join + segment rollup three ways:

  shuffle_smj   plain layout, autoBroadcast off  -> Exchange both sides
  bucketed_smj  bucketed layout, autoBroadcast off -> zero Exchange
  aqe_default   plain layout, session defaults   -> whatever AQE picks

Also records the one-time bucketing write cost (the shuffle the ingest
pays ONCE so queries pay none). Fresh-build timing per run, medians of 5;
build runs in a child process (same memory-exclusivity reasoning as
tools/floor_probe.py). Measurement tooling only; run exclusively.

Usage: python tools/bucket_probe.py [replicas]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC_SF = "/root/testdata/sf0.1"
BUCKETS = 32


def _join(spark, orders, cust):
    from pyspark.sql import functions as F

    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice")).alias("revenue"),
        )
    )


def _attach_bucketed(spark, dst: str, name: str, key: str) -> None:
    tbl = f"probe_{name}"
    if spark.catalog.tableExists(tbl):
        return
    path = f"{dst}/{name}_bucketed"
    schema = spark.read.parquet(path).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
    spark.sql(
        f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {BUCKETS} BUCKETS "
        f"LOCATION '{path}'"
    )


def build(spark, dst: str, reps: int) -> dict:
    from pyspark.sql import functions as F

    from vault_8_hive_spark.session import prep

    prep(spark)
    os.makedirs(dst, exist_ok=True)
    rng = F.broadcast(spark.range(reps).withColumnRenamed("id", "__r"))
    out = {}
    for name, keycol, mult in (
        ("orders", "o_custkey", 100_000_000),
        ("customer", "c_custkey", 100_000_000),
    ):
        df = (
            spark.read.parquet(f"{SRC_SF}/{name}.parquet")
            .repartition(32)
            .crossJoin(rng)
            .withColumn(keycol, F.col(keycol) + F.col("__r") * mult)
            .drop("__r")
        )
        t0 = time.perf_counter()
        df.repartition(32).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        out[f"write_plain_{name}_s"] = round(time.perf_counter() - t0, 2)
        tbl = f"probe_build_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        t0 = time.perf_counter()
        (
            # One file per bucket (repartition on the bucket key uses the
            # same pmod(murmur3) as bucket assignment): single-file
            # buckets let the scan expose the SORTED BY ordering, so the
            # join needs neither Exchange nor Sort.
            spark.read.parquet(f"{dst}/{name}.parquet")
            .repartition(BUCKETS, F.col(keycol))
            .write.mode("overwrite")
            .bucketBy(BUCKETS, keycol)
            .sortBy(keycol)
            .option("path", f"{dst}/{name}_bucketed")
            .saveAsTable(tbl)
        )
        out[f"write_bucketed_{name}_s"] = round(time.perf_counter() - t0, 2)
    with open(f"{dst}/_BUILD.json", "w", encoding="utf-8") as fh:
        json.dump(out, fh)
    return out


def _time(build_df, runs: int = 5) -> float:
    times = []
    for _ in range(runs):
        df = build_df()
        t0 = time.perf_counter()
        df.toPandas()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 4)


def main() -> None:
    from vault_8_hive_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".work", f"bucket_probe_r{reps}",
    )
    if not os.path.exists(os.path.join(dst, "_BUILD.json")):
        if "--build-only" in sys.argv:
            spark = get_spark(app_name="bucket-probe-build")
            build(spark, dst, reps)
            spark.stop()
            return
        import subprocess

        subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(reps), "--build-only"],
            check=True,
        )

    spark = get_spark(app_name="bucket-probe")  # cluster posture: AQE on
    out: dict = {"replicas": reps, "buckets": BUCKETS}
    out.update(json.load(open(f"{dst}/_BUILD.json", encoding="utf-8")))
    _attach_bucketed(spark, dst, "orders", "o_custkey")
    _attach_bucketed(spark, dst, "customer", "c_custkey")

    plain = lambda: _join(  # noqa: E731
        spark,
        spark.read.parquet(f"{dst}/orders.parquet"),
        spark.read.parquet(f"{dst}/customer.parquet"),
    )
    bucketed = lambda: _join(  # noqa: E731
        spark, spark.table("probe_orders"), spark.table("probe_customer")
    )

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # Pin SMJ on both paths so the delta isolates the exchange.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    plain().toPandas()  # warm
    out["shuffle_smj_s"] = _time(plain)
    bucketed().toPandas()  # warm
    out["bucketed_smj_s"] = _time(bucketed)
    plan = bucketed()._jdf.queryExecution().executedPlan().toString()
    out["bucketed_no_exchange"] = "Exchange" not in plan.split("SortMergeJoin")[-1]
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    out["aqe_default_s"] = _time(plain)
    out["speedup_vs_shuffle"] = round(out["shuffle_smj_s"] / out["bucketed_smj_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
