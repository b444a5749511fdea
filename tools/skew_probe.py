#!/usr/bin/env python
"""Skew probe: MEASURED evidence for the engine's skew posture (SCALE.md
"Skew"), on a deliberately skewed key — one user owns 50% of all rows,
the realistic fleet shape where one device emits most of the telemetry.

Four experiments, each plain-vs-mitigated on identical data. The first
two are expected (and measured) to be PARITY — recording the non-wins
documents where Spark needs no hand-holding:

1. mergeable agg (count/sum/max per user): partial (map-side)
   aggregation collapses the hot key to one partial row per task before
   the shuffle — plain groupBy and the salted two-stage pattern
   (operators/skew.py) tie within run noise.
2. count(DISTINCT x) per user: Spark's distinct-agg plan exchanges on
   (group, distinct) for the dedup and only then on the group key with
   map-side partial counts (verified via .explain) — the planner already
   IS the two-phase rewrite, so the manual version ties.
3. top-10 per user by value: a plain ranking window sorts the hot
   user's entire row share in ONE task; the mitigation salts ONLY the
   hot keys (identified by a cheap count) into a two-level rank —
   partial top-k per (user, salt), merge-rank over the k*S survivors —
   so every sort is bounded while the 100k cold keys keep their single
   cheap partition. (A uniform salt over ALL keys was measured 5x SLOWER
   than plain at this cardinality — it shreds every cold key into
   S near-empty window partitions; the skew pattern must target the
   skew.)
4. shuffle join on the skewed key (broadcast disabled): AQE skew-join
   splitting off vs on, with split thresholds scaled to the local data
   volume the way a cluster tunes them to executor memory.

Usage: python tools/skew_probe.py [replicas]   (default 100 -> 10M rows)
Prints ONE JSON line; numbers recorded in BASELINE.md §3c.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC_SF = "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
HOT_USER = 42
TOPK = 10


def build(spark, dst: str) -> None:
    """Replicate events REPLICAS times; re-key user_id so user 42 owns
    half of all rows and the other half spreads over ~100k users."""
    raw = spark.read.parquet(f"{SRC_SF}/events.parquet")
    parts = []
    for r in range(REPLICAS):
        parts.append(
            raw.withColumn("event_id", F.col("event_id") + F.lit(r * 1_000_000_000))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    skewed = out.withColumn(
        "user_id",
        F.when(F.pmod(F.col("event_id"), 2) == 0, F.lit(HOT_USER)).otherwise(
            F.pmod(F.hash("event_id"), 100_000).cast("bigint") + 1_000_000
        ),
    )
    skewed.repartition(16).write.mode("overwrite").parquet(dst)


def timed(fn, runs: int = 5) -> float:
    fn(), fn()  # two warm passes: JIT + shuffle-file page cache
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def main() -> None:
    from vault_8_hive_spark.operators.skew import salted_agg
    from vault_8_hive_spark.session import get_spark

    spark = get_spark(app_name="skew-probe")
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".work", f"skew_probe_x{REPLICAS}",
    )
    if not os.path.exists(os.path.join(dst, "_SUCCESS")):
        build(spark, dst)
    ev = spark.read.parquet(dst)
    n = ev.count()
    results: dict[str, float] = {}

    # -- 1. mergeable agg: plain vs salted (measured parity) ----------------
    def agg_plain():
        ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.max("value").alias("m"),
        ).agg(F.max("n"), F.max("s")).collect()

    def agg_salted():
        salted_agg(
            ev,
            keys=["user_id"],
            partial_aggs=[
                F.count(F.lit(1)).alias("pn"),
                F.sum("value").alias("ps"),
                F.max("value").alias("pm"),
            ],
            merge_aggs=lambda: [
                F.sum("pn").alias("n"),
                F.sum("ps").alias("s"),
                F.max("pm").alias("m"),
            ],
            salt_on="event_id",
        ).agg(F.max("n"), F.max("s")).collect()

    results["mergeable_plain"] = timed(agg_plain)
    results["mergeable_salted"] = timed(agg_salted)

    # -- 2. count distinct: planner's distinct-agg vs manual two-phase ------
    def distinct_plain():
        ev.groupBy("user_id").agg(
            F.countDistinct("event_id").alias("d")
        ).agg(F.max("d")).collect()

    def distinct_two_phase():
        (
            ev.select("user_id", "event_id")
            .distinct()
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(F.max("d"))
            .collect()
        )

    results["distinct_plain"] = timed(distinct_plain)
    results["distinct_two_phase"] = timed(distinct_two_phase)

    # -- 3. top-k per user: plain window vs salted two-level rank -----------
    def topk_plain():
        w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
        (
            ev.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= TOPK)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("k"), F.min("value").alias("kth"))
            .agg(F.count(F.lit(1)), F.min("kth"))
            .collect()
        )

    # Hot keys found by a cheap mergeable count — driver receives only
    # the few keys above the threshold (1% of rows), not a key list.
    hot_keys = [
        r["user_id"]
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > n / 100)
        .collect()
    ]

    def topk_salted():
        is_hot = F.col("user_id").isin(hot_keys)
        salted = ev.withColumn(
            "__salt",
            F.when(is_hot, F.pmod(F.hash("event_id"), F.lit(32))).otherwise(F.lit(0)),
        )
        w1 = Window.partitionBy("user_id", "__salt").orderBy(
            F.desc("value"), "event_id"
        )
        survivors = salted.withColumn("rn", F.row_number().over(w1)).where(
            F.col("rn") <= TOPK
        )
        w2 = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
        (
            survivors.withColumn("rn2", F.row_number().over(w2))
            .where(F.col("rn2") <= TOPK)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("k"), F.min("value").alias("kth"))
            .agg(F.count(F.lit(1)), F.min("kth"))
            .collect()
        )

    results["topk_plain"] = timed(topk_plain)
    results["topk_salted_hotkeys"] = timed(topk_salted)

    # -- 4. shuffle join on the hot key: AQE skew split off vs on -----------
    users_path = dst + "_users"
    if not os.path.exists(os.path.join(users_path, "_SUCCESS")):
        ev.select("user_id").distinct().withColumn(
            "segment", F.pmod(F.col("user_id"), 7)
        ).write.mode("overwrite").parquet(users_path)
    users = spark.read.parquet(users_path)

    def run_join():
        (
            ev.join(users, "user_id")
            .groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    def with_conf(aqe: bool, fn):
        # Split thresholds scaled to the probe's data volume (a cluster
        # scales them to executor memory the same way): the hot partition
        # is ~100 MB here, far under the 256 MB default threshold.
        conf = {
            "spark.sql.adaptive.enabled": str(aqe).lower(),
            "spark.sql.adaptive.skewJoin.enabled": str(aqe).lower(),
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        restore = {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        }

        def run():
            for k, v in conf.items():
                spark.conf.set(k, v)
            try:
                fn()
            finally:
                for k, v in restore.items():
                    spark.conf.set(k, v)
        return run

    results["join_skew_aqe_off"] = timed(with_conf(False, run_join))
    results["join_skew_aqe_on"] = timed(with_conf(True, run_join))

    print(json.dumps({
        "replicas": REPLICAS, "rows": n, "hot_share": 0.5,
        **results,
        "topk_salted_speedup": round(
            results["topk_plain"] / results["topk_salted_hotkeys"], 2),
        "join_aqe_speedup": round(
            results["join_skew_aqe_off"] / results["join_skew_aqe_on"], 2),
    }))


if __name__ == "__main__":
    main()
