#!/usr/bin/env python
"""Round-8 probe: connected_components — one vs two propagation rounds
per materialized checkpoint.

The r8 loop pays per iteration: one job (lazy-checkpoint count), one
Catalyst compile of the round plan, one driver round-trip. Near-dup
graphs converge in 2-3 rounds, so the loop runs 3-4 jobs where a
two-rounds-per-job fusion runs 2 — the question is whether the saved
round-trips/compiles beat the (at most one) extra round of join work
the fused convergence check can't skip.

Interleaved A/B on er_pipeline (the bench consumer), one session,
median of N; equality of final output asserted first.

Usage: python tools/cc_fuse_probe.py [--runs N] [--sf DIR]
Measurement tooling only; run exclusively.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from vault_8_hive_spark.catalog import table  # noqa: E402
from vault_8_hive_spark.session import prep  # noqa: E402


def fused_connected_components(
    edges: DataFrame, a: str = "src", b: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Two min-label rounds per materialization; convergence checked on
    the second round's changes (round 2k improving nothing implies the
    round-(2k-1) labels were already a fixed point of round 2k)."""
    und = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .repartition("dst")
        .localCheckpoint(eager=False)
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(max_iter):
        mid = (
            labels.join(
                und.join(labels, und.dst == labels.node)
                .groupBy("src")
                .agg(F.min("label").alias("nbr_min")),
                labels.node == F.col("src"),
                "left",
            )
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias(
                    "label"
                ),
            )
        )
        new = (
            mid.join(
                und.join(mid, und.dst == mid.node)
                .groupBy("src")
                .agg(F.min("label").alias("nbr_min")),
                mid.node == F.col("src"),
                "left",
            )
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias(
                    "label"
                ),
                (F.col("nbr_min") < F.col("label")).alias("improved"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new.where("improved").count()
        labels = new.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError("no convergence")


def _er_with(cc_fn, spark: SparkSession, sf_dir: str) -> DataFrame:
    from vault_8_hive_spark.functions.exact import scaled_long
    from vault_8_hive_spark.queries.pipeline import _ER_SHIFT

    prep(spark)
    cust = table(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        scaled_long("c_acctbal").alias("cents"),
    )
    mutated = cust.where(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + _ER_SHIFT).alias("c_custkey"),
        F.regexp_replace("c_name", "#0", "#O").alias("c_name"),
        "c_nationkey", "c_mktsegment",
        scaled_long("c_acctbal").alias("cents"),
    )
    corpus = base.unionByName(mutated)
    b = corpus.select(
        F.col("c_custkey").alias("kb"), F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg"),
        F.col("cents").alias("cents_b"),
    )
    pairs = (
        corpus.join(
            b,
            (F.col("c_nationkey") == F.col("nk"))
            & (F.col("c_mktsegment") == F.col("seg"))
            & (F.col("c_custkey") < F.col("kb")),
        )
        .where(
            (F.col("cents") == F.col("cents_b"))
            & (F.levenshtein("c_name", "name_b") <= 2)
        )
        .select(F.col("c_custkey").alias("ka"), "kb")
    )
    labels = cc_fn(pairs, "ka", "kb")
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    w = Window.orderBy(F.desc("cluster_size"), "cluster_id")
    return (
        sizes.select(
            F.col("cluster_id").cast("bigint").alias("canonical_key"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            F.row_number().over(w).cast("int").alias("rk"),
        )
        .where(F.col("rk") <= 20)
        .orderBy("rk")
    )


def arm_seq(spark, sf_dir):
    from vault_8_hive_spark.operators.components import connected_components

    return _er_with(connected_components, spark, sf_dir)


def arm_fused(spark, sf_dir):
    return _er_with(fused_connected_components, spark, sf_dir)


def timed_run(spark, fn, sf_dir) -> float:
    import gc

    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.toPandas()
    dt = time.perf_counter() - t0
    del df
    gc.collect()
    spark._jvm.System.gc()
    time.sleep(0.3)
    return dt


def main() -> None:
    from vault_8_hive_spark.catalog import optimize_tables
    from vault_8_hive_spark.session import get_spark

    runs = 5
    sf_dir = "/root/testdata/sf0.1"
    for arg in sys.argv[1:]:
        if arg.startswith("--runs"):
            runs = int(arg.split("=")[1])
        if arg.startswith("--sf"):
            sf_dir = arg.split("=")[1]

    spark = get_spark(app_name="cc-fuse-probe")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    optimize_tables(spark, sf_dir, chunks=4)

    s_pdf = arm_seq(spark, sf_dir).toPandas()
    f_pdf = arm_fused(spark, sf_dir).toPandas()
    print(f"rows: seq={len(s_pdf)} fused={len(f_pdf)} "
          f"equal={s_pdf.equals(f_pdf)}", flush=True)

    st = spark.sparkContext.statusTracker()

    def jobs_of(fn):
        before = len(st.getJobIdsForGroup() or [])
        fn(spark, sf_dir).toPandas()
        return len(st.getJobIdsForGroup() or []) - before

    print(f"jobs: seq={jobs_of(arm_seq)} fused={jobs_of(arm_fused)}", flush=True)

    timed_run(spark, arm_seq, sf_dir)
    timed_run(spark, arm_fused, sf_dir)
    seqs, fuseds = [], []
    for _ in range(runs):
        seqs.append(timed_run(spark, arm_seq, sf_dir))
        fuseds.append(timed_run(spark, arm_fused, sf_dir))
    sm, fm = statistics.median(seqs), statistics.median(fuseds)
    print(
        f"er_pipeline: seq={sm:.3f}s fused={fm:.3f}s speedup={sm / fm:.2f}x\n"
        f"  seq runs {[round(x, 2) for x in seqs]}\n"
        f"  fused runs {[round(x, 2) for x in fuseds]}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
