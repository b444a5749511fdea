"""Accuracy gates for the approximate aggregates.

The registered queries band their estimates into the sketch's accuracy
window (that banded value is cross-engine reproducible, so the oracle
gate hash-checks it — see queries/aggregates.py); these tests assert the
RAW estimates track the exact answers within the sketch error bounds,
which the banding alone can't prove.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vault_8_hive_spark.queries import all_queries

QUERIES = all_queries()


def test_approx_distinct_within_rsd(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    approx = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
        )
        .toPandas()
        .set_index("l_returnflag")
    )
    exact = (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d"), F.expr("percentile(l_extendedprice, 0.5)").alias("m"))
        .toPandas()
        .set_index("l_returnflag")
    )
    for flag in exact.index:
        d, m = exact.loc[flag, "d"], exact.loc[flag, "m"]
        assert abs(approx.loc[flag, "approx_parts"] - d) <= max(5, 0.1 * d)
        assert abs(approx.loc[flag, "approx_median_price"] - m) <= 0.05 * m


def test_moments_builtin_close_to_exact(spark, sf_dir):
    built = QUERIES["agg_moments_builtin"].fn(spark, sf_dir).toPandas().set_index("l_returnflag")
    exact = QUERIES["agg_moments_exact"].fn(spark, sf_dir).toPandas().set_index("l_returnflag")
    for flag in exact.index:
        # Both sides round to 1e-6, so a true sub-1e-6 difference can land
        # exactly one rounding step apart — 2e-6 is the tight bound here.
        assert abs(built.loc[flag, "stddev_qty"] - exact.loc[flag, "stddev_qty"]) <= 2e-6
        assert abs(built.loc[flag, "corr_qty_price"] - exact.loc[flag, "corr_qty_price"]) <= 2e-6


def test_sketch_merge_accuracy(spark, sf_dir):
    """The merged HLL union estimate must track the exact distinct count
    per flag AND for the all-flags union (merge correctness — the union
    can't be reconstructed from the per-group estimates alone). Raw
    estimates recomputed here; the registered query ships the banded
    window (hash-checked against the oracle in test_oracle.py)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per_flag = li.groupBy("l_returnflag").agg(F.hll_sketch_agg("l_suppkey").alias("sk"))
    flags = per_flag.select("l_returnflag", F.hll_sketch_estimate("sk").alias("approx_suppliers"))
    merged = per_flag.agg(F.hll_union_agg("sk").alias("u")).select(
        F.lit("ALL").alias("l_returnflag"),
        F.hll_sketch_estimate("u").alias("approx_suppliers"),
    )
    est = flags.unionByName(merged).toPandas().set_index("l_returnflag")
    exact = (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("d"))
        .toPandas()
        .set_index("l_returnflag")
    )
    total = li.select("l_suppkey").distinct().count()
    for flag in exact.index:
        d = exact.loc[flag, "d"]
        assert abs(est.loc[flag, "approx_suppliers"] - d) <= max(5, 0.05 * d)
    assert abs(est.loc["ALL", "approx_suppliers"] - total) <= max(5, 0.05 * total)
