"""Accuracy gates for the approximate aggregates (no SQL oracle — the
sketches are implementation-specific, so the check is error-bounded
against the exact answers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vault_8_hive_spark.queries import all_queries

QUERIES = all_queries()


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = QUERIES["agg_approx"].fn(spark, sf_dir).toPandas().set_index("l_returnflag")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
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
        assert abs(built.loc[flag, "stddev_qty"] - exact.loc[flag, "stddev_qty"]) < 1e-6
        assert abs(built.loc[flag, "corr_qty_price"] - exact.loc[flag, "corr_qty_price"]) < 1e-6


def test_sketch_merge_accuracy(spark, sf_dir):
    """The merged HLL union estimate must track the exact distinct count
    per flag AND for the all-flags union (merge correctness — the union
    can't be reconstructed from the per-group estimates alone)."""
    est = QUERIES["agg_sketch_merge"].fn(spark, sf_dir).toPandas().set_index("l_returnflag")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
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
