"""Engine facade tests: the user-facing sql/table/run surface."""

from __future__ import annotations

from vault_8_hive_spark.engine import Engine


def test_engine_surface(spark, sf_dir):
    eng = Engine(sf_dir, spark=spark)
    assert eng.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"] > 0
    assert eng.table("nation").count() == 25
    assert len(eng.run("top_segment_revenue").collect()) == 5
    assert "lineitem" in eng.tables()


def test_exact_aggregates_invariant_under_replan(spark, sf_dir):
    """The determinism contract of functions/exact.py, tested directly:
    money aggregates must hash-match under different shuffle partition
    counts and with AQE toggled — the property that makes 1000-executor
    re-runs byte-identical."""
    from vault_8_hive_spark.queries import all_queries

    qs = all_queries()
    baseline = {}
    for name in ("pricing_summary", "agg_basic", "top_segment_revenue"):
        pdf = qs[name].fn(spark, sf_dir).toPandas()
        baseline[name] = sorted(
            tuple(repr(v) for v in r) for r in pdf[sorted(pdf.columns)].itertuples(index=False)
        )
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        for parts, aqe in (("3", "true"), ("17", "false")):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            for name, expect in baseline.items():
                pdf = qs[name].fn(spark, sf_dir).toPandas()
                got = sorted(
                    tuple(repr(v) for v in r)
                    for r in pdf[sorted(pdf.columns)].itertuples(index=False)
                )
                assert got == expect, f"{name} diverged at partitions={parts} aqe={aqe}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_table_rebuilds_on_source_regeneration(spark, tmp_path):
    """The driver regenerates testdata every round: a derived bucketed
    layout must detect the new source fingerprint and rebuild, never
    serve stale rows (the same contract catalog compaction honors)."""
    import shutil

    from pyspark.sql import functions as F

    from vault_8_hive_spark.catalog import bucketed_table

    src = tmp_path / "sfX"
    src.mkdir()
    spark.range(0, 100).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).alias("o_custkey"),
        F.lit(1.0).alias("o_totalprice"),
    ).coalesce(1).write.parquet(str(src / "orders.parquet"))
    # bucketed_table loads through catalog.table, which requires a known
    # name — orders is one.
    t1 = bucketed_table(spark, str(src), "orders", "o_custkey", buckets=2)
    assert t1.count() == 100

    # "regenerate" the landing file with different contents
    shutil.rmtree(src / "orders.parquet")
    spark.range(0, 37).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).alias("o_custkey"),
        F.lit(2.0).alias("o_totalprice"),
    ).coalesce(1).write.parquet(str(src / "orders.parquet"))

    t2 = bucketed_table(spark, str(src), "orders", "o_custkey", buckets=2)
    assert t2.count() == 37, "stale bucketed layout served after regeneration"
