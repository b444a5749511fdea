"""Scale-mechanism proofs: bucketed co-located joins and salted aggs.

These test the *mechanisms* SCALE.md claims, at toy size: the point is
the plan shape / equivalence, not throughput.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vault_8_hive_spark.operators.skew import salted_agg
from vault_8_hive_spark.plans.explain import formatted_plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Both sides bucketed+sorted on the join key -> sort-merge join with
    ZERO exchanges (the co-location story behind SCALE.md's bucketing)."""
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # A previous session's orphaned warehouse dir blocks managed-table
    # creation even after DROP (the table isn't in this catalog).
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    # Disable broadcast: at toy SF the planner would broadcast (and skip
    # bucketed scans entirely); at cluster scale both sides are big and
    # SMJ is what bucketing exists to serve.
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
            .select("o_orderkey", "l_linenumber", "o_totalprice", "l_quantity")
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    """Salting must be a pure execution-strategy change — byte-identical
    results to the direct groupBy."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain = {
        r["o_orderstatus"]: (r["n"], r["mx"])
        for r in o.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.max("o_totalprice").alias("mx"))
        .collect()
    }
    salted = {
        r["o_orderstatus"]: (r["n"], r["mx"])
        for r in salted_agg(
            o,
            keys=["o_orderstatus"],
            partial_aggs=[F.count(F.lit(1)).alias("pn"), F.max("o_totalprice").alias("pm")],
            merge_aggs=lambda: [F.sum("pn").alias("n"), F.max("pm").alias("mx")],
            salt_on="o_orderkey",
            salt_buckets=7,
        ).collect()
    }
    assert plain == salted
