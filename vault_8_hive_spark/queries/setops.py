"""Set operations + deduplication (SURVEY.md §2B): union all/distinct,
intersect/intersect all, except/except all, exact key-dedup with a
deterministic tie-break.

Scale: UNION ALL is a zero-shuffle concatenation; the DISTINCT variants
and INTERSECT/EXCEPT shuffle on the full row — at 100 TB prefer keyed
dedup (window or groupBy on a key) over whole-row DISTINCT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..session import prep
from . import register


def _year_custkeys(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == year)
        .select(F.col("o_custkey").alias("custkey"))
    )


@register(
    "setop_union_all",
    oracle="""
SELECT custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
  UNION ALL
  SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
) t
""",
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    return _year_custkeys(spark, sf_dir, 1995).unionAll(_year_custkeys(spark, sf_dir, 1996))


@register(
    "setop_union_distinct",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
UNION
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
""",
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    return (
        _year_custkeys(spark, sf_dir, 1995).union(_year_custkeys(spark, sf_dir, 1996)).distinct()
    )


@register(
    "setop_intersect",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
""",
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both 1995 and 1996 (set semantics)."""
    prep(spark)
    return _year_custkeys(spark, sf_dir, 1995).intersect(_year_custkeys(spark, sf_dir, 1996))


@register(
    "setop_intersect_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT ALL
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
""",
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersect — multiplicity = min(count95, count96)."""
    prep(spark)
    return _year_custkeys(spark, sf_dir, 1995).intersectAll(_year_custkeys(spark, sf_dir, 1996))


@register(
    "setop_except",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
""",
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    return _year_custkeys(spark, sf_dir, 1995).subtract(_year_custkeys(spark, sf_dir, 1996))


@register(
    "setop_except_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT ALL
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
""",
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    return _year_custkeys(spark, sf_dir, 1995).exceptAll(_year_custkeys(spark, sf_dir, 1996))


@register(
    "dedup_exact_keyed",
    oracle="""
SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
       CAST(l_quantity AS DOUBLE) AS l_quantity
FROM (
  SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_partkey, l_suppkey
                            ORDER BY l_orderkey, l_linenumber) AS rn
  FROM lineitem
) t
WHERE rn = 1
""",
    tags=("dedup",),
)
def dedup_exact_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-dedup with a deterministic survivor (first by orderkey,
    linenumber) — the scalable replacement for dropDuplicates([keys]),
    whose survivor choice is execution-order-dependent."""
    prep(spark)
    w = Window.partitionBy("l_partkey", "l_suppkey").orderBy("l_orderkey", "l_linenumber")
    return (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("l_quantity"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "dedup_full_row",
    oracle="""
SELECT DISTINCT o_orderstatus, o_orderpriority, CAST(year(o_orderdate) AS INT) AS order_year
FROM orders
""",
    tags=("dedup",),
)
def dedup_full_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-row DISTINCT over a projected (low-cardinality) row set."""
    prep(spark)
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderstatus", "o_orderpriority", F.year("o_orderdate").alias("order_year")
        )
        .distinct()
    )


@register(
    "unpivot_part_metrics",
    oracle="""
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
FROM part WHERE p_partkey <= 1000
UNION ALL
SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value
FROM part WHERE p_partkey <= 1000
""",
    tags=("unpivot",),
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide columns -> (metric, value) rows via stack()
    — the inverse of events_daily_pivot."""
    prep(spark)
    return (
        table(spark, sf_dir, "part")
        .where(F.col("p_partkey") <= 1000)
        .selectExpr(
            "p_partkey",
            "stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice) AS (metric, value)",
        )
    )
