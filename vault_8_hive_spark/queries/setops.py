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


@register(
    "table_snapshot_diff",
    oracle="""
WITH prev AS (
  SELECT doc_id, md5(text) AS row_hash FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 900000 AS doc_id, md5(text) AS row_hash
  FROM documents WHERE doc_id % 11 = 0
),
cur AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0
                  THEN regexp_replace(text, '^[^ ]+', 'EDITED')
                  ELSE text END) AS row_hash
  FROM documents
),
d AS (
  SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
         CASE WHEN p.doc_id IS NULL THEN 'added'
              WHEN c.doc_id IS NULL THEN 'removed'
              WHEN p.row_hash <> c.row_hash THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM prev p FULL JOIN cur c ON p.doc_id = c.doc_id
)
SELECT status, COUNT(*) AS n_rows,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM d GROUP BY status
""",
    tags=("setops", "diff", "audit", "versioning"),
)
def table_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two table versions (the audit a versioned
    lake runs after every ingest): full-outer join on the key, row-level
    md5 comparison classifies added / removed / changed / unchanged.
    The 'previous' version is derived deterministically (every 13th doc
    missing from it -> added; every 7th edited -> changed; a shifted
    slice present only in it -> removed) so all four classes are
    exercised.

    Scale: ONE co-partitioned full-outer join on the key plus an md5 per
    row — at 100 TB both sides bucket by the key so the join is
    exchange-free, and the md5 rides the scan. The per-status rollup is
    a 4-row aggregate."""
    prep(spark)
    docs = table(spark, sf_dir, "documents")
    prev = (
        docs.where(F.col("doc_id") % 13 != 0)
        .select("doc_id", F.md5(F.col("text").cast("binary")).alias("row_hash"))
        .unionByName(
            docs.where(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 900000).alias("doc_id"),
                F.md5(F.col("text").cast("binary")).alias("row_hash"),
            )
        )
    )
    cur = docs.select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0,
                F.regexp_replace("text", "^[^ ]+", "EDITED"),
            )
            .otherwise(F.col("text"))
            .cast("binary")
        ).alias("row_hash"),
    )
    p = prev.alias("p")
    c = cur.alias("c")
    d = p.join(c, F.col("p.doc_id") == F.col("c.doc_id"), "full_outer").select(
        F.coalesce("p.doc_id", "c.doc_id").alias("doc_id"),
        F.when(F.col("p.doc_id").isNull(), "added")
        .when(F.col("c.doc_id").isNull(), "removed")
        .when(F.col("p.row_hash") != F.col("c.row_hash"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return d.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@register(
    "merge_into_cdc",
    oracle="""
WITH tgt AS (
  SELECT c_custkey, CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
  FROM customer WHERE c_custkey % 10 <> 0
),
src AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
         CAST(ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 1000.0,
                    0) AS BIGINT) AS delta_cents
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1995-07-01'
  GROUP BY 1
)
SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
       CAST(CASE WHEN t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
                 THEN t.bal_cents + s.delta_cents
                 WHEN t.c_custkey IS NULL THEN s.delta_cents
                 ELSE t.bal_cents END AS DOUBLE) / 100.0 AS balance,
       CASE WHEN t.c_custkey IS NULL THEN 'insert'
            WHEN s.c_custkey IS NOT NULL THEN 'update'
            ELSE 'keep' END AS op
FROM tgt t FULL JOIN src s ON t.c_custkey = s.c_custkey
WHERE NOT (t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
           AND s.n_orders >= 8)
""",
    tags=("merge", "row-level-ops", "cdc", "upsert"),
)
def merge_into_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO over vanilla parquet, the declarative surface
    (operators/merge.py): target = customer balance snapshot (custkeys
    not divisible by 10, so the source genuinely exercises the INSERT
    clause), source = per-customer 1995-H1 order activity. One statement-
    shaped call expresses WHEN MATCHED AND n_orders >= 8 THEN DELETE
    (archive churned-out keys), WHEN MATCHED THEN UPDATE (balance +=
    delta), WHEN NOT MATCHED THEN INSERT — compiled to ONE full outer
    join + projection, the plan a lakehouse MERGE produces after its own
    row-level rewrite. SCALE.md "Row-level operations / MERGE INTO"
    records why the statement form needs a table format and why this
    operator + the foreachBatch/CDC patterns are the vanilla-parquet
    contract.

    Determinism: balances ride integer cents end-to-end; the only double
    division (cents / 100.0) is one identical IEEE op per row on both
    engines. The audit op column tags each surviving row."""
    from ..functions.exact import scaled_long
    from ..operators.merge import merge_into

    prep(spark)
    target = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 10 != 0)
        .select("c_custkey", scaled_long("c_acctbal").alias("bal_cents"))
    )
    source = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
        )
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(scaled_long("o_totalprice")) / 1000.0, 0)
            .cast("bigint")
            .alias("delta_cents"),
        )
    )
    merged = merge_into(
        target,
        source,
        on=["c_custkey"],
        matched_delete=F.col("n_orders") >= 8,
        matched_update={
            "bal_cents": F.col("bal_cents") + F.col("delta_cents")
        },
        not_matched_insert={"bal_cents": F.col("delta_cents")},
        op_column="op",
    )
    return merged.select(
        "c_custkey",
        (F.col("bal_cents").cast("double") / 100.0).alias("balance"),
        "op",
    )
