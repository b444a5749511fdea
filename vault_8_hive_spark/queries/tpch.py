"""Core star-schema batch queries (scan + filter + join + agg + sort + limit).

These exercise the v0 end-to-end slice from SURVEY.md §7: parquet scan with
pushdown, broadcast/shuffle joins, hash aggregation with exact-decimal money
sums, ordering with deterministic tie-breaks, and limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.exact import (
    FRAC_DEC,
    QTY_DEC,
    dec,
    exact_sum,
    long_avg,
    long_double,
    long_sum,
    round4,
    scaled_long,
)
from ..session import prep
from . import register

# (1 - l_discount) / (1 + l_tax) as exact decimals; inputs have <=2 decimal
# digits (verified against the sf0.01 data) so scale-4/6 casts are lossless.


def _disc_price() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1).cast(FRAC_DEC) - dec("l_discount", FRAC_DEC))


def _charge() -> F.Column:
    return _disc_price() * (F.lit(1).cast(FRAC_DEC) + dec("l_tax", FRAC_DEC))


# Scaled-long spellings of the same exact values (see functions/exact.py:
# hot path for the bench SFs; the decimal spellings above are the >=5e7-row
# cluster-scale fallback with identical results).


def _disc100x100() -> F.Column:
    # l_extendedprice*(1-l_discount) in 1e-4 units, exact on int64
    return scaled_long("l_extendedprice") * (F.lit(100) - scaled_long("l_discount"))


def _charge100x3() -> F.Column:
    # ... * (1+l_tax) in 1e-6 units
    return _disc100x100() * (F.lit(100) + scaled_long("l_tax"))


# DECIMAL(28,4) (not 18) so DuckDB multiplies in int128 instead of
# overflowing its int64 fast path; the rational value is identical.
_O_DISC = "CAST(l_extendedprice AS DECIMAL(28,4)) * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))"
_O_CHARGE = f"({_O_DISC}) * (CAST(1 AS DECIMAL(8,6)) + CAST(l_tax AS DECIMAL(8,6)))"


@register(
    "pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE)      AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM({_O_DISC}), 4) AS DOUBLE)                              AS sum_disc_price,
       CAST(ROUND(SUM({_O_CHARGE}), 4) AS DOUBLE)                            AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(8,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("scan", "filter", "agg", "sort"),
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: grouped 8-way aggregate over lineitem.

    Scale: single shuffle on a 6-value grouping key; partial aggregation
    (map-side combine) reduces each partition to <=6 rows before exchange,
    so this stays network-cheap at any SF. Filter + 7-column projection are
    pushed into the parquet scan.
    """
    prep(spark)
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    # Exact fixed-point aggregation on scaled int64 (functions/exact.py):
    # the five money sums stay long-typed through the partial/final agg
    # (whole-stage codegen, no BigDecimal buffers) and unscale through
    # decimal on the 6 output rows — bit-identical doubles to the decimal
    # spelling, measured ~2x faster end-to-end at sf0.1.
    sq = F.sum(scaled_long("l_quantity"))
    se = F.sum(scaled_long("l_extendedprice"))
    sd100 = F.sum(scaled_long("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            long_sum(sq, 2).alias("sum_qty"),
            long_sum(se, 2).alias("sum_base_price"),
            long_sum(F.sum(_disc100x100()), 4).alias("sum_disc_price"),
            long_sum(F.sum(_charge100x3()), 6).alias("sum_charge"),
            long_avg(sq, 2, F.count("l_quantity")).alias("avg_qty"),
            long_avg(se, 2, F.count("l_extendedprice")).alias("avg_price"),
            (long_double(sd100, 2) / F.count("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "top_segment_revenue",
    oracle=f"""
SELECT c_mktsegment,
       CAST(ROUND(SUM({_O_DISC}), 4) AS DOUBLE) AS revenue,
       COUNT(DISTINCT o_orderkey)     AS n_orders
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY c_mktsegment
ORDER BY revenue DESC, c_mktsegment
LIMIT 5
""",
    tags=("scan", "filter", "join", "agg", "sort", "limit"),
    bench=True,
)
def top_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: top-5 market segments by gross revenue in 1995.

    customer ⋈ orders ⋈ lineitem with the year filter pushed below the
    joins. Scale: the orders filter lands in the parquet scan (partition
    pruning when orders is date-partitioned); customer⋈orders shuffles on
    custkey, orders⋈lineitem on orderkey — with AQE the filtered orders
    side is small enough at low SF to flip to broadcast at runtime.
    """
    prep(spark)
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            long_sum(F.sum(_disc100x100()), 4).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), "c_mktsegment")
        .limit(5)
    )


@register(
    "local_supplier_volume",
    oracle=f"""
SELECT n_name,
       CAST(ROUND(SUM({_O_DISC}), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    tags=("scan", "join", "agg", "sort"),
    bench=True,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 6-table join with a same-nation residual condition
    (customer's nation == supplier's nation) and a region filter.

    Scale: region+nation are broadcast (fixed cardinality), so the region
    filter prunes nations BEFORE the big fact joins; the three fact-side
    joins shuffle on their keys and AQE reorders/broadcasts by runtime
    size. The c_nationkey = s_nationkey condition rides the supplier join
    as a residual — no extra shuffle.
    """
    from ..catalog import dim

    prep(spark)
    region = dim(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = dim(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    # lineitem leads the chain so it is always the STREAM side: with
    # customer leading, the static planner broadcast-built lineitem itself
    # (its size estimate sits under the threshold at bench SFs) — a 600k-row
    # hashed relation per run. Fact-table-first ordering keeps every build
    # side a dim/filtered table at any SF, and at cluster scale AQE re-picks
    # shuffle joins when a side outgrows the threshold.
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            sup,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            long_sum(F.sum(_disc100x100()), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "forecast_revenue",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,4)) * CAST(l_discount AS DECIMAL(8,6))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("scan", "filter", "agg"),
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style revenue forecast: pure scan-filter-aggregate, the
    canonical predicate-pushdown query.

    Scale: all three predicates (date range, discount band, quantity cap)
    push into the parquet scan as row-group min/max filters, so at 100 TB
    only the matching row groups are ever decompressed; the global ungrouped
    sum is a partial-agg tree with one scalar per partition crossing the
    exchange.
    """
    prep(spark)
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        round4(F.sum(dec("l_extendedprice") * dec("l_discount", FRAC_DEC))).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "priority_late_ship",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("scan", "filter", "join", "semi", "agg", "sort"),
)
def priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check: orders in 1996-Q1 with at least
    one lineitem shipped after the order date, counted per priority.

    The EXISTS subquery is expressed as a LEFT SEMI join with the
    l_shipdate > o_orderdate condition as a residual — Spark's semi join
    stops probing a key on first match, so the lineitem side never fans
    out. Scale: the quarter filter prunes orders at the scan; the semi
    join shuffles both sides on orderkey once.
    """
    prep(spark)
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "promo_revenue_share",
    oracle=f"""
SELECT CAST(ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {_O_DISC} ELSE CAST(0 AS DECIMAL(28,4)) END), 4) AS DOUBLE)
       / CAST(ROUND(SUM({_O_DISC}), 4) AS DOUBLE) AS promo_share_pct,
       COUNT(*) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
""",
    tags=("scan", "filter", "join", "broadcast", "agg", "conditional"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promotion effect: share of one month's discounted
    revenue coming from PROMO-type parts.

    Scale: part is the small side — broadcast it so the month of lineitem
    never shuffles; the conditional sum is one map-side CASE feeding a
    scalar partial aggregate. Both numerator and denominator are exact
    decimal sums rounded to scale 4, then ONE double division — the same
    IEEE op in both engines.
    """
    from ..catalog import dim

    prep(spark)
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = dim(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(28,4)")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.round(F.lit(100.0) * F.sum(promo), 4).cast("double")
                / round4(F.sum(_disc_price()))
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "large_order_customers",
    oracle="""
SELECT c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    tags=("scan", "join", "agg", "having", "sort", "limit"),
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: orders whose total quantity
    exceeds 300 units, with their customer, top-20 by order value.

    Scale: aggregate lineitem by orderkey FIRST (the HAVING filter kills
    ~99% of orders before any join), then join the surviving handful to
    orders and customer — at 100 TB this turns two fact-fact joins into
    one fact aggregation plus small-side joins AQE can broadcast.
    """
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", QTY_DEC)).alias("qty_dec"))
        .where(F.col("qty_dec") > 300)
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.round("qty_dec", 4).cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@register(
    "top_supplier_revenue",
    oracle=f"""
WITH supplier_rev AS (
  SELECT l_suppkey, CAST(ROUND(SUM({_O_DISC}), 4) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN supplier_rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM supplier_rev)
ORDER BY s_suppkey
""",
    tags=("scan", "filter", "join", "agg", "subquery", "sort"),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: supplier(s) with the maximum quarterly
    revenue, via an uncorrelated scalar subquery over a derived agg.

    Scale: supplier_rev is one shuffle on suppkey; the MAX is a scalar
    broadcast back into the filter (Spark plans the reused subquery once
    with ReusedExchange); the supplier dim join is broadcast.
    """
    prep(spark)
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(round4(F.sum(_disc_price())).alias("total_revenue"))
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    sup = table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == F.col("m"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_SQL_API_TEXT = """
SELECT n_name,
       COUNT(DISTINCT s_suppkey)                 AS n_suppliers,
       CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(28,4))), 4) AS DOUBLE) AS total_bal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name <> 'EUROPE'
GROUP BY n_name
HAVING COUNT(DISTINCT s_suppkey) > 1
"""


@register(
    "sql_api_text",
    oracle=_SQL_API_TEXT,
    tags=("sql-api", "join", "agg"),
)
def sql_api_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text API surface: the identical ANSI string runs through
    spark.sql() over registered views AND through the DuckDB oracle —
    one query text, two engines, hash-equal results (incl. HAVING)."""
    from ..catalog import register_views

    prep(spark)
    register_views(spark, sf_dir)
    return spark.sql(_SQL_API_TEXT)


@register(
    "order_count_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("scan", "join", "outer", "agg", "sort"),
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: how many
    customers placed exactly N non-urgent orders, zeros included.

    The semantic trap Q13 exists to test: the priority exclusion rides
    the JOIN CONDITION, not a WHERE — a customer whose orders are all
    urgent must survive as a c_count=0 row (a WHERE would delete them
    after null-extension). Scale: one shuffle on custkey for the outer
    join + first aggregate; the distribution re-agg shuffles ~100
    distinct counts — negligible. The left join cannot broadcast the
    customer (preserved) side, but AQE can broadcast filtered orders if
    small; at 100 TB both sides hash-shuffle on custkey, the right
    posture for fact-fact.
    """
    prep(spark)
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "dormant_rich_customers",
    oracle="""
WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT n_name,
       COUNT(*) AS n_cust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
FROM customer CROSS JOIN pos
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
ORDER BY n_name
""",
    tags=("scan", "filter", "anti", "subquery", "agg", "sort"),
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: above-average-balance customers with no recent
    orders (none since 2000-01-01), rolled up per nation — the "global
    sales opportunity" shape: uncorrelated scalar subquery threshold +
    anti join + final agg.

    Numeric discipline: the above-average test is `bal * n > sum` in
    exact DECIMAL arithmetic (multiply, never divide) — decimal division
    scale rules differ between engines, and a double AVG would make the
    threshold float-summation-order dependent; the multiply form is
    bit-exact on both. Scale: the 1-row (sum, n) aggregate broadcasts;
    the anti join on custkey is one shuffle against filtered orders
    (date predicate pushed to the scan); nation is broadcast.
    """
    prep(spark)
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    pos = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(dec("c_acctbal", "decimal(18,2)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    recent = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cust.join(F.broadcast(pos))
        .where(dec("c_acctbal", "decimal(18,2)") * F.col("n") > F.col("s"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum(dec("c_acctbal", "decimal(18,2)")), 2).cast("double").alias("total_bal"),
        )
        .orderBy("n_name")
    )


_SQL_LATERAL = """
SELECT c.c_custkey, o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
FROM customer c,
     LATERAL (SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
WHERE c.c_custkey <= 500
"""


@register(
    "sql_lateral_topk",
    oracle=_SQL_LATERAL,
    tags=("sql-api", "lateral", "join", "topk"),
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table (SQL:1999 lateral join, Spark 4
    SQL): each customer's top-2 orders by value via a correlated
    ORDER BY ... LIMIT subquery — the identical ANSI string runs on both
    engines. Spark decorrelates the lateral into a ranked window over a
    single orders scan (no per-row re-execution), which is exactly the
    plan you want at 100 TB; DuckDB executes it as a dependent join."""
    from ..catalog import register_views

    prep(spark)
    register_views(spark, sf_dir)
    return spark.sql(_SQL_LATERAL)


_PIPE_SQL = """
FROM orders
|> WHERE o_orderstatus <> 'F'
|> JOIN customer ON o_custkey = c_custkey
|> AGGREGATE COUNT(*) AS n_orders,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4))), 4) AS DOUBLE)
               AS total
   GROUP BY c_mktsegment, o_orderpriority
|> WHERE n_orders > 5
|> SELECT c_mktsegment, o_orderpriority, n_orders, total
"""


@register(
    "sql_pipe_syntax",
    oracle="""
SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4))), 4) AS DOUBLE)
         AS total
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus <> 'F'
GROUP BY c_mktsegment, o_orderpriority
HAVING COUNT(*) > 5
""",
    tags=("sql-text", "pipe-syntax", "agg", "join"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0's `|>` operator chain, the
    GoogleSQL-style linear form): FROM ... |> WHERE |> JOIN |>
    AGGREGATE |> WHERE — each stage consumes the previous one in
    reading order, the post-aggregate WHERE replacing HAVING. The
    oracle runs the equivalent classic ANSI text in DuckDB: same
    relational algebra, hash-identical result, demonstrating the pipe
    form is surface, not semantics — Catalyst plans both identically
    (same pushdown, same broadcast)."""
    from ..catalog import register_views

    prep(spark)
    register_views(spark, sf_dir)
    return spark.sql(_PIPE_SQL)


@register(
    "sql_parameterized",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4))), 4) AS DOUBLE)
         AS total
FROM orders
WHERE o_totalprice >= 1000.0 AND o_orderstatus = 'O'
GROUP BY o_orderpriority
""",
    tags=("sql-text", "parameterized", "agg"),
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (spark.sql(text, args=...)): named :parameters
    bound server-side — the injection-safe API a migrating application
    layer uses instead of string interpolation. Parameters bind as
    literals BEFORE analysis, so Catalyst constant-folds and pushes them
    down exactly like hand-written literals (the oracle runs the
    equivalent literal text)."""
    from ..catalog import register_views

    prep(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4))), 4) AS DOUBLE)
         AS total
FROM orders
WHERE o_totalprice >= :min_price AND o_orderstatus = :status
GROUP BY o_orderpriority
""",
        args={"min_price": 1000.0, "status": "O"},
    )


@register(
    "shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       CAST(ROUND(SUM({_O_DISC}), 4) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-30'
  AND l_shipdate  > TIMESTAMP '1997-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("scan", "join", "agg", "sort", "limit"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: top-10 unshipped orders (ordered
    before the cutoff, shipping after it) by discounted revenue, for one
    market segment.

    Scale: both date predicates push into the parquet scans (row-group
    pruning kills most of lineitem and orders before any join); the
    segment filter reduces customer to ~1/5 — small enough to broadcast —
    so the only shuffle is lineitem⋈orders on orderkey, and the top-10 is
    a TakeOrdered (per-partition heap, no global sort).
    """
    prep(spark)
    cutoff = F.lit("1997-06-30").cast("timestamp")
    cust = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(long_sum(F.sum(_disc100x100()), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
       CAST(ROUND(SUM({_O_DISC}), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    tags=("scan", "join", "agg", "sort", "broadcast"),
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style volume shipping: two years of trade revenue between
    one nation pair, split by direction and ship year.

    Scale: the nation-pair predicate lands on the two BROADCAST nation
    joins, so supplier and customer shrink to ~2/25 each right after
    their (broadcast) nation lookups — AQE then broadcasts those filtered
    dims too, leaving the date-pruned lineitem as the only streamed fact
    and its orderkey join as the only exchange.
    """
    from ..catalog import dim

    prep(spark)
    pair = ("NATION_1", "NATION_2")
    n1 = dim(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    n2 = dim(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    sup = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == n1.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == n2.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            long_sum(F.sum(_disc100x100()), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "national_market_share",
    oracle=f"""
WITH all_nations AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         {_O_DISC} AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT o_year,
       CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS DECIMAL(28,4)) END), 4) AS DOUBLE)
         / CAST(ROUND(SUM(volume), 4) AS DOUBLE) AS mkt_share,
       CAST(ROUND(SUM(volume), 4) AS DOUBLE) AS total_volume,
       COUNT(*) AS n_lineitems
FROM all_nations
GROUP BY o_year
ORDER BY o_year
""",
    tags=("scan", "join", "agg", "conditional", "broadcast"),
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: one supplier nation's share
    of a region's imports of one part type, by order year.

    Scale: part (type-filtered), supplier+nation, and customer+nation+
    region are all broadcast dims; lineitem is streamed once with the
    order-date window pruned at the scan. The share is two exact decimal
    sums (conditional numerator, total denominator) divided ONCE as
    doubles — the same IEEE op on both engines.
    """
    from ..catalog import dim

    prep(spark)
    part = dim(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    n1 = dim(spark, sf_dir, "nation")
    region = dim(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    cust_nat = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    n2 = dim(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    sup = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    vol = _disc100x100()
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(cust_nat, F.col("o_custkey") == F.col("c_custkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                long_sum(F.sum(target), 4) / long_sum(F.sum(vol), 4)
            ).alias("mkt_share"),
            long_sum(F.sum(vol), 4).alias("total_volume"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("o_year")
    )


@register(
    "returned_item_reporting",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       CAST(ROUND(SUM({_O_DISC}), 4) AS DOUBLE) AS revenue,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("scan", "join", "agg", "sort", "limit"),
)
def returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item reporting: the 20 customers who
    returned the most revenue in one quarter.

    Scale: returnflag + the quarter window prune lineitem/orders at the
    scan; the grouped aggregate keys on custkey so the customer/nation
    (broadcast) joins attach AFTER the reduction — dims join ~|customers|
    rows, not |lineitems|. Top-20 is a TakeOrdered heap.
    """
    from ..catalog import dim

    prep(spark)
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    by_cust = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(long_sum(F.sum(_disc100x100()), 4).alias("revenue"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = dim(spark, sf_dir, "nation")
    return (
        by_cust.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "small_quantity_revenue",
    oracle="""
WITH thresh AS (
  SELECT l_partkey AS t_partkey,
         SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS sum_q100,
         COUNT(*) AS n_li
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem
JOIN part   ON p_partkey = l_partkey
JOIN thresh ON t_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND CAST(ROUND(l_quantity * 100, 0) AS BIGINT) * n_li * 5 < sum_q100
""",
    tags=("scan", "join", "agg", "correlated", "broadcast"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue: yearly revenue lost
    if orders below 20% of a part's average order quantity were dropped.

    The correlated scalar subquery (per-part AVG) decorrelates into a
    per-partkey aggregate joined back to lineitem; the 20%-of-average
    comparison rides EXACT integers (qty_cents * n * 5 < sum_cents, since
    q < 0.2*sum/n <=> 5qn < sum) so no engine disagrees on the boundary.

    Scale: the threshold aggregate is a map-side-combinable groupBy on
    partkey; the brand filter broadcasts part so only matching partkeys'
    lineitems survive to the threshold join — which AQE also broadcasts
    once the brand cut shrinks it under the threshold.
    """
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    q100 = scaled_long("l_quantity")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(q100).alias("sum_q100"), F.count(F.lit(1)).alias("n_li")
    )
    part = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(thresh, F.col("l_partkey") == F.col("t_partkey"))
        .where(q100 * F.col("n_li") * F.lit(5) < F.col("sum_q100"))
        .agg(
            (
                F.sum(dec("l_extendedprice", "decimal(28,4)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "disjunctive_predicate_revenue",
    oracle=f"""
SELECT CAST(ROUND(SUM({_O_DISC}), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
    tags=("scan", "join", "filter", "agg", "disjunction"),
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive-predicate revenue: an OR of three
    brand/size/quantity conjunctions across the part join.

    Scale: Catalyst extracts the common sub-predicates across the OR arms
    (quantity 1-30 pushes to the lineitem scan, size 1-15 and the 3-brand
    IN-list to the part scan) BEFORE evaluating the residual disjunction
    on join output — the classic derived-predicate optimization Q19
    exists to test. part broadcasts; lineitem never shuffles.
    """
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & qty.between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(
            arm("Brand#12", 5, 1, 11)
            | arm("Brand#23", 10, 10, 20)
            | arm("Brand#34", 15, 20, 30)
        )
        .agg(
            long_sum(F.sum(_disc100x100()), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "waiting_suppliers",
    oracle="""
WITH f AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F' AND l_suppkey IS NOT NULL
),
late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM f WHERE late)
SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM f l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    tags=("scan", "join", "exists", "anti", "agg", "sort", "limit"),
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style suppliers-who-kept-orders-waiting: in finished
    orders with at least two suppliers, count per supplier the orders
    where they were the ONLY late shipper (late = shipped more than 90
    days after the order date — this schema has no receipt/commit dates;
    reference contract SURVEY.md §2B).

    The EXISTS / NOT EXISTS pair decorrelates into ONE per-order
    aggregate: n_supp >= 2 (another supplier exists) and exactly one
    distinct late supplier (no OTHER late supplier exists for a late
    row). Under the n_late_supp == 1 filter that lone supplier is
    recoverable INSIDE the same aggregate — max(when(late, suppkey)) is
    exactly it — so the fact is consumed ONCE (the literal EXISTS plan
    reads it three times), reduced to one row per order before any join.

    Distinctness rides a pre-reduction to (order, supplier) pairs with
    max(late), NOT countDistinct: two distinct aggregates in one groupBy
    make Catalyst Expand the fact x3 (45M expand rows and two wide
    shuffles at the 25x probe — measured 5.5 s; this shape 0.1 s). The
    explicit repartition on l_orderkey lets BOTH groupBys ride the same
    exchange (HashPartitioning(okey) satisfies the (okey, skey)
    clustering requirement) — one fact shuffle total, no Expand.
    """
    prep(spark)
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    # l_suppkey IS NOT NULL: an unattributed line can neither make a
    # supplier 'waiting' nor witness that another supplier exists — and
    # the oracle's l2.l_suppkey <> l1.l_suppkey is never TRUE for NULL,
    # while count(*) over the pair reduction would count it (null-flood).
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_suppkey").isNotNull())
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    f = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("late"),
    )
    pairs = (
        f.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.count(F.when(F.col("late"), 1)).alias("n_late_supp"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    waiting = per_order.where(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    ).select("l_orderkey", "late_supp")
    sup = table(spark, sf_dir, "supplier")
    return (
        waiting.join(sup, F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "sql_group_by_all",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4))), 4) AS DOUBLE)
         AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY ALL
ORDER BY ALL
""",
    tags=("sql-text", "group-by-all", "agg"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (Spark 4 SQL surface): every
    non-aggregate select item becomes a grouping key and the full
    select list becomes the sort order — the analyst-ergonomics syntax
    a migrating DuckDB/BigQuery user expects to keep working. The
    oracle runs the IDENTICAL text (DuckDB pioneered the syntax), so
    this row also proves the dialect-level parity, not just the result.

    Scale: desugars to an ordinary grouped aggregate — same partial-agg
    + exchange plan as the explicit spelling; ORDER BY ALL adds one
    final sort of the reduced rows.
    """
    from ..catalog import register_views

    prep(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4))), 4) AS DOUBLE)
         AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY ALL
ORDER BY ALL
"""
    )


@register(
    "orders_open_backlog",
    oracle="""
WITH spans AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS d0,
         CAST(MAX(l.l_shipdate) AS DATE) AS d1
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate IS NOT NULL
  GROUP BY o.o_orderkey, o.o_orderdate
  HAVING MAX(l.l_shipdate) IS NOT NULL
),
deltas AS (
  SELECT d0 AS d, 1 AS delta FROM spans
  UNION ALL
  SELECT d1 + INTERVAL 1 DAY, -1 FROM spans
),
daily AS (SELECT CAST(d AS DATE) AS d, SUM(delta) AS dd FROM deltas GROUP BY 1),
cum AS (
  SELECT d, SUM(dd) OVER (ORDER BY d) AS open_orders
  FROM daily
)
SELECT CAST(d AS TIMESTAMP) AS d,
       CAST(open_orders AS BIGINT) AS open_orders,
       CAST(RANK() OVER (ORDER BY open_orders DESC) AS INT) AS rnk
FROM cum
QUALIFY ROW_NUMBER() OVER (ORDER BY open_orders DESC, d) <= 15
ORDER BY open_orders DESC, d
""",
    tags=("scan", "interval", "backlog", "time-series", "delta-encoding"),
)
def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time by interval stabbing: each order is
    'open' from its order date until its last line ships; the daily
    concurrency count comes from DELTA ENCODING (+1 at start, -1 the
    day after end) and ONE running sum over the daily deltas — the
    standard scalable spelling of 'how many intervals cover each day'
    (the naive days x orders stab join is quadratic; this is linear
    with a date-sized cumulative tail). Top-15 peak-backlog days with
    their dense rank.

    Counts are exact integers end to end; the only window runs over
    the DAY-level reduction (bounded by calendar span, thousands of
    rows at any SF), never the fact — the same post-reduction posture
    as the daily-series smoothers.

    Scale: the per-order MAX reduces LINEITEM ALONE (map-side
    combinable at the scan — the fact collapses to one row per order
    BEFORE any join), then the order dim joins the reduced relation
    key-to-key. Joining the raw fact first and aggregating after moves
    every line through the exchange — measured 7.0 s vs 5.4 s at the
    25x probe; the residual cost IS the per-order reduction itself
    (3.75M distinct keys leave little map-side combining). The two
    delta rows per order come from ONE inline() explode over the join
    output — spelling it as a UNION of two projections over `spans`
    re-executes the whole join subtree (2 joins / 4 scans in the
    physical plan, measured before the r7 rewrite); with inline() the
    fact is genuinely scanned once (plan-asserted: 1 join, 2 scans).
    One day rollup follows.
    """
    from pyspark.sql import Window

    prep(spark)
    # Dated spans only: an order with no order date (or no shipped
    # line) has no place on the timeline, and a NULL day would sit at
    # OPPOSITE ends of the two engines' running sums (null-flood sweep).
    ends = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("ship_end"))
        .where(F.col("ship_end").isNotNull())
    )
    deltas = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate").isNotNull())
        .select("o_orderkey", "o_orderdate")
        .join(ends, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.inline(
                F.array(
                    F.struct(
                        F.to_date("o_orderdate").alias("d"),
                        F.lit(1).alias("delta"),
                    ),
                    F.struct(
                        F.date_add(F.to_date("ship_end"), 1).alias("d"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            )
        )
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("dd"))
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select("d", F.sum("dd").over(wcum).alias("open_orders"))
    wtop = Window.orderBy(F.desc("open_orders"), "d")
    wrnk = Window.orderBy(F.desc("open_orders"))
    return (
        cum.select(
            F.col("d").cast("timestamp").alias("d"),
            F.col("open_orders").cast("bigint").alias("open_orders"),
            F.rank().over(wrnk).cast("int").alias("rnk"),
            F.row_number().over(wtop).alias("_rn"),
        )
        .where(F.col("_rn") <= 15)
        .drop("_rn")
        .orderBy(F.desc("open_orders"), "d")
    )
