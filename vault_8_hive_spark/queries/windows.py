"""Window-function family (SURVEY.md §2B): ranking (row_number, rank,
dense_rank, ntile, percent_rank), analytic (lag, lead, first, last,
nth_value), frames (rows / range between), and top-k per group.

Determinism: row_number/ntile order by includes a unique tie-break key;
rank/dense_rank/percent_rank may order by the value alone (ties share a
rank — deterministic output). Range frames order by an epoch-seconds cast
so Spark's numeric rangeBetween matches DuckDB's INTERVAL frame.

Scale: a window over partitionBy(k) is one shuffle on k (same exchange
reused by multiple window specs with the same partitioning — keep specs
aligned so Catalyst collapses them into one Window node per ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import dim, table
from ..functions.exact import dec, round4
from ..session import prep
from . import register


@register(
    "win_ranking",
    oracle="""
SELECT n_name, s_suppkey, CAST(s_acctbal AS DOUBLE) AS s_acctbal,
       CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey) AS INT) AS rn,
       CAST(RANK() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC) AS INT) AS rnk,
       CAST(DENSE_RANK() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC) AS INT) AS drnk,
       CAST(NTILE(4) OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey) AS INT) AS quartile,
       ROUND(PERCENT_RANK() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC), 9) AS prank
FROM supplier JOIN nation ON s_nationkey = n_nationkey
""",
    tags=("window", "ranking"),
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    tie = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"), "s_suppkey")
    val = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"))
    return (
        table(spark, sf_dir, "supplier")
        .join(dim(spark, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "s_suppkey",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            F.row_number().over(tie).alias("rn"),
            F.rank().over(val).alias("rnk"),
            F.dense_rank().over(val).alias("drnk"),
            F.ntile(4).over(tie).alias("quartile"),
            F.round(F.percent_rank().over(val), 9).alias("prank"),
        )
    )


@register(
    "win_analytic",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(LAG(o_totalprice)  OVER w AS DOUBLE) AS prev_price,
       CAST(LEAD(o_totalprice) OVER w AS DOUBLE) AS next_price,
       CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS first_price,
       CAST(LAST_VALUE(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS final_price,
       CAST(NTH_VALUE(o_totalprice, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey
                                             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS second_price
FROM orders
WHERE o_custkey <= 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey)
""",
    tags=("window", "analytic"),
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last/nth_value over a per-customer order timeline."""
    prep(spark)
    # NULL order dates exist in real data: the window order must say the
    # NULL end EXPLICITLY (Spark ASC defaults NULLS FIRST, DuckDB NULLS
    # LAST — round-7 null-flood sweep).
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("o_orderdate"), "o_orderkey"
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") <= 300)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
            F.lead("o_totalprice").over(w).cast("double").alias("next_price"),
            F.first("o_totalprice").over(w).cast("double").alias("first_price"),
            F.last("o_totalprice").over(wfull).cast("double").alias("final_price"),
            F.nth_value("o_totalprice", 2).over(wfull).cast("double").alias("second_price"),
        )
    )


@register(
    "win_frames",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_total,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS moving3_total,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
                  OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                        RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS trailing_90d_total
FROM orders
WHERE o_custkey <= 300 AND o_orderdate IS NOT NULL
""",
    tags=("window", "frames"),
)
def win_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum, 3-row moving sum, and a 90-day RANGE frame (epoch-
    seconds ordering so both engines see the identical numeric frame)."""
    prep(spark)
    row_w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    range_w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7776000, 0)
    )
    price = dec("o_totalprice", "decimal(28,4)")
    # Frames ride the order-date timeline; a row with no date has no
    # place on it (a NULL RANGE ordering key is engine-defined) — the
    # domain is explicit in both spellings.
    return (
        table(spark, sf_dir, "orders")
        .where((F.col("o_custkey") <= 300) & F.col("o_orderdate").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            round4(
                F.sum(price).over(row_w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            ).alias("running_total"),
            round4(F.sum(price).over(row_w.rowsBetween(-2, Window.currentRow))).alias(
                "moving3_total"
            ),
            round4(F.sum(price).over(range_w)).alias("trailing_90d_total"),
        )
    )


@register(
    "win_topk_per_group",
    oracle="""
SELECT c_mktsegment, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, CAST(rn AS INT) AS rn
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) t
WHERE rn <= 3
""",
    tags=("window", "topk", "limit"),
    bench=True,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment — the scalable per-group top-k
    (rank-filter prunes inside each partition before any global action)."""
    prep(spark)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .join(table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "sort_multikey_nulls",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o ON o_custkey = c_custkey
WHERE c_custkey <= 200
ORDER BY o_totalprice DESC NULLS LAST, c_custkey ASC, o_orderkey ASC NULLS FIRST
LIMIT 50
""",
    tags=("sort", "limit"),
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with explicit NULLS FIRST/LAST + LIMIT (Spark and
    DuckDB default null ordering differs — always say it explicitly)."""
    prep(spark)
    cust = table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    big = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
        .orderBy(
            F.col("o_totalprice").desc_nulls_last(),
            F.col("c_custkey").asc(),
            F.col("o_orderkey").asc_nulls_first(),
        )
        .limit(50)
    )


@register(
    "win_rolling_distinct",
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
days AS (SELECT DISTINCT d FROM du)
SELECT CAST(days.d AS TIMESTAMP) AS d,
       COUNT(DISTINCT du.user_id) AS dau7,
       COUNT(*) AS user_days7
FROM days JOIN du ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
GROUP BY days.d
""",
    tags=("window", "distinct", "rolling"),
)
def win_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day (trailing DAU window) — the
    windowed COUNT(DISTINCT) every activity dashboard needs and Spark's
    window functions don't accept directly. The engine rewrite: dedupe
    to (day, user), collapse each day to its user set, then a RANGE
    frame over day numbers unions the trailing 7 sets
    (size(array_distinct(flatten(collect_list)))).

    Scale: the frame state is bounded by (distinct users x 7 days) per
    row, NOT raw events — the dedupe and per-day collapse run first, so
    the window sees |days| rows with set-valued columns. For unbounded
    cardinalities the same query swaps the exact sets for HLL sketch
    partials merged across the frame (agg_sketch_hll), which is the
    100 TB posture; the exact form is the oracle-checkable dual."""
    prep(spark)
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    du = ev.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    day_sets = du.groupBy("d").agg(
        F.collect_set("user_id").alias("users"),
        F.count(F.lit(1)).alias("n_users"),
    )
    daynum = F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
    w = (
        Window.partitionBy(F.col("n_users") * 0)
        .orderBy(daynum)
        .rangeBetween(-6, 0)
    )
    return day_sets.select(
        F.col("d").cast("timestamp").alias("d"),
        F.size(F.array_distinct(F.flatten(F.collect_list("users").over(w))))
        .cast("bigint")
        .alias("dau7"),
        F.sum("n_users").over(w).alias("user_days7"),
    )


@register(
    "win_rolling_distinct_hll",
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
days AS (SELECT DISTINCT d FROM du)
SELECT CAST(days.d AS TIMESTAMP) AS d,
       COUNT(DISTINCT du.user_id) AS dau7,
       COUNT(DISTINCT du.user_id) AS verified_hll7
FROM days JOIN du ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
GROUP BY days.d
""",
    tags=("window", "distinct", "rolling", "sketch"),
)
def win_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB spelling of win_rolling_distinct: per-day HLL sketch
    PARTIALS merged across the 7-day RANGE frame (hll_union_agg as a
    window function) instead of exact user sets — frame state becomes a
    few KB per day regardless of user cardinality. Both spellings run
    in this one plan; the sketch estimate collapses to the exact count
    when within the sketch's accuracy envelope (lgK=14, rsd ~0.8%) and
    surfaces -1 otherwise, so the driver hash stays stable AND an
    out-of-contract sketch fails loudly (the module-standard clamp).

    This is the store-partials pattern crossed with window frames: the
    same per-day sketch table that serves daily rollups serves ANY
    trailing window by frame-union, no raw re-scan."""
    prep(spark)
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    day = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk"),
        F.collect_set("user_id").alias("users"),
    )
    daynum = F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
    w = (
        Window.partitionBy(F.length(F.col("d").cast("string")) * 0)
        .orderBy(daynum)
        .rangeBetween(-6, 0)
    )
    merged = day.select(
        "d",
        F.size(F.array_distinct(F.flatten(F.collect_list("users").over(w))))
        .cast("bigint")
        .alias("dau7"),
        F.expr("hll_union_agg(sk, true)").over(w).alias("m7"),
    )
    est = F.expr("hll_sketch_estimate(m7)")
    margin = F.greatest(F.lit(3.0), F.col("dau7") * 0.02)
    return merged.select(
        F.col("d").cast("timestamp").alias("d"),
        "dau7",
        F.when(F.abs(est - F.col("dau7")) <= margin, F.col("dau7"))
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("verified_hll7"),
    )


@register(
    "win_distribution",
    oracle="""
SELECT c_custkey, c_mktsegment,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       ROUND(percent_rank() OVER w, 9) AS pct_rank,
       ROUND(cume_dist() OVER w, 9) AS cume
FROM customer
WHERE c_custkey % 20 = 0
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal NULLS LAST, c_custkey)
""",
    tags=("window", "ranking", "distribution"),
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile quartiles, percent_rank,
    cume_dist per segment ordered by balance: the ranking family's
    normalized cousins (quartile bucketing for tiering, percentile rank
    for scoring). The (balance, custkey) order is total, so ntile's
    bucket boundaries are deterministic across engines and partition
    layouts."""
    prep(spark)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc_nulls_last("c_acctbal"), "c_custkey"
    )
    return (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 20 == 0)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w).cast("int").alias("quartile"),
            F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 9).alias("cume"),
        )
    )


@register(
    "win_rolling_regression",
    oracle="""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
         CAST(date_part('epoch', date_trunc('day', ts)) / 86400 AS BIGINT) AS x,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
)
SELECT d, total,
       CAST(COUNT(*) OVER w AS INT) AS n_window,
       ROUND(regr_slope(total, x) OVER w, 6) AS trend_slope,
       ROUND(regr_r2(total, x) OVER w, 6) AS trend_r2
FROM daily
WINDOW w AS (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
QUALIFY COUNT(*) OVER w >= 7
""",
    tags=("window", "regression", "time-series", "trend"),
)
def win_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS trend: regression aggregates AS WINDOW FUNCTIONS —
    per day, the slope and fit of total-vs-time over the trailing 14
    days, the trend detector behind 'metric declining for two weeks'
    alerts (CUSUM finds the break, this measures the drift rate).
    Days are integer epoch-days so x is exactly representable; slope
    over <=14 points rounds to 1e-6.

    Note the surface point: Spark runs regr_slope/regr_r2 in a frame
    spec directly (no self-join re-aggregation), the same partial-moment
    buffers as the grouped form; DuckDB mirrors with WINDOW + QUALIFY
    (Spark spells the n>=7 guard as a post-filter)."""
    prep(spark)
    from ..functions.exact import long_sum, scaled_long

    daily = (
        table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d"),
            (F.unix_timestamp(F.date_trunc("day", "ts")) / 86400)
            .cast("bigint")
            .alias("x"),
        )
        .agg(long_sum(F.sum(scaled_long("value")), 2).alias("total"))
    )
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("d")
        .rowsBetween(-13, 0)
    )
    out = daily.select(
        "d",
        "total",
        F.count(F.lit(1)).over(w).cast("int").alias("n_window"),
        F.round(F.regr_slope(F.col("total"), F.col("x")).over(w), 6).alias(
            "trend_slope"
        ),
        F.round(F.regr_r2(F.col("total"), F.col("x")).over(w), 6).alias("trend_r2"),
    )
    return out.where(F.col("n_window") >= 7)


@register(
    "win_pareto_frontier",
    oracle="""
WITH pts AS (
  SELECT p_partkey, p_retailprice, p_size,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM part
),
dom AS (
  SELECT p_partkey, p_retailprice, p_size, price_c,
         MAX(p_size) OVER (ORDER BY price_c
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS max_sz_cheaper,
         MAX(p_size) OVER (PARTITION BY price_c) AS max_sz_same
  FROM pts
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY price_c, p_partkey) AS INT) AS rnk,
       p_partkey, p_retailprice, CAST(p_size AS INT) AS p_size
FROM dom
WHERE COALESCE(max_sz_cheaper, -1) < p_size AND max_sz_same <= p_size
""",
    tags=("window-frames", "skyline", "pareto", "sort"),
)
def win_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline): the parts for which no other part
    is both at-most-as-expensive AND at-least-as-large with one strict —
    the "best tradeoff" set a recommendation or procurement query wants
    without the user pre-weighting the two objectives. The classic
    skyline operator no SQL engine ships natively.

    For two dimensions the block-nested-loop formulation collapses into
    ONE sorted window pass: scanning by ascending price, a part is
    dominated iff (a) some strictly-cheaper part has size >= its size —
    a running MAX over the strictly-preceding price RANGE frame — or
    (b) a same-price part has strictly larger size — a MAX over the
    price partition. Prices ride as exact scaled-int cents so the
    strict-cheaper frame is an integer RANGE (1 PRECEDING); ties on
    both coordinates survive together (identical points do not dominate
    each other). Everything is integer comparison — hash-stable.

    Scale: O(n log n) distributed sort + two windows, vs the O(n^2)
    self-join. The single global ORDER BY is the 2-D special case; at
    k > 2 dimensions partition the space (grid cells on one dimension,
    local skylines per cell, merge the per-cell frontiers — the
    standard divide-and-conquer skyline) so no task ever sees the whole
    relation."""
    prep(spark)
    from pyspark.sql import Window

    pts = table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_retailprice",
        F.col("p_size").cast("int").alias("p_size"),
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long").alias("price_c"),
    )
    w_cheaper = (
        Window.partitionBy(F.col("price_c") * 0)
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("price_c")
    dom = pts.select(
        "p_partkey",
        "p_retailprice",
        "p_size",
        "price_c",
        F.max("p_size").over(w_cheaper).alias("max_sz_cheaper"),
        F.max("p_size").over(w_same).alias("max_sz_same"),
    )
    frontier = dom.where(
        (F.coalesce(F.col("max_sz_cheaper"), F.lit(-1)) < F.col("p_size"))
        & (F.col("max_sz_same") <= F.col("p_size"))
    )
    w_rnk = Window.partitionBy(F.col("price_c") * 0).orderBy("price_c", "p_partkey")
    return frontier.select(
        F.row_number().over(w_rnk).cast("int").alias("rnk"),
        "p_partkey",
        "p_retailprice",
        "p_size",
    )
