"""Aggregation family (SURVEY.md §2B): hash aggregates, distinct aggs,
rollup/cube/grouping sets + grouping_id, sorted collect_list/set,
exact & approx percentiles, moment statistics (stddev/var/corr/covar),
filtered/conditional aggregation.

Scale notes: every aggregate here is a partial (map-side) + final hash
aggregate — one shuffle on the grouping key. Moment statistics that must
hash-match the oracle are computed from order-independent decimal power
sums (see functions/exact.py rationale); the built-in single-pass variants
are exposed too (rows-only check) since they're the right call when a
tolerance is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import dim, table
from ..functions.exact import (
    dec,
    exact_sum,
    long_double,
    long_sum,
    round4,
    scaled_long,
)
from ..session import prep
from . import register


@register(
    "agg_basic",
    oracle="""
SELECT n_name,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_mktsegment) AS n_segments,
       CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
       CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(28,4))), 4) AS DOUBLE) AS sum_bal,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    tags=("agg", "join"),
    bench=True,
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / count-distinct / min / max / exact sum / exact avg per
    nation. The money sums ride the scaled-long fast path (c_acctbal is
    exactly 2-decimal; verified <2e-10 scaling error on the driver data)
    — same value as the decimal sum with the aggregate kept inside
    whole-stage codegen; the 300x floor probe measured the decimal Sum
    buffer at ~5x the cost of the whole rest of this query."""
    prep(spark)
    cents = F.sum(scaled_long("c_acctbal"))
    return (
        table(spark, sf_dir, "customer")
        .join(dim(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
            long_sum(cents, 2).alias("sum_bal"),
            (long_double(cents, 2) / F.count("c_acctbal")).alias("avg_bal"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
SELECT r_name, n_name,
       GROUPING(r_name) * 2 + GROUPING(n_name) AS gid,
       COUNT(*) AS n_cust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(28,4))), 4) AS DOUBLE) AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
HAVING COUNT(*) > 0
""",
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) with grouping_id — subtotals + grand total.

    Empty-slice contract: Spark's grouping-set aggregates return ZERO
    rows over an empty relation, where the SQL standard (and DuckDB)
    emits the () grand-total row with zero counts. The engine ships
    Spark's behavior; the oracle aligns via HAVING COUNT(*) > 0, which
    is the identity on any nonempty input (every real group has >= 1
    row) and drops only the phantom empty-input total."""
    prep(spark)
    return (
        table(spark, sf_dir, "customer")
        .join(dim(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(dim(spark, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_cust"),
            exact_sum("c_acctbal", "decimal(28,4)").alias("sum_bal"),
        )
        .select("r_name", "n_name", "gid", "n_cust", "sum_bal")
    )


@register(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
HAVING COUNT(*) > 0
""",
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims — all 4 grouping combinations.
    Empty-slice contract as agg_rollup: HAVING COUNT(*) > 0 aligns the
    oracle with Spark's zero-rows-on-empty grouping-set semantics."""
    prep(spark)
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n_orders"))
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders")
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
HAVING COUNT(*) > 0
""",
    tags=("agg", "grouping_sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — per-flag, per-status, and grand total.
    Empty-slice contract as agg_rollup: HAVING COUNT(*) > 0 aligns the
    oracle with Spark's zero-rows-on-empty grouping-set semantics."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(F.count(F.lit(1)).alias("n"), exact_sum("l_quantity", "decimal(18,4)").alias("sum_qty"))


@register(
    "agg_collect_sorted",
    oracle="""
SELECT n_name,
       COALESCE(string_agg(s_name, ',' ORDER BY s_name), '') AS suppliers,
       COUNT(*) AS n_supp
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
    tags=("agg", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list made deterministic: array_sort then join to a string
    (string form also sidesteps array-vs-ndarray hashing differences)."""
    prep(spark)
    return (
        table(spark, sf_dir, "supplier")
        .join(dim(spark, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers"),
            F.count(F.lit(1)).alias("n_supp"),
        )
    )


@register(
    "agg_collect_set",
    oracle="""
SELECT c_mktsegment,
       COALESCE(string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority), '')
         AS priorities
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    tags=("agg", "collect"),
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    return (
        table(spark, sf_dir, "customer")
        .join(table(spark, sf_dir, "orders"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities"))
    )


@register(
    "agg_percentile_exact",
    oracle="""
SELECT c_mktsegment,
       ROUND(CAST(quantile_cont(c_acctbal, 0.5) AS DOUBLE), 6) AS median_bal,
       ROUND(CAST(quantile_cont(c_acctbal, 0.9) AS DOUBLE), 6) AS p90_bal,
       CAST(quantile_disc(c_acctbal, 0.5) AS DOUBLE) AS median_disc
FROM customer
GROUP BY c_mktsegment
""",
    tags=("agg", "percentile"),
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous + discrete). Continuous interpolation
    is one IEEE op on identical inputs — rounded to 6 to absorb formula
    variants across engines; discrete picks an actual value (exact)."""
    prep(spark)
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("median_bal"),
            F.round(F.expr("percentile(c_acctbal, 0.9)"), 6).alias("p90_bal"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal)")
            .cast("double")
            .alias("median_disc"),
        )
    )


@register(
    "agg_distinct_ops",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_part,
       CAST(ROUND(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_dist_qty
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "distinct"),
)
def agg_distinct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple distinct aggregates in one grouping (Catalyst expand)."""
    prep(spark)
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            round4(F.sum_distinct(dec("l_quantity", "decimal(18,4)"))).alias("sum_dist_qty"),
        )
    )


# Moment statistics, bit-exact: computed from order-independent decimal
# power sums, identical formula in both engines. sum(x^2) at scale 8 with
# x < 1e5 keeps the decimal inside precision 38 for sf<=1 row counts.
_O_SX = "SUM(CAST(l_quantity AS DECIMAL(28,4)))"
_O_SXX = "SUM(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_quantity AS DECIMAL(28,4)))"
_O_SY = "SUM(CAST(l_extendedprice AS DECIMAL(28,4)))"
_O_SYY = "SUM(CAST(l_extendedprice AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(28,4)))"
_O_SXY = "SUM(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(28,4)))"


@register(
    "agg_moments_exact",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND(SQRT((CAST({_O_SXX} AS DOUBLE) - CAST({_O_SX} AS DOUBLE) * CAST({_O_SX} AS DOUBLE) / COUNT(*)) / NULLIF(COUNT(*) - 1, 0)), 6) AS stddev_qty,
       ROUND((CAST({_O_SXX} AS DOUBLE) - CAST({_O_SX} AS DOUBLE) * CAST({_O_SX} AS DOUBLE) / COUNT(*)) / NULLIF(COUNT(*) - 1, 0), 6) AS var_qty,
       ROUND((CAST({_O_SXY} AS DOUBLE) - CAST({_O_SX} AS DOUBLE) * CAST({_O_SY} AS DOUBLE) / COUNT(*)) / NULLIF(COUNT(*) - 1, 0), 6) AS covar_qty_price,
       ROUND((COUNT(*) * CAST({_O_SXY} AS DOUBLE) - CAST({_O_SX} AS DOUBLE) * CAST({_O_SY} AS DOUBLE))
             / NULLIF(SQRT((COUNT(*) * CAST({_O_SXX} AS DOUBLE) - CAST({_O_SX} AS DOUBLE) * CAST({_O_SX} AS DOUBLE))
                    * (COUNT(*) * CAST({_O_SYY} AS DOUBLE) - CAST({_O_SY} AS DOUBLE) * CAST({_O_SY} AS DOUBLE))), 0), 6) AS corr_qty_price
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def agg_moments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/covariance/correlation from exact decimal power sums
    (order-independent -> hash-exact), the engine's deterministic variant of
    the built-in single-pass moment aggregates."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    x = dec("l_quantity", "decimal(28,4)")
    y = dec("l_extendedprice", "decimal(28,4)")
    sx = F.sum(x).cast("double")
    sxx = F.sum(x * x).cast("double")
    sy = F.sum(y).cast("double")
    syy = F.sum(y * y).cast("double")
    sxy = F.sum(x * y).cast("double")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag")
        .agg(
            n.alias("n"),
            # try_divide + oracle NULLIF on every denominator: a
            # single-row group (n-1 = 0) or a constant column (zero
            # variance in corr's sqrt) must be NULL on both engines,
            # not an ANSI ArithmeticException (degen-probe finding).
            F.round(
                F.sqrt(F.try_divide(sxx - sx * sx / n, n - F.lit(1))), 6
            ).alias("stddev_qty"),
            F.round(F.try_divide(sxx - sx * sx / n, n - F.lit(1)), 6).alias(
                "var_qty"
            ),
            F.round(F.try_divide(sxy - sx * sy / n, n - F.lit(1)), 6).alias(
                "covar_qty_price"
            ),
            F.round(
                F.try_divide(
                    n * sxy - sx * sy,
                    F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                ),
                6,
            ).alias("corr_qty_price"),
        )
    )


@register(
    "agg_moments_builtin",
    oracle="""
SELECT l_returnflag,
       ROUND(stddev_samp(l_quantity), 6) AS stddev_qty,
       ROUND(var_samp(l_quantity), 6) AS var_qty,
       ROUND(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price,
       ROUND(covar_samp(l_quantity, l_extendedprice)
             / NULLIF(stddev_samp(l_quantity) * stddev_samp(l_extendedprice), 0), 6)
         AS corr_qty_price
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def agg_moments_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in one-pass stddev_samp/var_samp/corr/covar_samp (the fast
    path when last-ulp decimal reproducibility isn't required), rounded to
    1e-6 so the float accumulation order (Spark partial-merge vs the
    oracle's serial pass) can't show through — at that rounding both
    engines agree exactly (measured at sf0.001 and sf0.01; the
    exact-decimal twin is agg_moments_exact)."""
    prep(spark)
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("stddev_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("covar_qty_price"),
            # corr spelled covar/(sd*sd) under try_divide: the built-in
            # corr aggregate's final division RAISES under ANSI mode on a
            # zero-variance group where DuckDB's corr returns NULL — an
            # engine fact worth recording: corr is the one moment builtin
            # without a NULL-on-degenerate path (regr_* return NULL).
            F.round(
                F.try_divide(
                    F.covar_samp("l_quantity", "l_extendedprice"),
                    F.stddev_samp("l_quantity")
                    * F.stddev_samp("l_extendedprice"),
                ),
                6,
            ).alias("corr_qty_price"),
        )
    )


@register(
    "agg_approx",
    # Self-verifying estimate pattern (replaces the r2/r3 fixed-width
    # bucket banding, which was bucket-boundary fragile: a correct sketch
    # estimate could straddle a floor() edge whenever a testdata regen
    # landed the exact value near one). Here the query computes BOTH the
    # sketch estimate and the exact answer and emits
    #   verified = CASE WHEN |estimate - exact| <= margin THEN exact
    #              ELSE estimate END
    # so the hash matches the oracle's exact value IFF the sketch met its
    # documented accuracy contract — with no bucket edge anywhere, the
    # check is stable under any data regeneration. A failing sketch
    # surfaces its raw estimate in the diff. Margins: distinct = 4x the
    # rsd (8%, min 5 absolute) — HLL++ rsd 0.02 means ~95% of estimates
    # within 2x rsd, 4x is far past any plausible drift; median = 2% (the
    # approx_percentile rank error at accuracy 10000 over these group
    # sizes is <0.1%, and the approx answer is a real data point vs the
    # oracle's interpolated midpoint, so 2% dominates both effects).
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(DISTINCT l_partkey) AS verified_parts,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS verified_median
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "approx"),
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) + approx_percentile — the 100 TB path
    where exact distinct/percentile shuffles would be prohibitive. The
    projection emits the exact answer next to a clamped estimate
    (estimate-within-margin collapses to the exact value), so the driver
    hash-checks the sketch's accuracy contract end-to-end without any
    fragile bucket boundary; raw-estimate accuracy is additionally
    asserted in tests/test_aggregates.py. The exact twin here is the
    verification harness, not the production path — at fleet scale you
    ship only the sketch column."""
    prep(spark)
    parts_margin = F.greatest(F.ceil(F.col("exact_parts") * 0.08), F.lit(5))
    median_margin = F.col("em") * 0.02
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("am"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("em"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            F.when(
                F.abs(F.col("ap") - F.col("exact_parts")) <= parts_margin,
                F.col("exact_parts"),
            ).otherwise(F.col("ap")).alias("verified_parts"),
            F.round(F.col("em"), 4).alias("exact_median"),
            F.when(
                F.abs(F.col("am") - F.col("em")) <= median_margin,
                F.round(F.col("em"), 4),
            ).otherwise(F.round(F.col("am"), 4)).alias("verified_median"),
        )
    )


@register(
    "agg_sketch_hll",
    # Same self-verifying clamp as agg_approx (no fixed-width bucket, so
    # no boundary to straddle after a testdata regen): the sketch path
    # (per-flag DataSketches HLL partials + union rollup) is compared
    # in-query against the exact rollup, and the verified column collapses
    # to the exact value when within margin. DataSketches HLL is
    # coupon-exact far beyond these cardinalities, so the 5% margin has
    # zero measured drift; the merged ALL row checks union correctness
    # (it cannot be reconstructed from the per-flag estimates alone).
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COUNT(DISTINCT l_suppkey) AS exact_supp,
       COUNT(DISTINCT l_suppkey) AS verified_supp
FROM lineitem
GROUP BY ROLLUP (l_returnflag)
HAVING COUNT(*) > 0
""",
    tags=("agg", "approx", "sketch"),
)
def agg_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL): build
    per-group partial sketches, then UNION them into a rollup estimate —
    the two-level pattern a 100 TB pipeline actually uses (store compact
    sketch bytes per partition/day, merge on demand for any rollup,
    never re-scan raw data for a new grouping).

    Here: distinct suppliers per returnflag AND the all-flags union,
    computed by merging the per-flag sketches rather than rescanning
    lineitem; each estimate is clamped to the exact rollup value when
    within the sketch's accuracy margin (|est - exact| <= max(5% of
    exact, 2)), so the driver hash-check verifies the sketch contract
    without a fragile bucket boundary. Raw-estimate accuracy is asserted
    in tests/test_aggregates.py."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_suppkey").alias("sk")
    )
    flags = per_flag.select(
        "l_returnflag", F.hll_sketch_estimate("sk").alias("est")
    )
    merged = per_flag.agg(F.hll_union_agg("sk").alias("u")).select(
        F.lit("ALL").alias("l_returnflag"),
        F.hll_sketch_estimate("u").alias("est"),
    )
    exact = (
        li.rollup("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("exact_supp"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            "exact_supp",
        )
    )
    margin = F.greatest(F.ceil(F.col("exact_supp") * 0.05), F.lit(2))
    return (
        flags.unionByName(merged)
        .join(F.broadcast(exact), "l_returnflag")
        .select(
            "l_returnflag",
            "exact_supp",
            F.when(
                F.abs(F.col("est") - F.col("exact_supp")) <= margin,
                F.col("exact_supp"),
            ).otherwise(F.col("est")).alias("verified_supp"),
        )
    )


@register(
    "agg_filtered_conditional",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_big,
       CAST(ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN CAST(o_totalprice AS DECIMAL(28,4))
                           ELSE CAST(0 AS DECIMAL(28,4)) END), 4) AS DOUBLE) AS urgent_total
FROM orders
GROUP BY o_orderstatus
""",
    tags=("agg", "conditional"),
)
def agg_filtered_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered / conditional aggregation (CASE-gated sums and counts)."""
    prep(spark)
    o = table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(urgent, 1)).alias("n_urgent"),
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
        round4(
            F.sum(
                F.when(urgent, dec("o_totalprice", "decimal(28,4)")).otherwise(
                    F.lit(0).cast("decimal(28,4)")
                )
            )
        ).alias("urgent_total"),
    )


@register(
    "agg_salted_skew",
    oracle="""
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_cust,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
    tags=("agg", "skew"),
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant DISTINCT aggregation on a deliberately hot key
    (o_orderstatus: 'O'/'F' each carry ~49% of orders): manual two-phase
    count-distinct, the mitigation the skew probe measured as the WIN
    (BASELINE.md §3e: 1.8x over the planner's distinct at 30M rows/50%
    hot key, while salting mergeable count/sum/max aggregates measured
    parity-at-best — map-side partial aggregation already collapses a hot
    key for those, so this entry was retargeted from the salted_agg demo
    it used to carry; operators/skew.py remains for partial-state-heavy
    aggregations and documents the same finding).

    Phase 1 exchanges on the COMPOSITE (status, custkey) — the hot
    status's rows spread across every partition because custkey varies —
    and dedups with a map-side-combinable count; phase 2 re-exchanges
    the (tiny) deduped set on status alone for the final counts. No task
    ever holds a hot key's full row set, and every stage stays partial-
    aggregated. The per-group total rides along from phase 1's counts,
    so the two-phase answer is checkable against the plain single-pass
    oracle. Plan shape pinned by tests/test_plans.py."""
    prep(spark)
    o = table(spark, sf_dir, "orders")
    dedup = (
        o.select("o_orderstatus", "o_custkey")
        .groupBy("o_orderstatus", "o_custkey")
        .agg(F.count(F.lit(1)).alias("pn"))
    )
    # count("o_custkey"), not count(*): the deduped set carries a NULL-
    # custkey group (orphan orders); COUNT(DISTINCT x) never counts NULL.
    return dedup.groupBy("o_orderstatus").agg(
        F.count("o_custkey").alias("n_cust"),
        F.sum("pn").alias("n_orders"),
    )


@register(
    "agg_sketch_theta",
    # Same self-verifying clamp as agg_sketch_hll. Theta sketches add what
    # HLL cannot: SET ALGEBRA on the sketches themselves — union,
    # intersection, and A-minus-B estimated from two compact sketches
    # without touching raw data. At these cardinalities (<4096 retained
    # hashes) the theta sketch is coupon-exact (measured: zero drift at
    # sf0.01); the 5% margin exists for scale factors past the exact
    # region.
    oracle="""
WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
     b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
SELECT 'urgent' AS metric, (SELECT COUNT(*) FROM a) AS exact_n, (SELECT COUNT(*) FROM a) AS verified_n
UNION ALL
SELECT 'low', (SELECT COUNT(*) FROM b), (SELECT COUNT(*) FROM b)
UNION ALL
SELECT 'union', (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b) u),
                (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b) u)
UNION ALL
SELECT 'intersect', (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b) i),
                    (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b) i)
UNION ALL
SELECT 'diff', (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b) d),
               (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b) d)
""",
    tags=("agg", "approx", "sketch", "set-algebra"),
)
def agg_sketch_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches (DataSketches) with sketch-level set algebra: the
    urgent-priority and low-priority customer sets are sketched once
    each, then customers-in-either (union), customers-in-both
    (intersection), and urgent-but-never-low (difference) are estimated
    FROM THE SKETCHES — the audience-overlap / retention shape. At 100 TB
    you persist one small sketch per segment/day and answer any overlap
    question later without a rescan; HLL can only union. Each estimate is
    clamped to the exact set-op count when within margin (hash-stable
    self-verification, no bucket edges)."""
    prep(spark)
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderpriority") == "1-URGENT").agg(
        F.theta_sketch_agg("o_custkey").alias("a")
    )
    b = o.where(F.col("o_orderpriority") == "5-LOW").agg(
        F.theta_sketch_agg("o_custkey").alias("b")
    )
    ests = a.crossJoin(b).select(
        F.theta_sketch_estimate("a").alias("urgent"),
        F.theta_sketch_estimate("b").alias("low"),
        F.theta_sketch_estimate(F.theta_union("a", "b")).alias("union"),
        F.theta_sketch_estimate(F.theta_intersection("a", "b")).alias("intersect"),
        F.theta_sketch_estimate(F.theta_difference("a", "b")).alias("diff"),
    )
    est_long = ests.unpivot([], ["urgent", "low", "union", "intersect", "diff"],
                            "metric", "est")
    ua = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    ub = o.where(F.col("o_orderpriority") == "5-LOW").select("o_custkey").distinct()
    exact = (
        ua.agg(F.count(F.lit(1)).alias("exact_n")).select(F.lit("urgent").alias("metric"), "exact_n")
        .unionByName(ub.agg(F.count(F.lit(1)).alias("exact_n")).select(F.lit("low").alias("metric"), "exact_n"))
        .unionByName(ua.union(ub).distinct().agg(F.count(F.lit(1)).alias("exact_n")).select(F.lit("union").alias("metric"), "exact_n"))
        .unionByName(ua.intersect(ub).agg(F.count(F.lit(1)).alias("exact_n")).select(F.lit("intersect").alias("metric"), "exact_n"))
        .unionByName(ua.subtract(ub).agg(F.count(F.lit(1)).alias("exact_n")).select(F.lit("diff").alias("metric"), "exact_n"))
    )
    margin = F.greatest(F.ceil(F.col("exact_n") * 0.05), F.lit(2))
    return est_long.join(F.broadcast(exact), "metric").select(
        "metric",
        "exact_n",
        F.when(F.abs(F.col("est") - F.col("exact_n")) <= margin, F.col("exact_n"))
        .otherwise(F.col("est").cast("bigint")).alias("verified_n"),
    )


@register(
    "agg_sketch_kll",
    # KLL is a RANDOMIZED sketch: its estimates jitter run to run (~0.3%
    # observed, max 0.8% across repeated sf0.001/sf0.01 runs), so the raw
    # estimate can never be hash-checked directly. The clamp absorbs the
    # randomness: drift stays far inside the 4% margin (5x the worst
    # observation; KLL k=200 guarantees ~1.65% rank error at 99%
    # confidence), so the verified column always collapses to the exact
    # percentile and the hash is stable across runs AND testdata regens.
    oracle="""
SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
            ELSE l_returnflag END AS l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS exact_p50,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS verified_p50,
       ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS exact_p95,
       ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS verified_p95
FROM lineitem
GROUP BY ROLLUP (l_returnflag)
""",
    tags=("agg", "approx", "sketch", "percentile"),
)
def agg_sketch_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches (DataSketches KLL): per-flag sketches
    of l_extendedprice answer p50/p95 per group, and the all-flags row
    merges the per-group sketches (kll_sketch_merge) instead of
    rescanning — the distributed-percentile pattern at 100 TB: store one
    ~KB sketch per partition, merge for any rollup, never sort raw data.
    Estimates are clamped to the exact interpolated percentile when
    within the rank-error margin (see oracle comment on the randomized
    clamp)."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    per = li.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double(price).alias("sk"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("e50"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("e95"),
    )
    flags = per.select(
        "l_returnflag",
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("a50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.95)).alias("a95"),
        "e50",
        "e95",
    )
    # kll_sketch_merge_double is a BINARY scalar merge (not an agg):
    # collect the per-flag sketches into an array and fold them — the
    # same pairwise merge a tree-reduction over partition sketches does.
    merged = (
        per.agg(F.array_agg("sk").alias("arr"))
        .select(
            F.expr(
                # Total under ANSI (SCALE.md "ANSI totality"): on an
                # EMPTY slice arr is [], whose arr[0] and size-1 slice
                # length both abort; greatest clamps the length and
                # get() says NULL out of bounds, so the merged sketch is
                # NULL and the ALL row carries NULL quantiles — exactly
                # the oracle's ROLLUP row over zero rows.
                "aggregate(slice(arr, 2, greatest(size(arr) - 1, 0)), get(arr, 0), "
                "(acc, x) -> kll_sketch_merge_double(acc, x))"
            ).alias("m")
        )
        .crossJoin(
            li.agg(
                F.percentile("l_extendedprice", F.lit(0.5)).alias("e50"),
                F.percentile("l_extendedprice", F.lit(0.95)).alias("e95"),
            )
        )
        .select(
            F.lit("ALL").alias("l_returnflag"),
            F.kll_sketch_get_quantile_double("m", F.lit(0.5)).alias("a50"),
            F.kll_sketch_get_quantile_double("m", F.lit(0.95)).alias("a95"),
            "e50",
            "e95",
        )
    )

    def clamp(est, exact):
        return (
            F.when(F.abs(F.col(est) - F.col(exact)) <= F.col(exact) * 0.04,
                   F.round(F.col(exact), 4))
            .otherwise(F.round(F.col(est), 4))
        )

    return flags.unionByName(merged).select(
        "l_returnflag",
        F.round("e50", 4).alias("exact_p50"),
        clamp("a50", "e50").alias("verified_p50"),
        F.round("e95", 4).alias("exact_p95"),
        clamp("a95", "e95").alias("verified_p95"),
    )


@register(
    "agg_listagg",
    oracle="""
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    tags=("agg", "listagg", "string"),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg WITHIN GROUP (ORDER BY) — the SQL:2016 ordered string
    aggregation (Spark 4 builtin): nations per region as a deterministic
    sorted CSV. The explicit WITHIN GROUP order is what makes a string
    aggregate hash-checkable at all (unordered listagg is
    partition-order-dependent)."""
    prep(spark)
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


_CMS_D = 4    # hash rows
_CMS_W = 512  # counters per row


def _cms_oracle() -> str:
    return f"""
WITH seeds AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS i),
pairs AS (
  SELECT seeds.i,
         CAST(('0x' || substr(md5(CAST(l_suppkey AS VARCHAR) || ':' || seeds.i), 1, 8))
              AS UBIGINT) % {_CMS_W} AS bucket
  FROM lineitem CROSS JOIN seeds
),
sketch AS (SELECT i, bucket, COUNT(*) AS cnt FROM pairs GROUP BY i, bucket),
exact AS (
  SELECT l_suppkey AS suppkey, COUNT(*) AS exact_n
  FROM lineitem GROUP BY l_suppkey
  ORDER BY exact_n DESC, suppkey LIMIT 10
),
est AS (
  SELECT exact.suppkey, exact.exact_n, MIN(sketch.cnt) AS cms_est
  FROM exact CROSS JOIN seeds
  JOIN sketch ON sketch.i = seeds.i
   AND sketch.bucket = CAST(('0x' || substr(md5(CAST(exact.suppkey AS VARCHAR) || ':' || seeds.i), 1, 8))
                            AS UBIGINT) % {_CMS_W}
  GROUP BY exact.suppkey, exact.exact_n
)
SELECT suppkey, exact_n, CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_n AS BIGINT) AS overcount
FROM est
"""


@register(
    "agg_cms_heavy_hitters",
    oracle=_cms_oracle(),
    tags=("agg", "sketch", "cms", "heavy-hitters"),
    bench=True,
)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter estimation, built relationally so
    the sketch itself is a DataFrame: 4x512 counters from
    seeded-md5 bucket hashing, estimate = MIN over the key's 4
    counters, checked against the exact top-10 counts (CMS guarantees
    est >= exact; overcount is the collision error surfaced).

    Mergeability is the point at 100 TB: counters ADD, so per-partition
    (or per-day) sketches combine by summing the (i, bucket) cells —
    exactly what Spark's partial aggregation does for the groupBy here;
    stored per-day sketch tables roll up to any window by the same sum.
    Fixed 4x512 cells estimate any key's frequency within
    eps*N without holding per-key state — the frequency dual of the HLL
    partials in agg_sketch_hll. Deterministic md5 hashing makes the
    whole construction hash-exact across engines (no clamp needed,
    unlike the randomized DataSketches branches).

    Build shape: a CMS cell is the SUM of the counts of the keys
    hashing into it, so the sketch is built from the PER-KEY count
    relation (one map-side-combinable fact aggregate, shared with the
    exact top-10 check), hashing each distinct key 4 times instead of
    each fact row — at 6M rows over 10k suppliers that is 600x fewer
    md5 calls for a bit-identical sketch. The oracle keeps the literal
    per-row spelling, proving the factoring."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")

    def bucket(key: F.Column, i: int) -> F.Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat(key.cast("string"), F.lit(f":{i}"))), 1, 8),
                16, 10,
            ).cast("long")
            % _CMS_W
        )

    counts = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    pairs = counts.select(
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        bucket(F.col("suppkey"), i).alias("bucket"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("p"),
    ).select("p.i", "p.bucket", "exact_n")
    sketch = pairs.groupBy("i", "bucket").agg(F.sum("exact_n").alias("cnt"))
    exact = counts.orderBy(F.col("exact_n").desc(), "suppkey").limit(10)
    probes = exact.select(
        "suppkey",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        bucket(F.col("suppkey"), i).alias("bucket"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("p"),
    ).select("suppkey", "exact_n", "p.i", "p.bucket")
    return (
        F.broadcast(probes)
        .join(sketch, ["i", "bucket"])
        .groupBy("suppkey", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "suppkey",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
    )


@register(
    "agg_iqr_outliers",
    oracle="""
WITH fences AS (
  SELECT c_mktsegment,
         quantile_cont(o_totalprice, 0.25) AS q1,
         quantile_cont(o_totalprice, 0.75) AS q3
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
)
SELECT f.c_mktsegment,
       ROUND(f.q3 + 1.5 * (f.q3 - f.q1), 6) AS upper_fence,
       COUNT(*) FILTER (WHERE o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1)) AS n_outliers,
       CAST(ROUND(MAX(CASE WHEN o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1)
                           THEN o_totalprice END), 2) AS DOUBLE) AS max_outlier
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN fences f ON f.c_mktsegment = customer.c_mktsegment
GROUP BY f.c_mktsegment, f.q1, f.q3
""",
    tags=("agg", "percentile", "outliers", "anomaly"),
)
def agg_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (1.5x IQR) outlier detection per segment: exact
    interpolated quartiles of order totals, then a second keyed pass
    counting values above q3 + 1.5*IQR — the distribution-free anomaly
    screen a monitoring pipeline runs per cohort.

    Shape: two aggregations sharing one join lineage — the quartile agg
    produces |segments| fence rows, broadcast back onto the joined fact
    for the outlier count, so the expensive join lineage shuffles once
    per pass and the fences never materialize more than a dim's worth of
    rows. (At 100 TB the quartile pass would ride the KLL sketch
    (agg_sketch_kll) instead of exact percentile; fences are then
    mergeable too.)"""
    prep(spark)
    j = table(spark, sf_dir, "orders").join(
        table(spark, sf_dir, "customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    fences = j.groupBy("c_mktsegment").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    fence = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    out = F.col("o_totalprice") > fence
    return (
        j.select("c_mktsegment", "o_totalprice")
        .join(F.broadcast(fences), "c_mktsegment")
        .groupBy("c_mktsegment", "q1", "q3")
        .agg(
            F.count_if(out).alias("n_outliers"),
            F.round(F.max(F.when(out, F.col("o_totalprice"))), 2)
            .cast("double")
            .alias("max_outlier"),
        )
        .select(
            "c_mktsegment",
            F.round(fence, 6).alias("upper_fence"),
            "n_outliers",
            "max_outlier",
        )
    )


@register(
    "agg_market_basket",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
  FROM lineitem WHERE l_partkey < 300
),
n_baskets AS (SELECT COUNT(DISTINCT basket) AS n FROM items),
item_n AS (SELECT item, COUNT(*) AS n_item FROM items GROUP BY item),
pair_n AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_ab
  FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
  GROUP BY item_a, item_b
)
SELECT item_a, item_b, n_ab,
       ROUND(CAST(n_ab AS DOUBLE) / nb.n, 6) AS support,
       ROUND(CAST(n_ab AS DOUBLE) / ia.n_item, 6) AS confidence,
       ROUND(CAST(n_ab AS DOUBLE) * nb.n / (ia.n_item * ib.n_item), 6) AS lift
FROM pair_n
JOIN item_n ia ON ia.item = item_a
JOIN item_n ib ON ib.item = item_b
CROSS JOIN n_baskets nb
ORDER BY n_ab DESC, item_a, item_b
LIMIT 10
""",
    tags=("agg", "association", "market-basket"),
)
def agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets (the 2-itemset core of
    FP-growth): top part pairs by co-occurrence with support,
    confidence(a->b), and lift — the classic 'bought together' measure
    set, here 'tasked together' for a fleet's command co-occurrence.

    Shape: distinct (basket, item) -> pair generation by basket
    self-join (bounded item slice keeps per-basket fan-out honest; at
    100 TB the standard guard is a min-support prefilter on item_n
    before pairing), then broadcast item counts onto the tiny pair
    aggregate. All ratios round to 1e-6; ordering is total."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem").where(F.col("l_partkey") < 300)
    items = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    nb = items.agg(F.countDistinct("basket").alias("n"))
    item_n = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    b = items.select(F.col("basket"), F.col("item").alias("item_b"))
    pair_n = (
        items.join(b, ["basket"])
        .where(F.col("item") < F.col("item_b"))
        .groupBy(F.col("item").alias("item_a"), "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ia = item_n.select(F.col("item").alias("item_a"), F.col("n_item").alias("na"))
    ib = item_n.select(F.col("item").alias("item_b"), F.col("n_item").alias("nb_i"))
    return (
        pair_n.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("n"), 6).alias("support"),
            F.round(F.col("n_ab").cast("double") / F.col("na"), 6).alias("confidence"),
            F.round(
                F.col("n_ab").cast("double") * F.col("n") / (F.col("na") * F.col("nb_i")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("n_ab").desc(), "item_a", "item_b")
        .limit(10)
    )


@register(
    "agg_regression",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n,
       ROUND(regr_slope(o_totalprice, c_acctbal), 6) AS slope,
       ROUND(regr_intercept(o_totalprice, c_acctbal), 6) AS intercept,
       ROUND(regr_r2(o_totalprice, c_acctbal), 6) AS r2,
       ROUND(regr_avgx(o_totalprice, c_acctbal), 6) AS avg_x,
       ROUND(regr_avgy(o_totalprice, c_acctbal), 6) AS avg_y
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    tags=("agg", "regression", "stats"),
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2003 linear-regression aggregates (regr_slope / intercept /
    r2 / avgx / avgy): does customer balance predict order size, per
    segment — the grouped OLS-fit primitive, computed as one-pass
    mergeable moment sums by both engines' builtins.

    Scale: regression aggregates are sum/sum-of-product moments, so
    they partial-aggregate map-side and merge associatively like any
    sum — one shuffle on the group key regardless of rows. Cross-engine
    note: both engines accumulate doubles in partition order; the 1e-6
    rounding absorbs the reduction-order drift exactly as the moments
    entries do (agg_moments_exact carries the bit-exact decimal
    spelling of the same algebra)."""
    prep(spark)
    j = table(spark, sf_dir, "orders").join(
        table(spark, sf_dir, "customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    y, x = F.col("o_totalprice"), F.col("c_acctbal")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 6).alias("avg_y"),
    )


@register(
    "agg_approx_topk",
    oracle="""
WITH exact AS (
  SELECT l_suppkey AS item, COUNT(*) AS n,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, l_suppkey) AS rnk
  FROM lineitem GROUP BY l_suppkey
)
SELECT CAST(rnk AS INT) AS rnk, item, n AS verified_n
FROM exact WHERE rnk <= 5
""",
    tags=("agg", "approx", "sketch", "topk"),
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's approx_top_k sketch under the module's self-verifying
    clamp: the sketch's top-5 suppliers are re-ranked deterministically
    (count desc, item) and each count collapses to the exact value only
    when the sketch got it right — a wrong estimate surfaces as -1 and
    breaks the driver hash loudly (the agg_sketch_hll contract).

    Sized honestly: maxItemsTracked=10000 >= the supplier NDV, so the
    sketch runs in its exact regime here; at 100 TB the same call with
    NDV above the budget degrades to Misra-Gries-style approximation,
    and the clamp is what notices. The sketch buffer is mergeable
    (fixed-size per partition), the reason it exists instead of a full
    groupBy at unbounded cardinality.

    Tie discipline (regen-probe finding, round 4): when counts TIE at
    the top, "which item is rank r" is not well-defined for the sketch —
    it surfaces an arbitrary member of the tie class, and a fresh
    testdata seed flips the choice. The judged projection therefore
    takes rank and item identity from the exact side's total order
    (count desc, item) — deterministic on any draw — and uses the
    sketch for what it actually promises: the rank-r COUNT. The clamp
    compares the sketch's r-th largest count against the exact r-th
    largest; a sketch outside its contract still breaks the hash as -1."""
    prep(spark)
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    approx = (
        li.agg(F.expr("approx_top_k(l_suppkey, 5, 10000)").alias("t"))
        .select(F.explode("t").alias("e"))
        .select(F.col("e.count").alias("approx_n"))
    )
    wa = Window.partitionBy(F.col("approx_n") * 0).orderBy(F.col("approx_n").desc())
    approx = approx.withColumn("rnk", F.row_number().over(wa))
    exact = (
        li.groupBy(F.col("l_suppkey").alias("item"))
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    # Distributed top-k: orderBy+limit (TakeOrderedAndProject) picks the
    # same 5 rows as the old global row_number window without moving the
    # whole per-item count relation into one task; the residual window
    # only ranks the 5 survivors.
    we = Window.partitionBy(F.lit(0)).orderBy(F.col("exact_n").desc(), "item")
    exact5 = (
        exact.orderBy(F.col("exact_n").desc(), "item")
        .limit(5)
        .withColumn("rnk", F.row_number().over(we))
    )
    return (
        exact5.join(F.broadcast(approx), "rnk")
        .select(
            "rnk",
            "item",
            F.when(F.col("approx_n") == F.col("exact_n"), F.col("exact_n"))
            .otherwise(F.lit(-1))
            .cast("bigint")
            .alias("verified_n"),
        )
    )


@register(
    "agg_entropy_mi",
    oracle="""
WITH cells AS (
  SELECT event_type AS x, date_part('hour', ts) AS y, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
n AS (SELECT SUM(c) AS n FROM cells),
px AS (SELECT x, SUM(c) AS cx FROM cells GROUP BY x),
py AS (SELECT y, SUM(c) AS cy FROM cells GROUP BY y),
hx AS (SELECT -SUM((cx / n.n) * log2(cx / n.n)) AS h FROM px, n),
hy AS (SELECT -SUM((cy / n.n) * log2(cy / n.n)) AS h FROM py, n),
hxy AS (SELECT -SUM((c / n.n) * log2(c / n.n)) AS h FROM cells, n)
SELECT ROUND(hx.h, 6) AS entropy_type,
       ROUND(hy.h, 6) AS entropy_hour,
       ROUND(hxy.h, 6) AS entropy_joint,
       ROUND(hx.h + hy.h - hxy.h, 6) AS mutual_info,
       ROUND((hx.h + hy.h - hxy.h) / NULLIF(LEAST(hx.h, hy.h), 0), 6) AS norm_mi
FROM hx, hy, hxy
""",
    tags=("aggregate", "entropy", "information"),
)
def agg_entropy_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy and mutual information between two categorical
    columns (event type x hour-of-day) — the information-theoretic
    dependence screen a feature-selection / data-audit pass runs over a
    training corpus: MI ~ 0 says the columns are independent, normalized
    MI near 1 flags a leaked/derived column that should be dropped.

    Plan shape: ONE groupBy over the (x, y) cell grid — everything else
    (marginals, three entropies, MI) is computed from that tiny cell
    table with broadcast scalar aggregates, so the data is scanned and
    shuffled exactly once however large the fact table. Terms are summed
    over <=200 cells and rounded to 1e-6, absorbing cross-engine
    float-order drift."""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("x"), F.hour("ts").alias("y")
    ).agg(F.count(F.lit(1)).alias("c"))
    # Total count rides as a broadcast 1-row cross, not a global window:
    # the cell grid is tiny but the shape stays shuffle-free at any size.
    cells = cells.crossJoin(F.broadcast(cells.agg(F.sum("c").alias("n"))))
    p = F.col("c") / F.col("n")
    hxy = cells.agg((-F.sum(p * F.log2(p))).alias("h"))
    px = cells.groupBy("x", "n").agg(F.sum("c").alias("cx"))
    hx = px.agg(
        (-F.sum((F.col("cx") / F.col("n")) * F.log2(F.col("cx") / F.col("n")))).alias("h")
    )
    py = cells.groupBy("y", "n").agg(F.sum("c").alias("cy"))
    hy = py.agg(
        (-F.sum((F.col("cy") / F.col("n")) * F.log2(F.col("cy") / F.col("n")))).alias("h")
    )
    return (
        hx.alias("hx")
        .crossJoin(hy.alias("hy"))
        .crossJoin(hxy.alias("hxy"))
        .select(
            F.round(F.col("hx.h"), 6).alias("entropy_type"),
            F.round(F.col("hy.h"), 6).alias("entropy_hour"),
            F.round(F.col("hxy.h"), 6).alias("entropy_joint"),
            F.round(F.col("hx.h") + F.col("hy.h") - F.col("hxy.h"), 6).alias(
                "mutual_info"
            ),
            # try_divide: a degenerate draw where one categorical
            # collapses to a single value has h = 0 — NULL like the
            # oracle's NULLIF, not 0/0 under ANSI mode.
            F.round(
                F.try_divide(
                    F.col("hx.h") + F.col("hy.h") - F.col("hxy.h"),
                    F.least(F.col("hx.h"), F.col("hy.h")),
                ),
                6,
            ).alias("norm_mi"),
        )
    )


@register(
    "agg_welch_ttest",
    oracle="""
WITH g AS (
  SELECT event_type,
         COUNT(*) AS n, AVG(value) AS m, VAR_SAMP(value) AS v
  FROM events
  WHERE event_type IN ('view', 'purchase')
    AND value IS NOT NULL AND isfinite(value) AND abs(value) < 1e12
  GROUP BY event_type
),
a AS (SELECT * FROM g WHERE event_type = 'view'),
b AS (SELECT * FROM g WHERE event_type = 'purchase')
SELECT CAST(a.n AS BIGINT) AS n_view,
       CAST(b.n AS BIGINT) AS n_purchase,
       ROUND(a.m - b.m, 6) AS mean_diff,
       ROUND((a.m - b.m) / SQRT(a.v / a.n + b.v / b.n), 6) AS t_stat,
       ROUND(POWER(a.v / a.n + b.v / b.n, 2)
             / (POWER(a.v / a.n, 2) / (a.n - 1) + POWER(b.v / b.n, 2) / (b.n - 1)),
             6) AS welch_dof
FROM a, b
""",
    tags=("aggregate", "statistics", "hypothesis-test"),
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test (view vs purchase
    event values): the A/B-comparison statistic an experimentation or
    data-drift monitor computes per metric. Reports the t statistic and
    the Welch-Satterthwaite degrees of freedom; significance lookup is a
    driver-side constant-time step (the distributed work is the moment
    aggregation, which is what this query exercises).

    Plan shape: one filtered scan -> one 2-group aggregate (count, mean,
    sample variance, all map-side partial) -> a scalar cross of the two
    single-row groups. Rounded to 1e-6: the group sizes are ~1k at
    sf0.01 and the statistic is O(1) arithmetic on six aggregates, well
    inside the rounding tolerance on both engines."""
    prep(spark)
    # Finite-measure domain (extremes-pin finding, round 7): one Inf
    # value drives VAR_SAMP out of double range — DuckDB raises where
    # Spark silently says Inf/NaN, the cross-engine divergence class.
    # The sample is the OBSERVED measures (n counts what mean/var use,
    # the statistically coherent spelling), bounded by the money domain.
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs("value") < F.lit(1e12))
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    a = g.where(F.col("event_type") == "view").alias("a")
    b = g.where(F.col("event_type") == "purchase").alias("b")
    se2 = F.col("a.v") / F.col("a.n") + F.col("b.v") / F.col("b.n")
    return a.crossJoin(b).select(
        F.col("a.n").cast("bigint").alias("n_view"),
        F.col("b.n").cast("bigint").alias("n_purchase"),
        F.round(F.col("a.m") - F.col("b.m"), 6).alias("mean_diff"),
        # try_divide: zero variance in BOTH samples (constant values on
        # a degenerate draw) zeroes the standard error and the dof
        # denominator — NULL like DuckDB's NULL-division, not an ANSI
        # exception (degen-probe finding).
        F.round(
            F.try_divide(F.col("a.m") - F.col("b.m"), F.sqrt(se2)), 6
        ).alias("t_stat"),
        F.round(
            F.try_divide(
                F.pow(se2, 2),
                F.pow(F.col("a.v") / F.col("a.n"), 2) / (F.col("a.n") - 1)
                + F.pow(F.col("b.v") / F.col("b.n"), 2) / (F.col("b.n") - 1),
            ),
            6,
        ).alias("welch_dof"),
    )


@register(
    "agg_mann_whitney",
    oracle="""
WITH ev2 AS (
  SELECT value, CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1
  FROM events
  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
),
per_v AS (
  SELECT value, COUNT(*) AS c, SUM(g1) AS c1
  FROM ev2 GROUP BY value
),
ranked AS (
  SELECT value, c, c1,
         COALESCE(SUM(c) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM per_v
),
agg AS (
  SELECT SUM(c1) AS n1, SUM(c - c1) AS n2,
         SUM(c1 * (cum_before + (c + 1) / 2.0)) AS r1,
         SUM(POWER(c, 3) - c) AS tie_term
  FROM ranked
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(r1 - n1 * (n1 + 1) / 2.0, 6) AS u1,
       ROUND(n1 * n2 - (r1 - n1 * (n1 + 1) / 2.0), 6) AS u2,
       ROUND((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
             / SQRT(n1 * n2 / 12.0
                    * ((n1 + n2 + 1) - tie_term
                       / ((n1 + n2) * (n1 + n2 - 1.0)))), 6) AS z_stat
FROM agg
""",
    tags=("aggregate", "statistics", "hypothesis-test", "rank"),
)
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test with tie correction, view vs
    purchase event values: the non-parametric complement to
    agg_welch_ttest for skewed metrics where mean comparisons mislead.

    The textbook formulation global-sorts every observation; this plan
    never ranks rows. Ranks reduce over the VALUE DOMAIN: one groupBy
    collapses the two groups to (value, count, group1-count), a
    cumulative window over those distinct values yields every average
    rank in closed form (cum_before + (c+1)/2), and the rank-sum /
    tie-correction terms are one aggregate over that reduced table. At
    100 TB the expensive stage stays the first map-side-partial groupBy;
    the window runs over value-domain cardinality (range-partition it if
    the domain itself is huge). Statistic rounded to 1e-6."""
    prep(spark)
    from pyspark.sql import Window

    ev2 = (
        table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            "value",
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("g1"),
        )
    )
    per_v = ev2.groupBy("value").agg(
        F.count(F.lit(1)).alias("c"), F.sum("g1").alias("c1")
    )
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_v.withColumn(
        "cum_before", F.coalesce(F.sum("c").over(w), F.lit(0))
    )
    agg = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n2"),
        F.sum(F.col("c1") * (F.col("cum_before") + (F.col("c") + 1) / 2.0)).alias("r1"),
        F.sum(F.pow("c", 3) - F.col("c")).alias("tie_term"),
    )
    n1, n2, r1 = F.col("n1"), F.col("n2"), F.col("r1")
    u1 = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    sigma = F.sqrt(
        n1 * n2 / 12.0 * ((n + 1) - F.col("tie_term") / (n * (n - 1.0)))
    )
    return agg.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        F.round(u1, 6).alias("u1"),
        F.round(n1 * n2 - u1, 6).alias("u2"),
        # try_divide: sigma is 0 when either sample is empty (a draw
        # with a missing event type) — NULL like the oracle's NULLIF,
        # not an ANSI ArithmeticException.
        F.round(F.try_divide(u1 - n1 * n2 / 2.0, sigma), 6).alias("z_stat"),
    )


@register(
    "agg_ks_test",
    oracle="""
WITH ev2 AS (
  SELECT value, CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1
  FROM events
  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
),
per_v AS (
  SELECT value, SUM(g1) AS c1, SUM(1 - g1) AS c2 FROM ev2 GROUP BY value
),
tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM per_v),
ecdf AS (
  SELECT value,
         SUM(c1) OVER (ORDER BY value) / NULLIF((SELECT n1 FROM tot), 0) AS f1,
         SUM(c2) OVER (ORDER BY value) / NULLIF((SELECT n2 FROM tot), 0) AS f2
  FROM per_v
)
SELECT CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2,
       ROUND(MAX(ABS(f1 - f2)), 6) AS ks_d,
       ROUND(MAX(ABS(f1 - f2)) * SQRT(t.n1 * t.n2 / (t.n1 + t.n2)), 6)
         AS ks_stat_scaled
FROM ecdf, tot t
GROUP BY t.n1, t.n2
""",
    tags=("aggregate", "statistics", "hypothesis-test", "drift"),
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (view vs purchase event
    values): the distribution-drift detector a training-data monitor
    runs between yesterday's and today's feature distributions — D is
    the sup-distance between the two empirical CDFs, reported raw and
    scaled by sqrt(n1*n2/(n1+n2)) for significance lookup.

    Same no-row-sort shape as agg_mann_whitney: one groupBy collapses
    both samples onto the value domain, the two ECDFs are cumulative
    windows over the distinct values, and D is one MAX over that reduced
    table. ECDF steps are exact rational counts (no float accumulation
    beyond the final divide), rounded to 1e-6."""
    prep(spark)
    from pyspark.sql import Window

    ev2 = (
        table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            "value",
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("g1"),
        )
    )
    per_v = ev2.groupBy("value").agg(
        F.sum("g1").alias("c1"), F.sum(1 - F.col("g1")).alias("c2")
    )
    tot = per_v.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdf = (
        per_v.withColumn("r1", F.sum("c1").over(w))
        .withColumn("r2", F.sum("c2").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "n1",
            "n2",
            # try_divide: an empty sample (draw with a missing event
            # type) makes n1 or n2 zero — NULL like the oracle's NULLIF,
            # not an ANSI ArithmeticException.
            (
                F.try_divide(F.col("r1"), F.col("n1"))
                - F.try_divide(F.col("r2"), F.col("n2"))
            ).alias("diff"),
        )
    )
    return ecdf.groupBy("n1", "n2").agg(
        F.round(F.max(F.abs("diff")), 6).alias("ks_d"),
        F.round(
            F.max(F.abs("diff"))
            * F.sqrt(F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2"))),
            6,
        ).alias("ks_stat_scaled"),
    ).select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        "ks_d",
        "ks_stat_scaled",
    )


@register(
    "agg_psi_drift",
    oracle="""
WITH ev2 AS (
  SELECT CAST(LEAST(GREATEST(FLOOR(value / 50.0), 0), 9) AS INT) AS bucket,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1
  FROM events
  WHERE event_type IN ('view', 'purchase')
    AND value IS NOT NULL AND isfinite(value) AND abs(value) < 1e12
),
b AS (
  SELECT bucket, SUM(g1) AS c1, SUM(1 - g1) AS c2 FROM ev2 GROUP BY bucket
),
tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM b),
p AS (
  SELECT bucket,
         (c1 + 0.5) / (t.n1 + 0.5 * (SELECT COUNT(*) FROM b)) AS p1,
         (c2 + 0.5) / (t.n2 + 0.5 * (SELECT COUNT(*) FROM b)) AS p2
  FROM b, tot t
)
SELECT CAST(bucket AS INT) AS bucket,
       ROUND(p1, 9) AS p_view,
       ROUND(p2, 9) AS p_purchase,
       ROUND((p1 - p2) * ln(p1 / p2), 9) AS psi_term,
       ROUND(SUM((p1 - p2) * ln(p1 / p2)) OVER (), 6) AS psi_total
FROM p
""",
    tags=("aggregate", "statistics", "drift", "psi"),
)
def agg_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between the view and purchase value
    distributions over 10 fixed-width buckets (Laplace-smoothed so empty
    buckets don't blow up the log): THE production drift score for
    features and corpus statistics — PSI < 0.1 stable, > 0.25 act. Each
    bucket's contribution is reported next to the total so the drifted
    region is identifiable, not just the scalar.

    One scan -> one 10-bucket aggregate; everything after runs on 10
    rows (the over-() total is a 10-row window, not a data-size one).
    Deterministic: bucket proportions are exact rationals rounded to
    1e-9 before the log terms, total to 1e-6."""
    prep(spark)
    from pyspark.sql import Window

    # Finite-measure domain + CLAMPED bucket (extremes-pin finding,
    # round 7): floor(-Inf/50) lands at LONG-min, whose INT cast ABORTS
    # under ANSI (DuckDB's INT cast of the same value errors too), and
    # a finite-but-huge measure still out-ranges INT through /50 — so
    # the measure rides the money domain and the bucket is total on it:
    # everything below the [0, 500) grid folds into the edge buckets.
    ev2 = (
        table(spark, sf_dir, "events")
        .where(
            F.col("event_type").isin("view", "purchase")
            & F.col("value").isNotNull()
            & ~F.isnan("value")
            & (F.abs("value") < F.lit(1e12))
        )
        .select(
            F.least(F.greatest(F.floor(F.col("value") / 50.0), F.lit(0)), F.lit(9))
            .cast("int")
            .alias("bucket"),
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("g1"),
        )
    )
    b = ev2.groupBy("bucket").agg(
        F.sum("g1").alias("c1"), F.sum(1 - F.col("g1")).alias("c2")
    )
    tot = b.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.count(F.lit(1)).alias("nb"),
    )
    p = b.crossJoin(F.broadcast(tot)).select(
        "bucket",
        ((F.col("c1") + 0.5) / (F.col("n1") + 0.5 * F.col("nb"))).alias("p1"),
        ((F.col("c2") + 0.5) / (F.col("n2") + 0.5 * F.col("nb"))).alias("p2"),
    )
    term = (F.col("p1") - F.col("p2")) * F.log(F.col("p1") / F.col("p2"))
    w = Window.partitionBy(F.lit(1))
    return p.select(
        "bucket",
        F.round("p1", 9).alias("p_view"),
        F.round("p2", 9).alias("p_purchase"),
        F.round(term, 9).alias("psi_term"),
        F.round(F.sum(term).over(w), 6).alias("psi_total"),
    )


@register(
    "diag_key_skew",
    oracle="""
WITH per_k AS (
  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c, user_id) AS rnk FROM per_k
),
n AS (SELECT COUNT(*) AS nk, SUM(c) AS total FROM per_k),
topk AS (
  SELECT SUM(c) AS top10 FROM (
    SELECT c FROM per_k ORDER BY c DESC, user_id LIMIT 10
  )
)
SELECT CAST(n.nk AS BIGINT) AS n_keys,
       CAST(n.total AS BIGINT) AS n_rows,
       ROUND((SELECT MAX(c) FROM per_k) / CAST(n.total AS DOUBLE), 6)
         AS max_key_share,
       ROUND(topk.top10 / CAST(n.total AS DOUBLE), 6) AS top10_share,
       ROUND(2.0 * (SELECT SUM(rnk * c) FROM ranked) / (n.nk * n.total)
             - (n.nk + 1.0) / n.nk, 6) AS gini
FROM n, topk
""",
    tags=("aggregate", "diagnostics", "skew"),
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution diagnostic for a prospective join/groupBy key:
    max single-key share, top-10-key share, and the Gini coefficient of
    per-key counts — the numbers that decide between a plain shuffle,
    AQE skew-join, and hot-key salting BEFORE the expensive job runs
    (tools/skew_probe.py measures the mitigations; this query measures
    the need).

    Shape: one map-side-partial count per key; the Gini rank-sum runs
    over the DISTINCT-KEY table (same value-domain discipline as
    agg_mann_whitney — rows are never ranked), top-10 is a
    TakeOrderedAndProject. Deterministic: rank and top-k orders carry
    key tie-breaks, shares round to 1e-6."""
    prep(spark)
    per_k = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Scalable global rank (operators/rank.py): the Gini rank-sum needs a
    # rank for EVERY key, so this was a single-partition window over the
    # whole distinct-key table — the range-partitioned two-pass spelling
    # produces the identical rank ((c, user_id) is a total order) with
    # each task ranking only its slice.
    from ..operators.rank import global_row_number

    ranked = global_row_number(per_k, ["c", "user_id"], out="rnk")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("nk"),
        F.sum("c").alias("total"),
        F.max("c").alias("mx"),
        F.sum(F.col("rnk") * F.col("c")).alias("rank_sum"),
    )
    top10 = (
        per_k.orderBy(F.desc("c"), "user_id")
        .limit(10)
        .agg(F.sum("c").alias("top10"))
    )
    return agg.crossJoin(F.broadcast(top10)).select(
        F.col("nk").cast("bigint").alias("n_keys"),
        F.col("total").cast("bigint").alias("n_rows"),
        F.round(F.col("mx") / F.col("total").cast("double"), 6).alias(
            "max_key_share"
        ),
        F.round(F.col("top10") / F.col("total").cast("double"), 6).alias(
            "top10_share"
        ),
        F.round(
            2.0 * F.col("rank_sum") / (F.col("nk") * F.col("total"))
            - (F.col("nk") + 1.0) / F.col("nk"),
            6,
        ).alias("gini"),
    )


@register(
    "diag_join_cardinality",
    oracle="""
WITH o AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY o_custkey),
c AS (SELECT c_custkey AS k, COUNT(*) AS c FROM customer GROUP BY c_custkey),
j AS (SELECT o.k, o.c * c.c AS pairs FROM o JOIN c ON o.k = c.k)
SELECT CAST((SELECT COUNT(*) FROM o) AS BIGINT) AS n_left_keys,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_right_keys,
       CAST((SELECT COUNT(*) FROM j) AS BIGINT) AS n_shared_keys,
       CAST((SELECT SUM(pairs) FROM j) AS BIGINT) AS est_join_rows,
       CAST((SELECT MAX(pairs) FROM j) AS BIGINT) AS max_key_pairs
""",
    tags=("aggregate", "diagnostics", "join", "cardinality"),
)
def diag_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-output cardinality from key histograms WITHOUT running
    the join: |A join B| = sum over shared keys of cnt_A * cnt_B — the
    dry-run a pipeline author (or an orchestrator gate) uses to catch a
    fan-out blowup before paying for it, and the per-key max that flags
    which key would explode.

    Shape: two per-key counts (each map-side partial) joined on the key
    — the histograms are |keys|-sized, typically orders of magnitude
    smaller than the tables; the estimate aggregate is a scalar. This
    is the same statistic CBO's ANALYZE keeps approximately
    (join_cbo_reorder); here it is exact and on-demand."""
    prep(spark)
    o = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("oc"))
    )
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cc"))
    )
    j = o.join(c, "k").select("k", (F.col("oc") * F.col("cc")).alias("pairs"))
    lo = o.agg(F.count(F.lit(1)).alias("n_left_keys"))
    rc = c.agg(F.count(F.lit(1)).alias("n_right_keys"))
    js = j.agg(
        F.count(F.lit(1)).alias("n_shared_keys"),
        F.sum("pairs").alias("est_join_rows"),
        F.max("pairs").alias("max_key_pairs"),
    )
    return (
        lo.crossJoin(F.broadcast(rc))
        .crossJoin(F.broadcast(js))
        .select(
            F.col("n_left_keys").cast("bigint").alias("n_left_keys"),
            F.col("n_right_keys").cast("bigint").alias("n_right_keys"),
            F.col("n_shared_keys").cast("bigint").alias("n_shared_keys"),
            F.col("est_join_rows").cast("bigint").alias("est_join_rows"),
            F.col("max_key_pairs").cast("bigint").alias("max_key_pairs"),
        )
    )


@register(
    "agg_weighted_median",
    oracle="""
WITH per_v AS (
  SELECT l_returnflag, l_extendedprice AS v, SUM(l_quantity) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
  GROUP BY l_returnflag, l_extendedprice
),
cum AS (
  SELECT l_returnflag, v, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM per_v
)
SELECT l_returnflag,
       CAST(MIN(CASE WHEN cw >= tw / 2 THEN v END) AS DOUBLE)
         AS weighted_median,
       CAST(MIN(CASE WHEN cw >= tw * 0.9 THEN v END) AS DOUBLE)
         AS weighted_p90,
       CAST(ROUND(MAX(tw), 4) AS DOUBLE) AS total_weight
FROM cum GROUP BY l_returnflag
""",
    tags=("aggregate", "percentile", "weighted"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted percentiles (median and p90 of price, weighted by
    quantity): the estimator a cost/latency analysis needs when each
    observation represents a different volume — the builtin percentile
    family is unweighted. Defined as the smallest value whose cumulative
    weight reaches the target fraction (type-1, exact).

    Same value-domain reduction as the rank statistics: one groupBy
    collapses rows to (value, total-weight), cumulative windows run per
    group over distinct values, and the answer is a conditional MIN —
    rows are never sorted. Weights sum as quantities (exact 2-decimal
    fixed-point, so the cumulative sums are exact)."""
    prep(spark)
    from pyspark.sql import Window

    per_v = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_extendedprice").isNotNull() & F.col("l_quantity").isNotNull())
        .groupBy("l_returnflag", F.col("l_extendedprice").alias("v"))
        .agg(F.sum(scaled_long("l_quantity")).alias("w"))
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("l_returnflag")
    cum = per_v.withColumn("cw", F.sum("w").over(wc)).withColumn(
        "tw", F.sum("w").over(wt)
    )
    return cum.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("cw") >= F.col("tw") / 2, F.col("v")))
        .cast("double")
        .alias("weighted_median"),
        F.min(F.when(F.col("cw") >= F.col("tw") * 0.9, F.col("v")))
        .cast("double")
        .alias("weighted_p90"),
        long_sum(F.max("tw"), 2).alias("total_weight"),
    )


@register(
    "agg_corr_matrix",
    oracle="""
WITH s AS (
  SELECT l_quantity AS q, l_extendedprice AS p, l_discount AS d, l_tax AS t
  FROM lineitem
)
SELECT 'q' AS x, 'p' AS y, ROUND(covar_samp(q, p) / NULLIF(stddev_samp(q) * stddev_samp(p), 0), 6) AS r FROM s
UNION ALL SELECT 'q', 'd', ROUND(covar_samp(q, d) / NULLIF(stddev_samp(q) * stddev_samp(d), 0), 6) FROM s
UNION ALL SELECT 'q', 't', ROUND(covar_samp(q, t) / NULLIF(stddev_samp(q) * stddev_samp(t), 0), 6) FROM s
UNION ALL SELECT 'p', 'd', ROUND(covar_samp(p, d) / NULLIF(stddev_samp(p) * stddev_samp(d), 0), 6) FROM s
UNION ALL SELECT 'p', 't', ROUND(covar_samp(p, t) / NULLIF(stddev_samp(p) * stddev_samp(t), 0), 6) FROM s
UNION ALL SELECT 'd', 't', ROUND(covar_samp(d, t) / NULLIF(stddev_samp(d) * stddev_samp(t), 0), 6) FROM s
""",
    tags=("aggregate", "statistics", "profiling", "correlation"),
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation matrix over the numeric fact columns
    (quantity, price, discount, tax) in long form — the multicollinearity
    screen a feature audit runs before model training; near-|1| pairs
    mean a redundant (droppable) feature.

    Shape: ONE aggregate computes all six correlations in a single scan
    (Catalyst shares the scan and the partial-moment buffers); the long
    form comes from a 6-row unpivot of that single aggregate row — never
    six scans. 1e-6 rounding absorbs moment-accumulation order drift."""
    prep(spark)
    s = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("q"),
        F.col("l_extendedprice").alias("p"),
        F.col("l_discount").alias("d"),
        F.col("l_tax").alias("t"),
    )
    pairs = [("q", "p"), ("q", "d"), ("q", "t"), ("p", "d"), ("p", "t"), ("d", "t")]
    # covar/(sd*sd) under try_divide instead of the corr builtin: a
    # constant column (any zero-variance feature on a degenerate draw)
    # makes corr's final division RAISE under ANSI mode where the
    # covar/stddev aggregates stay NULL-safe (degen-probe finding).
    agg = s.agg(
        *[
            F.round(
                F.try_divide(
                    F.covar_samp(a, b), F.stddev_samp(a) * F.stddev_samp(b)
                ),
                6,
            ).alias(f"r_{a}_{b}")
            for a, b in pairs
        ]
    )
    out = None
    for a, b in pairs:
        row = agg.select(
            F.lit(a).alias("x"), F.lit(b).alias("y"), F.col(f"r_{a}_{b}").alias("r")
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "agg_hist_equiwidth",
    oracle="""
WITH b AS (
  SELECT MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi FROM customer
),
binned AS (
  SELECT LEAST(CAST(FLOOR((c_acctbal - b.lo) / ((b.hi - b.lo) / 10.0)) AS INT), 9)
           AS bin,
         b.lo, b.hi
  FROM customer, b
)
SELECT CAST(bin AS INT) AS bin,
       ROUND(lo + bin * (hi - lo) / 10.0, 6) AS bin_lo,
       ROUND(lo + (bin + 1) * (hi - lo) / 10.0, 6) AS bin_hi,
       COUNT(*) AS n,
       ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS share
FROM binned GROUP BY bin, lo, hi
""",
    tags=("aggregate", "histogram", "profiling"),
)
def agg_hist_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (10 bins over the observed range) with bin
    bounds and shares — the distribution sketch a profile/drift report
    renders; the equi-DEPTH dual is the percentile family, and PSI
    (agg_psi_drift) compares two of these.

    Shape: one min/max aggregate broadcast back, then one binned count
    — two passes total, the second map-side partial. The bin arithmetic
    runs on the same doubles in both engines (floor of an affine map)
    and bounds round to 1e-6."""
    prep(spark)
    from pyspark.sql import Window

    cust = table(spark, sf_dir, "customer")
    b = cust.agg(F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / 10.0
    binned = cust.crossJoin(F.broadcast(b)).select(
        F.least(
            # try_divide: a constant column (hi == lo) must bin like the
            # oracle's NULL-division path (both engines' LEAST skips the
            # NULL -> bin 9), not raise under ANSI (degen-probe finding).
            F.floor(
                F.try_divide(F.col("c_acctbal") - F.col("lo"), width)
            ).cast("int"),
            F.lit(9),
        ).alias("bin"),
        "lo",
        "hi",
    )
    g = binned.groupBy("bin", "lo", "hi").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(F.lit(1))
    return g.select(
        F.col("bin").cast("int").alias("bin"),
        F.round(F.col("lo") + F.col("bin") * (F.col("hi") - F.col("lo")) / 10.0, 6).alias("bin_lo"),
        F.round(F.col("lo") + (F.col("bin") + 1) * (F.col("hi") - F.col("lo")) / 10.0, 6).alias("bin_hi"),
        "n",
        F.round(F.col("n") / F.sum("n").over(w).cast("double"), 6).alias("share"),
    )


@register(
    "agg_hhi_concentration",
    oracle="""
WITH cr AS (
  SELECT c.c_mktsegment, o.o_custkey,
         CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(28,4))), 4) AS DOUBLE)
           AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
),
seg AS (
  SELECT c_mktsegment, SUM(rev) AS total,
         COUNT(*) AS n_cust,
         SUM(rev * rev) AS ss
  FROM cr GROUP BY c_mktsegment
),
top5 AS (
  SELECT c_mktsegment, SUM(rev) AS t5 FROM (
    SELECT c_mktsegment, rev,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY rev DESC, o_custkey) AS rn
    FROM cr
  ) WHERE rn <= 5 GROUP BY c_mktsegment
)
SELECT s.c_mktsegment,
       CAST(s.n_cust AS BIGINT) AS n_cust,
       ROUND(s.ss / (s.total * s.total), 9) AS hhi,
       ROUND(t.t5 / s.total, 6) AS cr5
FROM seg s JOIN top5 t USING (c_mktsegment)
""",
    tags=("aggregate", "concentration", "hhi"),
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per segment: Herfindahl–Hirschman index
    (sum of squared revenue shares — 1/n_cust when uniform, 1.0 at
    monopoly) and CR5 (top-5-customer share) — the dependency-risk
    numbers an account review reads, and for a corpus: how concentrated
    the data is in few sources.

    Shape: one (segment, customer) exact-decimal rollup; HHI reduces it
    per segment (sum-of-squares over a single shuffle — the share
    division happens once on segment totals, so no per-row second
    pass), CR5 is a per-segment top-k window over the same rollup.
    HHI = ss/total^2 algebraically equals sum((rev/total)^2) with one
    deterministic division."""
    prep(spark)
    from pyspark.sql import Window

    cr = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy("c_mktsegment", "o_custkey")
        .agg(long_sum(F.sum(scaled_long("o_totalprice")), 2).alias("rev"))
    )
    seg = cr.groupBy("c_mktsegment").agg(
        F.sum("rev").alias("total"),
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(F.col("rev") * F.col("rev")).alias("ss"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("rev"), "o_custkey")
    top5 = (
        cr.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .groupBy("c_mktsegment")
        .agg(F.sum("rev").alias("t5"))
    )
    return seg.join(top5, "c_mktsegment").select(
        "c_mktsegment",
        F.col("n_cust").cast("bigint").alias("n_cust"),
        F.round(F.col("ss") / (F.col("total") * F.col("total")), 9).alias("hhi"),
        F.round(F.col("t5") / F.col("total"), 6).alias("cr5"),
    )


@register(
    "agg_runs_test",
    oracle="""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
med AS (SELECT ROUND(quantile_cont(total, 0.5), 6) AS m FROM daily),
signed AS (
  SELECT d, CASE WHEN total > med.m THEN 1 ELSE 0 END AS above
  FROM daily, med WHERE total <> med.m
),
runs AS (
  SELECT above,
         CASE WHEN LAG(above) OVER (ORDER BY d) IS NULL
                OR LAG(above) OVER (ORDER BY d) <> above THEN 1 ELSE 0 END
           AS new_run
  FROM signed
),
agg AS (
  SELECT SUM(new_run) AS r,
         SUM(above) AS n1,
         SUM(1 - above) AS n2
  FROM runs
)
SELECT CAST(r AS BIGINT) AS n_runs,
       CAST(n1 AS BIGINT) AS n_above,
       CAST(n2 AS BIGINT) AS n_below,
       ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
             / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 6) AS z_stat
FROM agg
""",
    tags=("aggregate", "statistics", "hypothesis-test", "randomness"),
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily series (above/below the
    median): too FEW runs means trending/autocorrelated data, too MANY
    means oscillation — the randomness screen that catches a broken
    shuffle or a periodic ingestion artifact that mean-level monitors
    miss (complements events_autocorr, which measures the lag structure
    this test detects the presence of).

    Shape: daily exact-decimal rollup -> sign sequence -> lag-compare
    run boundaries -> one 3-number aggregate and a closed-form z.
    Median ties are dropped (the standard convention); both engines
    compute the same rounded median from the same exact totals."""
    prep(spark)
    from pyspark.sql import Window

    daily = (
        table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d"))
        .agg(long_sum(F.sum(scaled_long("value")), 2).alias("total"))
    )
    med = daily.agg(
        F.round(F.expr("percentile(total, 0.5)"), 6).alias("m")
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("total") != F.col("m"))
        .select("d", F.when(F.col("total") > F.col("m"), 1).otherwise(0).alias("above"))
    )
    w = Window.partitionBy(F.lit(1)).orderBy("d")
    runs = signed.withColumn(
        "new_run",
        F.when(
            F.lag("above").over(w).isNull()
            | (F.lag("above").over(w) != F.col("above")),
            1,
        ).otherwise(0),
    )
    agg = runs.agg(
        F.sum("new_run").alias("r"),
        F.sum("above").alias("n1"),
        F.sum(1 - F.col("above")).alias("n2"),
    )
    r, n1, n2 = F.col("r"), F.col("n1"), F.col("n2")
    n = n1 + n2
    mu = 2.0 * n1 * n2 / n + 1
    sigma = F.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / (n * n * (n - 1.0)))
    return agg.select(
        r.cast("bigint").alias("n_runs"),
        n1.cast("bigint").alias("n_above"),
        n2.cast("bigint").alias("n_below"),
        # try_divide: constant values put every row on one side of the
        # median (n1*n2 = 0 -> sigma 0) — NULL on both engines.
        F.round(F.try_divide(r - mu, sigma), 6).alias("z_stat"),
    )


@register(
    "incremental_rollup_merge",
    # Deliberately NOT a mirror of the split-merge: the oracle recomputes
    # the rollup FROM SCRATCH over all rows, so the hash equality proves
    # merged(base, delta) == recompute(all) — the incremental-maintenance
    # contract itself, not just engine parity.
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_value,
       MAX(ts) AS latest_ts
FROM events GROUP BY event_type
""",
    tags=("aggregate", "incremental", "materialized-view", "merge"),
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the standing rollup
    (events before the cutover day) merges with the new partition's
    delta rollup by RE-AGGREGATING PARTIALS — count/sum/max are
    algebraic, so merged(base, delta) == recompute(all), which is
    exactly what the oracle asserts by recomputing from scratch. This
    is the pattern behind every incremental pipeline here (foreachBatch
    upsert, HLL partial stores, CDC compaction), stated as its own
    verifiable query: at 100 TB you aggregate the new partition only
    and fold it into yesterday's rollup; the full-recompute equality IS
    the correctness contract.

    Sums ride exact scaled-long cents so partial/merged/full all hit
    the identical double."""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    cut = F.lit("2024-01-25").cast("timestamp")

    def rollup(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(scaled_long("value")).alias("cents"),
            F.max("ts").alias("hi_ts"),
        )

    # The split must be TOTAL: ts < cut and ts >= cut BOTH reject a NULL
    # ts, so a nullable partition column silently drops rows from the
    # incremental path while the full recompute counts them (null-flood
    # sweep, round 7: 381 vs 402). NULLs route to the delta side — the
    # same all-rows-covered discipline a real partition router needs.
    base = rollup(ev.where(F.col("ts") < cut))
    delta = rollup(ev.where((F.col("ts") >= cut) | F.col("ts").isNull()))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("cents").alias("cents"),
            F.max("hi_ts").alias("hi_ts"),
        )
    )
    return merged.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        (F.col("cents").cast("double") / 100.0).alias("total_value"),
        F.col("hi_ts").alias("latest_ts"),
    )


@register(
    "feature_quantile_match",
    oracle="""
WITH pv AS (
  SELECT value AS v, COUNT(*) AS c FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL GROUP BY value
),
p_ecdf AS (
  SELECT v, SUM(c) OVER (ORDER BY v) / CAST((SELECT SUM(c) FROM pv) AS DOUBLE)
           AS q
  FROM pv
),
vv AS (
  SELECT value AS v, COUNT(*) AS c FROM events
  WHERE event_type = 'view' AND value IS NOT NULL GROUP BY value
),
v_ecdf AS (
  SELECT v, SUM(c) OVER (ORDER BY v) / CAST((SELECT SUM(c) FROM vv) AS DOUBLE)
           AS q
  FROM vv
)
SELECT p.v AS purchase_value,
       ROUND(p.q, 9) AS quantile,
       MIN(t.v) AS mapped_view_value
FROM p_ecdf p JOIN v_ecdf t ON t.q >= p.q - 1e-12
WHERE p.v <= 50.0
GROUP BY p.v, p.q
""",
    tags=("aggregate", "feature-engineering", "quantile-matching"),
)
def feature_quantile_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile matching (histogram matching): each purchase value maps
    to the view value at the SAME quantile — the monotone transform that
    calibrates one score/metric distribution onto a reference
    (score normalization across models, sensor harmonization, style
    transfer for numeric features). mapped(v) = inf{t : F_ref(t) >=
    F_src(v)}, the classic definition, computed exactly.

    Both ECDFs come from the value-domain reduction (no row ranking);
    the quantile lookup is a min-over-threshold join between the two
    reduced tables — candidate pairs bounded by |domain_a| x matching
    tail, and at scale the join becomes an as-of merge on sorted
    fraction tables. The 1e-12 slack absorbs the one-ulp ECDF division
    difference so the boundary row maps identically in both engines;
    fractions themselves round to 1e-9 in the output."""
    prep(spark)
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())

    def ecdf(df):
        per_v = df.groupBy(F.col("value").alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        tot = per_v.agg(F.sum("c").alias("t"))
        w = (
            Window.partitionBy(F.lit(1))
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return (
            per_v.withColumn("cum", F.sum("c").over(w))
            .crossJoin(F.broadcast(tot))
            .select("v", (F.col("cum") / F.col("t").cast("double")).alias("q"))
        )

    p = (
        ecdf(ev.where(F.col("event_type") == "purchase"))
        .where(F.col("v") <= 50.0)
        .select("v", "q", (F.col("q") - 1e-12).alias("q_lookup"), F.lit(1).alias("k"))
    )
    t = ecdf(ev.where(F.col("event_type") == "view")).select(
        F.col("v").alias("tv"), F.col("q").alias("tq"), F.lit(1).alias("k")
    )
    # Lookup = FORWARD as-of (smallest tq >= q), not a threshold join:
    # the naive tq >= q join is O(|A| x |B|) over the two value domains
    # and timed out at 25x; the union-merge as-of is one sort-window pass
    # (ECDFs are monotone, so the first row at-or-after q carries the
    # minimal mapped value by construction).
    from ..operators.asof import asof_join

    matched = asof_join(
        p, t, on=["k"], left_time="q_lookup", right_time="tq",
        value_cols=["tv"], direction="forward",
    )
    # tv IS NOT NULL: the as-of keeps all left rows (NULL tv when the
    # reference side is empty — a draw with no 'view' events), but the
    # oracle's threshold join is inner; filter so the degenerate draw
    # agrees (zero rows on both engines).
    return matched.where(F.col("tv").isNotNull()).select(
        F.col("v").alias("purchase_value"),
        F.round("q", 9).alias("quantile"),
        F.col("tv").alias("mapped_view_value"),
    )


@register(
    "agg_mad_outliers",
    oracle="""
WITH med AS (
  SELECT c_mktsegment, ROUND(MEDIAN(c_acctbal), 4) AS med
  FROM customer GROUP BY 1
),
dev AS (
  SELECT c.c_mktsegment, c.c_acctbal, m.med,
         ROUND(ABS(c.c_acctbal - m.med), 4) AS adev
  FROM customer c JOIN med m USING (c_mktsegment)
),
mad AS (
  SELECT c_mktsegment, med, ROUND(MEDIAN(adev), 4) AS mad
  FROM dev GROUP BY 1, 2
)
SELECT d.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       ANY_VALUE(m.med) AS med,
       ANY_VALUE(m.mad) AS mad,
       CAST(COUNT(*) FILTER (WHERE d.adev > 5 * m.mad) AS BIGINT)
         AS n_outliers,
       ROUND(MAX(d.adev) / NULLIF(1.4826 * ANY_VALUE(m.mad), 0), 6)
         AS max_robust_z
FROM dev d JOIN mad m USING (c_mktsegment)
GROUP BY d.c_mktsegment
""",
    tags=("agg", "robust-stats", "median", "outliers"),
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen by median absolute deviation: per segment,
    MAD = median(|x - median(x)|), outliers = points beyond 5 MADs, and
    the max robust z-score (|dev| / 1.4826*MAD — the Gaussian-consistent
    scaling). The robust dual of agg_iqr_outliers' fence test and
    events_anomaly_zscore's mean/stddev screen: one wild balance moves a
    mean-based threshold, but breaks neither median.

    Determinism: both engines interpolate even-count medians the same
    way (linear midpoint), but reach the midpoint by differently-ordered
    float ops — so each median is rounded to 1e-4 BEFORE it feeds the
    next stage (2-decimal inputs make midpoints 3-decimal: the round is
    drift-free), the same staging discipline as events_rolling_median.
    The 5*mad threshold compare runs on identical doubles in both
    engines, so boundary cases agree too.

    Scale: exact median needs the value multiset — here via two grouped
    medians (three passes over the dim). At fact scale swap
    median() for percentile_approx(0.5) (mergeable KLL buffers, one
    pass each) and keep the same staging; the exact variant stays the
    audit path (agg_percentile_exact's split)."""
    prep(spark)
    cust = table(spark, sf_dir, "customer")
    med = cust.groupBy("c_mktsegment").agg(
        F.round(F.median("c_acctbal"), 4).alias("med")
    )
    dev = cust.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment",
        "med",
        F.round(F.abs(F.col("c_acctbal") - F.col("med")), 4).alias("adev"),
    )
    mad = dev.groupBy("c_mktsegment", "med").agg(
        F.round(F.median("adev"), 4).alias("mad")
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.count_if(F.col("adev") > 5 * F.col("mad"))
            .cast("bigint")
            .alias("n_outliers"),
            # try_divide: a zero MAD (half a segment at its median —
            # possible on a changed driver draw) must yield NULL like
            # the oracle's NULLIF, not an ANSI ArithmeticException.
            F.round(
                F.try_divide(F.max("adev"), 1.4826 * F.first("mad")), 6
            ).alias("max_robust_z"),
        )
    )


@register(
    "agg_theilsen_trend",
    oracle="""
WITH daily AS (
  SELECT date_diff('day', DATE '2000-01-01', CAST(ts AS DATE)) AS dn,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
slopes AS (
  SELECT (b.v - a.v) / (b.dn - a.dn) AS m
  FROM daily a JOIN daily b ON a.dn < b.dn
),
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rn, COUNT(*) OVER () AS np
  FROM slopes
),
ts AS (SELECT m AS theilsen_slope FROM ranked WHERE rn = (np + 1) // 2),
ols AS (
  SELECT COUNT(*) AS n_days,
         ROUND(regr_slope(v, dn), 6) AS ols_slope
  FROM daily
)
SELECT CAST(o.n_days AS BIGINT) AS n_days,
       CAST(o.n_days * (o.n_days - 1) / 2 AS BIGINT) AS n_pairs,
       t.theilsen_slope, o.ols_slope
FROM ols o CROSS JOIN ts t
""",
    tags=("agg", "robust-stats", "regression", "trend"),
)
def agg_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimate of daily purchase revenue: the
    median of all pairwise slopes (v_j - v_i)/(d_j - d_i), reported next
    to the OLS slope — up to ~29% contaminated days cannot move the
    Theil-Sen line, where a single spiked day drags OLS (the regression
    dual of agg_mad_outliers vs the mean).

    Determinism without interpolation: the median is TYPE-1 (the
    rank-floor((n+1)/2) element of the sorted slope multiset), so the
    reported value is an actual computed slope — one IEEE divide of
    exact-decimal daily totals, bit-identical in both engines — not an
    interpolated midpoint that each engine reaches by different float
    ops. The day index is epoch-anchored, not data-anchored, so slopes
    are invariant to which day the draw starts on.

    Scale: the pair join is O(days^2) on the POST-AGGREGATION series —
    30 days = 435 pairs; even 10 years is ~6.7M pairs, dim-sized. The
    fact scan (the actual data volume) reduces to one row per day
    first; at fleet scale partition the pair join by series id."""
    prep(spark)
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2000-01-01").cast("date")).alias(
            "dn"
        )
    ).agg(long_sum(F.sum(scaled_long("value")), 2).alias("v"))
    a = daily.select(F.col("dn").alias("da"), F.col("v").alias("va"))
    b = daily.select(F.col("dn").alias("db"), F.col("v").alias("vb"))
    slopes = (
        a.join(b, F.col("da") < F.col("db"))
        .select(((F.col("vb") - F.col("va")) / (F.col("db") - F.col("da"))).alias("m"))
    )
    wr = Window.partitionBy(F.col("m") * 0).orderBy("m")
    ranked = slopes.select(
        "m",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(F.col("m") * 0)).alias("np"),
    )
    # Integer floor-div, mirroring the oracle's `//`: a float (np+1)/2
    # is x.5 for even pair counts and would match NO rank at all.
    ts = ranked.where(F.col("rn") == F.expr("(np + 1) DIV 2")).select(
        F.col("m").alias("theilsen_slope")
    )
    ols = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.regr_slope("v", "dn"), 6).alias("ols_slope"),
    )
    return ols.crossJoin(F.broadcast(ts)).select(
        F.col("n_days").cast("bigint").alias("n_days"),
        (F.col("n_days") * (F.col("n_days") - 1) / 2).cast("bigint").alias("n_pairs"),
        "theilsen_slope",
        "ols_slope",
    )


@register(
    "agg_bootstrap_ci",
    oracle="""
WITH reps AS (SELECT unnest(generate_series(0, 99)) AS rep),
w AS (
  SELECT c.c_mktsegment AS seg, r.rep,
         CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) AS cents,
         (CAST(('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR) || '_'
                                    || CAST(r.rep AS VARCHAR)), 1, 8))
               AS UBIGINT) + 0.5) / 4294967296.0 AS u
  FROM customer c, reps r
),
pw AS (
  SELECT seg, rep, cents,
         CASE WHEN u < 0.367879441171 THEN 0
              WHEN u < 0.735758882343 THEN 1
              WHEN u < 0.919698602929 THEN 2
              WHEN u < 0.980988177458 THEN 3
              WHEN u < 0.996340153091 THEN 4
              ELSE 5 END AS wt
  FROM w
),
means AS (
  SELECT seg, rep,
         CAST(SUM(wt * cents) AS DOUBLE) / NULLIF(SUM(wt), 0) / 100.0
           AS rep_mean
  FROM pw GROUP BY seg, rep
),
ranked AS (
  -- rep_mean IS NOT NULL: an EMPTY resample (all Poisson weights 0 —
  -- probability e^-n per replica, nil for any real segment but ~37%
  -- when a slice holds one row) has no mean and is discarded, the
  -- textbook bootstrap treatment; without the filter the two engines
  -- rank NULLs at opposite ends (Spark ASC = NULLS FIRST, DuckDB =
  -- NULLS LAST) and the percentile picks diverge.
  SELECT seg, rep_mean,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY rep_mean, rep) AS rk
  FROM means WHERE rep_mean IS NOT NULL
),
base AS (
  SELECT c_mktsegment AS seg, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 100.0 AS mean_bal
  FROM customer GROUP BY 1
)
SELECT b.seg AS c_mktsegment, CAST(b.n AS BIGINT) AS n,
       ROUND(b.mean_bal, 6) AS mean_bal,
       ROUND(lo.rep_mean, 6) AS ci_lo,
       ROUND(hi.rep_mean, 6) AS ci_hi
FROM base b
JOIN ranked lo ON lo.seg = b.seg AND lo.rk = 3
JOIN ranked hi ON hi.seg = b.seg AND hi.rk = 98
""",
    tags=("aggregate", "bootstrap", "uncertainty", "statistics"),
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for the per-segment
    mean balance — the distributed bootstrap: instead of resampling n
    rows WITH replacement (which needs global coordination), each row
    draws an independent Poisson(1) weight per replica, which converges
    to the multinomial bootstrap and is embarrassingly parallel — the
    standard trick for uncertainty quantification over data too big to
    resample (and the error bars every metrics pipeline should ship
    with its point estimates).

    Determinism: the Poisson draw is an inverse-CDF lookup on a uniform
    derived from md5(custkey, replica) — the A-ES discipline
    (text_weighted_sample), no RNG; replica means ride exact integer
    cents over integer weight sums, so both engines rank IDENTICAL
    doubles; the CI bounds are type-1 percentiles (rank 3 and 98 of
    100) with a replica tie-break.

    Scale: the replica dimension is a constant 100x map-side fan-out
    (no shuffle growth: the aggregate collapses to seg x 100 partials),
    and at 100 TB the same plan bootstraps any additive statistic in
    one pass."""
    prep(spark)
    from pyspark.sql import Window

    cust = table(spark, sf_dir, "customer")
    reps = spark.range(0, 100).select(F.col("id").cast("int").alias("rep"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "_", F.col("c_custkey").cast("string"), F.col("rep").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    u = (h + 0.5) / float(1 << 32)
    wt = (
        F.when(u < 0.367879441171, 0)
        .when(u < 0.735758882343, 1)
        .when(u < 0.919698602929, 2)
        .when(u < 0.980988177458, 3)
        .when(u < 0.996340153091, 4)
        .otherwise(5)
    )
    pw = cust.crossJoin(F.broadcast(reps)).select(
        F.col("c_mktsegment").alias("seg"),
        "rep",
        scaled_long("c_acctbal").alias("cents"),
        wt.alias("wt"),
    )
    means = pw.groupBy("seg", "rep").agg(
        (
            F.try_divide(
                F.sum(F.col("wt") * F.col("cents")).cast("double"),
                F.sum("wt"),
            )
            / 100.0
        ).alias("rep_mean")
    )
    # Discard empty resamples before ranking (see the oracle's comment:
    # NULL ordering diverges between the engines, and a no-weight
    # replica carries no mean); a segment without a full 100-replica
    # support drops out of the CI join — you cannot form this CI from
    # fewer resamples, and on any real segment P(empty) = e^-n = never.
    rk_w = Window.partitionBy("seg").orderBy("rep_mean", "rep")
    ranked = means.where(F.col("rep_mean").isNotNull()).withColumn(
        "rk", F.row_number().over(rk_w)
    )
    base = cust.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum(scaled_long("c_acctbal")).cast("double")
            / F.count(F.lit(1))
            / 100.0
        ).alias("mean_bal"),
    )
    lo = ranked.where(F.col("rk") == 3).select("seg", F.col("rep_mean").alias("lo"))
    hi = ranked.where(F.col("rk") == 98).select("seg", F.col("rep_mean").alias("hi"))
    return (
        base.join(F.broadcast(lo), "seg")
        .join(F.broadcast(hi), "seg")
        .select(
            F.col("seg").alias("c_mktsegment"),
            "n",
            F.round("mean_bal", 6).alias("mean_bal"),
            F.round("lo", 6).alias("ci_lo"),
            F.round("hi", 6).alias("ci_hi"),
        )
    )


# Multi-feature OLS: the closed-form pieces are shared strings so both
# engines execute the TEXTUALLY IDENTICAL arithmetic over the same exact
# integer sums — same IEEE op order, same doubles, hash-exact.
_OLS_DET = (
    "(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2))"
)
_OLS_NUM0 = (
    "(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y))"
)
_OLS_NUM1 = (
    "(n*(s1y*s22 - s2y*s12) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2))"
)
_OLS_NUM2 = (
    "(n*(s11*s2y - s12*s1y) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2))"
)
_OLS_COEF = (
    f"{_OLS_NUM0} / NULLIF({_OLS_DET}, 0.0) AS b0c",
    f"{_OLS_NUM1} / NULLIF({_OLS_DET}, 0.0) AS b1",
    f"{_OLS_NUM2} / NULLIF({_OLS_DET}, 0.0) AS b2",
)
_OLS_FIT = (
    "syy - b0c*sy - b1*s1y - b2*s2y AS sse",
    "syy - sy*sy/n AS sst",
)
_OLS_OUT = (
    "CAST(n AS BIGINT) AS n",
    "ROUND(b0c / 100.0, 6) AS b0",
    "ROUND(b1, 6) AS b1",
    "ROUND(b2, 6) AS b2",
    "ROUND(1.0 - sse / NULLIF(sst, 0.0), 6) AS r2",
)


@register(
    "agg_ols_multi",
    oracle=f"""
WITH p AS (
  SELECT CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS x1,
         CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x2,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y
  FROM lineitem
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x1 AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(x2 AS HUGEINT)) AS DOUBLE) AS s2,
         CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
         CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
         CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
         CAST(SUM(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
         CAST(SUM(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
  FROM p
),
c AS (SELECT *, {', '.join(_OLS_COEF)} FROM s),
e AS (SELECT *, {', '.join(_OLS_FIT)} FROM c)
SELECT {', '.join(_OLS_OUT)} FROM e
""",
    tags=("aggregate", "regression", "statistics", "linear-algebra"),
)
def agg_ols_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-feature OLS by normal equations: extendedprice regressed on
    quantity AND discount with an intercept, solved in closed form via
    Cramer's rule on the 3x3 Gram matrix — the distributed linear-
    regression primitive beyond the builtin regr_* (agg_regression),
    which only does simple (one-x) regression. One pass accumulates the
    ten Gram/moment sums; the solve is O(1) driver-free arithmetic on
    the single aggregated row.

    Determinism: features ride exact integer cents and every Gram sum
    is an exact DECIMAL(38,0)/HUGEINT integer; both engines then run the
    TEXTUALLY IDENTICAL Cramer formulas (shared strings above) on the
    same doubles — same IEEE sequence, 1e-6 rounding at the edge.
    Degenerate draws (constant feature => det 0, or constant target =>
    sst 0) yield NULL coefficients/r2 via NULLIF on both engines.

    Scale: this is THE pattern for fitting linear models at 100 TB —
    X'X/X'y sums are map-side-combinable partials (one shuffle to one
    row), and k features need k(k+3)/2 sums; the closed-form solve
    stays O(k^3) on one row. Coefficients are in dollar units (b0
    rescaled from cents)."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    x1 = scaled_long("l_quantity")
    x2 = scaled_long("l_discount")
    y = scaled_long("l_extendedprice")
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = (
        li.select(x1.alias("x1"), x2.alias("x2"), y.alias("y"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(d38(F.col("x1"))).cast("double").alias("s1"),
            F.sum(d38(F.col("x2"))).cast("double").alias("s2"),
            F.sum(d38(F.col("y"))).cast("double").alias("sy"),
            # widen BEFORE the product: cents-scaled longs at the 1e12
            # money-domain edge multiply to ~1e22, past INT64 — an ANSI
            # long*long ABORTS the job (extremes-pin finding, round 7);
            # the oracle's HUGEINT casts moved inside SUM() the same way.
            F.sum(d38(F.col("x1")) * d38(F.col("x1"))).cast("double").alias("s11"),
            F.sum(d38(F.col("x1")) * d38(F.col("x2"))).cast("double").alias("s12"),
            F.sum(d38(F.col("x2")) * d38(F.col("x2"))).cast("double").alias("s22"),
            F.sum(d38(F.col("x1")) * d38(F.col("y"))).cast("double").alias("s1y"),
            F.sum(d38(F.col("x2")) * d38(F.col("y"))).cast("double").alias("s2y"),
            F.sum(d38(F.col("y")) * d38(F.col("y"))).cast("double").alias("syy"),
        )
    )
    c = s.selectExpr("*", *_OLS_COEF)
    e = c.selectExpr("*", *_OLS_FIT)
    return e.selectExpr(*_OLS_OUT)


@register(
    "agg_gini_concentration",
    oracle="""
WITH v AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         o_orderkey
  FROM orders WHERE o_totalprice IS NOT NULL
),
r AS (
  SELECT grp, cents,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents, o_orderkey)
           AS i
  FROM v
),
s AS (
  SELECT grp, COUNT(*) AS n,
         SUM(CAST(cents AS HUGEINT)) AS sx,
         SUM(CAST(i AS HUGEINT) * cents) AS six
  FROM r GROUP BY grp
)
SELECT grp AS o_orderpriority, CAST(n AS BIGINT) AS n,
       ROUND(CAST(2 * six - (n + 1) * sx AS DOUBLE)
             / CAST(n * sx AS DOUBLE), 6) AS gini
FROM s
""",
    tags=("aggregate", "statistics", "inequality", "gini"),
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order-value concentration per priority class
    (the rank-sum identity G = (2*sum(i*x_i) - (n+1)*sum(x)) /
    (n*sum(x)) over ascending-sorted values): the inequality measure a
    revenue or token-budget analysis pairs with HHI (agg_hhi measures
    share concentration across named buckets; Gini measures dispersion
    across the whole distribution). Values ride exact integer cents and
    the rank weights stay exact DECIMAL/HUGEINT sums — one double
    division at the edge, 1e-6 rounding.

    Tie handling is pinned (rank by value then orderkey), so both
    engines weight identical ranks. Scale: one window pass per group
    (the per-group sort IS the cost — same shape as exact percentiles)
    plus a partial-agg shuffle; sub-sorting within the group
    distributes via range partitioning on the window key."""
    prep(spark)
    from pyspark.sql import Window

    v = table(spark, sf_dir, "orders").where(
        F.col("o_totalprice").isNotNull()
    ).select(
        F.col("o_orderpriority").alias("grp"),
        scaled_long("o_totalprice").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("grp").orderBy("cents", "o_orderkey")
    r = v.select("grp", "cents", F.row_number().over(w).alias("i"))
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = r.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38(F.col("cents"))).alias("sx"),
        F.sum(d38(F.col("i").cast("long") * F.col("cents"))).alias("six"),
    )
    return s.select(
        F.col("grp").alias("o_orderpriority"),
        F.col("n").cast("bigint").alias("n"),
        F.round(
            (2 * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast("double")
            / (F.col("n") * F.col("sx")).cast("double"),
            6,
        ).alias("gini"),
    )


@register(
    "agg_anova_f",
    oracle="""
WITH v AS (
  SELECT c_mktsegment AS seg,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
),
g AS (
  SELECT seg, COUNT(*) AS n_g,
         SUM(cents) AS s_g,
         SUM(CAST(cents AS HUGEINT) * cents) AS ss_g
  FROM v GROUP BY seg
),
t AS (
  SELECT COUNT(*) AS k,
         SUM(n_g) AS n,
         CAST(SUM(s_g) AS DOUBLE) AS s,
         CAST(SUM(CAST(ROUND(CAST(ss_g AS DOUBLE)
                   - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g, 6)
                   AS DECIMAL(38,6))) AS DOUBLE)
           AS ssw,
         CAST(SUM(CAST(ROUND(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g, 6)
                   AS DECIMAL(38,6))) AS DOUBLE)
           AS sb_raw
  FROM g
)
SELECT CAST(k AS INT) AS k_groups,
       CAST(n AS BIGINT) AS n_rows,
       ROUND((sb_raw - s * s / n) / 1e4, 4) AS ss_between,
       ROUND(ssw / 1e4, 4) AS ss_within,
       ROUND(((sb_raw - s * s / n) / (k - 1)) / (ssw / (n - k)), 6)
         AS f_stat
FROM t
WHERE k >= 2 AND n > k AND ssw > 0
""",
    tags=("aggregate", "statistics", "anova", "hypothesis-test"),
)
def agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic: does mean account balance differ across
    market segments? Complements the two-sample tests (Welch t,
    Mann-Whitney, KS) with the k-group omnibus test.

    Sufficient statistics only: each group reduces to (n, sum, sum-of-
    squares) on EXACT integer cents, the square pre-widened to
    DECIMAL(38,0)/HUGEINT (a money-domain-edge balance squares past
    INT64), then the F decomposition runs on the k-row result.
    Per-group double terms are rounded to 1e-6 BEFORE the k-way sum and
    the sum itself runs in DECIMAL(38,6) — exact in any order — because
    at extreme magnitudes a double k-way sum's order noise can flip the
    final rounding at a tie (extremes-sweep finding); same
    round-before-sum discipline as text_unigram_xent, hardened. SS
    columns are reported in dollar^2 units (/1e4).

    Scale: one map-side-combinable groupBy over the fact; everything
    after is k rows. The degenerate guards (k>=2, n>k, ssw>0) drop the
    single-segment or zero-variance draw on both engines.
    """
    prep(spark)
    cents = scaled_long("c_acctbal")
    g = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("seg"), cents.alias("cents"))
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_g"),
            F.sum("cents").alias("s_g"),
            # widen BEFORE squaring: cents at the money-domain edge
            # square past INT64 (extremes-sweep class; oracle HUGEINT)
            F.sum(
                F.col("cents").cast("decimal(38,0)") * F.col("cents")
            ).alias("ss_g"),
        )
    )
    sd = F.col("s_g").cast("double")
    # The per-group rounded terms are bit-identical across engines
    # (same IEEE ops on same inputs); summing them as DOUBLES is not —
    # at extreme magnitudes (ULP ~4 at 2e16) the k-way sum ORDER flips
    # the final 1e-4 rounding at a tie (extremes full-sweep finding).
    # DECIMAL(38,6) sums of the rounded terms are exact in any order.
    # Bound: the (38,6) cast aborts under ANSI once a per-group term
    # reaches 1e32 — with cents^2 ~1e28 at the money-domain edge that
    # is ~1e4 edge-balance rows in ONE group (SCALE.md "ANSI totality",
    # anova entry). Kept as a loud failure rather than try_cast: a
    # NULLed term would silently drop a group's variance from ssw.
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").cast("double").alias("s"),
        F.sum(
            F.round(F.col("ss_g").cast("double") - sd * sd / F.col("n_g"), 6)
            .cast("decimal(38,6)")
        ).cast("double").alias("ssw"),
        F.sum(
            F.round(sd * sd / F.col("n_g"), 6).cast("decimal(38,6)")
        ).cast("double").alias("sb_raw"),
    )
    k, n, s = F.col("k"), F.col("n"), F.col("s")
    ssb = F.col("sb_raw") - s * s / n
    return (
        t.where((k >= 2) & (n > k) & (F.col("ssw") > 0))
        .select(
            k.cast("int").alias("k_groups"),
            n.cast("bigint").alias("n_rows"),
            F.round(ssb / 1e4, 4).alias("ss_between"),
            F.round(F.col("ssw") / 1e4, 4).alias("ss_within"),
            F.round((ssb / (k - 1)) / (F.col("ssw") / (n - k)), 6).alias(
                "f_stat"
            ),
        )
    )


@register(
    "agg_equidepth_histogram",
    oracle="""
WITH v AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents, o_orderkey
  FROM orders WHERE o_totalprice IS NOT NULL
),
b AS (
  SELECT cents, NTILE(10) OVER (ORDER BY cents, o_orderkey) AS bucket
  FROM v
)
SELECT CAST(bucket AS INT) AS bucket,
       COUNT(*) AS n,
       CAST(MIN(cents) AS DOUBLE) / 100.0 AS lo,
       CAST(MAX(cents) AS DOUBLE) / 100.0 AS hi,
       CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / COUNT(*) / 100.0
         AS mean_in_bucket
FROM b
GROUP BY bucket
ORDER BY bucket
""",
    tags=("aggregate", "histogram", "statistics", "optimizer-stats"),
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of order values: 10 buckets
    with (as near as possible) equal row counts, reporting each
    bucket's bounds and mean — the optimizer-statistics shape (ANALYZE
    collects exactly these) and the robust complement of the existing
    equal-WIDTH histogram row, which a skewed money column renders
    useless (one bucket holds everything).

    Exactness: bucket assignment is NTILE over exact integer cents with
    an id tie-break — a pure rank computation both engines share; the
    bounds are picked integers and the mean divides exact sums once.

    Scale: NTILE over a bare ORDER BY would drag the whole table into
    ONE task (WindowExec single-partition path); instead the rank comes
    from operators/rank.py's two-pass range-partitioned row number and
    the bucket from the SQL NTILE remainder rule on that rank — same
    values, parallel sort, with the denominator carried by the rank's
    own offsets aggregate (total=...) instead of a count cross-join
    branch that re-scans the table. For 100 TB optimizer stats, swap
    for the KLL sketch row (agg_sketch_merge) — approximate bounds, no
    sort at all; this op is the exact dual.
    """
    from ..operators.rank import global_row_number, ntile_from_rank

    prep(spark)
    v = table(spark, sf_dir, "orders").where(
        F.col("o_totalprice").isNotNull()
    ).select(
        scaled_long("o_totalprice").alias("cents"), "o_orderkey"
    )
    ranked = global_row_number(v, ["cents", "o_orderkey"], total="n_total")
    b = ranked.select(
        "cents",
        ntile_from_rank(F.col("rn"), F.col("n_total"), 10).alias("bucket"),
    )
    n = F.count(F.lit(1))
    return (
        b.groupBy("bucket")
        .agg(
            n.alias("n"),
            (F.min("cents").cast("double") / 100.0).alias("lo"),
            (F.max("cents").cast("double") / 100.0).alias("hi"),
            (
                F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
                / n
                / 100.0
            ).alias("mean_in_bucket"),
        )
        .select(F.col("bucket").cast("int").alias("bucket"), "n", "lo", "hi",
                "mean_in_bucket")
        .orderBy("bucket")
    )


@register(
    "agg_higher_moments",
    oracle="""
WITH v AS (
  SELECT c_mktsegment AS seg,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS c
  FROM customer
),
s AS (
  SELECT seg,
         COUNT(*) AS n,
         CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS s2,
         CAST(SUM(CAST(c AS HUGEINT) * c * c) AS DOUBLE) AS s3,
         CAST(SUM(CAST(c AS HUGEINT) * c * c * c) AS DOUBLE) AS s4
  FROM v GROUP BY seg
),
m AS (
  SELECT seg, n,
         s1 / n AS m1,
         (s2 - s1 * s1 / n) / n AS m2,
         (s3 - 3 * (s1 / n) * s2 + 2 * n * (s1 / n) * (s1 / n) * (s1 / n))
           / n AS m3,
         (s4 - 4 * (s1 / n) * s3 + 6 * (s1 / n) * (s1 / n) * s2
          - 3 * n * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) / n AS m4
  FROM s
)
SELECT seg AS c_mktsegment,
       CAST(n AS BIGINT) AS n,
       ROUND(m1 / 100.0, 6) AS mean,
       ROUND(m3 / (m2 * SQRT(m2)), 6) AS skewness,
       ROUND(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
FROM m
WHERE m2 > 0
ORDER BY c_mktsegment
""",
    tags=("aggregate", "statistics", "moments", "skewness", "kurtosis"),
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per segment from raw
    power sums — the 3rd/4th-moment completion of the stddev/var/corr
    family (is the balance distribution lopsided? heavy-tailed?).

    One pass builds EXACT integer power sums (Sx..Sx^4; cents^4 ~ 1e24
    needs 128-bit — DECIMAL(38,0) on Spark, HUGEINT on DuckDB), then
    the central-moment expansion runs on k rows with the TEXTUALLY
    IDENTICAL expression order in both engines, so every intermediate
    double matches bit-for-bit. Spark's builtin skewness/kurtosis use
    streaming float updates whose order varies per partitioning — the
    sufficient-statistics spelling is both the deterministic AND the
    mergeable (map-side combinable) one.

    Scale: one grouped aggregate over the fact; everything after is
    k-row arithmetic. The same shape powers any moment-based screen
    (Jarque-Bera, tail flags) without touching the fact again.
    """
    prep(spark)
    c = scaled_long("c_acctbal")
    cd = F.col("c").cast("decimal(38,0)")
    s = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("seg"), c.alias("c"))
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cd).cast("double").alias("s1"),
            F.sum(cd * F.col("c")).cast("double").alias("s2"),
            F.sum(cd * F.col("c") * F.col("c")).cast("double").alias("s3"),
            F.sum(cd * F.col("c") * F.col("c") * F.col("c"))
            .cast("double")
            .alias("s4"),
        )
    )
    n, s1, s2, s3, s4 = (F.col(x) for x in ("n", "s1", "s2", "s3", "s4"))
    m1 = s1 / n
    m2 = (s2 - s1 * s1 / n) / n
    m3 = (s3 - 3 * (s1 / n) * s2 + 2 * n * (s1 / n) * (s1 / n) * (s1 / n)) / n
    m4 = (
        s4
        - 4 * (s1 / n) * s3
        + 6 * (s1 / n) * (s1 / n) * s2
        - 3 * n * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)
    ) / n
    m = s.select(
        F.col("seg"),
        n,
        m1.alias("m1"),
        m2.alias("m2"),
        m3.alias("m3"),
        m4.alias("m4"),
    )
    return (
        m.where(F.col("m2") > 0)
        .select(
            F.col("seg").alias("c_mktsegment"),
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("m1") / 100.0, 6).alias("mean"),
            F.round(
                F.col("m3") / (F.col("m2") * F.sqrt("m2")), 6
            ).alias("skewness"),
            F.round(
                F.col("m4") / (F.col("m2") * F.col("m2")) - 3.0, 6
            ).alias("excess_kurtosis"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_numeric_mi",
    oracle="""
WITH v AS (
  SELECT CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS q,
         CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS disc
  FROM lineitem
),
bounds AS (
  SELECT MIN(q) AS qlo, MAX(q) AS qhi, MIN(disc) AS dlo, MAX(disc) AS dhi,
         COUNT(*) AS n
  FROM v
),
binned AS (
  SELECT LEAST((q - qlo) * 10 // NULLIF(qhi - qlo + 1, 0), 9) AS qb,
         LEAST((disc - dlo) * 10 // NULLIF(dhi - dlo + 1, 0), 9) AS db,
         n
  FROM v CROSS JOIN bounds
),
joint AS (SELECT qb, db, MAX(n) AS n, COUNT(*) AS c FROM binned GROUP BY qb, db),
mq AS (SELECT qb, SUM(c) AS cq FROM joint GROUP BY qb),
md AS (SELECT db, SUM(c) AS cd FROM joint GROUP BY db),
terms AS (
  SELECT j.c, j.n,
         ROUND((CAST(j.c AS DOUBLE) / j.n)
               * ln((CAST(j.c AS DOUBLE) * j.n)
                    / (CAST(mq.cq AS DOUBLE) * md.cd)), 9) AS t
  FROM joint j JOIN mq ON mq.qb = j.qb JOIN md ON md.db = j.db
)
SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
       COUNT(*) AS n_cells,
       ROUND(SUM(t), 6) AS mi_nats
FROM terms
""",
    tags=("aggregate", "statistics", "mutual-information", "binning"),
)
def agg_numeric_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two NUMERIC columns (quantity,
    discount) via 10x10 equi-width binning — the numeric companion of
    agg_entropy_mi's categorical MI, and the screen that catches
    nonlinear dependence corr/covar miss entirely.

    Bin ids are pure integer arithmetic from exact integer bounds
    ((x-lo)*10 DIV (hi-lo+1), clamped — integer floor division on BOTH
    engines: DuckDB ROUNDS double->int casts where Spark truncates, so a
    float-divide-then-cast spelling shifts boundary rows), so the
    contingency table is
    identical on both engines; each cell's p*ln(p/(px*py)) term is
    rounded to 1e-9 before the <=100-term sum (round-before-sum), and
    the empty-range NULLIF guards the constant-column draw.

    Scale: one bounds pass + one 100-cell contingency aggregate over
    the fact (both map-side combinable); everything after is cell math.
    """
    prep(spark)
    v = table(spark, sf_dir, "lineitem").select(
        scaled_long("l_quantity").alias("q"),
        scaled_long("l_discount").alias("disc"),
    )
    bounds = v.agg(
        F.min("q").alias("qlo"),
        F.max("q").alias("qhi"),
        F.min("disc").alias("dlo"),
        F.max("disc").alias("dhi"),
        F.count(F.lit(1)).alias("n"),
    )
    qb = F.least(
        F.expr("(q - qlo) * 10 DIV nullif(qhi - qlo + 1, 0)"), F.lit(9)
    )
    db = F.least(
        F.expr("(disc - dlo) * 10 DIV nullif(dhi - dlo + 1, 0)"), F.lit(9)
    )
    binned = v.crossJoin(F.broadcast(bounds)).select(
        qb.alias("qb"), db.alias("db"), "n"
    )
    joint = binned.groupBy("qb", "db").agg(
        F.max("n").alias("n"), F.count(F.lit(1)).alias("c")
    )
    mq = joint.groupBy("qb").agg(F.sum("c").alias("cq"))
    md = joint.groupBy("db").agg(F.sum("c").alias("cd"))
    terms = (
        joint.join(F.broadcast(mq), "qb")
        .join(F.broadcast(md), "db")
        .select(
            "n",
            F.round(
                (F.col("c").cast("double") / F.col("n"))
                * F.log(
                    (F.col("c").cast("double") * F.col("n"))
                    / (F.col("cq").cast("double") * F.col("cd"))
                ),
                9,
            ).alias("t"),
        )
    )
    return terms.agg(
        F.max("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum("t"), 6).alias("mi_nats"),
    )


@register(
    "agg_wilson_interval",
    oracle="""
WITH conv AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
),
s AS (SELECT COUNT(*) AS n, SUM(y) AS k FROM conv),
w AS (
  SELECT n, k,
         CAST(k AS DOUBLE) / n AS p,
         1.959963985 AS z
  FROM s
)
SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       ROUND(p, 6) AS p_hat,
       ROUND((p + z * z / (2 * n)
              - z * SQRT((p * (1 - p) + z * z / (4 * n)) / n))
             / (1 + z * z / n), 6) AS wilson_lo,
       ROUND((p + z * z / (2 * n)
              + z * SQRT((p * (1 - p) + z * z / (4 * n)) / n))
             / (1 + z * z / n), 6) AS wilson_hi
FROM w
WHERE n > 0
""",
    tags=("aggregate", "statistics", "confidence-interval", "wilson"),
)
def agg_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for the user conversion
    rate — the proportion CI that behaves at p near 0/1 and small n
    where the naive Wald interval collapses; the per-metric error bar
    every experiment readout and quality dashboard needs (the analytic
    complement of agg_bootstrap_ci's resampled intervals).

    One exact (n, k) reduction; the Wilson closed form assembles from
    those two integers with identical expression text on both engines
    (z = 1.959963985 inlined as the same literal).

    Scale: one grouped MAX to per-user flags, one scalar rollup — the
    fact is read once; grouped variants (CI per segment/day) keep the
    same shape with the formula applied per group row.
    """
    prep(spark)
    conv = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y")
        )
    )
    s = conv.agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("k"))
    p = F.col("k").cast("double") / F.col("n")
    z = F.lit(1.959963985)
    n = F.col("n")
    half = z * F.sqrt((p * (1 - p) + z * z / (4 * n)) / n)
    center = p + z * z / (2 * n)
    denom = 1 + z * z / n
    return s.where(n > 0).select(
        n.cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("k"),
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


@register(
    "agg_spearman_corr",
    oracle="""
WITH v AS (
  SELECT CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y
  FROM lineitem
),
rx AS (
  SELECT x, RANK() OVER (ORDER BY x) + (COUNT(*) OVER (PARTITION BY x) - 1)
              / 2.0 AS r
  FROM v
),
-- rank each column independently (tie = average rank), then Pearson
xr AS (SELECT x AS xv, MAX(r) AS rx FROM rx GROUP BY x),
ry AS (
  SELECT y, RANK() OVER (ORDER BY y) + (COUNT(*) OVER (PARTITION BY y) - 1)
              / 2.0 AS r
  FROM v
),
yr AS (SELECT y AS yv, MAX(r) AS ry FROM ry GROUP BY y),
j AS (
  SELECT xr.rx, yr.ry FROM v
  JOIN xr ON xr.xv = v.x
  JOIN yr ON yr.yv = v.y
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(rx) AS sx, SUM(ry) AS sy,
         SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
         SUM(rx * ry) AS sxy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND((n * sxy - sx * sy)
             / NULLIF(SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 0.0),
             6) AS spearman_rho
FROM s
""",
    tags=("aggregate", "statistics", "correlation", "rank", "spearman"),
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and extended price:
    Pearson over tie-averaged ranks — the monotone-dependence measure
    that survives outliers and nonlinearity where the raw Pearson row
    (agg_moments_exact) does not, completing the correlation family
    (Pearson / rolling / cross / numeric-MI / Spearman).

    Ranks come from PER-DISTINCT-VALUE sufficient statistics, not a
    row-level window: rank(v) = count of smaller values + 1 and the tie
    adjustment (cnt-1)/2 — computed on the distinct-value tables via
    the same cumulative trick as ml_eval_auc, then joined back
    broadcast. Average ranks are half-integers (exact in doubles);
    every sum is order-independent; one guarded divide at the edge.

    Scale: two distinct-value reductions + two broadcast joins back
    onto the fact + one sufficient-statistics rollup — no global
    row-level sort at any size (distinct money values ~1e6; the
    per-value tables stay broadcastable far past 100 TB of rows).
    Exactness bound: rank-product sums are quarter-integers, exact in
    a double while n*max_rank^2 < 2^51 (~1e6 rows); past that quantize
    ranks to a 2x-scaled long and sum through DECIMAL(38,0) — same
    value, documented fallback (the agg_higher_moments pattern).
    """
    from ..operators.rank import global_cumsum

    prep(spark)
    v = table(spark, sf_dir, "lineitem").select(
        scaled_long("l_quantity").alias("x"),
        scaled_long("l_extendedprice").alias("y"),
    )

    def rank_map(col: str):
        per = v.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        cum = global_cumsum(per, [col], "c")
        # average rank for all rows sharing the value
        return cum.select(
            F.col(col).alias(f"{col}v"),
            (
                (F.col("cum") - F.col("c") + 1)
                + (F.col("c") - 1) / F.lit(2.0)
            ).alias(f"r{col}"),
        )

    xr = rank_map("x")
    yr = rank_map("y")
    j = v.join(F.broadcast(xr), F.col("x") == F.col("xv")).join(
        F.broadcast(yr), F.col("y") == F.col("yv")
    )
    s = j.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
    )
    return s.select(
        n.cast("bigint").alias("n"),
        F.round(
            (n * sxy - sx * sy)
            / F.nullif(
                F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                F.lit(0.0),
            ),
            6,
        ).alias("spearman_rho"),
    )
