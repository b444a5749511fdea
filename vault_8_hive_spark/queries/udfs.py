"""UDF surface (SURVEY.md §2B): row-at-a-time scalar Python UDF, vectorized
pandas UDF, and grouped-map applyInPandas — each Column-composable.

The scalar UDF is registered for completeness and benchmarked as the slow
path (see the pandas UDF doing the same work vectorized); real pipelines
here always prefer built-ins > pandas UDF > scalar UDF (SCALE.md).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from ..catalog import table
from ..functions.codecs import crc16
from ..session import prep
from . import register

# Fixed fixture strings so the expected CRCs can be embedded in the oracle.
_CRC_INPUTS = [f"hive-record-{i:04d}" for i in range(64)]
_CRC_EXPECTED = [(s, crc16(s.encode())) for s in _CRC_INPUTS]


@register(
    "udf_scalar_crc16",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(f"('{s}', {c})" for s, c in _CRC_EXPECTED)
    + ") AS t(payload, crc)",
    tags=("udf", "scalar"),
)
def udf_scalar_crc16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (functions/codecs.crc16) over a fixture
    column; oracle = the same CRCs precomputed at registration time."""
    prep(spark)
    crc_udf = F.udf(lambda s: crc16(s.encode()), IntegerType())
    df = spark.createDataFrame([(s,) for s in _CRC_INPUTS], "payload string")
    return df.select("payload", crc_udf("payload").alias("crc"))


@register(
    "udf_pandas_vectorized",
    oracle="""
SELECT l_orderkey, l_linenumber,
       (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge
FROM lineitem
WHERE l_orderkey <= 500
""",
    tags=("udf", "pandas"),
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF computing the charge formula on whole
    batches. No rounding on either side: the same association of IEEE
    double ops is bit-identical in numpy and the oracle, while a final
    round-to-4 would diverge (numpy rounds half-even, SQL half-away)."""
    prep(spark)

    @F.pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return (price * (1 - disc)) * (1 + tax)

    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@register(
    "udf_grouped_map_topk",
    oracle="""
SELECT c_mktsegment, c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) t WHERE rn <= 2
""",
    tags=("udf", "grouped-map"),
)
def udf_grouped_map_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the UDAF/UDTF analog): per-segment top-2
    by balance with a deterministic tie-break, computed in pandas per
    group. One shuffle on the group key; each group must fit in one pandas
    frame (fine for bounded groups — the window variant
    win_topk_per_group is the unbounded-safe twin)."""
    prep(spark)

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).head(2)
        return out[["c_mktsegment", "c_custkey", "c_acctbal"]]

    return (
        table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal"))
        .groupBy("c_mktsegment")
        .applyInPandas(top2, schema="c_mktsegment string, c_custkey bigint, c_acctbal double")
    )


@register(
    "udf_table_function",
    oracle="""
WITH w AS (
  SELECT doc_id,
         CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
         unnest(string_split(text, ' ')) AS word
  FROM documents WHERE doc_id < 60
)
SELECT doc_id, pos, word, CAST(length(word) AS INT) AS n_chars FROM w
UNION ALL
SELECT doc_id, -1 AS pos, NULL AS word, CAST(SUM(length(word)) AS INT) AS n_chars
FROM w GROUP BY doc_id
""",
    tags=("udf", "udtf", "table-function"),
)
def udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function, Spark 3.5+/4 surface):
    a word tokenizer invoked with a TABLE(...) argument PARTITION BY
    doc_id — eval() yields one (pos, word, n_chars) row per token and
    terminate() flushes a per-document summary row (pos = -1, total
    chars), exercising the per-partition lifecycle the scalar UDF
    surface can't express. Arrow-batched like any pandas-boundary op;
    the oracle rebuilds both the token rows (string_split WITH
    ordinality) and the summary rows relationally.
    """
    from pyspark.sql.functions import udtf

    prep(spark)

    @udtf(returnType="doc_id bigint, pos int, word string, n_chars int")
    class WordStats:
        def __init__(self):
            self._doc = None
            self._chars = 0

        def eval(self, row):
            # NULL text yields NOTHING — including no summary row:
            # DuckDB's unnest(string_split(NULL)) emits zero rows, so a
            # doc of only-NULL text never appears in the oracle at all.
            if row.text is None:
                return
            self._doc = row.doc_id
            for i, w in enumerate(row.text.split(" ")):
                self._chars += len(w)
                yield (row.doc_id, i, w, len(w))

        def terminate(self):
            if self._doc is not None:
                yield (self._doc, -1, None, self._chars)

    spark.udtf.register("word_stats_udtf", WordStats)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT s.* FROM word_stats_udtf("
        "TABLE(SELECT doc_id, text FROM udtf_docs WHERE doc_id < 60) "
        "PARTITION BY doc_id) s"
    )


@register(
    "udf_arrow_batches",
    oracle="""
SELECT l_orderkey,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)) * 100, 0) AS BIGINT)) AS BIGINT) AS price_cents
FROM lineitem
WHERE l_orderkey <= 500
GROUP BY l_orderkey
""",
    tags=("udf", "arrow", "mapInArrow"),
)
def udf_arrow_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy batch surface below pandas UDFs: the
    transform receives raw pyarrow RecordBatches (no pandas conversion
    at all) and emits cent-exact per-row projections computed with
    pyarrow.compute kernels; a normal JVM aggregation finishes the job.
    This is the boundary to hand-rolled columnar code (tokenizers,
    codecs) where even the pandas layer is measurable overhead. Money
    rides HALF_UP integer cents so the Python boundary adds no float
    drift."""
    prep(spark)

    def cents_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            price = batch.column("l_extendedprice")
            cents = pc.cast(
                pc.floor(
                    pc.add(pc.multiply(pc.cast(price, pa.float64()), 100.0), 0.5)
                ),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_orderkey"), cents],
                names=["l_orderkey", "cents"],
            )

    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 500)
    projected = li.select("l_orderkey", "l_extendedprice").mapInArrow(
        cents_batches, "l_orderkey bigint, cents bigint"
    )
    return projected.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("price_cents"),
    )


_LR_B0, _LR_B1, _LR_B2, _LR_B3 = -2.0, 0.000012, 0.35, 1.1


@register(
    "ml_score_logistic",
    oracle=f"""
WITH feats AS (
  SELECT o_orderkey, o_orderpriority,
         o_totalprice,
         (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_lines,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
  FROM orders
),
scored AS (
  SELECT o_orderpriority,
         ROUND(1.0 / (1.0 + exp(-({_LR_B0} + {_LR_B1} * o_totalprice
                                  + {_LR_B2} * n_lines + {_LR_B3} * is_urgent))), 6) AS p
  FROM feats
)
SELECT o_orderpriority,
       p >= 0.5 AS predicted,
       COUNT(*) AS n,
       ROUND(AVG(p), 6) AS avg_p
FROM scored
GROUP BY o_orderpriority, predicted
""",
    tags=("ml", "inference", "scoring"),
)
def ml_score_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch model inference: a fixed-coefficient logistic model scored
    over engineered features (price, line count, urgency flag) entirely
    in whole-stage codegen — the deploy-a-trained-model-as-SQL pattern
    (coefficients are artifacts; inference is a projection, no ML
    runtime needed). Output: per (priority, predicted) calibration
    counts and mean score.

    Scale: scoring is stateless row-local arithmetic — it fuses into
    whatever scan feeds it and never shuffles; the only exchange here
    builds the per-order line-count feature (in a real feature store
    that column is precomputed). The same shape serves any GLM or small
    MLP inlined as nested expressions; heavier models step up to a
    Pandas-UDF batch scorer (udf_pandas entry) only when the math
    outgrows SQL expressions."""
    prep(spark)
    orders = table(spark, sf_dir, "orders")
    nl = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    feats = orders.join(nl, "o_orderkey", "left").select(
        "o_orderpriority",
        F.col("o_totalprice"),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias(
            "is_urgent"
        ),
    )
    z = (
        F.lit(_LR_B0)
        + _LR_B1 * F.col("o_totalprice")
        + _LR_B2 * F.col("n_lines")
        + _LR_B3 * F.col("is_urgent")
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return (
        feats.select("o_orderpriority", p.alias("p"))
        .groupBy("o_orderpriority", (F.col("p") >= 0.5).alias("predicted"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("p"), 6).alias("avg_p"),
        )
    )


@register(
    "sql_udf_functions",
    oracle="""
WITH q(qtr) AS (VALUES (1), (2), (3), (4))
SELECT q.qtr,
       CASE WHEN o_totalprice > 300000 THEN 'big' ELSE 'small' END AS tier,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4))), 4) AS DOUBLE) AS total
FROM orders JOIN q ON CAST(quarter(o_orderdate) AS INT) = q.qtr
GROUP BY q.qtr, tier
""",
    tags=("udf", "sql-function", "tvf"),
)
def sql_udf_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions (Spark 4.1): a scalar SQL UDF
    (CREATE FUNCTION ... RETURNS STRING RETURN CASE ...) and a SQL
    table-valued function (RETURNS TABLE ... RETURN SELECT) used in one
    query — per-quarter order tiers where the tier label comes from the
    scalar function and the quarter dimension from the TVF.

    Why this matters vs Python UDFs: SQL functions are INLINED by the
    analyzer into the calling plan — the tier CASE lands inside
    whole-stage codegen with zero serialization boundary, so shared
    business logic gets UDF ergonomics at built-in speed (the oracle is
    literally the inlined spelling). TVFs give parameterized derived
    tables the same way."""
    from ..catalog import register_views

    prep(spark)
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION order_tier(x DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN x > 300000 THEN 'big' ELSE 'small' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION quarters() "
        "RETURNS TABLE(qtr INT) RETURN SELECT explode(sequence(1, 4))"
    )
    return spark.sql("""
SELECT q.qtr, order_tier(o_totalprice) AS tier,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4))), 4) AS DOUBLE) AS total
FROM orders JOIN quarters() q ON CAST(quarter(o_orderdate) AS INT) = q.qtr
GROUP BY q.qtr, tier
""")


@register(
    "sql_scripting_block",
    oracle="""
SELECT 'above_mean' AS bucket, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4))), 4) AS DOUBLE) AS total
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
""",
    tags=("sql", "scripting"),
)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN...END compound statements): a
    procedural block DECLAREs a variable, SETs it from a query, and the
    final SELECT uses it — the migration surface for warehouse stored
    procedures, executed natively by the engine (no driver-side string
    splicing; the variable is a session-scoped typed value).

    The oracle is the equivalent declarative spelling (scalar subquery
    inlined), which is also the honest scale note: scripting sequences
    whole queries — each statement is its own distributed job — so
    procedural style costs nothing extra per-row, only per-statement
    scheduling."""
    from ..catalog import register_views

    prep(spark)
    register_views(spark, sf_dir)
    if spark.conf.get("spark.sql.scripting.enabled", "false") != "true":
        spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql("""
BEGIN
  DECLARE mean_price DOUBLE DEFAULT 0;
  SET mean_price = (SELECT AVG(o_totalprice) FROM orders);
  SELECT 'above_mean' AS bucket, COUNT(*) AS n,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4))), 4) AS DOUBLE) AS total
  FROM orders
  WHERE o_totalprice > mean_price;
END
""")


@register(
    "udf_cogrouped_asof",
    oracle="""
WITH va AS (
  SELECT user_id, ts, CAST(ROUND(MAX(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END) * 100, 0) AS BIGINT) AS vcents
  FROM events
  WHERE event_type = 'view' AND ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY user_id, ts
),
p AS (SELECT user_id, ts FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL),
m AS (
  SELECT p.user_id, va.vcents
  FROM p ASOF LEFT JOIN va ON p.user_id = va.user_id AND p.ts >= va.ts
),
vc AS (SELECT user_id, COUNT(*) AS n_view_ts FROM va GROUP BY user_id)
SELECT m.user_id,
       CAST(COALESCE(ANY_VALUE(vc.n_view_ts), 0) AS BIGINT) AS n_view_ts,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(m.vcents) AS BIGINT) AS n_matched,
       CAST(COALESCE(SUM(m.vcents), 0) AS BIGINT) AS matched_view_cents
FROM m LEFT JOIN vc ON vc.user_id = m.user_id
GROUP BY m.user_id
""",
    tags=("udf", "cogrouped-map", "asof", "pandas"),
)
def udf_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped applyInPandas (the two-sided grouped-map surface):
    views and purchases co-grouped per user, each pair of per-user
    pandas frames merged with pd.merge_asof — the shape for per-entity
    logic that needs BOTH relations in one pass (custom conformance
    checks, per-user replay, trajectory alignment) without a global
    join. View-side ties are pre-aggregated per (user, ts) so the as-of
    pick is deterministic; matched values ride integer cents.

    Scale: ONE co-partitioned shuffle on the key for both inputs; each
    user's pair of frames is Arrow-transferred to one python worker —
    bounded by per-user activity, never corpus-sized. The batch as-of
    dual (operators/asof.py) is the JVM-only twin; this row exercises
    the cogroup API surface itself."""
    prep(spark)
    # Event-time domain: pd.merge_asof REFUSES NaT merge keys outright
    # ('Merge keys contain null values') — the asof domain is
    # timestamped rows, explicit in both spellings (null-flood sweep).
    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    # The view (match-source) side also drops NULL users: cogroup puts
    # NULL keys in ONE group (pandas would happily merge them) but SQL
    # equality never matches NULL = NULL — purchases of unknown users
    # stay in the output with zero matches.
    views = (
        ev.where(F.col("event_type") == "view")
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id", "ts")
        .agg(
            F.round(
                F.max(
                    F.when(
                        ~F.isnan("value")
                        & (F.abs("value") < F.lit(1e12)),
                        F.col("value"),
                    )
                )
                * 100,
                0,
            ).cast("bigint").alias("vcents")
        )
    )
    # Fresh aliases break the shared-attribute lineage with the view
    # side: both branches scan the same events attributes, and Spark's
    # cogroup column pruning under a downstream projection resolves the
    # colliding exprIds by dropping the right child's non-key columns
    # (observed: the purchase frame arrives as ['user_id'] only). New
    # exprIds make the prune see two independent relations.
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )

    def conv(key: tuple, vdf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.rename(columns={"p_user_id": "user_id", "p_ts": "ts"})
        if len(pdf) == 0:
            # views-only users contribute no output row (the oracle
            # aggregates over purchases)
            return pd.DataFrame(
                columns=[
                    "user_id", "n_view_ts", "n_purchases", "n_matched",
                    "matched_view_cents",
                ]
            )
        pdf = pdf.sort_values("ts")[["ts"]]
        vdf = vdf.sort_values("ts")[["ts", "vcents"]]
        if len(vdf) == 0:
            n_matched, total = 0, 0
        else:
            merged = pd.merge_asof(pdf, vdf, on="ts", direction="backward")
            n_matched = int(merged["vcents"].notna().sum())
            total = int(merged["vcents"].fillna(0).sum())
        return pd.DataFrame(
            [[key[0], len(vdf), len(pdf), n_matched, total]],
            columns=[
                "user_id", "n_view_ts", "n_purchases", "n_matched",
                "matched_view_cents",
            ],
        )

    return (
        views.groupBy("user_id")
        .cogroup(purchases.groupBy("p_user_id"))
        .applyInPandas(
            conv,
            schema=(
                "user_id bigint, n_view_ts bigint, n_purchases bigint, "
                "n_matched bigint, matched_view_cents bigint"
            ),
        )
    )


@register(
    "udf_grouped_agg_trimmed",
    oracle="""
WITH v AS (
  SELECT o_orderpriority AS priority,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL
),
r AS (
  SELECT priority, cents,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY priority) AS n
  FROM v
),
tm AS (
  SELECT priority,
         CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS tm_cents
  FROM r
  WHERE rn > n // 10 AND rn <= n - n // 10
  GROUP BY priority
)
SELECT v.priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(ANY_VALUE(tm.tm_cents) / 100, 6) AS trimmed_mean,
       CAST(SUM(CASE WHEN v.cents > tm.tm_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above,
       ROUND(CAST(SUM(CASE WHEN v.cents > tm.tm_cents THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS frac_above,
       CAST(1 AS INT) AS paths_agree
FROM v JOIN tm ON tm.priority = v.priority
GROUP BY v.priority
ORDER BY v.priority
""",
    tags=("udf", "pandas", "grouped-agg", "udaf", "window"),
)
def udf_grouped_agg_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (custom vectorized aggregate): a 10%-
    trimmed mean of order value, applied through BOTH surfaces the API
    offers — `groupBy().agg(udaf)` and the same udaf OVER a
    `Window.partitionBy` with an unbounded frame — and cross-checked
    (paths_agree) so a divergence between the two execution paths fails
    the hash. This is the custom-aggregate shape MLlib-free pipelines
    use for robust statistics builtins lack (trimmed/winsorized means,
    custom loss reductions) while keeping Arrow-batch transfer.

    Exactness: values ride integer cents; the trimmed sum is an exact
    int64 regardless of pandas' reduction order (bounded by 2^63 cents
    = ~9.2e16 dollars per group — numpy would overflow SILENTLY past
    that, so a group whose money sum could approach it must pre-scale
    or sum as Python ints); k = n // 10 is integer on both engines
    (never FLOOR(n * 0.1), whose float product can land an ulp under
    the integer); the mean divides once, the /100 and round happen
    JVM-side with the shared ROUND discipline. Trimming ties at the cut
    is well-defined: equal values are interchangeable in a sum.

    Scale: ONE hash shuffle on the group key for the agg path; the
    window path re-partitions the same way (unbounded frame = whole
    partition per Arrow batch — a skewed group's batch must fit one
    worker, the documented GROUPED_AGG constraint; pre-reduced inputs
    or applyInPandas chunking are the escape hatch). The udaf receives
    only the cents column, never the row."""
    import numpy as np
    from pyspark.sql import Window

    prep(spark)

    @F.pandas_udf("double")
    def trimmed_mean_cents(c: pd.Series) -> float:
        s = np.sort(c.to_numpy())
        k = len(s) // 10
        core = s[k : len(s) - k]
        return float(core.sum()) / len(core)

    v = table(spark, sf_dir, "orders").where(
        F.col("o_totalprice").isNotNull()
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    win = Window.partitionBy("priority").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    flagged = v.withColumn("tm_win", trimmed_mean_cents("cents").over(win))
    # A GROUPED_AGG pandas UDF cannot share one agg() with non-pandas
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — the agg-path value
    # computes in its own groupBy and joins back (5 groups, broadcast).
    agg_tm = v.groupBy("priority").agg(
        trimmed_mean_cents("cents").alias("tm_agg")
    )
    return (
        flagged.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.max("tm_win").alias("tm_win_g"),
            F.sum(
                F.when(F.col("cents") > F.col("tm_win"), 1).otherwise(0)
            ).cast("bigint").alias("n_above"),
        )
        .join(F.broadcast(agg_tm), "priority")
        .select(
            "priority",
            "n_orders",
            F.round(F.col("tm_agg") / 100, 6).alias("trimmed_mean"),
            "n_above",
            F.round(
                F.col("n_above").cast("double") / F.col("n_orders"), 6
            ).alias("frac_above"),
            (F.col("tm_agg") == F.col("tm_win_g")).cast("int").alias(
                "paths_agree"
            ),
        )
        .orderBy("priority")
    )
