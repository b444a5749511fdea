"""Scalar function families (SURVEY.md §2B): string, date/time, math,
conditional, array (+ higher-order functions), map, JSON.

Everything here is a narrow projection — no shuffle at all; the point is
expression-level parity with the oracle, staying inside whole-stage
codegen (zero Python in any of these plans).

Dialect notes encoded in the oracles: DuckDB dayofweek is 0=Sunday vs
Spark 1=Sunday (+1 in SQL); DuckDB list slicing is 1-based end-inclusive
like Spark's `slice`; date outputs are formatted to strings because the
two engines' pandas date representations differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..session import prep
from . import register


@register(
    "scalar_string",
    oracle="""
SELECT p_partkey,
       concat_ws('/', p_brand, p_type)                   AS brand_type,
       substr(p_name, 1, 6)                              AS name6,
       upper(p_name)                                     AS name_upper,
       lower(p_brand)                                    AS brand_lower,
       trim('  ' || p_name || ' ')                       AS name_trim,
       lpad(CAST(p_size AS VARCHAR), 4, '0')             AS size_pad,
       CASE WHEN p_name IS NULL THEN NULL
            ELSE split_part(p_name, ' ', 1) END           AS first_word,
       regexp_extract(p_brand, '#([0-9]+)', 1)           AS brand_num,
       regexp_replace(c_like.p_name_num, '[0-9]+', '#')  AS masked,
       p_type LIKE 'PRO%'                                AS is_promo,
       regexp_matches(p_name, '^[a-z]+ (widget|bolt)$')  AS is_known_shape,
       CAST(length(p_name) AS INT)                       AS name_len,
       CAST(levenshtein(p_brand, 'Brand#13') AS INT)     AS brand_dist
FROM (SELECT *, p_name || CAST(p_partkey AS VARCHAR) AS p_name_num FROM part) c_like
WHERE p_partkey <= 2000
""",
    tags=("scalar", "string"),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") <= 2000)
    return p.select(
        "p_partkey",
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 6).alias("name6"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace(
            F.concat(F.col("p_name"), F.col("p_partkey").cast("string")), "[0-9]+", "#"
        ).alias("masked"),
        F.col("p_type").like("PRO%").alias("is_promo"),
        F.col("p_name").rlike("^[a-z]+ (widget|bolt)$").alias("is_known_shape"),
        F.length("p_name").alias("name_len"),
        F.levenshtein("p_brand", F.lit("Brand#13")).alias("brand_dist"),
    )


@register(
    "scalar_date",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT)                      AS y,
       CAST(month(o_orderdate) AS INT)                     AS m,
       CAST(day(o_orderdate) AS INT)                       AS d,
       CAST(quarter(o_orderdate) AS INT)                   AS q,
       CAST(dayofweek(o_orderdate) + 1 AS INT)             AS dow,
       CAST(weekofyear(o_orderdate) AS INT)                AS woy,
       date_trunc('month', o_orderdate)                    AS month_start,
       CAST(datediff('day', o_orderdate, TIMESTAMP '1998-12-31') AS INT) AS days_to_eoy,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
       o_orderdate + INTERVAL 3 DAY                        AS ts_plus3,
       CAST(epoch(o_orderdate) AS BIGINT)                  AS epoch_s,
       CAST(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS reparsed,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')          AS formatted
FROM orders
WHERE o_orderkey <= 3000
""",
    tags=("scalar", "date"),
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. dow normalized to Spark's 1=Sunday; date-typed
    results rendered as strings (engines' pandas date reprs differ)."""
    prep(spark)
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 3000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_eoy"
        ),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias("plus30"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("ts_plus3"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.to_timestamp(
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss"
        ).alias("reparsed"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("formatted"),
    )


@register(
    "scalar_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1)                   AS price_r1,
       CAST(floor(l_extendedprice) AS BIGINT)      AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT)       AS price_ceil,
       abs(l_extendedprice - 50000)                AS dist_50k,
       l_quantity * l_quantity                     AS qty_sq,
       round(sqrt(l_extendedprice), 6)             AS price_sqrt,
       round(ln(l_extendedprice), 6)               AS price_ln,
       round(log10(l_extendedprice), 6)            AS price_log10,
       round(exp(l_discount), 6)                   AS disc_exp,
       l_orderkey % 7                              AS key_mod7,
       CAST(floor(l_orderkey / 3) AS BIGINT)       AS key_div3,
       power(l_quantity, 2)                        AS qty_pow2
FROM lineitem
WHERE l_orderkey <= 1000
""",
    tags=("scalar", "math"),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family; transcendentals rounded to 6 (libm last-ulp variance)."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_extendedprice") - 50000).alias("dist_50k"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.floor(F.col("l_orderkey") / 3).alias("key_div3"),
        F.pow("l_quantity", F.lit(2)).alias("qty_pow2"),
    )


@register(
    "scalar_conditional",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'overdrawn'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END                                  AS tier,
       coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'OTHER')    AS seg_or_other,
       least(c_acctbal, 1000.0)                                 AS capped_low,
       greatest(c_acctbal, 0.0)                                 AS floored,
       CASE WHEN c_custkey % 2 = 0 THEN NULL ELSE c_custkey END AS odd_only
FROM customer
WHERE c_custkey <= 2000
""",
    tags=("scalar", "conditional"),
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 2000)
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("capped_low"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("floored"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit(None)).otherwise(F.col("c_custkey")).alias(
            "odd_only"
        ),
    )


@register(
    "scalar_array_hof",
    oracle="""
SELECT doc_id,
       CAST(len(words) AS INT)                                   AS n_words,
       array_to_string(words[1:5], ' ')                          AS first5,
       list_contains(words, 'spark')                             AS has_spark,
       array_to_string(list_sort(words)[1:3], ' ')               AS sorted3,
       upper(words[1])                                           AS first_upper,
       CAST(len(list_filter(words, w -> length(w) > 4)) AS INT)  AS n_long,
       CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS total_chars
FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id <= 300) t
""",
    tags=("scalar", "array", "hof"),
)
def scalar_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops + higher-order functions (transform/filter/aggregate) —
    all JVM-side lambda expressions, no UDFs."""
    prep(spark)
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 300)
        .select("doc_id", F.split("text", " ").alias("words"))
    )
    return docs.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.array_join(F.slice("words", 1, 5), " ").alias("first5"),
        F.array_contains("words", "spark").alias("has_spark"),
        F.array_join(F.slice(F.array_sort("words"), 1, 3), " ").alias("sorted3"),
        F.upper(F.element_at("words", 1)).alias("first_upper"),
        F.size(F.filter("words", lambda w: F.length(w) > 4)).alias("n_long"),
        F.aggregate(
            "words", F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
        ).alias("total_chars"),
    )


@register(
    "scalar_explode",
    oracle="""
SELECT d.doc_id, CAST(i.pos - 1 AS INT) AS pos, d.words[i.pos] AS word
FROM (SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE doc_id <= 20) d,
     LATERAL (SELECT unnest(generate_series(1, len(d.words))) AS pos) i
""",
    tags=("scalar", "array", "explode"),
)
def scalar_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: one row per (doc, position, token)."""
    prep(spark)
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 20)
        .select("doc_id", F.split("text", " ").alias("words"))
    )
    return docs.select("doc_id", F.posexplode("words").alias("pos", "word"))


@register(
    "scalar_map",
    oracle="""
SELECT event_id,
       array_to_string(list_sort(map_keys(m)), ',')   AS keys_sorted,
       CAST(map_extract(m, 'type')[1] AS VARCHAR)     AS type_val,
       CAST(cardinality(m) AS INT)                    AS map_size
FROM (SELECT event_id,
             MAP {'type': event_type, 'k': json_extract_string(props, '$.k')} AS m
      FROM events WHERE event_id <= 500) t
""",
    tags=("scalar", "map"),
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + map_keys/element_at/size (values out as strings)."""
    prep(spark)
    ev = table(spark, sf_dir, "events").where(F.col("event_id") <= 500)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("k"), F.get_json_object("props", "$.k"),
    )
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "type").alias("type_val"),
        F.size(m).alias("map_size"),
    )


@register(
    "scalar_json",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT)  AS k_val,
       to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS INT),
                           t := event_type))           AS reencoded
FROM events
WHERE event_id <= 1000
""",
    tags=("scalar", "json"),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / from_json -> struct -> to_json round-trip on the
    events.props JSON column."""
    prep(spark)
    ev = table(spark, sf_dir, "events").where(F.col("event_id") <= 1000)
    parsed = ev.select(
        "event_id",
        "event_type",
        F.from_json("props", "k INT").alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_val"),
        # ignoreNullFields=false: Spark's to_json DROPS null struct
        # fields by default where DuckDB renders "t":null (null-flood
        # sweep, round 7) — the JSON bytes must agree.
        F.to_json(
            F.struct(F.col("p.k").alias("k"), F.col("event_type").alias("t")),
            {"ignoreNullFields": "false"},
        ).alias("reencoded"),
    )


@register(
    "scalar_variant",
    oracle=r"""
SELECT event_id,
       event_type                                        AS vtype,
       user_id                                           AS vuid,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS vk,
       event_id % 7                                      AS tag0,
       CAST(NULL AS INT)                                 AS vmissing,
       (CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 = 0) AS x_is_null,
       'OBJECT<meta: OBJECT<type: STRING, uid: BIGINT>, p: OBJECT<k: BIGINT>, tags: ARRAY<BIGINT>>' AS vschema
FROM events
WHERE event_id <= 1000
  AND regexp_matches(props, '^\{"k": -?[0-9]+\}$')
  AND user_id IS NOT NULL AND event_type IS NOT NULL
""",
    tags=("scalar", "variant", "json", "semi-structured"),
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json -> VariantType
    column -> typed variant_get extraction, try_variant_get on a missing
    path (NULL, no error), is_variant_null distinguishing JSON null from
    absent, and schema_of_variant reporting the per-row inferred shape.

    Variant is Spark's open-format answer to schemaless JSON columns: the
    binary encoding is columnar-shreddable, so at 100 TB repeated paths
    ($.meta.type here) read like ordinary columns instead of re-parsing
    text per row. The envelope JSON is built with format_string from
    typed columns (deterministic bytes), then round-tripped through a
    real parse — the oracle recomputes every extraction relationally from
    the base columns, so a parse/extract defect cannot hash-clean.
    schema_of_variant's spelling is asserted as a literal in the oracle:
    a Spark-side inference change breaks the hash loudly rather than
    silently.
    """
    prep(spark)
    # The props-shape guard makes the vschema literal (and the embedded
    # `"p":%s` splice) immune to a future testdata regen adding other
    # props shapes: only rows provably of the simple {"k": N} form are
    # selected, identically on both engines.
    ev = table(spark, sf_dir, "events").where(
        (F.col("event_id") <= 1000)
        & F.col("props").rlike('^\\{"k": -?[0-9]+\\}$')
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    doc = F.format_string(
        '{"meta":{"type":"%s","uid":%d},"p":%s,"tags":[%d,%d]}',
        F.col("event_type"),
        F.col("user_id"),
        F.col("props"),
        F.col("event_id") % 7,
        F.col("user_id") % 5,
    )
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    nullable_doc = F.when(k % 3 == 0, F.lit('{"x":null}')).otherwise(
        F.format_string('{"x":%d}', k)
    )
    v = F.parse_json(doc)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.meta.type", "string").alias("vtype"),
        F.variant_get(v, "$.meta.uid", "bigint").alias("vuid"),
        F.variant_get(v, "$.p.k", "bigint").alias("vk"),
        F.variant_get(v, "$.tags[0]", "bigint").alias("tag0"),
        F.try_variant_get(v, "$.missing.path", "int").alias("vmissing"),
        F.is_variant_null(
            F.variant_get(F.parse_json(nullable_doc), "$.x", "variant")
        ).alias("x_is_null"),
        F.schema_of_variant(v).alias("vschema"),
    )


_PROFILE_COLS = (
    ("c_custkey", "CAST(MIN(c_custkey) AS VARCHAR)", "CAST(MAX(c_custkey) AS VARCHAR)"),
    ("c_name", "MIN(c_name)", "MAX(c_name)"),
    ("c_nationkey", "CAST(MIN(c_nationkey) AS VARCHAR)", "CAST(MAX(c_nationkey) AS VARCHAR)"),
    ("c_acctbal", "CAST(ROUND(MIN(c_acctbal), 2) AS VARCHAR)", "CAST(ROUND(MAX(c_acctbal), 2) AS VARCHAR)"),
    ("c_mktsegment", "MIN(c_mktsegment)", "MAX(c_mktsegment)"),
)


def _profile_oracle() -> str:
    parts = []
    for col, mn, mx in _PROFILE_COLS:
        parts.append(f"""
SELECT '{col}' AS column_name,
       COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE {col} IS NULL) AS n_nulls,
       COUNT(DISTINCT {col}) AS n_distinct,
       {mn} AS min_value, {mx} AS max_value
FROM customer""")
    return "\nUNION ALL\n".join(parts)


@register(
    "scalar_profile_columns",
    oracle=_profile_oracle(),
    tags=("scalar", "profiling", "stats"),
)
def scalar_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profiling (the ANALYZE TABLE / data-quality
    primitive): per-column row count, null count, exact distinct count,
    and min/max, computed in ONE scan of the table — all per-column
    aggregates ride a single wide aggregation, then unpivot to the
    (column, stats) long form.

    Scale: this is how a profiler must run at 100 TB — one pass, no
    per-column rescans. The multiple COUNT(DISTINCT)s plan through
    Catalyst's Expand (row multiplication by #distinct-aggs) — the
    documented trade; a production profiler would swap exact distinct
    for HLL partials (agg_sketch_hll) above memory budget, same shape,
    mergeable across partitions."""
    prep(spark)
    cust = table(spark, sf_dir, "customer")
    aggs = []
    for col, _, _ in _PROFILE_COLS:
        c = F.col(col)
        mn, mx = F.min(c), F.max(c)
        if col == "c_acctbal":
            mn, mx = F.round(mn, 2), F.round(mx, 2)
        aggs += [
            F.count(F.lit(1)).alias(f"{col}__rows"),
            F.count_if(c.isNull()).alias(f"{col}__nulls"),
            F.countDistinct(c).alias(f"{col}__distinct"),
            mn.cast("string").alias(f"{col}__min"),
            mx.cast("string").alias(f"{col}__max"),
        ]
    wide = cust.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', {col}__rows, {col}__nulls, {col}__distinct, {col}__min, {col}__max"
        for col, _, _ in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )


@register(
    "scalar_benford_digits",
    oracle="""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d
  FROM orders WHERE o_totalprice >= 1
),
obs AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY d),
tot AS (SELECT SUM(n) AS total FROM obs)
SELECT obs.d,
       obs.n,
       ROUND(CAST(obs.n AS DOUBLE) / tot.total, 6) AS observed_p,
       ROUND(log10(1.0 + 1.0 / obs.d), 6) AS benford_p,
       ROUND(CAST(obs.n AS DOUBLE) / tot.total - log10(1.0 + 1.0 / obs.d), 6)
         AS deviation
FROM obs CROSS JOIN tot
""",
    tags=("scalar", "quality", "benford"),
)
def scalar_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screening of order totals: observed
    leading-digit frequencies against the log10(1 + 1/d) expectation —
    the classic forensic data-quality test for fabricated or truncated
    numeric columns (a synthetic-uniform column like this one deviates
    loudly, which is exactly the point of running the screen).

    Shape: leading digit is a pure projection (int truncation +
    substring — no float formatting ambiguity), the distribution is a
    9-row aggregate, and the expectation is computed, not stored. At
    100 TB this is a free column-profiler add-on (one scan, mergeable
    counts)."""
    prep(spark)
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    # explicit floor: DuckDB's double->bigint cast ROUNDS while Spark's
    # truncates — the same boundary trap events_chi_square documents.
    d = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = o.select(d.alias("d")).groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    benford = F.log10(1.0 + 1.0 / F.col("d"))
    p = F.col("n").cast("double") / F.col("total")
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n",
            F.round(p, 6).alias("observed_p"),
            F.round(benford, 6).alias("benford_p"),
            F.round(p - benford, 6).alias("deviation"),
        )
    )


@register(
    "feature_scaling",
    oracle="""
WITH stats AS (
  SELECT p_brand,
         AVG(p_retailprice) AS mu,
         STDDEV_SAMP(p_retailprice) AS sigma,
         MIN(p_retailprice) AS lo,
         MAX(p_retailprice) AS hi
  FROM part WHERE p_retailprice IS NOT NULL GROUP BY p_brand
)
SELECT p.p_partkey, p.p_brand,
       ROUND((p.p_retailprice - s.mu) / NULLIF(s.sigma, 0), 6) AS z_scaled,
       ROUND((p.p_retailprice - s.lo) / NULLIF(s.hi - s.lo, 0), 6)
         AS minmax_scaled,
       ROUND(percent_rank() OVER (PARTITION BY p.p_brand
                                  ORDER BY p.p_retailprice, p.p_partkey), 6)
         AS quantile_rank
FROM part p JOIN stats s ON s.p_brand = p.p_brand
WHERE p.p_retailprice IS NOT NULL
""",
    tags=("scalar", "feature-engineering", "scaling"),
)
def feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature scaling, all three standard transforms in one
    pass: z-score (standard), min-max, and rank-based quantile transform
    of retail price within brand — the feature-preparation step between
    a curated corpus and model training, grouped so every brand's scale
    is its own.

    Shape: one grouped moment aggregate broadcast back onto the fact
    (z and min-max are pure projections after that), plus one window for
    the rank transform partitioned on the same key — two exchanges
    total, both on p_brand. The (price, partkey) window order makes the
    quantile rank total and deterministic."""
    prep(spark)
    from pyspark.sql import Window

    part = table(spark, sf_dir, "part").where(
        F.col("p_retailprice").isNotNull()
    )
    stats = part.groupBy("p_brand").agg(
        F.avg("p_retailprice").alias("mu"),
        F.stddev_samp("p_retailprice").alias("sigma"),
        F.min("p_retailprice").alias("lo"),
        F.max("p_retailprice").alias("hi"),
    )
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return (
        part.join(F.broadcast(stats), "p_brand")
        .select(
            "p_partkey",
            "p_brand",
            # try_divide + oracle NULLIF: a constant-price brand (zero
            # sigma / zero range) must scale to NULL on both engines,
            # not raise under ANSI mode (degen-probe finding, round 4).
            F.round(
                F.try_divide(
                    F.col("p_retailprice") - F.col("mu"), F.col("sigma")
                ),
                6,
            ).alias("z_scaled"),
            F.round(
                F.try_divide(
                    F.col("p_retailprice") - F.col("lo"),
                    F.col("hi") - F.col("lo"),
                ),
                6,
            ).alias("minmax_scaled"),
            F.round(F.percent_rank().over(w), 6).alias("quantile_rank"),
        )
    )


@register(
    "dq_expectations",
    oracle="""
WITH src AS (SELECT * FROM orders),
checks AS (
  SELECT 1 AS rule_id, 'o_orderkey_unique' AS rule,
         (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM src) AS n_violations,
         (SELECT COUNT(*) FROM src) AS n_rows
  UNION ALL
  SELECT 2, 'o_totalprice_positive',
         (SELECT COUNT(*) FROM src WHERE o_totalprice <= 0
                                      OR o_totalprice IS NULL),
         (SELECT COUNT(*) FROM src)
  UNION ALL
  SELECT 3, 'o_orderstatus_in_set',
         (SELECT COUNT(*) FROM src
          WHERE o_orderstatus NOT IN ('O', 'F', 'P')
             OR o_orderstatus IS NULL),
         (SELECT COUNT(*) FROM src)
  UNION ALL
  SELECT 4, 'o_custkey_not_null',
         (SELECT COUNT(*) FROM src WHERE o_custkey IS NULL),
         (SELECT COUNT(*) FROM src)
  UNION ALL
  SELECT 5, 'o_orderdate_in_range',
         (SELECT COUNT(*) FROM src
          WHERE o_orderdate < TIMESTAMP '1992-01-01'
             OR o_orderdate >= TIMESTAMP '2000-01-01'),
         (SELECT COUNT(*) FROM src)
)
SELECT CAST(rule_id AS INT) AS rule_id, rule,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(n_rows AS BIGINT) AS n_rows,
       (n_violations = 0) AS passed
FROM checks
""",
    tags=("scalar", "data-quality", "expectations", "audit"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the dbt-test / Great-Expectations
    shape): uniqueness, positivity, domain membership, not-null, and
    date-range contracts evaluated as ONE pass over the table, one
    result row per rule with its violation count — the gate an ingest
    pipeline runs before publishing a partition.

    Shape: every rule is a conditional aggregate over the same scan, so
    Catalyst collapses the suite into a single read + one aggregate
    (violations are COUNT(CASE...)s, uniqueness is count - distinct);
    adding a rule adds a column, not a pass."""
    prep(spark)
    src = table(spark, sf_dir, "orders")
    agg = src.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v1"),
        F.count(
            F.when(
                (F.col("o_totalprice") <= 0) | F.col("o_totalprice").isNull(), 1
            )
        ).alias("v2"),
        F.count(
            F.when(
                ~F.col("o_orderstatus").isin("O", "F", "P")
                | F.col("o_orderstatus").isNull(),
                1,
            )
        ).alias("v3"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("v4"),
        F.count(
            F.when(
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")),
                1,
            )
        ).alias("v5"),
    )
    rules = [
        (1, "o_orderkey_unique", "v1"),
        (2, "o_totalprice_positive", "v2"),
        (3, "o_orderstatus_in_set", "v3"),
        (4, "o_custkey_not_null", "v4"),
        (5, "o_orderdate_in_range", "v5"),
    ]
    out = None
    for rid, name, col in rules:
        row = agg.select(
            F.lit(rid).cast("int").alias("rule_id"),
            F.lit(name).alias("rule"),
            F.col(col).cast("bigint").alias("n_violations"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            (F.col(col) == 0).alias("passed"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "privacy_k_anonymity",
    oracle="""
WITH q AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(FLOOR(c_acctbal / 2000.0) AS INT) AS bal_band,
         COUNT(*) AS group_size
  FROM customer GROUP BY 1, 2, 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN group_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_groups,
       CAST(SUM(CASE WHEN group_size < 5 THEN group_size ELSE 0 END) AS BIGINT)
         AS n_reidentifiable_rows,
       CAST(MIN(group_size) AS BIGINT) AS k_anonymity,
       ROUND(SUM(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
             / CAST(SUM(group_size) AS DOUBLE), 6) AS reident_fraction
FROM q
""",
    tags=("scalar", "privacy", "k-anonymity", "audit"),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (segment x
    nation x coarse balance band): the dataset's k is the SMALLEST
    group size — any group under the threshold (k=5 here) marks rows a
    linkage attack could re-identify, the check a privacy review runs
    before a dataset leaves the boundary (and before deciding how much
    to generalize the bands).

    Shape: one groupBy on the quasi-identifier tuple, then a 5-number
    summary over the group-size table — the audit costs one shuffle
    however wide the table."""
    prep(spark)
    q = (
        table(spark, sf_dir, "customer")
        .groupBy(
            "c_mktsegment",
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 2000.0).cast("int").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
    )
    small = F.when(F.col("group_size") < 5, F.col("group_size")).otherwise(0)
    return q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("group_size") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_small_groups"),
        F.sum(small).cast("bigint").alias("n_reidentifiable_rows"),
        F.min("group_size").cast("bigint").alias("k_anonymity"),
        F.round(F.sum(small) / F.sum("group_size").cast("double"), 6).alias(
            "reident_fraction"
        ),
    )


@register(
    "scalar_try_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount = 0 THEN NULL
            ELSE ROUND(l_extendedprice / l_discount, 6) END AS price_per_disc,
       TRY_CAST(CASE WHEN l_linenumber = 1 THEN 'not_a_number'
                     ELSE CAST(l_quantity AS VARCHAR) END AS DOUBLE) AS qty_parsed,
       CASE WHEN l_quantity = 0 THEN NULL
            ELSE CAST(CAST(FLOOR(l_extendedprice) AS BIGINT)
                      % CAST(FLOOR(l_quantity) AS BIGINT) AS BIGINT)
       END AS price_mod_qty
FROM lineitem
WHERE l_orderkey % 50 = 0
""",
    tags=("scalar", "ansi", "try-arithmetic", "migration"),
)
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic surface (Spark 4 defaults to ANSI mode, the
    single biggest migration tripwire from Spark 3): try_divide /
    try_cast / try_mod return NULL where strict ANSI would THROW
    (division by zero, bad casts) — the idiom that keeps a 100 TB job
    from dying at hour 9 on one malformed row while still surfacing the
    NULLs for auditing. The oracle spells the same semantics with
    guarded CASE + TRY_CAST (DuckDB's equivalents)."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_extendedprice", "l_discount"), 6).alias(
            "price_per_disc"
        ),
        F.when(F.col("l_linenumber") == 1, F.lit("not_a_number"))
        .otherwise(F.col("l_quantity").cast("string"))
        .try_cast("double")
        .alias("qty_parsed"),
        # floor before the bigint cast: Spark's double->bigint truncates
        # while DuckDB's ROUNDS — an explicit floor makes both identical.
        F.try_mod(
            F.floor("l_extendedprice").cast("bigint"),
            F.floor("l_quantity").cast("bigint"),
        )
        .cast("bigint")
        .alias("price_mod_qty"),
    )


@register(
    "layout_zorder",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_custkey & 255 AS a,
         CAST(date_part('epoch', o_orderdate) / 86400 AS BIGINT) & 255 AS b
  FROM orders
),
z AS (
  SELECT o_orderkey, a, b,
         list_sum(list_transform(generate_series(0, 7),
           i -> (((a >> i) & 1) + 2 * ((b >> i) & 1)) * (1 << (2 * i))))
           AS zval
  FROM base
)
SELECT CAST(zval >> 10 AS INT) AS z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MAX(a) - MIN(a) AS BIGINT) AS cust_span,
       CAST(MAX(b) - MIN(b) AS BIGINT) AS day_span
FROM z GROUP BY 1
""",
    tags=("scalar", "layout", "zorder", "data-skipping"),
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve bucketing over (customer, order-day): bit
    interleaving maps the 2-D key space onto a 1-D sort key whose
    contiguous ranges stay TIGHT in BOTH dimensions — the multi-column
    clustering behind lakehouse OPTIMIZE ZORDER BY, where file-level
    min/max stats then skip files for predicates on EITHER column (a
    single-column sort keeps only its own column's spans tight). The
    per-bucket (cust_span, day_span) output IS the data-skipping
    evidence: both spans stay near 2^4 of a 2^8 domain at 64 buckets.

    The interleave is one fold over 8 bit positions — pure bigint
    shifts/masks, identical in both engines; at ingest the same
    expression feeds repartitionByRange(zval) before the write."""
    prep(spark)
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").bitwiseAND(F.lit(255)).alias("a"),
        (F.unix_timestamp("o_orderdate") / 86400)
        .cast("bigint")
        .bitwiseAND(F.lit(255))
        .alias("b"),
    )
    z = base.withColumn(
        "zval",
        F.expr(
            "aggregate(sequence(0, 7), 0L, (acc, i) -> acc"
            " + ((shiftright(a, i) & 1) + 2 * (shiftright(b, i) & 1))"
            "   * shiftleft(1L, 2 * i))"
        ),
    )
    return (
        z.groupBy(F.shiftright("zval", 10).cast("int").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.max("a") - F.min("a")).cast("bigint").alias("cust_span"),
            (F.max("b") - F.min("b")).cast("bigint").alias("day_span"),
        )
    )


@register(
    "privacy_l_diversity",
    oracle="""
WITH g AS (
  SELECT c_mktsegment, c_nationkey,
         COUNT(*) AS group_size,
         COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000.0) AS INT)) AS n_sensitive
  FROM customer GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(n_sensitive) AS BIGINT) AS l_diversity,
       CAST(SUM(CASE WHEN n_sensitive < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_diversity_groups,
       CAST(SUM(CASE WHEN n_sensitive < 3 THEN group_size ELSE 0 END)
         AS BIGINT) AS n_exposed_rows,
       ROUND(SUM(CASE WHEN n_sensitive < 3 THEN group_size ELSE 0 END)
             / CAST(SUM(group_size) AS DOUBLE), 6) AS exposed_fraction
FROM g
""",
    tags=("scalar", "privacy", "l-diversity", "audit"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's necessary complement: a group
    can be large (k-safe) yet expose its members anyway if everyone in
    it shares the same SENSITIVE value (the homogeneity attack). Per
    quasi-identifier group (segment x nation), count DISTINCT sensitive
    values (the coarse balance band); the dataset's l is the minimum,
    and groups under l=3 mark rows whose sensitive attribute an
    attacker learns from the quasi-identifiers alone.

    Shape: one groupBy with a distinct-count on the QI tuple, then a
    5-number summary — same single-shuffle audit cost as
    privacy_k_anonymity, which shares this projection's QI columns."""
    prep(spark)
    g = (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct(
                F.floor(F.col("c_acctbal") / 2000.0).cast("int")
            ).alias("n_sensitive"),
        )
    )
    low = F.col("n_sensitive") < 3
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("n_sensitive").cast("bigint").alias("l_diversity"),
        F.sum(F.when(low, 1).otherwise(0))
        .cast("bigint")
        .alias("n_low_diversity_groups"),
        F.sum(F.when(low, F.col("group_size")).otherwise(0))
        .cast("bigint")
        .alias("n_exposed_rows"),
        F.round(
            F.sum(F.when(low, F.col("group_size")).otherwise(0))
            / F.sum("group_size").cast("double"),
            6,
        ).alias("exposed_fraction"),
    )


@register(
    "dq_referential_integrity",
    oracle="""
WITH rel AS (
  SELECT 'lineitem.l_orderkey -> orders' AS relation,
         (SELECT COUNT(*) FROM lineitem) AS n_child,
         (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
           AS n_orphans,
         (SELECT COUNT(*) FROM orders) AS n_parent,
         (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
           AS n_unreferenced
  UNION ALL
  SELECT 'orders.o_custkey -> customer',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
         (SELECT COUNT(*) FROM customer),
         (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
  UNION ALL
  SELECT 'lineitem.l_partkey -> part',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
         (SELECT COUNT(*) FROM part),
         (SELECT COUNT(*) FROM part p WHERE NOT EXISTS
            (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey))
  UNION ALL
  SELECT 'lineitem.l_suppkey -> supplier',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
         (SELECT COUNT(*) FROM supplier),
         (SELECT COUNT(*) FROM supplier s WHERE NOT EXISTS
            (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey))
)
SELECT relation, CAST(n_child AS BIGINT) AS n_child,
       CAST(n_orphans AS BIGINT) AS n_orphans,
       CAST(n_parent AS BIGINT) AS n_parent,
       CAST(n_unreferenced AS BIGINT) AS n_unreferenced
FROM rel
""",
    tags=("scalar", "data-quality", "referential-integrity", "anti-join"),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's four FK
    relations: orphaned children (FK value with no parent — broken
    ingestion) and unreferenced parents (dimension rows no fact touches
    — dead weight or a silently-dropped feed) per relation. The
    contract check every warehouse load runs before downstream joins
    silently drop rows; dq_expectations' cross-table sibling.

    Shape — the 100 TB discipline is ONE pass over each fact side:
    lineitem's three FK checks ride a single scan carrying three
    broadcast existence flags (left joins against the parents' key
    sets), aggregated into n_child + all three orphan counts at once —
    not one anti-join scan per relation. The parent-side unreferenced
    counts anti-join each (dim-sized) parent against the fact's
    distinct keys. Everything is a lazy 1-row aggregate crossJoined
    into the report (no driver-side actions at plan-build). When a
    parent outgrows broadcast size, that relation's flag falls back to
    a shuffle semi-join — the flags are independent, so only the big
    relation pays."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    part = table(spark, sf_dir, "part")
    supp = table(spark, sf_dir, "supplier")

    def keyset(parent, pkey, alias, marker):
        return F.broadcast(
            parent.select(F.col(pkey).alias(alias)).distinct()
            .withColumn(marker, F.lit(1))
        )

    # one lineitem scan, three broadcast existence flags, one aggregate
    li_stats = (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(keyset(orders, "o_orderkey", "l_orderkey", "ok_o"), "l_orderkey", "left")
        .join(keyset(part, "p_partkey", "l_partkey", "ok_p"), "l_partkey", "left")
        .join(keyset(supp, "s_suppkey", "l_suppkey", "ok_s"), "l_suppkey", "left")
        .agg(
            F.count(F.lit(1)).alias("n_li"),
            F.count(F.when(F.col("ok_o").isNull(), 1)).alias("orph_o"),
            F.count(F.when(F.col("ok_p").isNull(), 1)).alias("orph_p"),
            F.count(F.when(F.col("ok_s").isNull(), 1)).alias("orph_s"),
        )
    )
    ord_stats = (
        orders.select("o_custkey")
        .join(keyset(cust, "c_custkey", "o_custkey", "ok_c"), "o_custkey", "left")
        .agg(
            F.count(F.lit(1)).alias("n_ord"),
            F.count(F.when(F.col("ok_c").isNull(), 1)).alias("orph_c"),
        )
    )

    def unref(parent, pkey, child, ckey, out):
        # The pre-distinct is load-bearing: it partial-aggregates
        # map-side, so the anti join's exchange carries ~|keys| rows
        # instead of |fact| (measured at 25x: dropping it 5.8 -> 8.1 s).
        ck = child.select(F.col(ckey).alias(pkey)).distinct()
        return (
            parent.select(pkey)
            .join(ck, pkey, "left_anti")
            .agg(F.count(F.lit(1)).alias(out))
        )

    counts = (
        li_stats.crossJoin(ord_stats)
        .crossJoin(orders.agg(F.count(F.lit(1)).alias("n_ord_p")))
        .crossJoin(cust.agg(F.count(F.lit(1)).alias("n_cust")))
        .crossJoin(part.agg(F.count(F.lit(1)).alias("n_part")))
        .crossJoin(supp.agg(F.count(F.lit(1)).alias("n_supp")))
        .crossJoin(unref(orders, "o_orderkey", li, "l_orderkey", "un_o"))
        .crossJoin(unref(cust, "c_custkey", orders, "o_custkey", "un_c"))
        .crossJoin(unref(part, "p_partkey", li, "l_partkey", "un_p"))
        .crossJoin(unref(supp, "s_suppkey", li, "l_suppkey", "un_s"))
    )

    def row(name, n_child, n_orphans, n_parent, n_unref):
        return counts.select(
            F.lit(name).alias("relation"),
            F.col(n_child).cast("bigint").alias("n_child"),
            F.col(n_orphans).cast("bigint").alias("n_orphans"),
            F.col(n_parent).cast("bigint").alias("n_parent"),
            F.col(n_unref).cast("bigint").alias("n_unreferenced"),
        )

    return (
        row("lineitem.l_orderkey -> orders", "n_li", "orph_o", "n_ord_p", "un_o")
        .unionByName(row("orders.o_custkey -> customer", "n_ord", "orph_c",
                         "n_cust", "un_c"))
        .unionByName(row("lineitem.l_partkey -> part", "n_li", "orph_p",
                         "n_part", "un_p"))
        .unionByName(row("lineitem.l_suppkey -> supplier", "n_li", "orph_s",
                         "n_supp", "un_s"))
    )


@register(
    "feature_winsorize",
    oracle="""
WITH v AS (
  SELECT c_mktsegment AS seg,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents,
         c_custkey
  FROM customer WHERE c_acctbal IS NOT NULL
),
r AS (
  SELECT seg, cents,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, c_custkey)
           AS rn,
         COUNT(*) OVER (PARTITION BY seg) AS n
  FROM v
),
cuts AS (
  SELECT seg,
         MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.05 * n) AS BIGINT), 1)
                  THEN cents END) AS lo,
         MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.95 * n) AS BIGINT), 1)
                  THEN cents END) AS hi
  FROM r GROUP BY seg
)
SELECT v.seg AS c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(c.lo AS DOUBLE) / 100.0 AS p05,
       CAST(c.hi AS DOUBLE) / 100.0 AS p95,
       CAST(SUM(CAST(v.cents AS HUGEINT)) AS DOUBLE) / COUNT(*) / 100.0
         AS mean_raw,
       CAST(SUM(CAST(LEAST(GREATEST(v.cents, c.lo), c.hi) AS HUGEINT))
            AS DOUBLE) / COUNT(*) / 100.0 AS mean_winsorized
FROM v JOIN cuts c ON c.seg = v.seg
GROUP BY v.seg, c.lo, c.hi
""",
    tags=("scalar", "feature", "robust", "winsorize", "statistics"),
)
def feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: per-segment balances clipped at the exact 5th/95th
    percentile (percentile_disc by pinned rank — smallest value at
    ceil(p*n), ties irrelevant because the PICKED VALUE is what clips),
    reporting the raw vs winsorized mean — the robust-preprocessing
    step feature pipelines apply before scaling so one outlier doesn't
    own the z-score (complements feature_scaling's minmax/z and the
    MAD outlier screen, which flags instead of clipping).

    Everything rides exact integer cents: the cut values are exact
    order statistics, the clip is an integer LEAST/GREATEST, and both
    means are exact-integer sums divided once at the edge — identical
    doubles on both engines with no rounding step needed.

    Scale: one window pass per segment for the ranks (the same
    sort-per-group cost as exact percentiles), a tiny per-segment cuts
    relation broadcast back onto the rows, one aggregate. At 100 TB the
    cuts join is a broadcast of #segments rows."""
    prep(spark)
    from pyspark.sql import Window

    from ..functions.exact import scaled_long

    v = table(spark, sf_dir, "customer").where(
        F.col("c_acctbal").isNotNull()
    ).select(
        F.col("c_mktsegment").alias("seg"),
        scaled_long("c_acctbal").alias("cents"),
        "c_custkey",
    )
    w = Window.partitionBy("seg").orderBy("cents", "c_custkey")
    wn = Window.partitionBy("seg")
    r = v.select(
        "seg",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda p: F.greatest(  # noqa: E731
        F.ceil(F.lit(p) * F.col("n")).cast("bigint"), F.lit(1)
    )
    cuts = r.groupBy("seg").agg(
        F.max(F.when(F.col("rn") == pick(0.05), F.col("cents"))).alias("lo"),
        F.max(F.when(F.col("rn") == pick(0.95), F.col("cents"))).alias("hi"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    clipped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return (
        v.join(F.broadcast(cuts), "seg")
        .groupBy("seg", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.sum(d38(F.col("cents"))).cast("double") / F.count(F.lit(1)) / 100.0)
            .alias("mean_raw"),
            (
                F.sum(d38(clipped)).cast("double") / F.count(F.lit(1)) / 100.0
            ).alias("mean_winsorized"),
        )
        .select(
            F.col("seg").alias("c_mktsegment"),
            "n",
            (F.col("lo").cast("double") / 100.0).alias("p05"),
            (F.col("hi").cast("double") / 100.0).alias("p95"),
            "mean_raw",
            "mean_winsorized",
        )
    )


@register(
    "feature_quantile_normalize",
    oracle="""
WITH v AS (
  -- out-of-domain measures (non-finite / past the money bound) leave
  -- the relation entirely: a NULL cents row would otherwise RANK, and
  -- the two engines place NULLs at opposite ends of an ORDER BY
  -- (extremes-sweep finding) — the domain filter is the contract.
  SELECT event_type AS grp, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
  WHERE value IS NOT NULL AND isfinite(value) AND abs(value) < 1e12
),
r AS (
  SELECT grp, cents,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY grp) AS n_g
  FROM v
),
g AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, event_id) AS grn
  FROM v
),
tot AS (SELECT COUNT(*) AS n FROM v),
rt AS (
  -- materialize the target rank FIRST so the g lookup is a plain
  -- equi-join (computed-key-inside-join forced a nested loop)
  SELECT grp, cents, (rn * n + n_g - 1) // n_g AS t_rank
  FROM r CROSS JOIN tot
),
mapped AS (
  SELECT rt.grp, rt.cents, g.cents AS mapped_cents
  FROM rt JOIN g ON g.grn = rt.t_rank
)
SELECT grp AS event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / COUNT(*) / 100.0
         AS mean_raw,
       CAST(SUM(CAST(mapped_cents AS HUGEINT)) AS DOUBLE) / COUNT(*) / 100.0
         AS mean_mapped,
       CAST(MIN(mapped_cents) AS DOUBLE) / 100.0 AS min_mapped,
       CAST(MAX(mapped_cents) AS DOUBLE) / 100.0 AS max_mapped
FROM mapped
GROUP BY grp
ORDER BY grp
""",
    tags=("scalar", "feature", "quantile", "normalization", "statistics"),
)
def feature_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: each group's value distribution is mapped
    onto the GLOBAL distribution by rank — the value at within-group
    rank rn of n_g maps to the global order statistic at ceil(rn*N/n_g)
    — so after mapping every event_type has (up to ties) the same
    distribution. The cross-group alignment step feature pipelines use
    when per-source score scales drift (the unequal-size generalization
    of microarray quantile normalization).

    Exactness: ranks are integers with id tie-breaks, the target rank is
    pure integer arithmetic (ceil via (rn*N + n_g - 1) div n_g), and the
    mapped value is a PICKED order statistic — no interpolation, no
    float averaging; group means ride exact integer cents.

    Scale: NO row-level rank at all. Because the within-group rank rn
    enumerates 1..n_g exactly once per group, the mapped multiset of a
    group depends only on (n_g, N, the global distinct-value cumulative
    counts): the number of group-g rows mapping onto a distinct value c
    whose global ranks span (lo, hi] is floor(hi*n_g/N) - floor(lo*n_g/N)
    (ceil(rn*N/n_g) <= x  <=>  rn <= floor(x*n_g/N)). So the fact reduces
    immediately into two aggregates — per-distinct-value counts (the
    agg_spearman_corr pattern, cumulated by operators/rank.py's
    range-partitioned global_cumsum over DISTINCT values, not rows) and
    per-group counts — and the only join is a broadcast of the tiny
    group dim onto the distinct-value table. The oracle keeps the
    literal row-level two-rank spelling, proving the closed form.
    """
    from ..functions.exact import scaled_long
    from ..operators.rank import global_cumsum

    prep(spark)
    # scaled_long maps out-of-domain measures to NULL; those rows must
    # LEAVE the relation (matching the oracle's WHERE) — a NULL rank key
    # sorts first in Spark and last in DuckDB.
    v = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        scaled_long("value").alias("cents"),
    ).where(F.col("cents").isNotNull())
    gd = global_cumsum(
        v.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt")),
        ["cents"],
        "cnt",
        out="hi",
    ).withColumn("lo", F.col("hi") - F.col("cnt"))
    groups = v.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("csum"),
    )
    tot = v.agg(F.count(F.lit(1)).alias("n"))
    # mapped-row count per (group, distinct value); DECIMAL(38,0) products
    # keep hi*n_g exact past long range (1e12-row fact x 1e12 rank).
    cells = (
        gd.crossJoin(F.broadcast(groups))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "mc",
            F.expr(
                "CAST(CAST(hi AS DECIMAL(38,0)) * n_g DIV n"
                "   - CAST(lo AS DECIMAL(38,0)) * n_g DIV n AS BIGINT)"
            ),
        )
        .where(F.col("mc") > 0)
    )
    return (
        cells.groupBy("grp", "n_g", "csum")
        .agg(
            F.sum(F.col("cents").cast("decimal(38,0)") * F.col("mc")).alias(
                "msum"
            ),
            (F.min("cents").cast("double") / 100.0).alias("min_mapped"),
            (F.max("cents").cast("double") / 100.0).alias("max_mapped"),
        )
        .select(
            F.col("grp").alias("event_type"),
            F.col("n_g").alias("n"),
            (F.col("csum").cast("double") / F.col("n_g") / 100.0).alias(
                "mean_raw"
            ),
            (F.col("msum").cast("double") / F.col("n_g") / 100.0).alias(
                "mean_mapped"
            ),
            "min_mapped",
            "max_mapped",
        )
        .orderBy("event_type")
    )


@register(
    "dq_t_closeness",
    oracle="""
WITH v AS (
  SELECT c_mktsegment AS qi_group, c_nationkey AS sensitive
  FROM customer WHERE c_nationkey IS NOT NULL
),
global_d AS (
  SELECT sensitive, COUNT(*) AS g_cnt FROM v GROUP BY sensitive
),
tot AS (SELECT COUNT(*) AS n FROM v),
grp AS (
  SELECT qi_group, sensitive, COUNT(*) AS c FROM v GROUP BY 1, 2
),
gn AS (SELECT qi_group, SUM(c) AS n_g FROM grp GROUP BY 1),
cells AS (
  SELECT gn.qi_group, gd.sensitive, gn.n_g, gd.g_cnt, t.n,
         COALESCE(g.c, 0) AS c
  FROM gn CROSS JOIN global_d gd CROSS JOIN tot t
  LEFT JOIN grp g ON g.qi_group = gn.qi_group AND g.sensitive = gd.sensitive
),
dists AS (
  SELECT qi_group, sensitive, n_g,
         SUM(CAST(c AS DOUBLE) * n - CAST(g_cnt AS DOUBLE) * n_g)
           OVER (PARTITION BY qi_group ORDER BY sensitive) AS cum_scaled,
         CAST(n_g AS DOUBLE) * n AS denom
  FROM cells
),
emd AS (
  SELECT qi_group, MAX(n_g) AS n_g,
         SUM(ABS(cum_scaled)) / MAX(denom) AS t_raw
  FROM dists GROUP BY qi_group
)
SELECT qi_group, CAST(n_g AS BIGINT) AS n_g,
       ROUND(t_raw, 6) AS t_closeness,
       t_raw > 0.15 AS violates_t
FROM emd
ORDER BY qi_group
""",
    tags=("scalar", "privacy", "data-quality", "t-closeness"),
)
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (the privacy rung above k-anonymity and
    l-diversity, both already in the suite): for each quasi-identifier
    group, the earth-mover's distance between its sensitive-attribute
    distribution and the global one, for an ORDERED sensitive attribute
    (EMD = sum of |cumulative probability gaps|, the 1-Wasserstein
    closed form). Groups with t > 0.15 leak distributional information
    even when every group is k-anonymous and l-diverse.

    Exactness: the cumulative gap is kept as SCALED INTEGERS
    (c*N - g_cnt*n_g — both products exact int64), summed |.| per
    group, and divided ONCE by n_g*N at the edge — no per-cell float.

    Scale: two hash aggregates (cell counts, global counts) + a
    group×domain dense grid via cross join of the two SMALL reductions
    (never the fact), one window over the sensitive domain per group.
    """
    from pyspark.sql import Window

    prep(spark)
    v = table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isNotNull()
    ).select(
        F.col("c_mktsegment").alias("qi_group"),
        F.col("c_nationkey").alias("sensitive"),
    )
    global_d = v.groupBy("sensitive").agg(F.count(F.lit(1)).alias("g_cnt"))
    tot = v.agg(F.count(F.lit(1)).alias("n"))
    grp = v.groupBy("qi_group", "sensitive").agg(F.count(F.lit(1)).alias("c"))
    gn = grp.groupBy("qi_group").agg(F.sum("c").alias("n_g"))
    cells = (
        gn.crossJoin(F.broadcast(global_d))
        .crossJoin(F.broadcast(tot))
        .join(grp, ["qi_group", "sensitive"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    w = Window.partitionBy("qi_group").orderBy("sensitive")
    dists = cells.select(
        "qi_group",
        "n_g",
        F.sum(
            F.col("c").cast("double") * F.col("n")
            - F.col("g_cnt").cast("double") * F.col("n_g")
        )
        .over(w)
        .alias("cum_scaled"),
        (F.col("n_g").cast("double") * F.col("n")).alias("denom"),
    )
    emd = dists.groupBy("qi_group").agg(
        F.max("n_g").alias("n_g"),
        (F.sum(F.abs("cum_scaled")) / F.max("denom")).alias("t_raw"),
    )
    return emd.select(
        "qi_group",
        F.col("n_g").cast("bigint").alias("n_g"),
        F.round("t_raw", 6).alias("t_closeness"),
        (F.col("t_raw") > 0.15).alias("violates_t"),
    ).orderBy("qi_group")


@register(
    "feature_target_encode_loo",
    oracle="""
WITH base AS (
  SELECT o_orderpriority AS cat,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS y_cents,
         o_orderkey
  FROM orders
),
stats AS (
  SELECT cat, COUNT(*) AS n_c, SUM(y_cents) AS s_c FROM base GROUP BY cat
),
enc AS (
  SELECT b.cat, b.o_orderkey,
         CASE WHEN s.n_c > 1
              THEN CAST(s.s_c - b.y_cents AS DOUBLE) / (s.n_c - 1) / 100.0
         END AS loo_enc
  FROM base b JOIN stats s ON s.cat = b.cat
)
SELECT cat,
       COUNT(*) AS n,
       ROUND(MIN(loo_enc), 6) AS min_enc,
       ROUND(MAX(loo_enc), 6) AS max_enc,
       ROUND(CAST(SUM(CAST(ROUND(loo_enc * 1000000, 0) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1e6, 6) AS mean_enc
FROM enc
GROUP BY cat
ORDER BY cat
""",
    tags=("scalar", "feature", "target-encoding", "leakage", "pipeline"),
)
def feature_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each row's categorical value is
    replaced by the mean target of OTHER rows in the same category
    ((sum_c - y_i) / (n_c - 1)) — the leakage-safe mean encoding a
    feature pipeline applies to high-cardinality categoricals before
    gradient-boosted training; naive mean encoding leaks the row's own
    label and this is the standard fix.

    Exactness: category sums ride exact integer cents so every row's
    LOO numerator is an exact integer and the encode is ONE double
    divide; the per-category audit re-quantizes each encode to 1e-6
    integers before the mean so the verification sum is
    order-independent. Singleton categories encode NULL (no other rows
    to borrow from) on both engines.

    Scale: one map-side-combinable aggregate to category stats,
    broadcast back onto the fact — zero extra shuffles of the fact; at
    100 TB this is the same single-pass shape whatever |categories| is.
    """
    from ..functions.exact import scaled_long

    prep(spark)
    base = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("cat"),
        scaled_long("o_totalprice").alias("y_cents"),
        "o_orderkey",
    )
    stats = base.groupBy("cat").agg(
        F.count(F.lit(1)).alias("n_c"), F.sum("y_cents").alias("s_c")
    )
    enc = base.join(F.broadcast(stats), "cat").select(
        "cat",
        F.when(
            F.col("n_c") > 1,
            (F.col("s_c") - F.col("y_cents")).cast("double")
            / (F.col("n_c") - 1)
            / 100.0,
        ).alias("loo_enc"),
    )
    q6 = F.floor(F.col("loo_enc") * 1_000_000 + F.lit(0.5)).cast("long")
    return (
        enc.groupBy("cat")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("loo_enc"), 6).alias("min_enc"),
            F.round(F.max("loo_enc"), 6).alias("max_enc"),
            F.round(
                F.sum(q6).cast("double") / F.count(F.lit(1)) / 1e6, 6
            ).alias("mean_enc"),
        )
        .orderBy("cat")
    )


@register(
    "feature_softmax_weights",
    oracle="""
WITH v AS (
  SELECT c_mktsegment AS seg, c_custkey,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
),
top5 AS (
  SELECT seg, c_custkey, cents,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents DESC, c_custkey)
           AS rk
  FROM v
  QUALIFY rk <= 5
),
mx AS (SELECT seg, MAX(cents) AS mx FROM top5 GROUP BY seg),
e AS (
  SELECT t.seg, t.c_custkey, t.rk, t.cents,
         ROUND(exp(CAST(t.cents - m.mx AS DOUBLE) / 100000.0), 9) AS ew
  FROM top5 t JOIN mx m ON m.seg = t.seg
),
z AS (SELECT seg, SUM(ew) AS z FROM e GROUP BY seg)
SELECT e.seg AS c_mktsegment, e.c_custkey, CAST(e.rk AS INT) AS rk,
       CAST(e.cents AS DOUBLE) / 100.0 AS acctbal,
       ROUND(e.ew / z.z, 6) AS softmax_w
FROM e JOIN z ON z.seg = e.seg
ORDER BY c_mktsegment, rk
""",
    tags=("scalar", "feature", "softmax", "mixture"),
)
def feature_softmax_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numerically-stable softmax weighting: each segment's top-5
    balances become mixture weights via exp((x - max)/T)/Z with the
    max-subtraction shift (the stabilization every softmax at scale
    needs — raw exp(x/T) overflows as soon as one score is large) and
    temperature T = $1000. The weighting primitive behind
    softmax-sampled mixtures, alongside text_mixture_temperature's
    power-law variant.

    Exactness: the shifted exponent is an exact integer ratio; each
    exp term is rounded to 1e-9 BEFORE the 5-term partition sum
    (round-before-sum discipline), and the final weight divides once.

    Scale: the top-5-per-group window is the only data-sized pass
    (partitioned, bounded output); exp runs on k*5 rows. Softmax over
    MILLIONS of rows per group follows the same shape with the
    group-max as a broadcast join — never a global sort.
    """
    from pyspark.sql import Window

    from ..functions.exact import scaled_long

    prep(spark)
    v = table(spark, sf_dir, "customer").where(
        F.col("c_acctbal").isNotNull()
    ).select(
        F.col("c_mktsegment").alias("seg"),
        "c_custkey",
        scaled_long("c_acctbal").alias("cents"),
    )
    w = Window.partitionBy("seg").orderBy(F.desc("cents"), "c_custkey")
    top5 = v.select(
        "seg", "c_custkey", "cents", F.row_number().over(w).alias("rk")
    ).where(F.col("rk") <= 5)
    mx = top5.groupBy("seg").agg(F.max("cents").alias("mx"))
    e = top5.join(F.broadcast(mx), "seg").select(
        "seg",
        "c_custkey",
        "rk",
        "cents",
        F.round(
            F.exp((F.col("cents") - F.col("mx")).cast("double") / 100000.0), 9
        ).alias("ew"),
    )
    z = e.groupBy("seg").agg(F.sum("ew").alias("z"))
    return (
        e.join(F.broadcast(z), "seg")
        .select(
            F.col("seg").alias("c_mktsegment"),
            "c_custkey",
            F.col("rk").cast("int").alias("rk"),
            (F.col("cents").cast("double") / 100.0).alias("acctbal"),
            F.round(F.col("ew") / F.col("z"), 6).alias("softmax_w"),
        )
        .orderBy("c_mktsegment", "rk")
    )


@register(
    "feature_string_index",
    oracle="""
WITH freq AS (
  SELECT p_brand, COUNT(*) AS n FROM part GROUP BY p_brand
),
idx AS (
  SELECT p_brand, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, p_brand) - 1 AS brand_idx
  FROM freq
)
SELECT p_brand, CAST(brand_idx AS INT) AS brand_idx, CAST(n AS BIGINT) AS n,
       CAST(SUM(n) OVER (ORDER BY brand_idx) AS BIGINT) AS cum_rows
FROM idx
ORDER BY brand_idx
""",
    tags=("scalar", "feature", "string-indexer", "categorical"),
)
def feature_string_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StringIndexer parity: categorical values map to dense integer
    ids ordered by descending frequency (ties broken lexically — the
    MLlib frequencyDesc contract), with the cumulative row coverage per
    index — the encoding step before any embedding-table or tree model,
    done as a pure DataFrame build with NO fitted-model object: the
    index IS a small DataFrame you broadcast-join onto the fact.

    Scale: one hash aggregate over the fact builds the frequency table;
    the rank window runs on |categories| rows. Applying the index back
    is a broadcast join, exactly like feature_target_encode_loo's
    stats; at 100 TB nothing here grows past the category count.
    """
    from pyspark.sql import Window

    prep(spark)
    freq = (
        table(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    idx = freq.select(
        "p_brand",
        "n",
        (
            F.row_number().over(Window.orderBy(F.desc("n"), "p_brand")) - 1
        ).alias("brand_idx"),
    )
    return idx.select(
        "p_brand",
        F.col("brand_idx").cast("int").alias("brand_idx"),
        F.col("n").cast("bigint").alias("n"),
        F.sum("n")
        .over(
            Window.orderBy("brand_idx").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("bigint")
        .alias("cum_rows"),
    ).orderBy("brand_idx")


@register(
    "privacy_pseudonymize",
    oracle="""
WITH p AS (
  SELECT substr(md5('pseud-key-2026|' || CAST(user_id AS VARCHAR)), 1, 16)
           AS pid,
         event_type,
         CAST(ROUND(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END * 100, 0) AS BIGINT) AS cents
  FROM events
),
agg AS (
  SELECT pid, COUNT(*) AS n_events,
         COUNT(DISTINCT event_type) AS n_types,
         SUM(cents) AS cents
  FROM p GROUP BY pid
)
SELECT COUNT(*) AS n_pseudonyms,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(MAX(n_events) AS BIGINT) AS max_events_per_id,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_value,
       CAST(COUNT(CASE WHEN n_types >= 3 THEN 1 END) AS BIGINT)
         AS ids_with_3plus_types
FROM agg
""",
    tags=("scalar", "privacy", "pseudonymization", "pipeline"),
)
def privacy_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pseudonymization: user ids replaced by a keyed-hash token
    (md5 over a secret prefix — in production an HMAC with a managed
    key; the prefix is the pluggable part) that PRESERVES JOIN-ABILITY:
    the same user always maps to the same token, so per-user analytics
    (counts, distinct types, value sums — verified here) survive while
    raw identifiers leave the dataset. The reversible-by-keyholder
    complement of the PII redaction row (which destroys) and the
    k-anonymity/l-diversity/t-closeness audits (which measure).

    The audit proves the invariants: pseudonym count == user count,
    per-token aggregates equal per-user aggregates (exact integers).

    Scale: pseudonymization is a map-only expression — zero shuffle
    added to any existing plan; the token is a fixed-width string, so
    downstream joins/aggregates hash exactly as the raw id did.
    """
    from ..functions.exact import scaled_long

    prep(spark)
    p = table(spark, sf_dir, "events").select(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("pseud-key-2026|"), F.col("user_id").cast("string")
                )
            ),
            1,
            16,
        ).alias("pid"),
        "event_type",
        scaled_long("value").alias("cents"),
    )
    agg = p.groupBy("pid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.sum("cents").alias("cents"),
    )
    return agg.agg(
        F.count(F.lit(1)).alias("n_pseudonyms"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.max("n_events").cast("bigint").alias("max_events_per_id"),
        (F.sum("cents").cast("double") / 100.0).alias("total_value"),
        F.count(F.when(F.col("n_types") >= 3, 1))
        .cast("bigint")
        .alias("ids_with_3plus_types"),
    )
