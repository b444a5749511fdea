"""Event-stream analytics, batch side (SURVEY.md §2B): tumbling and
sliding time windows, gap-based sessionization, daily-active rollups with
pivot. The streaming duals live in queries/streaming_batch.py; these batch
forms are their replay-equivalence oracles.

Scale: time-window aggs group on (bucket, type) — bounded cardinality, so
partial aggregation collapses each partition before the shuffle. The
sessionization is one shuffle on user_id + two window passes (lag, cumsum)
— the standard island-detection plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.exact import dec, long_sum, round4, scaled_long
from ..session import prep
from . import register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def timed(spark: SparkSession, sf_dir: str, *, user: bool = False,
          valued: bool = False) -> DataFrame:
    """The event-TIME domain: rows that HAVE an event time — and a user
    key / a value where the operator is user-keyed / value-measured.

    Real pipelines carry NULL timestamps (a parser miss, a late
    backfill); an event-time operator is DEFINED over timestamped rows,
    so the domain restriction must be EXPLICIT in both spellings rather
    than an accident of engine behavior: Spark's F.window silently
    drops NULL event times while DuckDB's time_bucket groups them under
    a NULL bucket, window ORDER BY ts puts NULLs at opposite ends in
    the two engines (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST), and
    a NULL reaching pandas becomes NaT/NaN with its own comparison
    rules. (Round-7 null-flood sweep; every oracle carries the matching
    WHERE clause.)
    """
    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    if user:
        ev = ev.where(F.col("user_id").isNotNull())
    if valued:
        ev = ev.where(F.col("value").isNotNull())
    return ev


@register(
    "events_tumbling_hourly",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
""",
    tags=("events", "window-time"),
    bench=True,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via F.window (the streaming-compatible
    grouping); window.start equals date_trunc('hour') for aligned windows.

    total_value sums on the scaled-long fast path (events.value is
    exactly 2-decimal — verified max |x*100 - round(x*100)| < 4e-12 on
    the driver data): same value as the decimal sum, and the aggregate
    stays inside whole-stage codegen (the decimal Sum buffer was ~70% of
    this query's CPU at the 300x floor probe; functions/exact.py
    documents the overflow bound and the sf threshold for switching
    back)."""
    prep(spark)
    ev = timed(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            long_sum(F.sum(scaled_long("value")), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@register(
    "events_sliding_windows",
    oracle="""
SELECT time_bucket(INTERVAL 15 minutes, ts) - k.k * INTERVAL 15 minutes AS window_start,
       COUNT(*) AS n_events
FROM events, (SELECT unnest(generate_series(0, 3)) AS k) k
WHERE ts IS NOT NULL
GROUP BY 1
""",
    tags=("events", "window-time"),
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour length, 15-minute slide — each event lands
    in 4 overlapping windows (oracle replays the window arithmetic with a
    generate_series cross join)."""
    prep(spark)
    ev = timed(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


@register(
    "events_sessionize",
    oracle="""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 minutes OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new,
         event_id
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
sessions AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM marked
)
SELECT user_id, session_seq, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_seq
""",
    tags=("events", "sessionize", "window"),
    bench=True,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (gap > 30 min starts a new session):
    lag -> new-session flag -> running sum -> per-session aggregate. The
    batch dual of streaming session_window (stream_session_window)."""
    prep(spark)
    ev = timed(spark, sf_dir, user=True)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        # unix_micros (not a seconds cast): the gap comparison must see the
        # same microsecond precision the oracle's INTERVAL comparison does.
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sessions = marked.select(
        "user_id",
        "ts",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "events_daily_pivot",
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       COUNT(DISTINCT user_id) AS active_users,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS view
FROM events
WHERE ts IS NOT NULL
GROUP BY 1
""",
    tags=("events", "pivot", "agg"),
)
def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives + per-type counts pivoted to columns (explicit value
    list keeps the schema deterministic — never let pivot discover values
    at 100 TB)."""
    prep(spark)
    ev = timed(spark, sf_dir).withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    counts = (
        ev.groupBy("day")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )
    actives = ev.groupBy("day").agg(F.countDistinct("user_id").alias("active_users"))
    return actives.join(counts, "day").select(
        "day", "active_users", *[F.col(t).cast("bigint").alias(t) for t in EVENT_TYPES]
    )


@register(
    "events_funnel",
    oracle="""
WITH v AS (SELECT user_id, MIN(ts) AS first_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS first_click FROM events e
      JOIN v ON e.user_id = v.user_id AND e.ts > v.first_view
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS first_purchase FROM events e
      JOIN c ON e.user_id = c.user_id AND e.ts > c.first_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT 1 AS stage, 'view' AS name, (SELECT COUNT(*) FROM v) AS n_users
UNION ALL SELECT 2, 'view>click', (SELECT COUNT(*) FROM c)
UNION ALL SELECT 3, 'view>click>purchase', (SELECT COUNT(*) FROM p)
""",
    tags=("events", "funnel", "join", "agg", "setops"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked after
    their first view, then purchased after that click — each stage counted.

    Scale: each stage is one (filtered) scan aggregated by user_id, joined
    to the previous stage's (shrinking) user set — at 100 TB the stage
    tables are tiny relative to events, so AQE broadcasts them and the
    event scans dominate; the per-type filter prunes at the parquet scan.
    """
    prep(spark)
    ev = table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    stage = lambda n, name, df: df.agg(  # noqa: E731
        F.lit(n).alias("stage"), F.lit(name).alias("name"), F.count(F.lit(1)).alias("n_users")
    ).select("stage", "name", "n_users")
    return (
        stage(1, "view", v)
        .unionByName(stage(2, "view>click", c))
        .unionByName(stage(3, "view>click>purchase", p))
    )


@register(
    "events_gapfill_locf",
    oracle="""
WITH ev AS (SELECT * FROM events WHERE user_id < 50),
b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM ev GROUP BY user_id),
spine AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b),
ranked AS (SELECT user_id, date_trunc('hour', ts) AS hour, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM ev),
hourly AS (SELECT user_id, hour, MAX(rn) AS n, MAX(CASE WHEN rn = 1 THEN value END) AS last_v
           FROM ranked GROUP BY user_id, hour)
SELECT s.user_id, s.hour, COALESCE(h.n, 0) AS n_events,
       last_value(h.last_v IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.hour
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
""",
    tags=("events", "timeseries", "gapfill", "resample"),
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill (LOCF): densify each user's event
    history to a complete hourly spine (sequence + explode — the
    generate_series Spark spells natively) and carry the last observation
    forward across empty hours with last(ignorenulls) over an ordered
    window. The "sensor reading at every tick" shape (the reference's
    fleet uptime counters are exactly this: beacons arrive irregularly,
    liveness dashboards want a dense grid).

    Determinism: the per-hour representative value is picked by a full
    (ts DESC, event_id DESC) ranking — never arg_max on a tied key.
    Scale: the spine explodes ~hours-per-user rows (bounded by time
    range, not events); both the rank and the LOCF window partition by
    user_id — one shuffle, no global window. Values pass through
    untouched (no float arithmetic), so the hash is exact."""
    prep(spark)
    ev = table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    hour = F.date_trunc("hour", F.col("ts"))
    spine = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id", "hour").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
    )
    hourly = (
        ev.select("user_id", hour.alias("hour"), "ts", "event_id", "value")
        .withColumn("rn", rn)
        .groupBy("user_id", "hour")
        .agg(
            F.max("rn").alias("n"),
            F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("last_v"),
        )
    )
    locf = Window.partitionBy("user_id").orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("last_v", ignorenulls=True).over(locf).alias("locf_value"),
        )
    )


@register(
    "events_cohort_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
),
cohort_size AS (
  SELECT cohort_week, COUNT(*) AS n_cohort FROM first_seen GROUP BY cohort_week
)
SELECT f.cohort_week,
       CAST((date_part('epoch', a.week) - date_part('epoch', f.cohort_week)) / 604800 AS INT) AS week_offset,
       COUNT(*) AS n_active,
       CAST(COUNT(*) AS DOUBLE) / s.n_cohort AS retention
FROM first_seen f
JOIN activity a USING (user_id)
JOIN cohort_size s ON f.cohort_week = s.cohort_week
GROUP BY f.cohort_week, week_offset, s.n_cohort
""",
    tags=("events", "cohort", "retention", "agg"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users
    bucketed by first-seen week, then for each (cohort, weeks-since)
    cell the count and share of the cohort still active. The week
    offset is computed as an exact epoch difference of week-truncated
    timestamps (both engines truncate to Monday), and the retention
    share is a single double division — both hash-exact.

    Scale: first_seen and activity are two aggregations over the same
    user_id shuffle; the matrix itself is tiny (weeks x offsets). At
    100 TB the DISTINCT (user, week) pre-aggregation is the load-bearing
    step — it collapses the fact table before any join."""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort_size = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    offset = (
        (F.unix_timestamp("week") - F.unix_timestamp("cohort_week")) / 604800
    ).cast("int")
    return (
        first_seen.join(activity, "user_id")
        .join(F.broadcast(cohort_size), "cohort_week")
        .groupBy("cohort_week", offset.alias("week_offset"), "n_cohort")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            (F.col("n_active").cast("double") / F.col("n_cohort")).alias("retention"),
        )
    )


@register(
    "events_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
FROM pairs
""",
    tags=("events", "sequence", "markov"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | previous), the sequential-pattern
    primitive behind next-action prediction and anomaly scoring
    (a beacon fleet's analog: which command habitually follows which).

    Shape: ONE shuffle on user_id for the ordered lag window (the same
    partitioning sessionization uses), then a tiny (|types|^2) hash agg
    and a broadcast-scale normalization window. Per-user ordering is
    (ts, event_id) so concurrent events sequence deterministically."""
    prep(spark)
    from pyspark.sql import Window

    ev = timed(spark, sf_dir, user=True)
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("prev_type"),
    )
    pairs = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(norm), 6).alias("p"),
    )


@register(
    "events_chi_square",
    oracle="""
WITH obs AS (
  SELECT event_type, CAST(floor(hour(ts) / 6.0) AS INT) AS day_quarter, COUNT(*) AS n
  FROM events GROUP BY event_type, day_quarter
),
tot AS (SELECT SUM(n) AS total FROM obs),
marg_r AS (SELECT event_type, SUM(n) AS row_n FROM obs GROUP BY event_type),
marg_c AS (SELECT day_quarter, SUM(n) AS col_n FROM obs GROUP BY day_quarter),
cells AS (
  SELECT o.event_type, o.day_quarter, o.n,
         CAST(r.row_n AS DOUBLE) * c.col_n / t.total AS expected
  FROM obs o
  JOIN marg_r r USING (event_type)
  JOIN marg_c c USING (day_quarter)
  CROSS JOIN tot t
)
SELECT event_type,
       CAST(COUNT(*) AS INT) AS n_cells,
       ROUND(SUM((n - expected) * (n - expected) / expected), 6) AS chi2_part
FROM cells
GROUP BY event_type
""",
    tags=("events", "stats", "chi-square"),
)
def events_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic of event type vs time-of-day
    quarter, decomposed per event type — the contingency-table
    hypothesis-test primitive (is behavior time-uniform?), computed as
    pure relational algebra: observed cell counts, broadcast marginals,
    expected = row*col/total, then sum((O-E)^2/E).

    Scale: ONE aggregation over the fact table produces the |types| x 4
    contingency table; every subsequent join is on that tiny aggregate
    (broadcast), so the statistic costs a single shuffle regardless of
    corpus size — the same store-marginals shape any drift monitor
    ships. Per-type partial sums round to 1e-6 on both engines."""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type",
        F.floor(F.hour("ts") / 6.0).cast("int").alias("day_quarter"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    marg_r = obs.groupBy("event_type").agg(F.sum("n").alias("row_n"))
    marg_c = obs.groupBy("day_quarter").agg(F.sum("n").alias("col_n"))
    cells = (
        obs.join(F.broadcast(marg_r), "event_type")
        .join(F.broadcast(marg_c), "day_quarter")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n",
            (F.col("row_n").cast("double") * F.col("col_n") / F.col("total")).alias(
                "expected"
            ),
        )
    )
    return cells.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("int").alias("n_cells"),
        F.round(
            F.sum(
                (F.col("n") - F.col("expected"))
                * (F.col("n") - F.col("expected"))
                / F.col("expected")
            ),
            6,
        ).alias("chi2_part"),
    )


@register(
    "events_cdc_apply",
    oracle="""
WITH log AS (
  SELECT user_id AS key, ts, event_id,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
         event_type, value
  FROM events
),
latest AS (
  SELECT key, op, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY key) AS n_ops
  FROM log
)
SELECT key, event_type AS last_type, ROUND(value, 6) AS last_value,
       CAST(n_ops AS BIGINT) AS n_ops
FROM latest
WHERE rn = 1 AND op = 'upsert'
""",
    tags=("events", "cdc", "upsert"),
)
def events_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log materialization: apply an ordered change log
    (last-writer-wins upserts + delete tombstones) to produce current
    state per key — the batch dual of the foreachBatch streaming upsert
    sink (stream_upsert_sink), and the core of any snapshot-from-log
    table format. Here the events stream plays the log: 'error' rows
    are tombstones; the latest op per user decides existence and value.

    Shape: one shuffle on the key for the (ts, event_id)-ordered window;
    rn = 1 keeps the final op, tombstoned keys drop. At 100 TB this runs
    per partition-of-keys with no global coordination, and incremental
    compaction = the same query over (previous snapshot UNION new log
    segment) — snapshot rows entering as older-than-log upserts."""
    prep(spark)
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    log = ev.select(
        F.col("user_id").alias("key"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("upsert")
        .alias("op"),
        "event_type",
        "value",
    )
    w = Window.partitionBy("key").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = log.select(
        "key",
        "op",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("key")).alias("n_ops"),
    )
    return (
        latest.where((F.col("rn") == 1) & (F.col("op") == "upsert"))
        .select(
            "key",
            F.col("event_type").alias("last_type"),
            F.round("value", 6).alias("last_value"),
            F.col("n_ops").cast("bigint").alias("n_ops"),
        )
    )


@register(
    "events_session_paths",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM seq
),
paths AS (
  SELECT user_id, sess_id,
         array_to_string(list(event_type ORDER BY ts, event_id), '>') AS path
  FROM sess GROUP BY user_id, sess_id
)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 10
""",
    tags=("events", "sessionize", "paths"),
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session paths: sessionize (30-minute inactivity gap, the
    same lag->flag->cumsum shape as events_sessionize), concatenate
    each session's ordered event types into a path string, and count
    the most common journeys — clickstream path analysis (the fleet
    dual: which command sequences recur within a beacon session).

    Shape: ONE shuffle on user_id serves both windows; paths collapse
    per (user, session) via a sorted struct collect (deterministic
    order by (ts, event_id)); the path histogram is a tiny second agg
    finished by a bounded top-k."""
    prep(spark)
    from pyspark.sql import Window

    ev = timed(spark, sf_dir, user=True).where(
        F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    seq = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_sess"),
    )
    sess = seq.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    paths = sess.groupBy("user_id", "sess_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(10)
    )


@register(
    "events_ohlc",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) AS n,
       ROUND(first(value ORDER BY ts, event_id), 6) AS open,
       ROUND(MAX(value), 6) AS high,
       ROUND(MIN(value), 6) AS low,
       ROUND(last(value ORDER BY ts, event_id), 6) AS close
FROM events
WHERE event_type = 'purchase' AND ts IS NOT NULL AND value IS NOT NULL
GROUP BY day
""",
    tags=("events", "timeseries", "ohlc"),
)
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (candlesticks): per-day open/high/low/close of
    the purchase value stream via min_by/max_by over a total event
    order — the canonical time-series bar aggregation, as ONE hash
    aggregate (no window, no sort of the raw stream).

    The open/close ride min_by/max_by on a collision-free composite
    order key (epoch-micros * 2^20 + event_id, exact in int64), so
    'first by time' is deterministic even for same-microsecond events —
    the same total-order discipline every LIMIT in this repo carries.
    Scale: partial min/max/min_by/max_by merge associatively; one
    shuffle on the day bucket."""
    prep(spark)
    ev = timed(spark, sf_dir, valued=True).where(
        F.col("event_type") == "purchase"
    )
    # exact int64 composite order key: (micros since 2020) * 2^14 +
    # event_id mod 2^14 — fits int64 for ~17 millennia of micros while
    # still breaking same-microsecond ties deterministically.
    rel = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lit("2020-01-01 00:00:00").cast("timestamp")
    )
    okey = rel * F.lit(16384) + F.col("event_id") % F.lit(16384)
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min_by("value", okey), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", okey), 6).alias("close"),
        )
    )


@register(
    "events_twap",
    oracle="""
WITH seq AS (
  SELECT event_type, value,
         epoch(LEAD(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id))
           - epoch(ts) AS held_s
  FROM events
)
SELECT event_type,
       COUNT(held_s) AS n_intervals,
       ROUND(SUM(value * held_s) / SUM(held_s), 6) AS twap,
       ROUND(AVG(value), 6) AS naive_avg
FROM seq WHERE held_s IS NOT NULL
GROUP BY event_type
""",
    tags=("events", "timeseries", "twap"),
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) over irregular samples: each value
    holds until the next sample (LOCF weighting via lead), so sparse
    periods don't get diluted by dense ones — shown against the naive
    row-average it corrects. The irregular-time-series dual of the
    gap-fill entry.

    Shape: one shuffle on the series key for the lead window, then a
    plain weighted-sum aggregate; weights are microsecond-exact
    fractional seconds computed identically by both engines, and the
    1e-6 rounding on the final ratio absorbs summation-order drift."""
    prep(spark)
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    held = (
        F.lead(F.col("ts").cast("double")).over(w) - F.col("ts").cast("double")
    )
    seq = ev.select("event_type", "value", held.alias("held_s")).where(
        F.col("held_s").isNotNull()
    )
    return seq.groupBy("event_type").agg(
        F.count("held_s").alias("n_intervals"),
        # try_divide: a series whose samples all share one timestamp has
        # zero total holding time — no time-weighted average exists, and
        # DuckDB's SUM/SUM quietly says NULL where Spark's '/' ABORTS
        # under ANSI (all-ties corpus finding, round 7). Identity
        # whenever any interval has positive duration.
        F.round(
            F.try_divide(
                F.sum(F.col("value") * F.col("held_s")), F.sum("held_s")
            ),
            6,
        ).alias("twap"),
        F.round(F.avg("value"), 6).alias("naive_avg"),
    )


@register(
    "events_ewma",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dn,
         ROUND(SUM(value), 6) AS revenue
  FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY day, dn
)
SELECT day, revenue,
       ROUND(
         SUM(revenue * POWER(0.8, -dn)) OVER (ORDER BY dn
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         / SUM(POWER(0.8, -dn)) OVER (ORDER BY dn
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS ewma
FROM daily
""",
    tags=("events", "timeseries", "ewma"),
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha decay 0.8/day) of
    daily purchase revenue — the trend-smoothing primitive — computed
    WITHOUT recursion: ewma_d = sum(v_i * a^(d-i)) / sum(a^(d-i))
    factorizes into two running sums of v_i * a^(-i) and a^(-i), so a
    sequential-looking statistic becomes two ordinary window frames.

    Numeric honesty: a^(-i) grows with series length (0.8^-31 ~ 1000 at
    a month — fine; ~1e10 at 100 days), so the production form resets
    the factorization per bounded epoch (or carries log-domain sums);
    both engines compute the identical expression here and the 1e-6
    rounding absorbs pow's last-ulp variance."""
    prep(spark)
    from pyspark.sql import Window

    ev = timed(spark, sf_dir, valued=True).where(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "dn"
        ),
    ).agg(F.round(F.sum("value"), 6).alias("revenue"))
    w = (
        Window.partitionBy(F.col("dn") * 0)
        .orderBy("dn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    inv = F.pow(F.lit(0.8), -F.col("dn"))
    return daily.select(
        "day",
        "revenue",
        F.round(
            F.sum(F.col("revenue") * inv).over(w) / F.sum(inv).over(w), 6
        ).alias("ewma"),
    )


@register(
    "events_autocorr",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
  FROM events GROUP BY 1
),
-- calendar-lag (d - k days), NOT positional lag(): matches the Spark
-- date-shift self-join so a sparse draw with a missing date yields the
-- same pairs on both engines.
lagged AS (
  SELECT k.k AS lag_days, d.total, pd.total AS prev
  FROM daily d CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS k) k
  LEFT JOIN daily pd ON pd.d = d.d - CAST(k.k AS INT)
)
SELECT CAST(lag_days AS INT) AS lag_days,
       CAST(COUNT(prev) AS BIGINT) AS n_pairs,
       ROUND(covar_samp(total, prev)
             / NULLIF(stddev_samp(total) * stddev_samp(prev), 0), 6)
         AS autocorr
FROM lagged
GROUP BY lag_days
""",
    tags=("events", "time-series", "autocorrelation"),
)
def events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (k = 1..7) of the daily event-value series:
    the seasonality screen a time-series audit runs before choosing a
    forecast window — a spike at lag 7 says weekly cycle, slow decay
    says trend. Daily totals ride the exact decimal sum so the series
    itself is bit-identical across engines; the Pearson correlation over
    <=30 points is then rounded to 1e-6.

    Plan shape: the fact scan reduces to one row per day (map-side
    partial, one shuffle); the 7-lag fan-out and correlation run on that
    tiny series — at 100 TB the expensive part stays the single daily
    rollup, and the per-lag windows partition on lag_days so the series
    is never processed on one task per lag sequentially."""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        long_sum(F.sum(scaled_long("value")), 2).alias("total")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag_days"))
    # lag(total, k) needs a literal offset per k in Spark, so the k-step
    # lag is a date self-join instead (d - lag_days = d_prev), which also
    # keeps all 7 lags in one shuffle-free pass over the tiny series.
    lagged = daily.crossJoin(F.broadcast(lags)).join(
        daily.select(F.col("d").alias("d_prev"), F.col("total").alias("prev")),
        F.expr("date_sub(d, lag_days) = d_prev"),
        "left",
    )
    return (
        lagged.groupBy("lag_days")
        .agg(
            F.count("prev").cast("bigint").alias("n_pairs"),
            # try_divide'd covar/sd*sd, not built-in corr: under ANSI
            # mode corr's final division raises on a zero-variance lag
            # pairing (a sparse draw) where DuckDB returns NULL — same
            # guard as events_cross_correlation.
            F.round(
                F.try_divide(
                    F.covar_samp("total", "prev"),
                    F.stddev_samp("total") * F.stddev_samp("prev"),
                ),
                6,
            ).alias("autocorr"),
        )
    )


@register(
    "events_anomaly_zscore",
    oracle="""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
roll AS (
  SELECT d, total,
         COUNT(*) OVER w AS n_window,
         AVG(total) OVER w AS mu,
         STDDEV_SAMP(total) OVER w AS sigma
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT d, total,
       CAST(n_window AS INT) AS n_window,
       ROUND(mu, 6) AS baseline_mean,
       ROUND((total - mu) / sigma, 6) AS z_score,
       CASE WHEN ABS((total - mu) / sigma) > 2 THEN TRUE ELSE FALSE END
         AS is_anomaly
FROM roll WHERE n_window >= 3
""",
    tags=("events", "time-series", "anomaly"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly screen on the daily event-value series:
    each day scored against the trailing 7-day window EXCLUDING itself
    (a self-inclusive window drags the baseline toward the anomaly it is
    supposed to flag), |z| > 2 marked — the first-line data-quality
    tripwire a corpus ingestion pipeline runs per partition-day before
    accepting a drop.

    The fact scan reduces to one row per day (exact decimal totals);
    the trailing-frame window then runs over the tiny series. At fleet
    scale the same plan partitions by (source, day) and the window rides
    within source."""
    prep(spark)
    ev = timed(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d")
    ).agg(long_sum(F.sum(scaled_long("value")), 2).alias("total"))
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("d")
        .rowsBetween(-7, -1)
    )
    roll = daily.select(
        "d",
        "total",
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.avg("total").over(w).alias("mu"),
        F.stddev_samp("total").over(w).alias("sigma"),
    )
    # try_divide: a flat trailing window (sigma == 0, e.g. constant
    # values with equal daily counts) must yield NULL z like DuckDB's
    # NULL-division, and the anomaly flag then mirrors the oracle's
    # CASE (NULL -> FALSE) via coalesce — not an ANSI exception.
    z = F.try_divide(F.col("total") - F.col("mu"), F.col("sigma"))
    return roll.where(F.col("n_window") >= 3).select(
        "d",
        "total",
        F.col("n_window").cast("int").alias("n_window"),
        F.round("mu", 6).alias("baseline_mean"),
        F.round(z, 6).alias("z_score"),
        F.coalesce(F.abs(z) > 2, F.lit(False)).alias("is_anomaly"),
    )


@register(
    "events_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
m AS (SELECT ROUND(CAST(ROUND(SUM(CAST(total AS DECIMAL(38,6))), 4) AS DOUBLE)
             / COUNT(*), 6) AS mu FROM daily),
dev AS (
  SELECT d, total, ROUND(total - m.mu, 6) AS dev,
         SUM(ROUND(total - m.mu, 6)) OVER (ORDER BY d) AS cusum
  FROM daily, m
),
ext AS (
  SELECT MAX(cusum) AS mx, MIN(cusum) AS mn FROM dev
)
SELECT d, total, ROUND(dev, 6) AS dev, ROUND(cusum, 6) AS cusum,
       CASE WHEN cusum = ext.mx OR cusum = ext.mn THEN TRUE ELSE FALSE END
         AS is_extreme
FROM dev, ext
""",
    tags=("events", "time-series", "changepoint"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point screen on the daily series: cumulative sum of
    mean deviations — a sustained level shift bends the cusum path, and
    its extremes locate the most likely change points (the
    bootstrap-free core of change-point detection, run before alerting
    or segmenting a metric). Deviations round to 1e-6 BEFORE the
    cumulative sum so both engines accumulate identical doubles in the
    same (date) order — the running sum is then deterministic, not just
    tolerant.

    Shape: fact -> one daily rollup (exact decimal), then windows over
    the 30-row series; at fleet scale partition by (source) and the
    cusum rides within each."""
    prep(spark)
    daily = (
        timed(spark, sf_dir)
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d"))
        .agg(long_sum(F.sum(scaled_long("value")), 2).alias("total"))
    )
    # mu's numerator is an EXACT decimal sum, not F.avg: totals are
    # 2-decimal exact but a distributed double average's partition
    # order adds ~ULP noise per merge, and at extreme magnitudes
    # (1e9-scale days) that noise crosses the 1e-6 rounding quantum —
    # observed as a FLAKY is_extreme flip (1-in-3 runs) on the extremes
    # corpus; the exact numerator + one division is order-free.
    # round4 BEFORE the double cast (lossless: totals are 2-decimal
    # exact) so the unscaled value stays inside 2^53 — a bare
    # decimal(38,6)->double cast re-rounds per engine once the daily
    # grand total passes ~9e9, the exact divergence round4 exists for.
    mu = daily.agg(
        F.round(
            F.round(F.sum(F.col("total").cast("decimal(38,6)")), 4)
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mu")
    )
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dev = (
        daily.crossJoin(F.broadcast(mu))
        .withColumn("dev", F.round(F.col("total") - F.col("mu"), 6))
        .withColumn("cusum", F.sum("dev").over(w))
    )
    ext = dev.agg(F.max("cusum").alias("mx"), F.min("cusum").alias("mn"))
    return dev.crossJoin(F.broadcast(ext)).select(
        "d",
        "total",
        F.round("dev", 6).alias("dev"),
        F.round("cusum", 6).alias("cusum"),
        ((F.col("cusum") == F.col("mx")) | (F.col("cusum") == F.col("mn"))).alias(
            "is_extreme"
        ),
    )


@register(
    "events_gapfill_lerp",
    oracle="""
WITH ev AS (SELECT * FROM events WHERE user_id < 50),
b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM ev GROUP BY user_id),
spine AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b),
ranked AS (SELECT user_id, date_trunc('hour', ts) AS hour, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM ev),
hourly AS (SELECT user_id, hour, MAX(CASE WHEN rn = 1 THEN value END) AS v
           FROM ranked GROUP BY user_id, hour),
j AS (
  SELECT s.user_id, s.hour, h.v,
         last_value(h.v IGNORE NULLS) OVER w_prev AS pv,
         last_value(CASE WHEN h.v IS NOT NULL THEN s.hour END IGNORE NULLS)
           OVER w_prev AS ph,
         first_value(h.v IGNORE NULLS) OVER w_next AS nv,
         first_value(CASE WHEN h.v IS NOT NULL THEN s.hour END IGNORE NULLS)
           OVER w_next AS nh
  FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
  WINDOW w_prev AS (PARTITION BY s.user_id ORDER BY s.hour
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_next AS (PARTITION BY s.user_id ORDER BY s.hour
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, hour,
       CASE
         WHEN v IS NOT NULL THEN v
         WHEN pv IS NOT NULL AND nv IS NOT NULL AND ph <> nh THEN
           ((CAST(ROUND(pv * 100, 0) AS BIGINT)
               * CAST(date_part('epoch', nh) - date_part('epoch', ph) AS BIGINT)
             + (CAST(ROUND(nv * 100, 0) AS BIGINT)
                - CAST(ROUND(pv * 100, 0) AS BIGINT))
               * CAST(date_part('epoch', hour) - date_part('epoch', ph) AS BIGINT))
            * 1000000
            + (CAST(date_part('epoch', nh) - date_part('epoch', ph) AS BIGINT) * 100)
              // 2)
           // (CAST(date_part('epoch', nh) - date_part('epoch', ph) AS BIGINT) * 100)
           / 1000000.0
         WHEN pv IS NOT NULL THEN pv
         ELSE nv END AS lerp_value,
       (v IS NULL) AS was_gap
FROM j
""",
    tags=("events", "timeseries", "gapfill", "resample"),
)
def events_gapfill_lerp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill by LINEAR interpolation (the numeric dual of the LOCF
    fill): each missing hour takes the time-weighted blend of its
    flanking observed values — the resampling rule for continuous
    metrics (rates, temperatures) where carrying the last observation
    forward biases the series. Edges fall back to the nearest known
    value (one-sided extrapolation hold).

    Shape: identical spine join as LOCF, then two IGNORE NULLS windows
    per user (previous and next known value + their hours) and one
    closed-form blend — no self-join, no explode of gap runs. Rounds to
    1e-6; the blend is O(1) arithmetic on identically-derived inputs."""
    prep(spark)
    ev = table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    b = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = b.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour"),
    )
    wr = Window.partitionBy("user_id", F.date_trunc("hour", "ts")).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    hourly = (
        ev.withColumn("rn", F.row_number().over(wr))
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("v"))
    )
    j = spine.join(hourly, ["user_id", "hour"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    j = (
        j.withColumn("pv", F.last("v", ignorenulls=True).over(w_prev))
        .withColumn("ph", F.last(known_hour, ignorenulls=True).over(w_prev))
        .withColumn("nv", F.first("v", ignorenulls=True).over(w_next))
        .withColumn("nh", F.first(known_hour, ignorenulls=True).over(w_next))
    )
    # The blend AND its 1e-6 rounding run entirely on exact integers
    # (cent-scaled values x whole-second offsets; half-up = +den/2 before
    # the floor-div), with one final divide by 1e6 whose result is an
    # exactly-representable double. A float blend measured a half-ulp
    # apart at the rounding boundary (x.xxxxxx5 rounds differently on
    # doubles across engines); integers cannot drift.
    micro = F.expr(
        "((CAST(ROUND(pv * 100, 0) AS BIGINT) * (unix_timestamp(nh) - unix_timestamp(ph))"
        " + (CAST(ROUND(nv * 100, 0) AS BIGINT) - CAST(ROUND(pv * 100, 0) AS BIGINT))"
        "   * (unix_timestamp(hour) - unix_timestamp(ph))) * 1000000"
        " + ((unix_timestamp(nh) - unix_timestamp(ph)) * 100) DIV 2)"
        " DIV ((unix_timestamp(nh) - unix_timestamp(ph)) * 100)"
    )
    lerp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("ph") != F.col("nh")),
            micro / 1_000_000.0,
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return j.select(
        "user_id",
        "hour",
        F.round(lerp, 6).alias("lerp_value"),
        F.col("v").isNull().alias("was_gap"),
    )


@register(
    "events_interval_union",
    oracle="""
WITH iv AS (
  SELECT user_id, ts AS s, ts + INTERVAL 10 MINUTE AS e
  FROM events WHERE user_id < 50 AND ts IS NOT NULL
),
marked AS (
  SELECT user_id, s, e,
         CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              OR MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
),
merged AS (
  SELECT user_id, island, MIN(s) AS island_s, MAX(e) AS island_e
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(epoch_us(island_e) - epoch_us(island_s)) AS BIGINT)
         AS covered_us,
       CAST(MAX(epoch_us(island_e) - epoch_us(island_s)) AS BIGINT)
         AS longest_us
FROM merged GROUP BY user_id
""",
    tags=("events", "interval", "islands", "coverage"),
)
def events_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage: each event opens a 10-minute activity
    interval; overlapping intervals merge into islands and the per-user
    total covered time, island count, and longest stretch come out —
    the utilization/uptime computation (how long was each machine
    actually busy) that naive SUM(duration) double-counts whenever
    intervals overlap.

    The islands idiom at scale: one shuffle on user_id, a running-MAX
    window closes an island exactly when the next start clears every
    prior end, a cumulative sum numbers the islands, and two grouped
    aggregates finish — no self-join, no interval explosion. Durations
    are whole-microsecond integers (second-granularity epochs truncate
    vs round differently across engines — measured as an off-by-one)."""
    prep(spark)
    iv = (
        timed(spark, sf_dir)
        .where(F.col("user_id") < 50)
        .select(
            "user_id",
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("interval 10 minutes")).alias("e"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    )
    islands = marked.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("island_s"), F.max("e").alias("island_e")
    )
    dur = F.unix_micros("island_e") - F.unix_micros("island_s")
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum(dur).cast("bigint").alias("covered_us"),
        F.max(dur).cast("bigint").alias("longest_us"),
    )


@register(
    "events_stickiness",
    oracle="""
WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
wau AS (
  SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
  FROM days d JOIN du u
    ON u.day > d.day - INTERVAL 7 DAY AND u.day <= d.day
  GROUP BY d.day
)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       CAST(a.dau AS BIGINT) AS dau,
       CAST(w.wau AS BIGINT) AS wau,
       ROUND(a.dau / CAST(w.wau AS DOUBLE), 6) AS stickiness
FROM days d JOIN dau a ON a.day = d.day JOIN wau w ON w.day = d.day
""",
    tags=("events", "engagement", "distinct", "window-time"),
)
def events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day: daily actives over trailing-7-day
    actives — the engagement ratio every product/fleet dashboard leads
    with (for the reference's fleet: beacons seen today / this week).

    Shape: the corpus collapses ONCE to distinct (day, user) pairs;
    DAU is a count over that set and WAU joins each day against its
    trailing window of the SAME set — the quadratic term is bounded by
    (days x day-sets), never raw events. The trailing-distinct union
    runs through the banded join, not a 7-day window re-scan of the
    fact table."""
    prep(spark)
    du = (
        table(spark, sf_dir, "events")
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    u = du.select(F.col("day").alias("uday"), "user_id")
    wau = (
        days.join(
            u,
            (F.col("uday") > F.col("day") - F.expr("interval 7 days"))
            & (F.col("uday") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.round(F.col("dau") / F.col("wau").cast("double"), 6).alias(
                "stickiness"
            ),
        )
    )


@register(
    "events_attribution_linear",
    oracle="""
WITH p AS (
  SELECT event_id AS pid, user_id, ts AS pts, value
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT event_id AS vid, user_id, ts AS vts
  FROM events WHERE event_type = 'view'
),
touch AS (
  SELECT p.pid, p.value, v.vid, v.vts
  FROM p JOIN v ON v.user_id = p.user_id
   AND v.vts < p.pts AND v.vts >= p.pts - INTERVAL 1 HOUR
),
credit AS (
  SELECT strftime(date_trunc('day', vts), '%Y-%m-%d') AS day,
         CAST(ROUND(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))
              / COUNT(*) OVER (PARTITION BY pid), 6) AS DOUBLE) AS share
  FROM touch
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(ROUND(SUM(CAST(share AS DECIMAL(18,6))), 6) AS DOUBLE)
         AS credited_value
FROM credit GROUP BY day
""",
    tags=("events", "attribution", "join", "interval"),
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value splits
    equally across the user's views in the preceding hour, credited to
    the DAY OF THE TOUCH — the model marketing/engagement reporting uses
    when last-touch (join_asof_prior_spend's shape) over-credits the
    final click. Rollup is credited value per day.

    Determinism: per-purchase share = exact decimal value / touch count
    rounded to 1e-6, then summed AS DECIMAL so the day rollup is
    order-independent; the interval join is the bucketizable band shape
    (same as the stream-stream attribution dual)."""
    prep(spark)
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        "value",
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    touch = p.join(
        v,
        (F.col("vu") == F.col("pu"))
        & (F.col("vts") < F.col("pts"))
        & (F.col("vts") >= F.col("pts") - F.expr("interval 1 hour")),
    )
    n_touch = Window.partitionBy("pid")
    credit = touch.select(
        F.date_format(F.date_trunc("day", "vts"), "yyyy-MM-dd").alias("day"),
        F.round(
            F.col("value").cast("decimal(18,4)") / F.count(F.lit(1)).over(n_touch),
            6,
        )
        .cast("double")
        .alias("share"),
    )
    return credit.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.round(F.sum(F.col("share").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("credited_value"),
    )


@register(
    "events_session_dynamic_gap",
    oracle="""
WITH iv AS (
  SELECT user_id, ts,
         ts + CASE WHEN event_type = 'error' THEN INTERVAL 5 MINUTE
                   ELSE INTERVAL 30 MINUTE END AS reach
  FROM events
  WHERE user_id < 80 AND ts IS NOT NULL AND user_id IS NOT NULL
),
marked AS (
  SELECT user_id, ts, reach,
         CASE WHEN MAX(reach) OVER (PARTITION BY user_id ORDER BY ts, reach
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR ts >= MAX(reach) OVER (PARTITION BY user_id ORDER BY ts, reach
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_session
  FROM iv
),
sess AS (
  SELECT user_id, ts, reach,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, reach
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start, MAX(reach) AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
""",
    tags=("events", "sessionize", "session-window", "dynamic-gap"),
)
def events_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a DYNAMIC per-event gap (Spark's
    session_window accepts a gap EXPRESSION): error events hold the
    session open only 5 minutes while everything else holds 30 — the
    semantics for mixed-signal sessions (heartbeats shouldn't extend an
    interactive session the way real actions do). Streaming-compatible:
    the same expression drops into the watermarked streaming form.

    The oracle derives identical sessions first-principles as interval
    islands: each event reaches to ts + gap(event), a session breaks
    exactly when the next event starts at-or-after the running MAX
    reach — mirroring session_window's merge rule (gap-contiguous
    half-open intervals), with session_end = MAX(reach)."""
    prep(spark)
    ev = timed(spark, sf_dir, user=True).where(F.col("user_id") < 80)
    gap = F.when(F.col("event_type") == "error", F.lit("5 minutes")).otherwise(
        F.lit("30 minutes")
    )
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "events_rolling_median",
    oracle="""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
  FROM events WHERE ts IS NOT NULL GROUP BY 1
)
SELECT d, total,
       CAST(COUNT(*) OVER w AS INT) AS n_window,
       ROUND(MEDIAN(total) OVER w, 4) AS rolling_med,
       MIN(total) OVER w AS rolling_min,
       MAX(total) OVER w AS rolling_max
FROM daily
WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    tags=("events", "time-series", "window-frames", "median"),
)
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day EXACT median of the daily event-value series — the
    robust-centerline dual of events_anomaly_zscore's mean/stddev screen
    (one outlier day shifts a trailing mean by sigma/7 but leaves the
    median untouched, so median-based alerting survives the exact spikes
    the z-screen exists to flag).

    Spark has no median window function; over a bounded ROWS frame the
    exact median is a frame-sized expression instead: array_sort over
    collect_list(total) in the frame, middle element (odd) or midpoint
    of the two middles (even). DuckDB's windowed MEDIAN interpolates the
    same midpoint; both sides round to 1e-4 because the two engines
    reach that midpoint by differently-ordered float ops (a+(b-a)/2 vs
    (a+b)/2 differ in the last ulp; daily totals are 2-decimal exact, so
    midpoints are 3-decimal and the 1e-4 round is drift-free).

    Scale: the fact scan reduces to one row per day (exact scaled-long
    totals); the O(frame log frame) sort runs on a 7-element array per
    series row — constant work, no shuffle beyond the rollup. At fleet
    scale partition the window by (source) and the same frame rides
    within each; an unbounded-frame median would instead need the
    percentile_approx sketch (events_ewma's note on frame growth)."""
    prep(spark)
    ev = timed(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d")
    ).agg(long_sum(F.sum(scaled_long("value")), 2).alias("total"))
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("d")
        .rowsBetween(-6, 0)
    )
    frame = F.array_sort(F.collect_list("total").over(w))
    n = F.size(frame)
    mid_hi = F.element_at(frame, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(frame, ((n + 1) / 2).cast("int"))
    return daily.select(
        "d",
        "total",
        # n_window counts frame ROWS (the oracle's COUNT(*) OVER), not
        # collect_list's length: collect_list SKIPS a NULL total (a day
        # whose every measure is out of the money domain), so the two
        # counts diverge on such days (extremes-sweep finding). The
        # median itself IS the NULL-skipping statistic on both engines,
        # so it keeps riding the collected frame — when()-guarded for
        # the all-NULL frame, where element_at(empty, 1) aborts under
        # ANSI and DuckDB's MEDIAN says NULL.
        F.count(F.lit(1)).over(w).cast("int").alias("n_window"),
        F.when(n > 0, F.round((mid_lo + mid_hi) / 2, 4)).alias("rolling_med"),
        F.min("total").over(w).alias("rolling_min"),
        F.max("total").over(w).alias("rolling_max"),
    )


@register(
    "events_rfm_segments",
    oracle="""
WITH anchor AS (SELECT CAST(MAX(ts) AS DATE) AS a FROM events),
base AS (
  SELECT user_id,
         date_diff('day', CAST(MAX(ts) AS DATE), anchor.a) AS recency_days,
         COUNT(*) AS frequency,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS monetary
  FROM events, anchor WHERE event_type = 'purchase'
  GROUP BY user_id, anchor.a
),
scored AS (
  SELECT *,
         NTILE(4) OVER (ORDER BY recency_days, user_id) AS r,
         NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f,
         NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m
  FROM base
)
SELECT user_id, CAST(recency_days AS INT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency, monetary,
       CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
       CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
         AS segment
FROM scored
""",
    tags=("events", "rfm", "segmentation", "ntile"),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation over
    purchase events: per-user days-since-last-purchase against the
    corpus max-date anchor, purchase count, and exact-decimal spend,
    each quartiled by NTILE(4) and concatenated into the classic ' 111 =
    best, 444 = churned' segment code — the canonical marketing-
    analytics rollup and the ntile surface's real-workload counterpart
    to win_distribution's synthetic demo.

    Every NTILE rides a TOTAL order (metric, then user_id) — quartile
    assignment at equal metric values is otherwise engine-arbitrary,
    the same tie-class trap the regen probe caught in approx_top_k.
    The anchor is max(ts) over the data (not wall-clock now()), so the
    result is a pure function of the input.

    Scale: one filtered scan to a per-user aggregate (exact scaled-long
    spend); the three ntile windows run over |users| rows. Global NTILE
    needs a single-partition sort at fleet scale — there, bucket via
    approx quantile cutpoints (percentile_approx on the metric, then a
    broadcast range join), trading exact quartile edges for an
    embarrassingly parallel assignment; the module keeps this exact
    variant because segment AUDITS must be reproducible."""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.to_date("ts")).alias("a"))
    base = (
        ev.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "a")
        .agg(
            F.datediff(F.first("a"), F.max(F.to_date("ts"))).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            long_sum(F.sum(scaled_long("value")), 2).alias("monetary"),
        )
        .drop("a")
    )
    zero = F.lit(1)
    r = F.ntile(4).over(
        Window.partitionBy(zero).orderBy("recency_days", "user_id")
    )
    f = F.ntile(4).over(
        Window.partitionBy(zero).orderBy(F.desc("frequency"), "user_id")
    )
    m = F.ntile(4).over(
        Window.partitionBy(zero).orderBy(F.desc("monetary"), "user_id")
    )
    return base.select(
        "user_id",
        F.col("recency_days").cast("int").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        "monetary",
        r.cast("int").alias("r"),
        f.cast("int").alias("f"),
        m.cast("int").alias("m"),
    ).withColumn(
        "segment",
        F.concat(F.col("r").cast("string"), F.col("f").cast("string"),
                 F.col("m").cast("string")),
    )


@register(
    "events_seasonal_decompose",
    oracle="""
WITH hourly AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h_idx,
         CAST(date_part('hour', ts) AS INT) AS hod,
         SUM(CAST(FLOOR(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END * 100 + 0.5) AS BIGINT)) AS total_c
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
trended AS (
  SELECT h_idx, hod, total_c,
         COUNT(*) OVER w AS n_frame,
         SUM(total_c) OVER w AS frame_c
  FROM hourly
  WINDOW w AS (ORDER BY h_idx ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
detr AS (
  SELECT hod,
         CAST(FLOOR((total_c / 100.0 - frame_c / 2500.0) * 10000 + 0.5)
              AS BIGINT) AS detr_s
  FROM trended WHERE n_frame = 25
)
SELECT CAST(hod AS INT) AS hod,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       ROUND(CAST(SUM(detr_s) AS DOUBLE) / (10000.0 * COUNT(*)), 6)
         AS seasonal,
       ROUND(MIN(detr_s) / 10000.0, 6) AS min_detr,
       ROUND(MAX(detr_s) / 10000.0, 6) AS max_detr
FROM detr GROUP BY hod
""",
    tags=("events", "time-series", "seasonal", "decomposition"),
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition (STL-lite) of the hourly value
    series: trend = centered 25-ROW moving average over the OBSERVED
    hourly grid (full frames only — and note ROWS semantics: hours with
    zero events are absent from the grid, so on sparse data the frame
    spans more than 25 wall-clock hours; densify the spine first — the
    events_gapfill_* job — when that matters),
    detrended = hourly total - trend, seasonal = mean detrended value
    per hour-of-day — the 24-row daily-shape profile that separates
    "traffic peaks at 18:00" from genuine anomalies before any
    alerting/z-scoring runs (the zscore/CUSUM screens' seasonal blind
    spot).

    Cross-engine determinism by integer staging, one step further than
    events_rolling_median: hourly totals ride as exact scaled-long
    cents, the 25-hour frame SUM is integer (order-free), the
    detrended value's true magnitude is a 4-decimal rational whose
    double is within 1e-13 — so floor(x*1e4 + 0.5) recovers the exact
    scaled integer on both engines, and every per-hod aggregate (sum,
    min, max) is again integer arithmetic with ONE final divide.
    Float accumulation order never touches the result.

    Scale: one scan to the hourly grid, one frame window over it (at
    fleet scale, partition by source/series id), one 24-group rollup.
    The same staging extends to additive Holt-Winters once the smoothing
    recursions are epoch-factorized (events_ewma's note)."""
    prep(spark)
    ev = timed(spark, sf_dir)
    hourly = ev.groupBy(
        (F.unix_timestamp(F.date_trunc("hour", "ts")) / 3600)
        .cast("long")
        .alias("h_idx"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.sum(scaled_long("value")).alias("total_c"))
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("h_idx")
        .rowsBetween(-12, 12)
    )
    trended = hourly.select(
        "hod",
        "total_c",
        F.count(F.lit(1)).over(w).alias("n_frame"),
        F.sum("total_c").over(w).alias("frame_c"),
    )
    detr = trended.where(F.col("n_frame") == 25).select(
        "hod",
        F.floor(
            (F.col("total_c") / 100.0 - F.col("frame_c") / 2500.0) * 10000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("detr_s"),
    )
    return detr.groupBy("hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.round(
            F.sum("detr_s").cast("double") / (10000.0 * F.count(F.lit(1))), 6
        ).alias("seasonal"),
        F.round(F.min("detr_s") / 10000.0, 6).alias("min_detr"),
        F.round(F.max("detr_s") / 10000.0, 6).alias("max_detr"),
    )


@register(
    "events_decayed_leaderboard",
    oracle="""
WITH anchor AS (
  SELECT date_diff('day', DATE '2000-01-01', CAST(MAX(ts) AS DATE)) AS ad
  FROM events
),
scored AS (
  SELECT user_id,
         CAST(FLOOR(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END * 100 + 0.5) AS BIGINT)
           * CAST(POWER(2, 4 - (anchor.ad -
               date_diff('day', DATE '2000-01-01', CAST(ts AS DATE))) // 7)
             AS BIGINT) AS wv,
         CAST(FLOOR(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END * 100 + 0.5) AS BIGINT) AS v
  FROM events, anchor
  WHERE event_type = 'purchase'
    AND anchor.ad - date_diff('day', DATE '2000-01-01', CAST(ts AS DATE)) <= 34
),
agg AS (
  SELECT user_id, COUNT(*) AS n_events, SUM(v) AS raw_c, SUM(wv) AS dec_c
  FROM scored GROUP BY user_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY dec_c DESC, user_id) AS INT) AS rnk,
       user_id, CAST(n_events AS BIGINT) AS n_events,
       ROUND(raw_c / 100.0, 2) AS raw_total,
       ROUND(dec_c / 1600.0, 6) AS decayed_score
FROM agg
ORDER BY rnk LIMIT 20
""",
    tags=("events", "leaderboard", "decay", "topk"),
)
def events_decayed_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed top-20 spender leaderboard: purchase value halves in
    weight every 7 days of age (5 weekly half-life steps over a 35-day
    horizon), so the ranking favors RECENT spend — the freshness-aware
    dual of events_rfm_segments' monetary quartile, and the standard
    trending/leaderboard primitive.

    Exponential decay is usually a float sum (order-fragile); here the
    weights are exact powers of two on an integer day-age (2^(4 -
    age/7) in {16,8,4,2,1}), so every weighted value is an exact int64
    (cents x <=16) and the per-user sum is integer arithmetic — the
    decayed score is exact by construction, normalized by one final
    divide (1600 = 100 cents x 2^4). Overflow bound: cents <= 5e6 x
    weight 16 x ~1e11 rows per user before int64 saturates. The age
    anchor is max(ts)'s day (pure function of input, not wall clock);
    day numbers are epoch-based on both engines.

    Scale: one filtered scan, one exact-int groupBy, top-20 via
    TakeOrderedAndProject under a total order (score desc, user_id).
    Re-anchoring a live leaderboard = multiply every stored partial by
    2^(-delta_weeks) — the store-partials pattern mergeable sketches
    use, which is why the weights are powers of two."""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    epoch_day = F.datediff(F.col("ts").cast("date"), F.lit("2000-01-01").cast("date"))
    anchor = ev.agg(F.max(epoch_day).alias("ad"))
    age = F.col("ad") - F.col("dn")
    scored = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", scaled_long("value").alias("v"), epoch_day.alias("dn"))
        .crossJoin(F.broadcast(anchor))
        .where(age <= 34)
        .select(
            "user_id",
            "v",
            (F.col("v") * F.pow(F.lit(2.0), (F.lit(4) - (age / 7).cast("long")).cast("double")).cast("long")).alias("wv"),
        )
    )
    agg = scored.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("v").alias("raw_c"),
        F.sum("wv").alias("dec_c"),
    )
    # Distributed top-k: orderBy+limit (TakeOrderedAndProject) keeps the
    # same 20 rows under the same total order without dragging the whole
    # per-user aggregate into one window task; the residual window ranks
    # only the 20 survivors.
    w = Window.partitionBy(F.col("dec_c") * 0).orderBy(
        F.desc("dec_c"), "user_id"
    )
    return (
        agg.orderBy(F.desc("dec_c"), "user_id")
        .limit(20)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .select(
            "rnk",
            "user_id",
            "n_events",
            F.round(F.col("raw_c") / 100.0, 2).alias("raw_total"),
            F.round(F.col("dec_c") / 1600.0, 6).alias("decayed_score"),
        )
        .orderBy("rnk")
    )


@register(
    "events_attribution_ushaped",
    oracle="""
WITH p AS (
  SELECT event_id AS pid, user_id, ts AS pts, value
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT event_id AS vid, user_id, ts AS vts
  FROM events WHERE event_type = 'view'
),
touch AS (
  SELECT p.pid, p.value, v.vid, v.vts,
         ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY v.vts, v.vid) AS pos,
         COUNT(*) OVER (PARTITION BY p.pid) AS n
  FROM p JOIN v ON v.user_id = p.user_id
   AND v.vts < p.pts AND v.vts >= p.pts - INTERVAL 1 HOUR
),
credit AS (
  SELECT strftime(date_trunc('day', vts), '%Y-%m-%d') AS day,
         CASE WHEN pos = 1 OR pos = n THEN 1 ELSE 0 END AS is_endpoint,
         CAST(ROUND(value * (CASE
             WHEN n = 1 THEN 1.0
             WHEN n = 2 THEN 0.5
             WHEN pos = 1 OR pos = n THEN 0.4
             ELSE 0.2 / (n - 2) END), 6) AS DOUBLE) AS share
  FROM touch
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(is_endpoint) AS BIGINT) AS n_endpoint_touches,
       CAST(ROUND(SUM(CAST(share AS DECIMAL(18,6))), 6) AS DOUBLE)
         AS credited_value
FROM credit GROUP BY day
""",
    tags=("events", "attribution", "join", "interval"),
)
def events_attribution_ushaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: 40% of each
    purchase's value to the FIRST touch, 40% to the LAST, the remaining
    20% split across the middle touches (1-touch journeys take 100%,
    2-touch 50/50) — the model that credits discovery and closing over
    the mid-funnel, next to events_attribution_linear's equal split.

    Determinism follows the linear model's discipline with one extra
    care point: the middle-touch weight 0.2/(n-2) is a double divide of
    identical operands (deterministic), each share rounds to 1e-6
    BEFORE the day rollup, and the rollup sums DECIMAL(18,6) so
    accumulation order cannot move the credited total. Touch position
    is totally ordered (vts, then view id) — ties cannot reshuffle
    endpoint assignment between engines.

    Scale: same bucketizable interval join as linear attribution; the
    position window partitions per purchase (bounded fan-in: views
    within one hour)."""
    prep(spark)
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        "value",
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"),
        F.col("user_id").alias("vu"),
        F.col("ts").alias("vts"),
    )
    touch = p.join(
        v,
        (F.col("vu") == F.col("pu"))
        & (F.col("vts") < F.col("pts"))
        & (F.col("vts") >= F.col("pts") - F.expr("interval 1 hour")),
    )
    wp = Window.partitionBy("pid").orderBy("vts", "vid")
    wn = Window.partitionBy("pid")
    pos, n = F.row_number().over(wp), F.count(F.lit(1)).over(wn)
    endpoint = (pos == 1) | (pos == n)
    weight = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when(endpoint, F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2))
    )
    credit = touch.select(
        F.date_format(F.date_trunc("day", "vts"), "yyyy-MM-dd").alias("day"),
        endpoint.cast("int").alias("is_endpoint"),
        F.round(F.col("value") * weight, 6).alias("share"),
    )
    return credit.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum("is_endpoint").cast("bigint").alias("n_endpoint_touches"),
        F.round(F.sum(F.col("share").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("credited_value"),
    )


@register(
    "events_conversion_time",
    oracle="""
WITH p AS (
  SELECT event_id AS pid, user_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
),
conv AS (
  SELECT p.pid,
         CAST(epoch_us(p.pts) - epoch_us(MIN(v.ts)) AS BIGINT) AS gap_us
  FROM p JOIN events v
    ON v.event_type = 'view' AND v.user_id = p.user_id
   AND v.ts < p.pts AND v.ts >= p.pts - INTERVAL 1 HOUR
  GROUP BY p.pid, p.pts
),
ranked AS (
  SELECT gap_us, ROW_NUMBER() OVER (ORDER BY gap_us, pid) AS rn,
         COUNT(*) OVER () AS n
  FROM conv
)
SELECT CAST(MAX(n) AS BIGINT) AS n_conversions,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_us END) AS BIGINT)
         AS median_gap_us,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN gap_us END)
         AS BIGINT) AS p90_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM ranked
""",
    tags=("events", "attribution", "percentile", "funnel"),
)
def events_conversion_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every purchase with a view in
    the preceding hour, the gap from the user's FIRST such view
    (discovery) to the purchase, summarized as exact type-1 median /
    p90 / max — the funnel-latency readout that decides whether the
    1-hour attribution window is even the right window.

    Gaps are exact integer microseconds and the percentiles are RANK
    positions (rn = floor((n+1)/2), ceil(0.9n)) in a totally ordered
    multiset (gap, then purchase id) — actual observed gaps, never
    interpolated midpoints, so both engines report bit-identical
    values on any draw (agg_theilsen_trend's type-1 discipline).

    Scale: the view-purchase join is the same bucketizable hour-band;
    the per-purchase MIN collapses it before the global rank, which at
    fleet scale runs per segment/cohort rather than globally."""
    prep(spark)
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    conv = (
        p.join(
            v,
            (F.col("vu") == F.col("pu"))
            & (F.col("vts") < F.col("pts"))
            & (F.col("vts") >= F.col("pts") - F.expr("interval 1 hour")),
        )
        .groupBy("pid", "pts")
        .agg(
            (F.unix_micros(F.col("pts")) - F.unix_micros(F.min("vts"))).alias(
                "gap_us"
            )
        )
    )
    wr = Window.partitionBy(F.col("gap_us") * 0).orderBy("gap_us", "pid")
    ranked = conv.select(
        "gap_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(F.col("gap_us") * 0)).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_conversions"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("gap_us")))
        .cast("bigint")
        .alias("median_gap_us"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.9 * F.col("n")), F.col("gap_us"))
        )
        .cast("bigint")
        .alias("p90_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


@register(
    "events_cross_correlation",
    oracle="""
WITH vd AS (
  SELECT date_diff('day', DATE '2000-01-01', CAST(ts AS DATE)) AS dn,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS v
  FROM events WHERE event_type = 'view' GROUP BY 1
),
pd AS (
  SELECT date_diff('day', DATE '2000-01-01', CAST(ts AS DATE)) AS dn,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS p
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
lags AS (SELECT unnest(generate_series(-7, 7)) AS lag_days),
paired AS (
  SELECT l.lag_days, vd.v, pd.p
  FROM lags l
  JOIN vd ON TRUE
  JOIN pd ON pd.dn = vd.dn + l.lag_days
)
SELECT CAST(lag_days AS INT) AS lag_days,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(covar_samp(v, p)
             / NULLIF(stddev_samp(v) * stddev_samp(p), 0), 6) AS xcorr
FROM paired GROUP BY lag_days
""",
    tags=("events", "time-series", "cross-correlation"),
)
def events_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the daily VIEW-value and
    PURCHASE-value series (lags -7..+7): does view volume lead purchase
    volume, and by how many days? — the two-series companion of
    events_autocorr, and the signal that picks the attribution window
    events_conversion_time then measures precisely.

    Same discipline as autocorr: exact-decimal daily totals, the
    lag realized as a date-shift equi-join (Spark's lag() needs a
    literal offset per window, so 15 lags ride one broadcast of the
    lag spine and one shuffle-free join over the tiny series), corr
    over identical doubles rounded at 1e-6 to absorb the engines'
    one-pass moment accumulation order.

    Scale: the fact scan collapses to two ~30-row daily series; all
    lag work happens on the dim-sized product. At fleet scale the
    same plan partitions by (series_id, lag)."""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    epoch_day = F.datediff(F.col("ts").cast("date"), F.lit("2000-01-01").cast("date"))

    def daily(etype, col):
        return (
            ev.where(F.col("event_type") == etype)
            .groupBy(epoch_day.alias("dn"))
            .agg(long_sum(F.sum(scaled_long("value")), 2).alias(col))
        )

    vd = daily("view", "v")
    pd_ = daily("purchase", "p").select(
        F.col("dn").alias("pdn"), "p"
    )
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("lag_days"))
    paired = (
        vd.crossJoin(F.broadcast(lags))
        .join(pd_, F.expr("pdn = dn + lag_days"))
    )
    # corr spelled as covar/(sd*sd) under try_divide: built-in corr's
    # final division raises under ANSI mode when a lag pairing has zero
    # variance (a sparse reseeded draw with 2-3 equal daily totals),
    # where DuckDB's corr returns NULL — try_divide + the oracle's
    # NULLIF make the degenerate case NULL on both engines.
    return paired.groupBy("lag_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(
            F.try_divide(
                F.covar_samp("v", "p"),
                F.stddev_samp("v") * F.stddev_samp("p"),
            ),
            6,
        ).alias("xcorr"),
    )


@register(
    "events_sprt_abtest",
    oracle="""
WITH obs AS (
  SELECT CAST(user_id % 2 AS INT) AS arm, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
  FROM events WHERE event_type IN ('view', 'purchase')
),
cum AS (
  SELECT arm, event_id,
         SUM(x) OVER w AS k, COUNT(*) OVER w AS n
  FROM obs
  WINDOW w AS (PARTITION BY arm ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
llr AS (
  SELECT arm, event_id, n,
         k * ln(0.15 / 0.10) + (n - k) * ln(0.85 / 0.90) AS llr
  FROM cum
),
hits AS (
  SELECT arm, n, llr,
         CASE WHEN llr >= ln(19.0) THEN 'accept_h1'
              WHEN llr <= -ln(19.0) THEN 'accept_h0' END AS decision,
         ROW_NUMBER() OVER (PARTITION BY arm ORDER BY event_id) AS rn_hit
  FROM llr
  WHERE llr >= ln(19.0) OR llr <= -ln(19.0)
),
tot AS (
  SELECT arm, COUNT(*) AS n_total, SUM(x) AS k_total FROM obs GROUP BY arm
)
SELECT t.arm,
       CAST(t.n_total AS BIGINT) AS n_total,
       COALESCE(h.decision, 'continue') AS decision,
       CAST(COALESCE(h.n, t.n_total) AS BIGINT) AS n_at_decision,
       ROUND(COALESCE(h.llr,
                      t.k_total * ln(0.15 / 0.10)
                      + (t.n_total - t.k_total) * ln(0.85 / 0.90)), 6)
         AS llr_at_decision
FROM tot t LEFT JOIN hits h ON h.arm = t.arm AND h.rn_hit = 1
""",
    tags=("events", "statistics", "sequential-test", "abtest"),
)
def events_sprt_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test over the event stream —
    the always-valid A/B monitor that decides as soon as the evidence
    crosses a boundary instead of waiting for a fixed n: arms split by
    user_id parity, H0: conversion p0=0.10 vs H1: p1=0.15, boundaries
    ln(19) / -ln(19) (alpha = beta = 0.05). Reports, per arm, the first
    boundary crossing (decision, n, LLR at decision) or 'continue' with
    the end-of-stream LLR.

    Determinism: the LLR at row n is k*ln(p1/p0) + (n-k)*ln(q1/q0) from
    INTEGER cumulative counts — both engines compute identical doubles
    from identical integers, so the boundary comparison agrees exactly;
    the reported LLR rounds to 1e-6.

    Scale: the cumulative window partitions by arm — sequential by
    construction (that IS the test's semantics: evidence in arrival
    order). At 100 TB the monitor runs per (arm x shard) with shard-level
    SPRTs combined by meta-analysis, or on batch boundaries (group
    sequential); the per-row reduction below is the shard-local plan.
    The first-crossing filter prunes to <=1 row per arm before the final
    broadcast join."""
    prep(spark)
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    import math

    c1 = math.log(0.15 / 0.10)
    c0 = math.log(0.85 / 0.90)
    bound = math.log(19.0)
    obs = ev.select(
        (F.col("user_id") % 2).cast("int").alias("arm"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("x"),
    )
    w = (
        Window.partitionBy("arm")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = obs.select(
        "arm",
        "event_id",
        F.sum("x").over(w).alias("k"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    llr = cum.select(
        "arm",
        "event_id",
        "n",
        (F.col("k") * c1 + (F.col("n") - F.col("k")) * c0).alias("llr"),
    )
    hit_w = Window.partitionBy("arm").orderBy("event_id")
    hits = (
        llr.where((F.col("llr") >= bound) | (F.col("llr") <= -bound))
        .withColumn(
            "decision",
            F.when(F.col("llr") >= bound, "accept_h1").otherwise("accept_h0"),
        )
        .withColumn("rn_hit", F.row_number().over(hit_w))
        .where(F.col("rn_hit") == 1)
        .select("arm", F.col("n").alias("hn"), F.col("llr").alias("hllr"), "decision")
    )
    tot = obs.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_total"), F.sum("x").alias("k_total")
    )
    return tot.join(F.broadcast(hits), "arm", "left").select(
        "arm",
        F.col("n_total").cast("bigint").alias("n_total"),
        F.coalesce("decision", F.lit("continue")).alias("decision"),
        F.coalesce("hn", "n_total").cast("bigint").alias("n_at_decision"),
        F.round(
            F.coalesce(
                "hllr",
                F.col("k_total") * c1 + (F.col("n_total") - F.col("k_total")) * c0,
            ),
            6,
        ).alias("llr_at_decision"),
    )


@register(
    "events_mann_kendall",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
  FROM events GROUP BY 1
),
pairs AS (
  SELECT CASE WHEN b.total > a.total THEN 1
              WHEN b.total < a.total THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b ON b.d > a.d
),
s AS (SELECT CAST(SUM(sgn) AS BIGINT) AS s_stat FROM pairs),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
ties AS (
  SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS tie_term
  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY total HAVING COUNT(*) > 1)
)
SELECT n.n_days, s.s_stat,
       ROUND((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie_term)
             / 18.0, 6) AS var_s,
       ROUND((s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
                              WHEN s.s_stat < 0 THEN -1 ELSE 0 END)
             / NULLIF(SQRT((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                            - ties.tie_term) / 18.0), 0), 6) AS z_stat,
       CASE WHEN s.s_stat > 0 THEN 'increasing'
            WHEN s.s_stat < 0 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM n, s, ties
""",
    tags=("events", "time-series", "statistics", "trend"),
)
def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test on the daily event-value
    series — the distribution-free monotone-trend detector a data-volume
    or metric-drift monitor runs where a rolling OLS (win_rolling_ols)
    would be thrown by outliers: S = sum of pairwise sign comparisons,
    variance with the standard tie correction, continuity-corrected z.

    Determinism: the daily series rides the exact decimal sum, so every
    pairwise sign is an integer decided on identical doubles; S, n and
    the tie term are integers — both engines compute the same z from the
    same integers (rounded 1e-6). try_divide/NULLIF guard the degenerate
    all-equal draw (var 0).

    Scale: the fact table reduces to one row per day FIRST (one shuffle,
    map-side partial); the O(days²) pairwise stage runs on that tiny
    series — at 10 years that is ~6.7M comparisons on 3653 rows, a
    broadcast self-join, never a fact-sized one."""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        long_sum(F.sum(scaled_long("value")), 2).alias("total")
    )
    a = daily.select(F.col("d").alias("da"), F.col("total").alias("ta"))
    b = daily.select(F.col("d").alias("db"), F.col("total").alias("tb"))
    pairs = a.join(F.broadcast(b), F.col("db") > F.col("da"))
    s = pairs.agg(
        F.sum(
            F.when(F.col("tb") > F.col("ta"), 1)
            .when(F.col("tb") < F.col("ta"), -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_stat")
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ties = (
        daily.groupBy("total")
        .agg(F.count(F.lit(1)).alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    nd, ss = F.col("n_days"), F.col("s_stat")
    var_s = (nd * (nd - 1) * (2 * nd + 5) - F.col("tie_term")) / 18.0
    cc = F.when(ss > 0, 1).when(ss < 0, -1).otherwise(0)
    return (
        n.crossJoin(s)
        .crossJoin(ties)
        .select(
            "n_days",
            "s_stat",
            F.round(var_s, 6).alias("var_s"),
            F.round(F.try_divide(ss - cc, F.sqrt(var_s)), 6).alias("z_stat"),
            F.when(ss > 0, "increasing")
            .when(ss < 0, "decreasing")
            .otherwise("no_trend")
            .alias("trend"),
        )
    )


@register(
    "events_holt_linear",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY d) AS rn, total FROM daily
),
hw(rn, lvl, trend) AS (
  SELECT 1,
         (SELECT total FROM idx WHERE rn = 1),
         (SELECT total FROM idx WHERE rn = 2)
           - (SELECT total FROM idx WHERE rn = 1)
  UNION ALL
  SELECT hw.rn + 1,
         i.total * 0.3 + (hw.lvl + hw.trend) * 0.7,
         (i.total * 0.3 + (hw.lvl + hw.trend) * 0.7 - hw.lvl) * 0.2
           + hw.trend * 0.8
  FROM hw JOIN idx i ON i.rn = hw.rn + 1
)
SELECT CAST((SELECT MAX(rn) FROM idx) AS BIGINT) AS n_days,
       ROUND(lvl, 6) AS level,
       ROUND(trend, 6) AS trend,
       ROUND(lvl + 7 * trend, 6) AS forecast_7d
FROM hw
WHERE rn = (SELECT MAX(rn) FROM idx) AND (SELECT MAX(rn) FROM idx) >= 2
""",
    tags=("events", "time-series", "forecast", "smoothing", "iterative"),
)
def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing over the daily
    event-value series, alpha=0.3 beta=0.2, textbook init (level=x1,
    trend=x2-x1): the short-horizon forecaster a capacity/ingest planner
    runs per metric — reported as the final level/trend plus a 7-day-out
    projection.

    The recursion is inherently sequential, so the engine runs it as ONE
    JVM-side array fold (F.aggregate over the sorted daily array) after
    the distributed part — the fact-to-daily reduction — has already
    collapsed the data: the same reduce-then-recur shape as
    events_autocorr and the k-means loop (iterate on the small thing,
    never the fact table). The oracle is the literal recursive CTE; both
    engines execute the identical sequence of IEEE ops (the update
    expressions are written in the same operation order), so results
    match to the 1e-6 rounding exactly. Draws with fewer than 2 days
    yield zero rows on both engines.

    Scale: at 100 TB the daily rollup is the only data-sized stage; the
    fold runs on n_days elements (3653 for a decade) inside one task.
    Per-key forecasting (millions of series) keeps the same plan with
    the fold keyed per group — no driver loop either way."""
    prep(spark)
    ev = timed(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        long_sum(F.sum(scaled_long("value")), 2).alias("total")
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "total"))).alias("arr")
    ).select(F.transform("arr", lambda s: s["total"]).alias("xs"))
    xs = F.col("xs")
    init = F.struct(
        F.element_at(xs, 1).alias("lvl"),
        (F.element_at(xs, 2) - F.element_at(xs, 1)).alias("trend"),
    )
    lvl_next = lambda acc, x: x * 0.3 + (acc["lvl"] + acc["trend"]) * 0.7  # noqa: E731
    folded = F.aggregate(
        F.slice(xs, 2, F.size(xs) - 1),
        init,
        lambda acc, x: F.struct(
            lvl_next(acc, x).alias("lvl"),
            ((lvl_next(acc, x) - acc["lvl"]) * 0.2 + acc["trend"] * 0.8).alias(
                "trend"
            ),
        ),
    )
    return (
        series.where(F.size(xs) >= 2)
        .select(F.size(xs).cast("bigint").alias("n_days"), folded.alias("f"))
        .select(
            "n_days",
            F.round(F.col("f.lvl"), 6).alias("level"),
            F.round(F.col("f.trend"), 6).alias("trend"),
            F.round(F.col("f.lvl") + 7 * F.col("f.trend"), 6).alias("forecast_7d"),
        )
    )


@register(
    "events_changepoint",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))) * 100, 0) AS BIGINT)
           AS cents
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
idx AS (
  SELECT d, cents,
         ROW_NUMBER() OVER (ORDER BY d) AS rn,
         SUM(cents) OVER (ORDER BY d) AS cs,
         SUM(cents * cents) OVER (ORDER BY d) AS css
  FROM daily
),
tot AS (
  SELECT COUNT(*) AS n, SUM(cents) AS s, SUM(cents * cents) AS ss FROM daily
),
splits AS (
  SELECT i.d, i.rn, t.n,
         (CAST(i.css AS DOUBLE) - CAST(i.cs AS DOUBLE) * i.cs / i.rn)
         + (CAST(t.ss - i.css AS DOUBLE)
            - CAST(t.s - i.cs AS DOUBLE) * (t.s - i.cs) / (t.n - i.rn))
           AS cost,
         CAST(t.ss AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / t.n AS sse_total,
         CAST(i.cs AS DOUBLE) / i.rn / 100.0 AS mean_left,
         CAST(t.s - i.cs AS DOUBLE) / (t.n - i.rn) / 100.0 AS mean_right
  FROM idx i, tot t
  WHERE i.rn < t.n
),
ranked AS (
  SELECT d AS split_date, CAST(rn AS BIGINT) AS n_left,
         CAST(n - rn AS BIGINT) AS n_right,
         ROUND(mean_left, 6) AS mean_left,
         ROUND(mean_right, 6) AS mean_right,
         ROUND((sse_total - cost) / 10000.0, 6) AS sse_gain,
         ROW_NUMBER() OVER (ORDER BY ROUND((sse_total - cost) / 10000.0, 6)
                            DESC, d) AS rk
  FROM splits
)
SELECT strftime(split_date, '%Y-%m-%d') AS split_date,
       n_left, n_right, mean_left, mean_right, sse_gain
FROM ranked WHERE rk = 1
""",
    tags=("events", "time-series", "changepoint", "statistics"),
)
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single changepoint detection by binary segmentation on the daily
    event-value series: the split minimizing total within-segment SSE
    (equivalently maximizing variance-explained gain) — the level-shift
    detector a data-quality monitor runs when a producer deploy or
    schema change bends a metric. Reports the last day of the left
    segment, both segment means, and the SSE gain; recursing on each
    side yields the standard multi-changepoint algorithm.

    Determinism: daily totals ride integer CENTS and the cumulants
    (sum, sum-of-squares) stay exact BIGINTs (30 days of 1e6-cent days
    squares to ~3e13, far inside int64) — each candidate's cost is then
    O(1) double arithmetic on identical integers in both engines,
    rounded to 1e-6 before the argmax with a date tie-break.

    Scale: one shuffle collapses the fact table to days; the candidate
    scan is a window pass over the tiny series (same reduce-then-score
    shape as events_anomaly_zscore). Per-key changepoints (millions of
    metrics) partition the window by key, same plan."""
    prep(spark)
    ev = timed(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(scaled_long("value")).alias("cents")
    )
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    idx = daily.select(
        "d",
        "cents",
        F.row_number().over(Window.partitionBy(F.lit(1)).orderBy("d")).alias("rn"),
        F.sum("cents").over(w).alias("cs"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("css"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    sp = idx.crossJoin(F.broadcast(tot)).where(F.col("rn") < F.col("n"))
    cs, css, rn = F.col("cs"), F.col("css"), F.col("rn")
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    cost = (
        css.cast("double") - cs.cast("double") * cs / rn
    ) + (
        (ss - css).cast("double") - (s - cs).cast("double") * (s - cs) / (n - rn)
    )
    sse_total = ss.cast("double") - s.cast("double") * s / n
    ranked = sp.select(
        F.date_format("d", "yyyy-MM-dd").alias("split_date"),
        rn.cast("bigint").alias("n_left"),
        (n - rn).cast("bigint").alias("n_right"),
        F.round(cs.cast("double") / rn / 100.0, 6).alias("mean_left"),
        F.round((s - cs).cast("double") / (n - rn) / 100.0, 6).alias("mean_right"),
        F.round((sse_total - cost) / 10000.0, 6).alias("sse_gain"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy(F.lit(1)).orderBy(
                F.desc("sse_gain"), "split_date"
            )
        ),
    )
    return ranked.where(F.col("rk") == 1).drop("rk")


@register(
    "events_kalman_level",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS x
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY d) AS rn, x FROM daily
),
kf(rn, lvl, p) AS (
  SELECT 1, (SELECT x FROM idx WHERE rn = 1), CAST(1.0 AS DOUBLE)
  UNION ALL
  SELECT kf.rn + 1,
         kf.lvl + ((kf.p + 0.01) / (kf.p + 0.01 + 1.0)) * (i.x - kf.lvl),
         (1.0 - (kf.p + 0.01) / (kf.p + 0.01 + 1.0)) * (kf.p + 0.01)
  FROM kf JOIN idx i ON i.rn = kf.rn + 1
)
SELECT CAST((SELECT MAX(rn) FROM idx) AS BIGINT) AS n_days,
       ROUND(lvl, 6) AS level,
       ROUND(p, 6) AS p_var,
       ROUND((p + 0.01) / (p + 0.01 + 1.0), 6) AS gain_next
FROM kf
WHERE rn = (SELECT MAX(rn) FROM idx)
""",
    tags=("events", "time-series", "kalman", "smoothing", "iterative"),
)
def events_kalman_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level (random-walk) Kalman filter over the daily event-value
    series, process variance q=0.01, observation variance r=1.0, diffuse
    init (level=x1, P=1): the optimal online denoiser for a drifting
    metric — reports the final filtered level, the posterior variance,
    and the steady-state-converging gain the NEXT observation would get.
    Alongside events_holt_linear this completes the classic recursive
    smoother pair (Holt = trend-aware EWMA; Kalman = variance-tracking
    level with a principled gain schedule).

    Same reduce-then-recur shape as Holt: the fact table collapses to
    the daily series in one shuffle, then the inherently-sequential
    recursion runs as ONE JVM-side F.aggregate fold over the sorted
    array — never a driver loop, never an iteration over the fact. The
    oracle is the literal recursive CTE with the update expressions in
    the identical operation order, so both engines walk the same IEEE
    sequence. Single-day draws emit the init row; empty draws emit
    nothing, on both engines.

    Scale: per-key filtering (one Kalman state per metric/entity at
    100 TB) keeps the same plan with the fold keyed per group — the
    state is two doubles regardless of series length."""
    prep(spark)
    ev = timed(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        long_sum(F.sum(scaled_long("value")), 2).alias("x")
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "x"))).alias("arr")
    ).select(F.transform("arr", lambda s: s["x"]).alias("xs"))
    xs = F.col("xs")
    init = F.struct(
        F.element_at(xs, 1).alias("lvl"), F.lit(1.0).alias("p")
    )
    gain = lambda acc: (acc["p"] + 0.01) / (acc["p"] + 0.01 + 1.0)  # noqa: E731
    folded = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        init,
        lambda acc, x: F.struct(
            (acc["lvl"] + gain(acc) * (x - acc["lvl"])).alias("lvl"),
            ((F.lit(1.0) - gain(acc)) * (acc["p"] + 0.01)).alias("p"),
        ),
    )
    return (
        series.where(F.size(xs) >= 1)
        .select(F.size(xs).cast("bigint").alias("n_days"), folded.alias("f"))
        .select(
            "n_days",
            F.round(F.col("f.lvl"), 6).alias("level"),
            F.round(F.col("f.p"), 6).alias("p_var"),
            F.round(
                (F.col("f.p") + 0.01) / (F.col("f.p") + 0.01 + 1.0), 6
            ).alias("gain_next"),
        )
    )


@register(
    "events_kaplan_meier",
    oracle="""
WITH RECURSIVE per_user AS (
  SELECT user_id,
         CAST(CAST(MAX(ts) AS DATE) - CAST(MIN(ts) AS DATE) AS INT) AS dur,
         CASE WHEN MAX(ts) < (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
              THEN 1 ELSE 0 END AS observed
  FROM events GROUP BY user_id
),
steps AS (
  SELECT dur, SUM(observed) AS d, COUNT(*) AS all_c
  FROM per_user GROUP BY dur
),
ordered AS (
  SELECT dur, d, ROW_NUMBER() OVER (ORDER BY dur) AS rn,
         SUM(all_c) OVER (ORDER BY dur
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS n
  FROM steps
),
km(rn, s) AS (
  SELECT 1, (SELECT 1.0 - CAST(d AS DOUBLE) / n FROM ordered WHERE rn = 1)
  UNION ALL
  SELECT km.rn + 1, km.s * (1.0 - CAST(o.d AS DOUBLE) / o.n)
  FROM km JOIN ordered o ON o.rn = km.rn + 1
)
SELECT o.dur AS duration_days, CAST(o.n AS BIGINT) AS n_risk,
       CAST(o.d AS BIGINT) AS d_events, ROUND(k.s, 6) AS survival
FROM ordered o JOIN km k ON k.rn = o.rn
WHERE o.d > 0
""",
    tags=("events", "survival", "statistics", "kaplan-meier", "iterative"),
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over user lifetimes (duration =
    days between a user's first and last event), right-censoring users
    still active within 7 days of the corpus horizon: the
    retention/churn curve S(t) = prod(1 - d_i/n_i) every lifecycle
    analysis starts from, emitted at each event time (d_i > 0 steps).

    Same reduce-then-recur shape as the Holt/Kalman folds: one shuffle
    collapses the fact table to per-user rows, a second to per-duration
    (d_i, n_i) steps — exact integers via a cumulative window — and the
    inherently-sequential survival product runs as ONE JVM-side
    F.aggregate fold over the sorted step array (the fold multiplies
    every step, censored-only steps by exactly 1.0, so both engines
    walk the identical IEEE product; the oracle is the literal
    recursive CTE). Draws where no user churns yield zero rows on both
    engines.

    Scale: the step array is one row per distinct lifetime (bounded by
    the observation window in days), never user- or fact-sized; at
    100 TB stratified curves (per cohort/segment) key the same fold
    per group."""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    horizon = F.broadcast(
        ev.agg(F.max("ts").alias("mx")).select(
            (F.col("mx") - F.expr("INTERVAL 7 DAYS")).alias("cutoff")
        )
    )
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts")))
            .cast("int")
            .alias("dur"),
            F.max("ts").alias("last_ts"),
        )
        .crossJoin(horizon)
        .select(
            "dur",
            F.when(F.col("last_ts") < F.col("cutoff"), 1)
            .otherwise(0)
            .alias("observed"),
        )
    )
    steps = per_user.groupBy("dur").agg(
        F.sum("observed").alias("d"), F.count(F.lit(1)).alias("all_c")
    )
    # n_i (at risk) is the suffix sum of step counts — computed in the
    # same window pass, no second fact reduction for a global count.
    w = Window.partitionBy(F.lit(1)).orderBy("dur")
    ordered = steps.select(
        "dur",
        "d",
        F.sum("all_c")
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        .alias("n"),
    )
    arr = ordered.agg(
        F.sort_array(F.collect_list(F.struct("dur", "d", "n"))).alias("arr")
    )
    folded = arr.select(
        F.expr(
            "aggregate(arr, "
            "named_struct('s', CAST(1.0 AS DOUBLE), "
            "             'out', CAST(array() AS "
            "array<struct<dur:int,d:bigint,n:bigint,s:double>>)), "
            "(acc, x) -> named_struct("
            "  's', acc.s * (1.0D - CAST(x.d AS DOUBLE) / x.n), "
            "  'out', array_append(acc.out, named_struct("
            "    'dur', x.dur, 'd', x.d, 'n', x.n, "
            "    's', acc.s * (1.0D - CAST(x.d AS DOUBLE) / x.n)))), "
            "acc -> acc.out) AS curve"
        )
    )
    return (
        folded.select(F.explode("curve").alias("c"))
        .where(F.col("c.d") > 0)
        .select(
            F.col("c.dur").alias("duration_days"),
            F.col("c.n").cast("bigint").alias("n_risk"),
            F.col("c.d").cast("bigint").alias("d_events"),
            F.round(F.col("c.s"), 6).alias("survival"),
        )
    )


def _hw_oracle() -> str:
    m1 = "(" + "+".join(f"a[{i}]" for i in range(1, 8)) + ")/7.0"
    m2 = "(" + "+".join(f"a[{i}]" for i in range(8, 15)) + ")/7.0"
    seas0 = "[" + ", ".join(f"a[{i}] - {m1}" for i in range(1, 8)) + "]"
    lvl2 = "(x.total - hw.seas[1])*0.3 + (hw.lvl + hw.trend)*0.7"
    return f"""
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(ROUND(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS rn, total FROM daily),
xs AS (SELECT LIST(total ORDER BY rn) AS a, MAX(rn) AS n FROM idx),
init AS (
  SELECT 14 AS rn,
         {m1} AS lvl,
         ({m2} - {m1}) / 7.0 AS trend,
         {seas0} AS seas,
         n
  FROM xs WHERE n >= 15
),
hw(rn, lvl, trend, seas, n) AS (
  SELECT rn, lvl, trend, seas, n FROM init
  UNION ALL
  SELECT hw.rn + 1,
         {lvl2},
         (({lvl2}) - hw.lvl)*0.2 + hw.trend*0.8,
         list_append(hw.seas[2:7],
                     (x.total - ({lvl2}))*0.1 + hw.seas[1]*0.9),
         hw.n
  FROM hw JOIN idx x ON x.rn = hw.rn + 1
  WHERE hw.rn < hw.n
)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(lvl, 6) AS level,
       ROUND(trend, 6) AS trend,
       ROUND(lvl + trend + seas[1], 6) AS forecast_1d
FROM hw WHERE rn = n
"""


@register(
    "events_holt_winters",
    oracle=_hw_oracle(),
    tags=("events", "time-series", "forecast", "seasonal", "iterative"),
)
def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing (period 7, alpha=0.3,
    beta=0.2, gamma=0.1) over the daily event-value series — the
    weekly-seasonality forecaster that completes the smoothing ladder
    above events_holt_linear (level+trend) and events_kalman_level
    (level+variance). Textbook init from the first two weeks: level =
    week-1 mean, trend = (week-2 mean - week-1 mean)/7, seasonal_j =
    x_j - week-1 mean.

    The seasonal state is a 7-slot QUEUE carried inside the fold
    accumulator (head = s_{{t-7}}, rotate-append each step), so the whole
    recursion is still ONE JVM-side F.aggregate over the sorted daily
    array — same reduce-then-recur shape as the siblings, and the oracle
    is the literal recursive CTE maintaining the same LIST column with
    the same op order (both engines run the identical IEEE sequence;
    draws shorter than 15 days yield zero rows on both).

    Scale: the daily rollup is the only data-sized stage; the fold is
    O(n_days) in one task, per-key when forecasting many series.
    """
    prep(spark)
    ev = timed(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        long_sum(F.sum(scaled_long("value")), 2).alias("total")
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "total"))).alias("arr")
    ).select(F.transform("arr", lambda s: s["total"]).alias("xs"))
    xs = F.col("xs")
    e = lambda i: F.element_at(xs, i)  # noqa: E731
    m1 = (e(1) + e(2) + e(3) + e(4) + e(5) + e(6) + e(7)) / 7.0
    m2 = (e(8) + e(9) + e(10) + e(11) + e(12) + e(13) + e(14)) / 7.0
    init = F.struct(
        m1.alias("lvl"),
        ((m2 - m1) / 7.0).alias("trend"),
        F.array(*[(e(i) - m1) for i in range(1, 8)]).alias("seas"),
    )

    def step(acc, x):
        s_old = F.element_at(acc["seas"], 1)
        lvl2 = (x - s_old) * 0.3 + (acc["lvl"] + acc["trend"]) * 0.7
        return F.struct(
            lvl2.alias("lvl"),
            ((lvl2 - acc["lvl"]) * 0.2 + acc["trend"] * 0.8).alias("trend"),
            F.concat(
                F.slice(acc["seas"], 2, 6),
                F.array((x - lvl2) * 0.1 + s_old * 0.9),
            ).alias("seas"),
        )

    folded = F.aggregate(F.slice(xs, 15, F.size(xs) - 14), init, step)
    return (
        series.where(F.size(xs) >= 15)
        .select(F.size(xs).cast("bigint").alias("n_days"), folded.alias("f"))
        .select(
            "n_days",
            F.round(F.col("f.lvl"), 6).alias("level"),
            F.round(F.col("f.trend"), 6).alias("trend"),
            F.round(
                F.col("f.lvl") + F.col("f.trend") + F.element_at(F.col("f.seas"), 1),
                6,
            ).alias("forecast_1d"),
        )
    )


@register(
    "events_bollinger",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         SUM(CAST(ROUND(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END * 100, 0) AS BIGINT)) AS cents
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
w AS (
  SELECT d, cents,
         SUM(cents) OVER win AS s,
         SUM(cents * cents) OVER win AS ss,
         COUNT(*) OVER win AS n
  FROM daily
  WINDOW win AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT CAST(d AS TIMESTAMP) AS d,
       CAST(cents AS DOUBLE) / 100.0 AS total,
       ROUND(CAST(s AS DOUBLE) / n / 100.0, 6) AS sma7,
       ROUND(SQRT((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n)
             / 100.0, 6) AS sd7,
       CAST(cents AS DOUBLE) * n > CAST(s AS DOUBLE)
         + 2.0 * n * SQRT((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n)
         AS above_upper
FROM w
WHERE n = 7
ORDER BY d
""",
    tags=("events", "time-series", "rolling", "volatility"),
)
def events_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over the daily event-value series: 7-day rolling
    mean and population standard deviation, plus an above-upper-band
    flag (value > sma + 2*sd) — the rolling volatility envelope behind
    both trading signals and operational anomaly banding (a windowed
    sibling of the global z-score screen events_anomaly_z).

    Exactness: the window carries EXACT integer sums (cents, cents^2);
    mean/sd derive from them per row with the identical expression text
    on both engines, and the band test multiplies through by n instead
    of dividing — the flag compares the same two doubles everywhere.
    Rows before the window fills (n < 7) are dropped on both engines.

    Scale: daily reduction first (map-side combinable), then ONE
    ROWS-frame window over the date order — at 100 TB the window runs
    per key-range partition; no self-join formulation.
    """
    from pyspark.sql import Window

    prep(spark)
    daily = (
        timed(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum(scaled_long("value")).alias("cents"))
    )
    win = Window.orderBy("d").rowsBetween(-6, 0)
    w = daily.select(
        "d",
        "cents",
        F.sum("cents").over(win).alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(win).alias("ss"),
        F.count(F.lit(1)).over(win).alias("n"),
    )
    sd_expr = F.sqrt(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        )
        / F.col("n")
    )
    return (
        w.where(F.col("n") == 7)
        .select(
            F.col("d").cast("timestamp").alias("d"),
            (F.col("cents").cast("double") / 100.0).alias("total"),
            F.round(
                F.col("s").cast("double") / F.col("n") / 100.0, 6
            ).alias("sma7"),
            F.round(sd_expr / 100.0, 6).alias("sd7"),
            (
                F.col("cents").cast("double") * F.col("n")
                > F.col("s").cast("double") + 2.0 * F.col("n") * sd_expr
            ).alias("above_upper"),
        )
        .orderBy("d")
    )


@register(
    "events_max_drawdown",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         SUM(CAST(ROUND(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END * 100, 0) AS BIGINT)) AS cents
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT d,
         SUM(cents) OVER (ORDER BY d) AS equity
  FROM daily
),
dd AS (
  SELECT d, equity,
         MAX(equity) OVER (ORDER BY d) AS peak
  FROM cum
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(peak - equity) AS BIGINT) AS max_drawdown_cents,
       ROUND(CAST(MAX(peak - equity) AS DOUBLE) / 100.0, 2) AS max_drawdown,
       CAST(MAX(equity) AS DOUBLE) / 100.0 AS final_equity
FROM dd
""",
    tags=("events", "time-series", "cumulative", "drawdown"),
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily value series: the
    largest peak-to-trough fall of the running total — THE risk metric
    for any cumulative quantity (P&L, storage headroom, quota burn).
    Computed as max(running_max - running_total), all on exact integer
    cents, so the answer is an exact integer both engines agree on.

    Scale: after the daily rollup, two cumulative windows over the date
    order (running sum, running max) and a scalar max — each is one
    range-partitioned pass; nothing quadratic, no self-join.
    """
    from pyspark.sql import Window

    prep(spark)
    daily = (
        timed(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum(scaled_long("value")).alias("cents"))
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select("d", F.sum("cents").over(wcum).alias("equity"))
    withpeak = cum.select(
        "equity",
        F.max("equity")
        .over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0))
        .alias("peak"),
    )
    return withpeak.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max(F.col("peak") - F.col("equity")).cast("bigint").alias(
            "max_drawdown_cents"
        ),
        F.round(
            F.max(F.col("peak") - F.col("equity")).cast("double") / 100.0, 2
        ).alias("max_drawdown"),
        (F.max("equity").cast("double") / 100.0).alias("final_equity"),
    )


@register(
    "events_peak_detection",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         SUM(CAST(ROUND(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END * 100, 0) AS BIGINT)) AS cents
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
nb AS (
  SELECT d, cents,
         MAX(cents) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
           AS max_before,
         MAX(cents) OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
           AS max_after,
         COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
           AS n_before,
         COUNT(*) OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
           AS n_after
  FROM daily
)
SELECT CAST(d AS TIMESTAMP) AS d, CAST(cents AS DOUBLE) / 100.0 AS total,
       ROUND(CAST(cents - GREATEST(max_before, max_after) AS DOUBLE) / 100.0,
             2) AS prominence
FROM nb
WHERE n_before = 3 AND n_after = 3
  AND cents > max_before AND cents > max_after
ORDER BY d
""",
    tags=("events", "time-series", "peaks", "anomaly"),
)
def events_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum peak detection on the daily series: days strictly
    above every neighbor within ±3 days (interior days only — the
    window must be full on both sides), with a min-neighbor prominence
    measure. The discrete peak-finder behind seasonality eyeballing and
    burst triage; complements events_changepoint (level shifts) and the
    CUSUM drift screen (slow creep).

    Exactness: all comparisons are on exact integer cents; prominence
    divides once at the edge.

    Scale: two bounded ROWS-frame windows over the daily rollup — same
    single-pass posture as the other rolling ops; at millions of series
    add the key to the partition clause.
    """
    from pyspark.sql import Window

    prep(spark)
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum(scaled_long("value")).alias("cents"))
    )
    wb = Window.orderBy("d").rowsBetween(-3, -1)
    wa = Window.orderBy("d").rowsBetween(1, 3)
    nb = daily.select(
        "d",
        "cents",
        F.max("cents").over(wb).alias("max_before"),
        F.max("cents").over(wa).alias("max_after"),
        F.count(F.lit(1)).over(wb).alias("n_before"),
        F.count(F.lit(1)).over(wa).alias("n_after"),
    )
    return (
        nb.where(
            (F.col("n_before") == 3)
            & (F.col("n_after") == 3)
            & (F.col("cents") > F.col("max_before"))
            & (F.col("cents") > F.col("max_after"))
        )
        .select(
            F.col("d").cast("timestamp").alias("d"),
            (F.col("cents").cast("double") / 100.0).alias("total"),
            F.round(
                (
                    F.col("cents")
                    - F.greatest("max_before", "max_after")
                ).cast("double")
                / 100.0,
                2,
            ).alias("prominence"),
        )
        .orderBy("d")
    )


@register(
    "events_funnel_exclusion",
    oracle="""
WITH base AS (
  SELECT user_id, ts, event_type FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
v AS (SELECT user_id, ts FROM base WHERE event_type = 'view'),
p AS (SELECT user_id, ts FROM base WHERE event_type = 'purchase'),
e AS (SELECT user_id, ts FROM base WHERE event_type = 'error'),
conv AS (
  -- first qualifying (view, purchase) pair per user: purchase within
  -- 24h of the view and NO error strictly between them
  SELECT v.user_id, v.ts AS view_ts, MIN(p.ts) AS purchase_ts
  FROM v JOIN p ON p.user_id = v.user_id
              AND p.ts > v.ts
              AND p.ts <= v.ts + INTERVAL 24 HOUR
  WHERE NOT EXISTS (
    SELECT 1 FROM e
    WHERE e.user_id = v.user_id AND e.ts > v.ts AND e.ts < p.ts
  )
  GROUP BY v.user_id, v.ts
),
best AS (
  SELECT user_id, MIN(view_ts) AS view_ts FROM conv GROUP BY user_id
)
SELECT COUNT(*) AS n_clean_converters,
       CAST(MIN(b.user_id) AS BIGINT) AS first_user,
       CAST(MAX(b.user_id) AS BIGINT) AS last_user,
       ROUND(SUM(date_diff('second', b.view_ts, c.purchase_ts))
             / COUNT(*) / 60.0, 4) AS avg_minutes_to_convert
FROM best b JOIN conv c ON c.user_id = b.user_id AND c.view_ts = b.view_ts
""",
    tags=("events", "funnel", "sequence", "exclusion", "behavioral"),
)
def events_funnel_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel with a NEGATIVE condition (MATCH_RECOGNIZE-lite): users
    whose view converted to a purchase within 24h with NO error event
    strictly in between — the exclusion pattern plain funnels cannot
    express (events_funnel counts ordered stage hits; this one must
    also prove an absence). Reported as clean-converter count and mean
    minutes-to-convert over each user's earliest clean pair.

    The NOT-EXISTS decorrelates into an as-of shape: for each view the
    absence witness is the FIRST error after it, and the candidate is
    the FIRST purchase after it — both fall out of ONE per-user window
    ordered by time (MIN-over-following-rows), so there is no pair join
    and no per-pair subquery at all. A view converts cleanly iff its
    first following purchase lands within 24h and at-or-before its
    first following error; the earliest purchase that passes the oracle
    IS that first purchase (any later purchase is blocked by the same
    error). The oracle keeps the literal NOT EXISTS, proving the
    rewrite's equivalence.

    Scale: ONE shuffle (hash by user_id for the window); the groupBy
    that follows reuses the same partitioning, so the whole funnel is
    one exchange + one ordered pass per user. 'Strictly after' rides a
    RANGE frame over exact epoch micros (1 FOLLOWING excludes ts ties,
    matching the oracle's e.ts > v.ts), never a row frame that would
    split ties arbitrarily. This replaced a 2-join/3-groupBy spelling
    measured 1.94 s at the 25x probe.
    """
    from pyspark.sql import Window

    prep(spark)
    ev = timed(spark, sf_dir, user=True).where(
        F.col("event_type").isin("view", "purchase", "error")
    ).select("user_id", "event_type", "ts", F.unix_micros("ts").alias("m"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("m")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    marked = ev.select(
        "user_id",
        "event_type",
        "m",
        F.min(F.when(F.col("event_type") == "error", F.col("m"))).over(w).alias("fe"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("m"))).over(w).alias("fp"),
    )
    clean_views = marked.where(
        (F.col("event_type") == "view")
        & F.col("fp").isNotNull()
        & (F.col("fp") <= F.col("m") + F.lit(24 * 3600 * 1_000_000))
        & (F.col("fe").isNull() | (F.col("fp") <= F.col("fe")))
    )
    best = clean_views.groupBy("user_id").agg(
        F.min(F.struct(F.col("m").alias("vm"), F.col("fp").alias("pm"))).alias("s")
    )
    return best.agg(
        F.count(F.lit(1)).alias("n_clean_converters"),
        F.min("user_id").cast("bigint").alias("first_user"),
        F.max("user_id").cast("bigint").alias("last_user"),
        # floor-seconds difference == timestamp cast('long') subtraction
        # == the oracle's date_diff('second', ...) on positive epochs
        F.round(
            F.sum(
                F.expr("s.pm DIV 1000000") - F.expr("s.vm DIV 1000000")
            )
            / F.count(F.lit(1))
            / 60.0,
            4,
        ).alias("avg_minutes_to_convert"),
    )


@register(
    "events_rolling_correlation",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         SUM(CASE WHEN event_type = 'view'
                  THEN CAST(ROUND(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END * 100, 0) AS BIGINT) ELSE 0 END)
           AS v,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END * 100, 0) AS BIGINT) ELSE 0 END)
           AS p
  FROM events
  WHERE event_type IN ('view', 'purchase') AND ts IS NOT NULL
  GROUP BY 1
),
w AS (
  SELECT d,
         COUNT(*) OVER win AS n,
         SUM(v) OVER win AS sv,
         SUM(p) OVER win AS sp,
         SUM(v * v) OVER win AS svv,
         SUM(p * p) OVER win AS spp,
         SUM(v * p) OVER win AS svp
  FROM daily
  WINDOW win AS (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT CAST(d AS TIMESTAMP) AS d,
       CAST(n AS INT) AS n,
       ROUND(
         (CAST(n AS DOUBLE) * svp - CAST(sv AS DOUBLE) * sp)
         / NULLIF(SQRT((CAST(n AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv)
                       * (CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp)),
                  0.0),
         6) AS rolling_corr
FROM w
WHERE n = 14
ORDER BY d
""",
    tags=("events", "time-series", "rolling", "correlation"),
)
def events_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 14-day Pearson correlation between the daily view-value
    and purchase-value series: does engagement track conversion THIS
    month (not on average over all time — that is agg_moments_exact's
    global corr; the windowed version shows the relationship drifting).

    Exactness: the window carries SIX exact integer sums (n, Sv, Sp,
    Svv, Spp, Svp — cents^2 * 14 days stays far inside int64) and the
    correlation assembles from them per row with identical expression
    text in both engines; the zero-variance window (one series flat for
    14 days) yields NULL via NULLIF on both.

    Scale: one conditional-sum daily rollup (single fact pass), one
    bounded ROWS window over the date series — per-key partitioning
    when correlating millions of series pairs.
    """
    from pyspark.sql import Window

    prep(spark)
    cents = scaled_long("value")
    daily = (
        timed(spark, sf_dir)
        .where(F.col("event_type").isin("view", "purchase"))
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", cents).otherwise(
                    F.lit(0)
                )
            ).alias("v"),
            F.sum(
                F.when(F.col("event_type") == "purchase", cents).otherwise(
                    F.lit(0)
                )
            ).alias("p"),
        )
    )
    win = Window.orderBy("d").rowsBetween(-13, 0)
    w = daily.select(
        "d",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("v").over(win).alias("sv"),
        F.sum("p").over(win).alias("sp"),
        F.sum(F.col("v") * F.col("v")).over(win).alias("svv"),
        F.sum(F.col("p") * F.col("p")).over(win).alias("spp"),
        F.sum(F.col("v") * F.col("p")).over(win).alias("svp"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("svp") - F.col("sv").cast("double") * F.col("sp")
    den = F.sqrt(
        (n * F.col("svv") - F.col("sv").cast("double") * F.col("sv"))
        * (n * F.col("spp") - F.col("sp").cast("double") * F.col("sp"))
    )
    return (
        w.where(F.col("n") == 14)
        .select(
            F.col("d").cast("timestamp").alias("d"),
            F.col("n").cast("int").alias("n"),
            F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("rolling_corr"),
        )
        .orderBy("d")
    )


@register(
    "events_burstiness",
    oracle="""
WITH o AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_ts
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
gaps AS (
  SELECT user_id,
         date_diff('second', prev_ts, ts) AS gap
  FROM o WHERE prev_ts IS NOT NULL
),
s AS (
  SELECT user_id, COUNT(*) AS n,
         SUM(gap) AS sg, SUM(CAST(gap AS HUGEINT) * gap) AS sgg
  FROM gaps GROUP BY user_id
  HAVING COUNT(*) >= 20
),
b AS (
  SELECT user_id, n,
         CAST(sg AS DOUBLE) / n AS mu,
         SQRT((CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * sg / n) / n)
           AS sigma
  FROM s
)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
       ROUND(mu, 6) AS mean_gap_s,
       ROUND((sigma - mu) / NULLIF(sigma + mu, 0.0), 6) AS burstiness
FROM b
ORDER BY burstiness DESC, user_id
LIMIT 20
""",
    tags=("events", "time-series", "burstiness", "inter-arrival"),
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burstiness of inter-arrival times: B = (sigma - mu) /
    (sigma + mu) over the gaps between consecutive events (Goh-Barabasi
    coefficient; -1 = metronome, 0 = Poisson, ->1 = bursty). The
    temporal-shape screen that separates scripted/bot traffic (B near
    -1) from bursty humans at identical event COUNTS — a signal rate
    limiting and bot-detection both key on.

    Gaps are exact integer seconds (LAG over a user-partitioned window
    with event_id tie-breaks); (n, sum, sum-of-squares) are exact
    int64 sufficient statistics; sigma/mu assemble per user with
    identical text, and one-gap-flat users hit the NULLIF. Users need
    >= 20 gaps so the statistic means something.

    Scale: one user-partitioned window pass + one grouped reduction —
    co-partitioned after a single shuffle on user_id; top-20 is a
    TakeOrdered heap.
    """
    from pyspark.sql import Window

    prep(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = timed(spark, sf_dir, user=True).select(
        "user_id", "ts", F.lag("ts").over(w).alias("prev_ts")
    )
    gaps = o.where(F.col("prev_ts").isNotNull()).select(
        "user_id",
        (
            F.col("ts").cast("long") - F.col("prev_ts").cast("long")
        ).alias("gap"),
    )
    s = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("gap").alias("sg"),
            # widen BEFORE squaring: a 1970->2262 timestamp gap is
            # ~9.2e9 s, whose square passes INT64 — ANSI long*long
            # ABORTS (extremes full-sweep finding; oracle HUGEINT
            # matches). The >= 20-gap HAVING can't save it: the sum
            # computes before the filter.
            F.sum(F.col("gap").cast("decimal(38,0)") * F.col("gap")).alias("sgg"),
        )
        .where(F.col("n") >= 20)
    )
    mu = F.col("sg").cast("double") / F.col("n")
    sigma = F.sqrt(
        (
            F.col("sgg").cast("double")
            - F.col("sg").cast("double") * F.col("sg") / F.col("n")
        )
        / F.col("n")
    )
    return (
        s.select(
            "user_id",
            F.col("n").cast("bigint").alias("n_gaps"),
            F.round(mu, 6).alias("mean_gap_s"),
            F.round(
                (sigma - mu) / F.nullif(sigma + mu, F.lit(0.0)), 6
            ).alias("burstiness"),
        )
        .orderBy(F.desc("burstiness"), "user_id")
        .limit(20)
    )


@register(
    "events_ab_proportion_test",
    oracle="""
WITH users AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events
  GROUP BY user_id
),
arms AS (
  SELECT arm, COUNT(*) AS n, SUM(converted) AS conv
  FROM users GROUP BY arm
),
w AS (
  SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS na,
         MAX(CASE WHEN arm = 'A' THEN conv END) AS ca,
         MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
         MAX(CASE WHEN arm = 'B' THEN conv END) AS cb
  FROM arms
),
z AS (
  SELECT na, ca, nb, cb,
         CAST(ca AS DOUBLE) / na AS pa,
         CAST(cb AS DOUBLE) / nb AS pb,
         CAST(ca + cb AS DOUBLE) / (na + nb) AS pp
  FROM w
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       ROUND(pa, 6) AS conv_a,
       ROUND(pb, 6) AS conv_b,
       ROUND((pa - pb)
             / NULLIF(SQRT(pp * (1.0 - pp)
                           * (1.0 / na + 1.0 / nb)), 0.0), 6) AS z_stat,
       ROUND((CAST(na - nb AS DOUBLE) * (na - nb))
             / (CAST(na + nb AS DOUBLE)), 6) AS srm_chi2
FROM z
WHERE na > 0 AND nb > 0
""",
    tags=("events", "ab-test", "experimentation", "hypothesis-test"),
)
def events_ab_proportion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment (arms = user-id
    parity, metric = converted-to-purchase), plus the sample-ratio-
    mismatch chi-square on arm sizes (chi2 = (na-nb)^2/(na+nb) for the
    50/50 design — the FIRST check an experimentation platform runs;
    a significant SRM invalidates the experiment before any metric is
    read). The core experimentation primitive beside Welch t (means)
    and chi-square independence (categoricals).

    Per-user conversion flags are exact integers via one grouped MAX;
    both test statistics assemble from four exact counts with identical
    expression text and NULLIF degenerate guards.

    Scale: ONE reduction of the fact to per-user flags (map-side
    combinable), then a 2-row arm rollup — the entire test reads the
    fact once whatever its size.
    """
    prep(spark)
    users = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
        .select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
            "converted",
        )
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    w = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("cb"),
    )
    na, ca, nb, cb = (F.col(c) for c in ("na", "ca", "nb", "cb"))
    pa = ca.cast("double") / na
    pb = cb.cast("double") / nb
    pp = (ca + cb).cast("double") / (na + nb)
    return w.where((na > 0) & (nb > 0)).select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        F.round(pa, 6).alias("conv_a"),
        F.round(pb, 6).alias("conv_b"),
        F.round(
            (pa - pb)
            / F.nullif(
                F.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb)), F.lit(0.0)
            ),
            6,
        ).alias("z_stat"),
        F.round(
            ((na - nb).cast("double") * (na - nb))
            / (na + nb).cast("double"),
            6,
        ).alias("srm_chi2"),
    )


@register(
    "events_cuped",
    oracle="""
WITH span AS (
  SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid_us
  FROM events
),
per_user AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         SUM(CASE WHEN epoch_us(ts) < mid_us
                  THEN CAST(ROUND(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END * 100, 0) AS BIGINT)
                  ELSE 0 END) AS x,
         SUM(CASE WHEN epoch_us(ts) >= mid_us
                  THEN CAST(ROUND(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END * 100, 0) AS BIGINT)
                  ELSE 0 END) AS y
  FROM events CROSS JOIN span
  GROUP BY user_id
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM per_user
),
theta AS (
  SELECT n, sx, sy, syy,
         (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0) AS th
  FROM s
),
adj AS (
  SELECT p.arm,
         COUNT(*) AS n_arm,
         SUM(ROUND(p.y - t.th * (p.x - t.sx / t.n), 4)) AS s_adj,
         SUM(ROUND((p.y - t.th * (p.x - t.sx / t.n))
                   * (p.y - t.th * (p.x - t.sx / t.n)), 4)) AS s_adj2,
         SUM(p.y) AS s_raw
  FROM per_user p CROSS JOIN theta t
  GROUP BY p.arm
),
tot AS (
  SELECT t.n, t.sy, t.syy, t.th,
         (SELECT SUM(s_adj2) FROM adj) AS all_adj2,
         (SELECT SUM(s_adj) FROM adj) AS all_adj
  FROM theta t
)
SELECT a.arm,
       CAST(a.n_arm AS BIGINT) AS n_users,
       ROUND(CAST(a.s_raw AS DOUBLE) / a.n_arm / 100.0, 6) AS mean_raw,
       ROUND(a.s_adj / a.n_arm / 100.0, 6) AS mean_cuped,
       ROUND(1.0 - ((t.all_adj2 - t.all_adj * t.all_adj / t.n) / t.n)
                   / NULLIF((t.syy - t.sy * t.sy / t.n) / t.n, 0.0), 6)
         AS variance_reduction
FROM adj a CROSS JOIN tot t
ORDER BY a.arm
""",
    tags=("events", "ab-test", "cuped", "variance-reduction",
          "experimentation"),
)
def events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B experiment: each user's
    post-period metric y is adjusted by theta*(x - mean_x) where x is
    the user's PRE-period value (first half of the time range) and
    theta = cov(x,y)/var(x) — the industry-standard trick that shrinks
    experiment variance using pre-experiment behavior, reported as
    per-arm raw vs adjusted means and the overall variance-reduction
    fraction (1 - var_adj/var_raw).

    Exactness: per-user x/y are exact integer cents; theta and the
    means come from exact sufficient sums with one NULLIF-guarded
    divide; each user's adjusted value is rounded to 1e-4 before the
    per-arm sums (round-before-sum) so both engines add identical
    doubles.

    Scale: ONE pass over the fact into per-user (x, y) pairs, one
    sufficient-statistics rollup, one broadcast of the 1-row theta
    back over users — the fact never shuffles twice.
    """
    prep(spark)
    cents = scaled_long("value")
    # exact integer-microsecond midpoint: both engines floor-divide the
    # same two integers (a timestamp/interval spelling truncates to
    # seconds on one engine and not the other)
    span = table(spark, sf_dir, "events").agg(
        F.expr("(unix_micros(min(ts)) + unix_micros(max(ts))) DIV 2").alias(
            "mid_us"
        )
    )
    per_user = (
        table(spark, sf_dir, "events")
        .crossJoin(F.broadcast(span))
        .groupBy("user_id", "mid_us")
        .agg(
            F.sum(
                F.when(F.unix_micros("ts") < F.col("mid_us"), cents).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.unix_micros("ts") >= F.col("mid_us"), cents).otherwise(0)
            ).alias("y"),
        )
        .select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
            "x",
            "y",
        )
    )
    s = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy, sxx, sxy, syy = (
        F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy", "syy")
    )
    theta = s.select(
        n.alias("n"),
        sx.alias("sx"),
        sy.alias("sy"),
        syy.alias("syy"),
        ((n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))).alias(
            "th"
        ),
    )
    adjv = F.round(
        F.col("y") - F.col("th") * (F.col("x") - F.col("sx") / F.col("n")), 4
    )
    adj = (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_arm"),
            F.sum(adjv).alias("s_adj"),
            F.sum(adjv * adjv).alias("s_adj2"),
            F.sum("y").alias("s_raw"),
            F.max("n").alias("n"),
            F.max("sy").alias("sy"),
            F.max("syy").alias("syy"),
        )
    )
    allagg = adj.agg(
        F.sum("s_adj2").alias("all_adj2"), F.sum("s_adj").alias("all_adj")
    )
    var_red = F.round(
        1.0
        - (
            (F.col("all_adj2") - F.col("all_adj") * F.col("all_adj") / F.col("n"))
            / F.col("n")
        )
        / F.nullif(
            (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")) / F.col("n"),
            F.lit(0.0),
        ),
        6,
    )
    return (
        adj.crossJoin(F.broadcast(allagg))
        .select(
            "arm",
            F.col("n_arm").cast("bigint").alias("n_users"),
            F.round(
                F.col("s_raw").cast("double") / F.col("n_arm") / 100.0, 6
            ).alias("mean_raw"),
            F.round(F.col("s_adj") / F.col("n_arm") / 100.0, 6).alias(
                "mean_cuped"
            ),
            var_red.alias("variance_reduction"),
        )
        .orderBy("arm")
    )


@register(
    "events_diff_in_diff",
    oracle="""
WITH span AS (
  SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid_us
  FROM events
),
cells AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN epoch_us(ts) < mid_us THEN 'pre' ELSE 'post' END
           AS period,
         COUNT(*) AS n,
         SUM(CAST(ROUND(CASE WHEN isfinite(value) AND abs(value) < 1e12 THEN value END * 100, 0) AS BIGINT)) AS cents
  FROM events CROSS JOIN span
  GROUP BY 1, 2
),
w AS (
  SELECT MAX(CASE WHEN arm='A' AND period='pre'
                  THEN CAST(cents AS DOUBLE) / n END) AS a_pre,
         MAX(CASE WHEN arm='A' AND period='post'
                  THEN CAST(cents AS DOUBLE) / n END) AS a_post,
         MAX(CASE WHEN arm='B' AND period='pre'
                  THEN CAST(cents AS DOUBLE) / n END) AS b_pre,
         MAX(CASE WHEN arm='B' AND period='post'
                  THEN CAST(cents AS DOUBLE) / n END) AS b_post,
         SUM(n) AS n_events
  FROM cells
)
SELECT CAST(n_events AS BIGINT) AS n_events,
       ROUND(a_pre / 100.0, 6) AS a_pre,
       ROUND(a_post / 100.0, 6) AS a_post,
       ROUND(b_pre / 100.0, 6) AS b_pre,
       ROUND(b_post / 100.0, 6) AS b_post,
       ROUND(((b_post - b_pre) - (a_post - a_pre)) / 100.0, 6) AS did
FROM w
WHERE a_pre IS NOT NULL AND a_post IS NOT NULL
  AND b_pre IS NOT NULL AND b_post IS NOT NULL
""",
    tags=("events", "experimentation", "diff-in-diff", "causal"),
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: treatment effect = (B_post - B_pre) -
    (A_post - A_pre) over per-event mean values, arms by user parity
    and periods split at the exact integer-microsecond midpoint (same
    split discipline as events_cuped) — the causal-inference workhorse
    when only the treated arm changes and trends are parallel.

    All four cell means are exact-integer-sum / exact-count single
    divides; the DiD assembles from them with identical text; a draw
    missing any cell yields zero rows on both engines.

    Scale: ONE grouped aggregate over the fact into 4 cells. Nothing
    else touches the data.
    """
    prep(spark)
    cents = scaled_long("value")
    span = table(spark, sf_dir, "events").agg(
        F.expr("(unix_micros(min(ts)) + unix_micros(max(ts))) DIV 2").alias(
            "mid_us"
        )
    )
    cells = (
        table(spark, sf_dir, "events")
        .crossJoin(F.broadcast(span))
        .groupBy(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
            F.when(F.unix_micros("ts") < F.col("mid_us"), "pre")
            .otherwise("post")
            .alias("period"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents"))
    )
    mean = F.col("cents").cast("double") / F.col("n")

    def cell(arm: str, period: str):
        return F.max(
            F.when(
                (F.col("arm") == arm) & (F.col("period") == period), mean
            )
        )

    w = cells.agg(
        cell("A", "pre").alias("a_pre"),
        cell("A", "post").alias("a_post"),
        cell("B", "pre").alias("b_pre"),
        cell("B", "post").alias("b_post"),
        F.sum("n").alias("n_events"),
    )
    return w.where(
        F.col("a_pre").isNotNull()
        & F.col("a_post").isNotNull()
        & F.col("b_pre").isNotNull()
        & F.col("b_post").isNotNull()
    ).select(
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(F.col("a_pre") / 100.0, 6).alias("a_pre"),
        F.round(F.col("a_post") / 100.0, 6).alias("a_post"),
        F.round(F.col("b_pre") / 100.0, 6).alias("b_pre"),
        F.round(F.col("b_post") / 100.0, 6).alias("b_post"),
        F.round(
            (
                (F.col("b_post") - F.col("b_pre"))
                - (F.col("a_post") - F.col("a_pre"))
            )
            / 100.0,
            6,
        ).alias("did"),
    )


@register(
    "events_cdc_asof",
    oracle="""
WITH cut AS (
  -- make_timestamp(micros): exact integer construction — a /1e6 float
  -- round-trip drifts ~400us at 2024 epochs vs Spark's timestamp_micros
  SELECT make_timestamp(
           epoch_us(MIN(ts)) + 3 * (epoch_us(MAX(ts)) - epoch_us(MIN(ts)))
           // 4) AS t
  FROM events
),
log AS (
  SELECT user_id AS key, ts, event_id,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END
           AS op,
         event_type, value
  FROM events CROSS JOIN cut
  WHERE ts <= cut.t
),
latest AS (
  SELECT key, op, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY key
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY key) AS n_ops
  FROM log
)
SELECT key, event_type AS last_type, ROUND(value, 6) AS last_value,
       CAST(n_ops AS BIGINT) AS n_ops_asof
FROM latest
WHERE rn = 1 AND op = 'upsert'
""",
    tags=("events", "cdc", "time-travel", "as-of"),
)
def events_cdc_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) state reconstruction from the CDC log: the
    same last-writer-wins materialization as events_cdc_apply, but cut
    at T = 75% through the log's time range — the time-travel query a
    lakehouse answers from snapshots, answered here from the raw log by
    filtering ops to ts <= T BEFORE the per-key window. Together the
    pair demonstrates that any historical state is a filter parameter
    away (at the cost of replaying the log — the recorded trade-off of
    log-only storage vs checkpointed snapshots, SCALE.md row-level ops).

    The cut instant derives from exact integer microseconds (DIV
    arithmetic, same discipline as events_cuped) so both engines
    keep/drop identical rows at the boundary.

    Scale: the ts <= T predicate pushes into the scan (row groups past
    the cut never decompress); the rest is events_cdc_apply's single
    key-partitioned window.
    """
    from pyspark.sql import Window

    prep(spark)
    ev = table(spark, sf_dir, "events")
    cut = ev.agg(
        F.expr(
            "timestamp_micros(unix_micros(min(ts))"
            " + 3 * (unix_micros(max(ts)) - unix_micros(min(ts))) DIV 4)"
        ).alias("t")
    )
    log = (
        ev.crossJoin(F.broadcast(cut))
        .where(F.col("ts") <= F.col("t"))
        .select(
            F.col("user_id").alias("key"),
            "ts",
            "event_id",
            F.when(F.col("event_type") == "error", "delete")
            .otherwise("upsert")
            .alias("op"),
            "event_type",
            "value",
        )
    )
    w = Window.partitionBy("key").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = log.select(
        "key",
        "op",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("key")).alias("n_ops"),
    )
    return (
        latest.where((F.col("rn") == 1) & (F.col("op") == "upsert"))
        .select(
            "key",
            F.col("event_type").alias("last_type"),
            F.round("value", 6).alias("last_value"),
            F.col("n_ops").cast("bigint").alias("n_ops_asof"),
        )
    )
