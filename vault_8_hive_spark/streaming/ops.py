"""Structured Streaming building blocks (SURVEY.md §2B streaming rows).

Each operator reads the `events` table as a file stream (the replay of the
reference's unbounded beacon stream, SURVEY.md §1.3), applies a streaming
transformation — windowed agg, session windows, watermarked dedup,
arbitrary state — and is driven to completion with an availableNow trigger
into a memory sink, so batch-replay equivalence against the DuckDB oracle
is checkable by the driver.

Production shape (100 TB): the same plans run against a socket/kafka
source with processing-time triggers; watermarks bound state; the memory
sink becomes a partitioned parquet/Delta append. Nothing in the plan
changes — only source/sink/trigger.
"""

from __future__ import annotations

import uuid

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState

from ..session import prep


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream (ts normalized to micros
    exactly like the batch catalog)."""
    prep(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # Point the file source at an events GLOB — never at sf_dir with a
    # pathGlobFilter: partition discovery over the whole corpus dir trips
    # on unrelated sibling directories (a compaction layout, a
    # foreachBatch sink's batch_id=N partitions) with conflicting roots
    # (KD009), seen at the sf1-native probe. The glob (not the bare file
    # path) keeps the source's derived basePath a directory, which the
    # file source requires, and matches either a single landing file or
    # a directory of parts.
    raw = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parquet*")
    from ..catalog import normalize_events_ts

    # Event-time streaming is DEFINED over timestamped rows: a NULL
    # event time under a watermark is engine-defined behavior (window
    # aggs silently drop it, joins never match it, state ops can crash
    # on NaT) — the source declares the domain instead (null-flood
    # sweep, round 7; every consumer's oracle carries the same WHERE).
    # ... and the domain is BOUNDED: a single far-future event advances
    # the watermark past every honest producer (everything after it
    # drops as "late"), and an epoch-zero event is late the moment any
    # current event arrives — WHICH micro-batch such a row lands in
    # decides whether it survives, i.e. the answer becomes a SCHEDULING
    # artifact (observed live: the extremes corpus's 1970 view survived
    # one run's batching and not another's). Every production stream
    # carries this clock-skew guard; every consumer's oracle carries the
    # identical WHERE.
    return normalize_events_ts(raw).where(
        F.col("ts").isNotNull()
        & (F.col("ts") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2200-01-01").cast("timestamp"))
    )


def run_to_memory(df: DataFrame, mode: str) -> DataFrame:
    """Drive a streaming DataFrame to completion (availableNow) into a
    memory sink; returns the sink contents as a batch DataFrame."""
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = df.sparkSession
    # Detach the (small, aggregated) result from the memory sink and drop
    # the sink's temp view — otherwise every call leaks a materialized
    # result set into driver memory for the session's lifetime.
    out = spark.table(name)
    try:
        # Guard the driver-side detach: the collect is only safe because
        # every caller sinks an *aggregated* stream whose cardinality is
        # bounded by its grouping keys. An unaggregated stream routed
        # through here would flood the driver — fail loudly instead.
        n = out.count()
        if n > 1_000_000:
            raise RuntimeError(
                f"memory sink {name} holds {n} rows; run_to_memory is for "
                "aggregated (key-bounded) streams only"
            )
        rows, schema = out.collect(), out.schema
    finally:
        # Drop the sink view on BOTH paths — the failure path must not
        # permanently pin the very result set the guard rejects.
        spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, schema)


# --- stateful operator: per-user running stats via applyInPandasWithState --

STATE_SCHEMA = "n bigint, vmax double"
OUTPUT_SCHEMA = "user_id bigint, n_events bigint, max_value double"


def _user_stats(key, pdf_iter, state: GroupState):
    """Arbitrary stateful aggregation: running event count + max value per
    user (the engine's flatMapGroupsWithState analog; the fleet-liveness
    detector uses the same shape over beacon streams).

    The max rides the FINITE-measure contract (functions/exact.py
    scaled_long): a float column reaching pandas can't distinguish SQL
    NULL from NaN, and pandas .max() skips NaN where SQL MAX ranks it
    greatest — so both spellings reduce over finite values only, and a
    user with none reports NULL (extremes sweep, round 7)."""
    import numpy as np

    n, vmax = state.get if state.exists else (0, None)
    for pdf in pdf_iter:
        n += len(pdf)
        vals = pdf["value"].to_numpy(dtype="float64", na_value=np.nan)
        vals = vals[np.isfinite(vals) & (np.abs(vals) < 1e12)]
        if len(vals):
            m = float(vals.max())
            vmax = m if vmax is None else max(vmax, m)
    state.update((n, vmax))
    yield pd.DataFrame([(key[0], n, vmax)], columns=["user_id", "n_events", "max_value"])


def stateful_user_stats(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").applyInPandasWithState(
        _user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
