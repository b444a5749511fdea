"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
settings are the documented starting point for a multi-executor cluster at
the 100 TB design point (see SCALE.md): AQE on (runtime re-planning, skew
join splitting, partition coalescing), UTC session timezone (oracle
comparability), Arrow for every Python boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


def get_spark(app_name: str = "vault-8-hive-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Shuffle partitions default to the core count: at local scale every
    partition stays in memory; on a real cluster this is overridden to
    ~2-3x total executor cores (and AQE coalesces down after the fact).
    """
    n = cpus or _cpus()
    # Export the protobuf-shim PYTHONPATH BEFORE the JVM launches so
    # transformWithStateInPandas workers inherit it (no-op if the machine
    # lacks the on-disk SDK protobuf; see compat/protobuf_alias.py).
    from .compat.protobuf_alias import ensure_tws_env

    ensure_tws_env()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # UI off for bench hygiene; SPARK_GRAFT_UI=1 turns it on for the
        # stage-timing probe (tools/stage_probe.py reads the REST API).
        .config("spark.ui.enabled",
                "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false")
    )
    return builder.getOrCreate()


def prep(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable session conf the engine depends on.

    Called at the top of every registered query so results are correct even
    when the caller (e.g. the verify driver) built its own SparkSession.
    Only CORRECTNESS-critical runtime keys belong here — performance knobs
    stay in get_spark()/bench so callers can tune without prep undoing it.
    """
    # Read-before-write: an unconditional conf.set invalidates the
    # session's plan/codegen caches and costs ~0.5s of recompilation on
    # the next query — a no-op set must stay a true no-op.
    # (no default arg: conf.get validates defaults for this key and throws
    # on an empty string when the key is unset)
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Some driver rounds ship events.parquet as TIMESTAMP(NANOS), which
    # vanilla Spark rejects; with this conf the raw int64 comes through
    # and catalog.normalize_events_ts converts to micros (matching DuckDB,
    # which truncates parquet nanos). Harmless when the landing file is
    # already micros (current rounds) — normalize_events_ts branches on
    # the observed dtype.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
