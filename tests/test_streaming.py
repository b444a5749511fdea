"""Streaming tests beyond the oracle entries: file sink round trip and
incremental (multi-batch) semantics of the stateful operator."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from vault_8_hive_spark.queries.formats import WORK_DIR
from vault_8_hive_spark.streaming.ops import stream_events


def test_stream_parquet_sink_roundtrip(spark, sf_dir):
    """readStream -> filter -> writeStream(parquet) -> read back: the
    append file sink must deliver exactly the filtered rows."""
    out = f"{WORK_DIR}/stream_sink_{uuid.uuid4().hex[:8]}"
    ev = stream_events(spark, sf_dir).where(F.col("event_type") == "purchase")
    q = (
        ev.writeStream.format("parquet")
        .option("path", f"{out}/data")
        .option("checkpointLocation", f"{out}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        got = spark.read.parquet(f"{out}/data").count()
        want = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .where(F.col("event_type") == "purchase")
            .count()
        )
        assert got == want
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_watermark_metadata_present(spark, sf_dir):
    """withWatermark must annotate the plan's event-time column."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", "10 minutes")
    assert "watermark" in ev._jdf.queryExecution().analyzed().toString().lower()
