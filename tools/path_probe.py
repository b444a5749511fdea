#!/usr/bin/env python
"""Scale probe for the two argued-but-unmeasured 100 TB paths:

1. Beacon decode (the mapInPandas XTEA+bz2+TLV parse): throughput at the
   fixture's 200 records vs 25x (5000 records), so the per-row decode
   cost and the fixed Arrow/setup overhead separate cleanly.
2. Streaming replay vs batch: the x25 events table (2.5M rows) replayed
   through the watermarked tumbling-window aggregation as a multi-batch
   file stream (availableNow) vs the identical aggregation as one batch
   query — the streaming-machinery overhead at volume.

Measurement tooling only; run exclusively.

Usage: python tools/path_probe.py
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

X25_EVENTS = "/root/repo/.work/scale_probe_x25/events.parquet"


def beacon_throughput(spark, n: int, runs: int = 3) -> dict:
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from vault_8_hive_spark.sources.beacons import (
        encode_fixture_blob,
        from_hive_beacon,
        make_fixture_records,
    )

    rows = [
        (r["beacon_id"], bytearray(encode_fixture_blob(r)))
        for r in make_fixture_records(n=n)
    ]
    schema = StructType(
        [StructField("beacon_id", LongType()), StructField("blob", BinaryType())]
    )
    blobs = spark.createDataFrame(rows, schema).repartition(32)
    blobs.persist().count()  # materialize input so runs time DECODE only
    try:
        from_hive_beacon(blobs).count()  # warm
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            ok = from_hive_beacon(blobs).where("parse_ok = 'true'").count()
            samples.append(time.perf_counter() - t0)
        sec = statistics.median(samples)
        return {
            "n_blobs": n, "parse_ok": ok, "sec": round(sec, 3),
            "rows_per_s": round(n / sec), "us_per_row": round(1e6 * sec / n, 1),
        }
    finally:
        blobs.unpersist()


def stream_vs_batch(spark) -> dict:
    import uuid

    from pyspark.sql import functions as F

    from vault_8_hive_spark.functions.exact import dec, round4

    def agg(df):
        return df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            round4(F.sum(dec("value", "decimal(18,4)"))).alias("total_value"),
        )

    # 8 shuffle partitions for BOTH sides: each shuffle partition of a
    # streaming aggregation is a state-store instance whose checkpoint
    # churn is paid per micro-batch — 32 instances for a 25-window result
    # is pure overhead (measured ~25% worse at 32).
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    batch_df = spark.read.parquet(X25_EVENTS)
    agg(batch_df).toPandas()  # warm
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        n_batch = len(agg(batch_df).toPandas())
        runs.append(time.perf_counter() - t0)
    batch_s = statistics.median(runs)

    schema = batch_df.schema

    def run_stream(files_per_trigger: int) -> tuple[float, int, int]:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(X25_EVENTS)
            .withWatermark("ts", "10 minutes")
        )
        name = f"probe_{uuid.uuid4().hex[:8]}"
        t0 = time.perf_counter()
        q = (
            agg(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        sec = time.perf_counter() - t0
        n = spark.table(name).count()
        spark.catalog.dropTempView(name)
        return sec, n, len(q.recentProgress)

    run_stream(2)  # warm: first streaming query pays JVM/state-store init
    multi_runs, single_runs = [], []
    for _ in range(3):
        s, n_multi, n_batches = run_stream(2)
        multi_runs.append(s)
        s, n_single, _ = run_stream(len(batch_df.inputFiles()))
        single_runs.append(s)
    multi_s = statistics.median(multi_runs)
    single_s = statistics.median(single_runs)
    return {
        "events": batch_df.count(),
        "batch_sec": round(batch_s, 3),
        "stream_sec_multi_batch": round(multi_s, 3),
        "micro_batches": n_batches,
        "stream_sec_single_batch": round(single_s, 3),
        "stream_over_batch_multi": round(multi_s / batch_s, 2),
        "stream_over_batch_single": round(single_s / batch_s, 2),
        "rows_match": n_batch == n_multi == n_single,
    }


def main() -> None:
    from vault_8_hive_spark.session import get_spark

    spark = get_spark(app_name="path-probe")
    out = {
        "beacon_decode": [beacon_throughput(spark, 200), beacon_throughput(spark, 5000)],
        "stream_replay": stream_vs_batch(spark),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
