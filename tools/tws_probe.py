"""Throughput probe: transformWithStateInPandas (state v2, RocksDB) vs
applyInPandasWithState (v1) vs the batch dual, on the sf0.1 events table
(100k rows, 4 micro-batches). Run:  python tools/tws_probe.py [sf_dir]

Measures wall seconds per full drain (fresh checkpoint per run) — the
honest comparison of the two arbitrary-state engines on identical input,
plus the batch lower bound.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from vault_8_hive_spark.catalog import normalize_events_ts  # noqa: E402
from vault_8_hive_spark.queries.streaming_batch import _events_split4  # noqa: E402
from vault_8_hive_spark.session import get_spark  # noqa: E402
from vault_8_hive_spark.streaming.tws import (  # noqa: E402
    OUT_SCHEMA,
    PARTIAL_SCHEMA,
    _V1_STATE,
    _finalize,
    _pre_reduce,
    _run_update_stream,
    _v1_stats,
    transform_user_stats,
    transform_user_stats_packed,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("tws-probe")
    src = _events_split4(spark, sf_dir)
    schema = spark.read.parquet(src).schema
    n_rows = spark.read.parquet(src).count()

    def stream():
        return normalize_events_ts(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    results = {}
    for run in range(2):  # run 0 warms the JVM/codegen; run 1 is reported
        t0 = time.time()
        df, engine = transform_user_stats(spark, stream(), allow_fallback=False)
        n_users = df.count()
        results["tws"] = time.time() - t0
        assert engine == "tws"

        t0 = time.time()
        dfp, engine = transform_user_stats_packed(
            spark, stream(), allow_fallback=False
        )
        dfp.count()
        results["packed"] = time.time() - t0
        assert engine == "tws"

        t0 = time.time()
        v1 = stream().mapInPandas(
            _pre_reduce, PARTIAL_SCHEMA
        ).groupBy("user_id").applyInPandasWithState(
            _v1_stats,
            outputStructType=OUT_SCHEMA,
            stateStructType=_V1_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
        _finalize(_run_update_stream(v1)).count()
        results["v1"] = time.time() - t0

        t0 = time.time()
        batch = spark.read.parquet(src)
        batch.groupBy("user_id").agg(
            F.count(F.lit(1)), F.sum("value"), F.min("event_id"), F.max("event_id")
        ).count()
        results["batch"] = time.time() - t0

    print(
        f"rows={n_rows} users={n_users} "
        f"tws={results['tws']:.2f}s ({n_rows/results['tws']:.0f} rows/s) "
        f"packed={results['packed']:.2f}s ({n_rows/results['packed']:.0f} rows/s) "
        f"v1={results['v1']:.2f}s ({n_rows/results['v1']:.0f} rows/s) "
        f"batch={results['batch']:.2f}s"
    )


if __name__ == "__main__":
    main()
