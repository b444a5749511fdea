"""Throughput probe: the custom Python DataSource (hive_beacons) vs a
parquet binary column carrying the same datagrams.
Run:  python tools/pyds_probe.py [n_datagrams] [n_shards]

Measures a full scan + md5 checksum aggregation through both transports.
The Python source pays the per-row python->arrow boundary; parquet is
the JVM-native floor. The gap is the price of a custom-format reader in
pure Python — the posture note for when a landing format has no JVM
reader at all (the alternative is not parquet, it is no access).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from vault_8_hive_spark.session import get_spark  # noqa: E402
from vault_8_hive_spark.sources import pyds  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("pyds-probe")
    pyds.register_datasource(spark)

    d = tempfile.mkdtemp(prefix="pyds_probe_")
    old_n = pyds.N_SHARDS
    pyds.N_SHARDS = shards
    try:
        recs = [
            (i, hashlib.md5(str(i).encode()).digest() * 12)  # 192-byte payloads
            for i in range(n)
        ]
        pyds.write_datagram_shards(d, recs)
        pq = os.path.join(d, "pq")
        spark.createDataFrame(
            [(bid, bytearray(b)) for bid, b in recs], "beacon_id long, blob binary"
        ).repartition(shards).write.parquet(pq)

        for label, reader in (
            ("pyds", lambda: spark.read.format("hive_beacons").option("path", d).load()),
            ("parquet", lambda: spark.read.parquet(pq)),
        ):
            best = None
            for _ in range(3):
                t0 = time.time()
                got = reader().agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.crc32(F.col("blob"))).alias("ck"),
                ).collect()[0]
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                assert got.n == n
            print(f"{label}: {best:.2f}s best-of-3 ({n/best:.0f} rows/s)")
    finally:
        pyds.N_SHARDS = old_n
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
