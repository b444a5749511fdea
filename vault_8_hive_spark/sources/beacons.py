"""Beacon source: deterministic fixture generator + from_hive_beacon UDF.

The landing-zone pattern for the reference's data path (SURVEY.md §3.1):
encoded beacon blobs (binary column) -> `from_hive_beacon` (Arrow-batched
pandas UDF around functions/codecs.decode_beacon) -> typed bronze table ->
JVM-side text parses to silver telemetry tables (queries/domain.py).

Scale: decode is embarrassingly parallel per blob — mapInPandas batches
keep it Arrow-vectorized at the boundary; everything after the bronze
table is pure DataFrame expressions.
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.codecs import OS_NAMES, decode_beacon, encode_beacon

FIXTURE_KEY = hashlib.md5(b"vault8-fixture-key").digest()  # 16 bytes, deterministic
N_FIXTURE_BEACONS = 200

BEACON_SCHEMA = StructType(
    [
        StructField("beacon_id", LongType()),
        StructField("version", IntegerType()),
        StructField("os", IntegerType()),
        StructField("os_name", StringType()),
        StructField("mac", StringType()),
        StructField("uptime_s", LongType()),
        StructField("next_beacon_s", IntegerType()),
        StructField("proc_list", StringType()),
        StructField("ipconfig", StringType()),
        StructField("netstat_rn", StringType()),
        StructField("netstat_an", StringType()),
    ]
)

_OS_CODES = sorted(OS_NAMES)
_COMMANDS = ("init", "sshd", "cron", "ntpd", "syslogd", "httpd", "getty", "sh")


def make_fixture_records(n: int = N_FIXTURE_BEACONS, seed: int = 42) -> list[dict]:
    """Deterministic beacon dicts: 20 distinct MACs, all OS codes, ~10%
    records with absent TLV sections (nullability per the wire format)."""
    rng = random.Random(seed)
    recs = []
    for i in range(n):
        mac = f"aa-bb-cc-dd-{(i % 20) // 16:02x}-{i % 20 % 16:02x}"
        os_code = _OS_CODES[i % len(_OS_CODES)]
        procs = "\n".join(
            f"{100 + j:>5} S {1:>5} {100 + j:>5} {100 + j:>5} {rng.choice(_COMMANDS)}"
            for j in range(rng.randint(3, 8))
        )
        gw_octet = rng.randint(0, 3)
        ipconfig = (
            f"eth0 ip 10.{i % 7}.{gw_octet}.{rng.randint(2, 250)} mac {mac}\n"
            f"lo ip 127.0.0.1 mac 00-00-00-00-00-00"
        )
        netstat_rn = (
            f"0.0.0.0 10.{i % 7}.{gw_octet}.1 UG eth0\n"
            f"10.{i % 7}.0.0 0.0.0.0 U eth0"
        )
        netstat_an = "\n".join(
            f"tcp 10.{i % 7}.{gw_octet}.9:{rng.randint(1024, 60000)} "
            f"198.51.100.{rng.randint(1, 250)}:443 ESTABLISHED"
            for _ in range(rng.randint(1, 4))
        )
        rec = {
            "beacon_id": i,
            "version": 29 if i % 4 else 22,  # exercise the pre-compression branch
            "os": os_code,
            "mac": mac,
            "uptime_s": rng.randint(60, 10_000_000),
            "next_beacon_s": rng.choice((300, 600, 3600)),
            "proc_list": procs if i % 10 else None,  # absent-TLV nullability
            "ipconfig": ipconfig,
            "netstat_rn": netstat_rn,
            "netstat_an": netstat_an if i % 7 else None,
        }
        recs.append(rec)
    return recs


def fixture_blobs_df(spark: SparkSession) -> DataFrame:
    """DataFrame(beacon_id long, blob binary) of encoded fixture beacons —
    the raw landing zone."""
    rows = [
        (r["beacon_id"], bytearray(encode_beacon(r, FIXTURE_KEY)))
        for r in make_fixture_records()
    ]
    schema = StructType(
        [StructField("beacon_id", LongType()), StructField("blob", BinaryType())]
    )
    return spark.createDataFrame(rows, schema)


def _decode_batches(pdf_iter):
    for pdf in pdf_iter:
        out = []
        for bid, blob in zip(pdf["beacon_id"], pdf["blob"]):
            d = decode_beacon(bytes(blob), FIXTURE_KEY)
            out.append(
                (
                    int(bid),
                    d["version"],
                    d["os"],
                    OS_NAMES.get(d["os"], "unknown"),
                    d["mac"],
                    d["uptime_s"],
                    d["next_beacon_s"],
                    d["proc_list"],
                    d["ipconfig"],
                    d["netstat_rn"],
                    d["netstat_an"],
                )
            )
        yield pd.DataFrame(out, columns=[f.name for f in BEACON_SCHEMA.fields])


def from_hive_beacon(blobs: DataFrame) -> DataFrame:
    """Decode a (beacon_id, blob) DataFrame into the typed bronze beacons
    table — the engine's signature parsing UDF (mapInPandas)."""
    return blobs.mapInPandas(_decode_batches, schema=BEACON_SCHEMA)


def bronze_beacons(spark: SparkSession) -> DataFrame:
    return from_hive_beacon(fixture_blobs_df(spark))
