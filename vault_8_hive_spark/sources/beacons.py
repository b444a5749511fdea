"""Beacon source: deterministic fixture generator + from_hive_beacon UDF.

The landing-zone pattern for the reference's data path (SURVEY.md §3.1):
BTHP-enveloped beacon blobs (binary column) -> `from_hive_beacon`
(Arrow-batched mapInPandas around functions/codecs.decode_bthp +
decode_beacon) -> typed bronze table -> JVM-side text parses to silver
telemetry tables (queries/domain.py).

Fixture fidelity to the reference:
- the wire chain is BTHP envelope (honeycomb/honeycomb.py:138-183: outer
  '>BBHII' header + typed sub-headers carrying beacon/dst/proxy IPs)
  around TLV -> bz2 (version >= 23) -> XTEA (server/beacon.c:200-458);
- the embedded ifconfig / netstat_rn text blobs come in the THREE per-OS
  dialects the LP's enrichment pipeline dispatches on
  (honeycomb/processRSI.py:120-248 interfaces, :249-283 routes:
  MikroTik / Solaris / Linux shapes);
- proc_list rows follow server/process_list.c:182-227 field order
  (pid state ppid pgrp session command); the Linux popen variant
  (server/get_data.c) prefixes the `ps`-style header line, which the
  silver parse must drop.

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

from ..functions.codecs import (
    OS_NAMES,
    decode_beacon,
    decode_bthp,
    encode_beacon,
    encode_bthp,
)

FIXTURE_KEY = hashlib.md5(b"vault8-fixture-key").digest()  # 16 bytes, deterministic
N_FIXTURE_BEACONS = 200

# Bump whenever the fixture content changes shape: landing directories
# derived from these records (.work/*/rsi_landing, beacon_stream) are
# stamped with this tag and rebuilt on mismatch, so stale data from an
# earlier fixture generation can never silently serve a query.
FIXTURE_VERSION = "r2-bthp-dialects-1"

BEACON_SCHEMA = StructType(
    [
        StructField("beacon_id", LongType()),
        StructField("parse_ok", StringType()),  # 'true'/'false' (see note)
        StructField("version", IntegerType()),
        StructField("os", IntegerType()),
        StructField("os_name", StringType()),
        StructField("mac", StringType()),
        StructField("uptime_s", LongType()),
        StructField("next_beacon_s", IntegerType()),
        StructField("beacon_ip", StringType()),
        StructField("dst_ip", StringType()),
        StructField("proxy_ip", StringType()),
        StructField("bytecount", LongType()),
        StructField("proc_list", StringType()),
        StructField("ipconfig", StringType()),
        StructField("netstat_rn", StringType()),
        StructField("netstat_an", StringType()),
    ]
)
# parse_ok is a string, not a boolean, for oracle-hash symmetry: a NULL
# boolean round-trips as None from Spark but NaN from DuckDB (see
# queries/composites.py) — and downstream VALUES oracles embed this
# column directly.

_OS_CODES = sorted(OS_NAMES)
_COMMANDS = ("init", "sshd", "cron", "ntpd", "syslogd", "httpd", "getty", "sh")


def dialect_of(os_code: int) -> str:
    """Text-telemetry dialect family for an OS code (the dispatch the LP
    performs on the `os` extraData: processRSI.py:121,167,207 branches on
    'ikro'/'olar'/else)."""
    name = OS_NAMES.get(os_code, "unknown")
    if name.startswith("mikrotik"):
        return "mikrotik"
    if name.startswith("solaris"):
        return "solaris"
    return "linux"


# Primary-interface name per dialect (loopback rendered alongside so the
# parsers must not blindly take the first interface).
_IFNAMES = {"linux": "eth0", "solaris": "ce0", "mikrotik": "ether1"}


def render_ifconfig(dialect: str, ip: str, mac: str) -> str:
    """Interface table in the per-OS text shape processRSI.py parses."""
    name = _IFNAMES[dialect]
    if dialect == "linux":
        # processRSI.py:207-248: 'Link encap' header line (name = token 0,
        # mac = token 4), 'inet addr:<ip>' detail lines.
        return (
            f"{name} Link encap:Ethernet HWaddr {mac}\n"
            f"  inet addr:{ip} Bcast:255.255.255.255 Mask:255.255.255.0\n"
            f"  inet6 addr: fe80::1/64 Scope:Link\n"
            f"lo Link encap:Local Loopback\n"
            f"  inet addr:127.0.0.1 Mask:255.0.0.0"
        )
    if dialect == "solaris":
        # processRSI.py:167-206: '<FLAGS>' header (name = before ':'),
        # 'inet <ip>' and 'ether <mac>' detail lines.
        return (
            f"{name}: flags=1000843 <UP,BROADCAST,RUNNING,MULTICAST> mtu 1500\n"
            f"\tinet {ip} netmask ffffff00\n"
            f"\tether {mac}\n"
            f"lo0: flags=2001000849 <UP,LOOPBACK,RUNNING> mtu 8232\n"
            f"\tinet 127.0.0.1 netmask ff000000"
        )
    # processRSI.py:121-166 (MikroTik): ': <FLAGS>' header, tabbed
    # 'HW addr:' / 'inet addr:' detail lines (value = token 2).
    return (
        f"{name}: <UP,BROADCAST,RUNNING>\n"
        f" HW addr:\t{mac}\n"
        f" inet addr:\t{ip}\n"
        f"lo: <UP,LOOPBACK>\n"
        f" inet addr:\t127.0.0.1"
    )


def render_routes(dialect: str, gw: str, net24: str) -> str:
    """Routing table in the per-OS shape processRSI.py:249-283 parses:
    Solaris flags the default route with a leading 'default', Linux with
    '0.0.0.0' at column 0, MikroTik with '0.0.0.0' at column 1."""
    name = _IFNAMES[dialect]
    if dialect == "linux":
        return (
            f"0.0.0.0 {gw} 0.0.0.0 UG 0 0 0 {name}\n"
            f"{net24}.0 0.0.0.0 255.255.255.0 U 0 0 0 {name}"
        )
    if dialect == "solaris":
        return (
            f"default {gw} UG 1 247 {name}\n"
            f"{net24}.0 {gw} U 1 0 {name}"
        )
    return (
        f" 0.0.0.0 {gw} 255.255.255.0 UG {name}\n"
        f" {net24}.0 0.0.0.0 255.255.255.0 U {name}"
    )


def render_proc_list(dialect: str, rows: list[tuple[int, str, int, int, int, str]]) -> str:
    """process rows (pid state ppid pgrp session command) in the
    server/process_list.c:182-227 fixed-width shape; the Linux popen
    variant (server/get_data.c) carries the ps-style header line."""
    body = "\n".join(
        f"{pid:>5} {st} {ppid:>5} {pgrp:>5} {sess:>5} {cmd}"
        for (pid, st, ppid, pgrp, sess, cmd) in rows
    )
    if dialect == "linux":
        return "  PID STATE  PPID  PGRP  SESS COMMAND\n" + body
    return body


def make_fixture_records(n: int = N_FIXTURE_BEACONS, seed: int = 42) -> list[dict]:
    """Deterministic beacon dicts: 20 distinct MACs, every OS code (so all
    three telemetry dialects appear), BTHP envelope IPs, ~10% records with
    absent TLV sections (nullability per the wire format)."""
    rng = random.Random(seed)
    recs = []
    for i in range(n):
        mac = f"aa-bb-cc-dd-{(i % 20) // 16:02x}-{i % 20 % 16:02x}"
        os_code = _OS_CODES[i % len(_OS_CODES)]
        d = dialect_of(os_code)
        proc_rows = [
            (100 + j, "S", 1, 100 + j, 100 + j, rng.choice(_COMMANDS))
            for j in range(rng.randint(3, 8))
        ]
        gw_octet = rng.randint(0, 3)
        ip = f"10.{i % 7}.{gw_octet}.{rng.randint(2, 250)}"
        # Most gateways share the interface's /24; every 11th record only
        # the /16, every 13th only the /8 — so the longest-prefix-match
        # join has to exercise all three depths.
        gw_second = (i % 7 + 3) if i % 13 == 0 else i % 7
        gw_third = (gw_octet + 1) % 4 if i % 11 == 0 else gw_octet
        gw = f"10.{gw_second}.{gw_third}.1"
        net24 = f"10.{gw_second}.{gw_third}"
        netstat_an = "\n".join(
            f"tcp 10.{i % 7}.{gw_octet}.9:{rng.randint(1024, 60000)} "
            f"198.51.100.{rng.randint(1, 250)}:443 ESTABLISHED"
            for _ in range(rng.randint(1, 4))
        )
        rec = {
            "beacon_id": i,
            "version": 29 if i % 4 else 22,  # exercise the pre-compression branch
            "os": os_code,
            "dialect": d,
            "mac": mac,
            "uptime_s": rng.randint(60, 10_000_000),
            "next_beacon_s": rng.choice((300, 600, 3600)),
            # BTHP envelope fields (sub-header types 2/3/6)
            "beacon_ip": ip,
            "dst_ip": f"192.0.2.{1 + i % 9}",
            "proxy_ip": f"198.51.100.{1 + i % 5}",
            "proc_list": render_proc_list(d, proc_rows) if i % 10 else None,
            "ipconfig": render_ifconfig(d, ip, mac),
            "netstat_rn": render_routes(d, gw, net24),
            "netstat_an": netstat_an if i % 7 else None,
            # parse targets for the oracle mirrors
            "_iface": _IFNAMES[d],
            "_iface_ip": ip,
            "_gateway": gw,
            "_procs": proc_rows if i % 10 else [],
        }
        recs.append(rec)
    return recs


def encode_fixture_blob(rec: dict) -> bytes:
    """Full wire encoding of one fixture record: TLV -> bz2 -> XTEA inner
    beacon, wrapped in the BTHP proxy envelope."""
    inner = encode_beacon(rec, FIXTURE_KEY)
    return encode_bthp(
        inner,
        beacon_ip=rec.get("beacon_ip"),
        dst_ip=rec.get("dst_ip"),
        proxy_ip=rec.get("proxy_ip"),
        proxy_id=88,
    )


# Deliberately-corrupt landing blobs (ids >= _BAD_ID_BASE): a truncated
# datagram and a bit-flipped ciphertext. A 100 TB ingest ALWAYS contains
# malformed records; the decoder must surface them as parse_ok=false rows,
# never as task failures.
_BAD_ID_BASE = 1_000_000


def bad_fixture_blobs() -> list[tuple[int, bytes]]:
    good = encode_fixture_blob(make_fixture_records(n=1)[0])
    flipped = bytearray(good)
    flipped[len(flipped) // 2] ^= 0xFF  # corrupt the XTEA ciphertext
    return [
        (_BAD_ID_BASE + 0, good[:11]),       # truncated mid-envelope
        (_BAD_ID_BASE + 1, bytes(flipped)),  # undecryptable body
    ]


def fixture_blobs_df(spark: SparkSession, include_bad: bool = False) -> DataFrame:
    """DataFrame(beacon_id long, blob binary) of enveloped fixture beacons
    — the raw landing zone (optionally with the corrupt-record matrix)."""
    rows = [
        (r["beacon_id"], bytearray(encode_fixture_blob(r)))
        for r in make_fixture_records()
    ]
    if include_bad:
        rows += [(bid, bytearray(b)) for bid, b in bad_fixture_blobs()]
    schema = StructType(
        [StructField("beacon_id", LongType()), StructField("blob", BinaryType())]
    )
    return spark.createDataFrame(rows, schema)


_NULL_ROW = (None,) * (len(BEACON_SCHEMA.fields) - 2)


def _decode_batches(pdf_iter):
    for pdf in pdf_iter:
        out = []
        for bid, blob in zip(pdf["beacon_id"], pdf["blob"]):
            try:
                env, inner = decode_bthp(bytes(blob))
                d = decode_beacon(inner, FIXTURE_KEY)
                out.append(
                    (
                        int(bid),
                        "true",
                        d["version"],
                        d["os"],
                        OS_NAMES.get(d["os"], "unknown"),
                        d["mac"],
                        d["uptime_s"],
                        d["next_beacon_s"],
                        env["beacon_ip"],
                        env["dst_ip"],
                        env["proxy_ip"],
                        env["bytecount"],
                        d["proc_list"],
                        d["ipconfig"],
                        d["netstat_rn"],
                        d["netstat_an"],
                    )
                )
            except Exception:
                # malformed record: flagged row, not a task failure
                out.append((int(bid), "false") + _NULL_ROW)
        yield pd.DataFrame(out, columns=[f.name for f in BEACON_SCHEMA.fields])


def from_hive_beacon(blobs: DataFrame) -> DataFrame:
    """Decode a (beacon_id, blob) DataFrame into the typed bronze beacons
    table — the engine's signature parsing UDF (mapInPandas): BTHP
    envelope fields + decoded TLV sections per row. Malformed blobs
    (truncated envelope, undecryptable body, bad bz2) become
    parse_ok='false' rows with null fields."""
    return blobs.mapInPandas(_decode_batches, schema=BEACON_SCHEMA)


def bronze_beacons(spark: SparkSession) -> DataFrame:
    """The clean bronze table (parse_ok rows only) every silver-layer
    query builds on; the raw parse including bad records is
    domain_beacon_parse's surface."""
    return from_hive_beacon(fixture_blobs_df(spark)).where(F.col("parse_ok") == "true")
