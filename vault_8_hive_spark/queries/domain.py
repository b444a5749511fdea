"""Domain-layer queries over the reference's record formats (SURVEY.md §1):
beacon codec round-trip through the engine, OS rollups, telemetry text
parsing to silver tables, and the gateway<->interface longest-prefix-match
join — the one real join in the reference (honeycomb/processRSI.py:287-320),
re-expressed as broadcast-joinable prefix keys.

Oracle strategy: the fixture corpus is deterministic (sources/beacons.py),
so each oracle embeds the *encoder inputs* as a VALUES relation. The Spark
side must reproduce them through the full encode -> XTEA/bz2/TLV -> decode
-> parse pipeline: a true independent round-trip check the driver can hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.codecs import OS_NAMES
from ..session import prep
from ..sources.beacons import (
    FIXTURE_KEY,
    bronze_beacons,
    make_fixture_records,
)
from . import register

_RECORDS = make_fixture_records()


def _dialect_col():
    """os_name -> telemetry dialect (the LP's dispatch, processRSI.py:
    121/167/207: 'ikro' / 'olar' / else-Linux branches)."""
    return (
        F.when(F.col("os_name").startswith("mikrotik"), "mikrotik")
        .when(F.col("os_name").startswith("solaris"), "solaris")
        .otherwise("linux")
    )


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        # DuckDB does not interpret backslash escapes inside plain '...'
        # literals, so newline-bearing values are built by concatenating
        # chr(10)/chr(13) — never by emitting a literal backslash-n.
        parts = []
        for segment in v.replace("\r", "\n\r").split("\n"):
            if segment.startswith("\r"):
                parts.append("chr(13)")
                segment = segment[1:]
            else:
                parts.append("chr(10)")
            parts.append("'" + segment.replace("'", "''") + "'")
        expr = " || ".join(parts[1:]) if parts else "''"
        return f"({expr})" if len(parts) > 2 else parts[1]
    return str(v)


def _values(rows: list[tuple], cols: list[str]) -> str:
    body = ",\n".join("(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows)
    return f"(VALUES\n{body}\n) AS t({', '.join(cols)})"


# --- 1. codec round-trip ----------------------------------------------------


_BYTECOUNT_MEMO: dict[int, int] = {}


def _expected_bytecount(r: dict) -> int:
    """The BTHP header's dataLen = size of the encapsulated (TLV->bz2->
    XTEA) beacon — recomputed here independently for the oracle.
    Memoized by beacon_id: three import-time call sites (beacon-parse
    VALUES, rsi VALUES, rsi rendering) would otherwise each pay 200
    pure-python encodes."""
    bid = r["beacon_id"]
    if bid not in _BYTECOUNT_MEMO:
        from ..functions.codecs import encode_beacon

        _BYTECOUNT_MEMO[bid] = len(encode_beacon(r, FIXTURE_KEY))
    return _BYTECOUNT_MEMO[bid]


_PARSE_COLS = [
    "beacon_id", "parse_ok", "version", "os_name", "mac", "uptime_s",
    "next_beacon_s", "beacon_ip", "proxy_ip", "bytecount", "has_procs",
]
_PARSE_ROWS = [
    (
        r["beacon_id"],
        "true",
        r["version"],
        OS_NAMES[r["os"]],
        r["mac"],
        r["uptime_s"],
        r["next_beacon_s"],
        r["beacon_ip"],
        r["proxy_ip"],
        _expected_bytecount(r),
        r["proc_list"] is not None,
    )
    for r in _RECORDS
]


def _bad_parse_rows() -> list[tuple]:
    from ..sources.beacons import bad_fixture_blobs

    return [
        (bid, "false", None, None, None, None, None, None, None, None, False)
        for bid, _ in bad_fixture_blobs()
    ]


@register(
    "domain_beacon_parse",
    oracle=(
        "SELECT CAST(beacon_id AS BIGINT) AS beacon_id, parse_ok, version, os_name, mac, "
        "CAST(uptime_s AS BIGINT) AS uptime_s, next_beacon_s, beacon_ip, proxy_ip, "
        "CAST(bytecount AS BIGINT) AS bytecount, has_procs "
        f"FROM {_values(_PARSE_ROWS + _bad_parse_rows(), _PARSE_COLS)}"
    ),
    tags=("domain", "codec", "udf"),
)
def domain_beacon_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full wire round-trip: fixture dicts -> TLV -> bz2 -> XTEA -> BTHP
    proxy envelope (beacon/dst/proxy IP sub-headers, honeycomb.py:138-183)
    -> binary column -> from_hive_beacon (mapInPandas) -> typed rows
    including the envelope's source IPs and byte count. The landing set
    includes deliberately-corrupt blobs (truncated envelope, flipped
    ciphertext) that must surface as parse_ok='false' rows — bad records
    can never fail an ingest task. The oracle is the encoder's input plus
    the expected bad-row matrix — any codec/parse defect breaks the hash."""
    from ..sources.beacons import fixture_blobs_df, from_hive_beacon

    prep(spark)
    raw = from_hive_beacon(fixture_blobs_df(spark, include_bad=True))
    return raw.select(
        "beacon_id",
        "parse_ok",
        "version",
        "os_name",
        "mac",
        "uptime_s",
        "next_beacon_s",
        "beacon_ip",
        "proxy_ip",
        "bytecount",
        F.col("proc_list").isNotNull().alias("has_procs"),
    )


# --- 2. OS rollup -----------------------------------------------------------

_OS_ROWS = [(r["beacon_id"], OS_NAMES[r["os"]], r["uptime_s"]) for r in _RECORDS]


@register(
    "domain_os_rollup",
    oracle=f"""
SELECT os_name, COUNT(*) AS n_beacons,
       CAST(SUM(uptime_s) AS BIGINT) AS total_uptime,
       CAST(SUM(uptime_s) AS DOUBLE) / COUNT(*) AS avg_uptime
FROM {_values(_OS_ROWS, ["beacon_id", "os_name", "uptime_s"])}
GROUP BY os_name
""",
    tags=("domain", "agg"),
)
def domain_os_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleet rollup per OS over the decoded bronze table."""
    prep(spark)
    return (
        bronze_beacons(spark)
        .groupBy("os_name")
        .agg(
            F.count(F.lit(1)).alias("n_beacons"),
            F.sum("uptime_s").alias("total_uptime"),
            (F.sum("uptime_s").cast("double") / F.count(F.lit(1))).alias("avg_uptime"),
        )
    )


# --- 3. processes silver table (text-blob parse) ---------------------------


# Oracle mirror straight from the encoder's structured inputs (_procs) —
# independent of both the renderer and the Spark parse.
_PROC_ROWS = [
    (r["beacon_id"], pid, st, ppid, cmd)
    for r in _RECORDS
    for (pid, st, ppid, _pgrp, _sess, cmd) in r["_procs"]
]


@register(
    "domain_processes_explode",
    oracle=f"""
SELECT command, COUNT(*) AS n_procs, COUNT(DISTINCT beacon_id) AS n_beacons,
       CAST(MIN(pid) AS INT) AS min_pid, CAST(MAX(pid) AS INT) AS max_pid
FROM {_values(_PROC_ROWS, ["beacon_id", "pid", "state", "ppid", "command"])}
GROUP BY command
""",
    tags=("domain", "text-parse"),
)
def domain_processes_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proc_list text blob -> processes silver table: split lines, split
    whitespace fields (all JVM expressions), then a fleet rollup per
    command. Parse shape per server/process_list.c:182-227 field order
    (pid state ppid pgrp session command); the Linux popen variant
    (server/get_data.c) prefixes a ps-style header line, dropped by the
    numeric-pid filter."""
    prep(spark)
    b = bronze_beacons(spark).where(F.col("proc_list").isNotNull())
    lines = b.select(
        "beacon_id", F.explode(F.split("proc_list", "\n")).alias("line")
    )
    fields = F.split(F.trim(F.regexp_replace("line", " +", " ")), " ")
    # try_cast (not cast): under ANSI semantics a cast of the ps header
    # line's 'PID' token would fail the task; try_cast yields NULL and the
    # filter drops the header row.
    procs = lines.select(
        "beacon_id",
        F.element_at(fields, 1).try_cast("int").alias("pid"),
        F.element_at(fields, 2).alias("state"),
        F.element_at(fields, 3).try_cast("int").alias("ppid"),
        F.element_at(fields, 6).alias("command"),
    ).where(F.col("pid").isNotNull())
    return procs.groupBy("command").agg(
        F.count(F.lit(1)).alias("n_procs"),
        F.countDistinct("beacon_id").alias("n_beacons"),
        F.min("pid").alias("min_pid"),
        F.max("pid").alias("max_pid"),
    )


# --- 4. gateway <-> interface longest-prefix match -------------------------


def _py_prefix_match() -> list[tuple]:
    """Oracle mirror for the /24 -> /16 -> /8 longest-prefix match,
    computed from the encoder's structured inputs (_gateway/_iface/
    _iface_ip) — independent of both the dialect renderers and the Spark
    text parse, so a defect in either breaks the hash."""
    out = []
    for r in _RECORDS:
        gw, name, ip = r["_gateway"], r["_iface"], r["_iface_ip"]
        g, p = gw.split("."), ip.split(".")
        depth = 24 if g[:3] == p[:3] else 16 if g[:2] == p[:2] else 8 if g[:1] == p[:1] else 0
        if depth:
            out.append((r["beacon_id"], gw, name, ip, depth))
    return out


@register(
    "domain_gateway_prefix_match",
    oracle=f"""
SELECT CAST(beacon_id AS BIGINT) AS beacon_id, gateway, iface, iface_ip, prefix_len
FROM {_values(_py_prefix_match(), ["beacon_id", "gateway", "iface", "iface_ip", "prefix_len"])}
""",
    tags=("domain", "join", "text-parse", "dialect"),
)
def domain_gateway_prefix_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's gateway<->interface longest-prefix-match join
    (processRSI.py:287-320) over dialect-dispatched telemetry parses
    (:120-283): routes and interfaces arrive in MikroTik / Solaris /
    Linux text shapes, selected per row by os_name — exactly the LP's
    'ikro'/'olar'/else branching, as CASE expressions instead of python
    loops.

    Scale: the stateful "attach detail lines to the most recent header
    line" parse is a per-beacon last(ignorenulls) window (one shuffle on
    beacon_id, arbitrary parallelism across beacons); the depth match is
    an equi-join on beacon_id plus computed prefix comparisons — never a
    cross product; max_by picks the deepest match without a sort."""
    prep(spark)
    b = bronze_beacons(spark).withColumn("dialect", _dialect_col())

    # --- default gateway per dialect (processRSI.py:249-283) ---
    rl = b.select(
        "beacon_id", "dialect", F.explode(F.split("netstat_rn", "\n")).alias("line")
    )
    rtok = F.split(F.trim(F.regexp_replace("line", "\\s+", " ")), " ")
    is_default = (
        F.when(F.col("dialect") == "solaris", F.element_at(rtok, 1) == "default")
        .otherwise(F.element_at(rtok, 1) == "0.0.0.0")
    ) & F.col("line").contains("UG")
    routes = rl.where(is_default).select(
        "beacon_id", F.element_at(rtok, 2).alias("gateway")
    )

    # --- interfaces per dialect (processRSI.py:120-248) ---
    il = b.select(
        "beacon_id", "dialect",
        F.posexplode(F.split("ipconfig", "\n")).alias("pos", "line"),
    )
    line = F.col("line")
    is_hdr = (
        F.when(F.col("dialect") == "linux", line.contains("Link encap"))
        .when(F.col("dialect") == "solaris", line.contains("<"))
        .otherwise(line.contains(": <"))
    )
    hdr_name = F.when(
        F.col("dialect") == "linux", F.element_at(F.split(F.trim(line), " +"), 1)
    ).otherwise(F.split_part(line, F.lit(":"), F.lit(1)))
    ttok = F.split(F.trim(F.regexp_replace("line", "\\s+", " ")), " ")
    ip_val = (
        F.when(
            (F.col("dialect") == "linux") & line.contains("inet addr"),
            F.regexp_extract(line, "addr:([0-9.]+)", 1),
        )
        .when(
            # rlike, not trim().startswith: Spark's trim strips spaces
            # only — the Solaris detail lines are tab-indented.
            (F.col("dialect") == "solaris")
            & line.rlike("^\\s*inet ")
            & ~line.contains("inet6"),
            F.element_at(ttok, 2),
        )
        .when(
            (F.col("dialect") == "mikrotik") & line.contains("inet addr:"),
            F.element_at(ttok, 3),
        )
    )
    w = (
        Window.partitionBy("beacon_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ifaces = (
        il.select(
            "beacon_id",
            F.last(F.when(is_hdr, hdr_name), ignorenulls=True).over(w).alias("iface"),
            ip_val.alias("iface_ip"),
        )
        .where(F.col("iface_ip").isNotNull())
    )

    def prefix(col: str, n: int):
        return F.concat_ws(".", *[F.split(F.col(col), "\\.").getItem(i) for i in range(n)])

    joined = routes.join(ifaces, "beacon_id").select(
        "beacon_id",
        "gateway",
        "iface",
        "iface_ip",
        F.when(prefix("gateway", 3) == prefix("iface_ip", 3), 24)
        .when(prefix("gateway", 2) == prefix("iface_ip", 2), 16)
        .when(prefix("gateway", 1) == prefix("iface_ip", 1), 8)
        .otherwise(0)
        .alias("prefix_len"),
    )
    best = joined.where(F.col("prefix_len") > 0).groupBy("beacon_id").agg(
        F.max_by(
            F.struct("gateway", "iface", "iface_ip", "prefix_len"), F.col("prefix_len")
        ).alias("m")
    )
    return best.select(
        "beacon_id",
        F.col("m.gateway").alias("gateway"),
        F.col("m.iface").alias("iface"),
        F.col("m.iface_ip").alias("iface_ip"),
        F.col("m.prefix_len").alias("prefix_len"),
    )


# --- 5. fleet liveness (missed-beacon detector) ----------------------------
# The analytic dual of the reference's self-delete clock
# (server/self_delete.c:19-57: act when now - last_contact > delay): flag
# implants whose expected next beacon is overdue at a fixed "now".

_BASE_TS = "2024-03-01 00:00:00"
_NOW_OFFSET_MIN = 3000  # "now" = base + 3000 minutes


def _py_liveness() -> list[tuple]:
    last: dict[str, dict] = {}
    for r in _RECORDS:
        cur = last.get(r["mac"])
        if cur is None or r["beacon_id"] > cur["beacon_id"]:
            last[r["mac"]] = r
    out = []
    for mac in sorted(last):
        r = last[mac]
        recv_min = r["beacon_id"] * 10  # deterministic synthetic recv time
        overdue_s = (_NOW_OFFSET_MIN - recv_min) * 60 - 2 * r["next_beacon_s"]
        out.append((mac, r["beacon_id"], r["next_beacon_s"], overdue_s > 0))
    return out


@register(
    "domain_fleet_liveness",
    oracle=f"""
SELECT mac, CAST(last_beacon_id AS BIGINT) AS last_beacon_id, next_beacon_s, missed
FROM {_values(_py_liveness(), ["mac", "last_beacon_id", "next_beacon_s", "missed"])}
""",
    tags=("domain", "liveness", "window"),
)
def domain_fleet_liveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missed-beacon detection: per MAC take the latest beacon (max_by),
    reconstruct its receive time (synthetic: beacon_id * 10 min after a
    fixed base), and flag implants more than 2 intervals overdue at a
    pinned 'now'. Streaming twin: stream_stateful_user_stats's
    applyInPandasWithState shape with a processing-time timeout."""
    prep(spark)
    b = bronze_beacons(spark)
    last = b.groupBy("mac").agg(
        F.max_by(F.struct("beacon_id", "next_beacon_s"), F.col("beacon_id")).alias("m")
    )
    recv_min = F.col("m.beacon_id") * 10
    overdue_s = (F.lit(3000) - recv_min) * 60 - 2 * F.col("m.next_beacon_s")
    return last.select(
        "mac",
        F.col("m.beacon_id").alias("last_beacon_id"),
        F.col("m.next_beacon_s").alias("next_beacon_s"),
        (overdue_s > 0).alias("missed"),
    )


# --- 5b. fleet state history (SCD2 / gaps-and-islands) ----------------------


def _py_state_history() -> list[tuple]:
    """Oracle mirror: per MAC, collapse consecutive runs of equal os_name
    (beacon_id order) into [from_id, to_id] validity intervals."""
    by_mac: dict[str, list] = {}
    for r in sorted(_RECORDS, key=lambda r: r["beacon_id"]):
        by_mac.setdefault(r["mac"], []).append((r["beacon_id"], OS_NAMES[r["os"]]))
    out = []
    for mac in sorted(by_mac):
        run_os, run_from, run_n, last_id = None, None, 0, None
        for bid, osn in by_mac[mac]:
            if osn != run_os:
                if run_os is not None:
                    out.append((mac, run_os, run_from, last_id, run_n))
                run_os, run_from, run_n = osn, bid, 0
            run_n += 1
            last_id = bid
        out.append((mac, run_os, run_from, last_id, run_n))
    return out


@register(
    "domain_state_history",
    oracle=f"""
SELECT mac, os_name, CAST(from_id AS BIGINT) AS from_id,
       CAST(to_id AS BIGINT) AS to_id, CAST(n_beacons AS BIGINT) AS n_beacons
FROM {_values(_py_state_history(), ["mac", "os_name", "from_id", "to_id", "n_beacons"])}
""",
    tags=("domain", "window", "scd2", "islands"),
)
def domain_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2-style fleet state history: per MAC, consecutive beacons
    reporting the same os_name collapse into one validity interval
    [from_id, to_id] — the gaps-and-islands pattern (lag -> change flag ->
    running sum -> per-island aggregate), i.e. the value-change dual of
    events_sessionize's time-gap islands. This is how a listening post
    turns a beacon feed into an auditable configuration history.

    Scale: one shuffle on mac + two window passes + the island aggregate;
    island count is bounded by change frequency, not beacon volume."""
    prep(spark)
    b = bronze_beacons(spark).select("mac", "beacon_id", "os_name")
    w = Window.partitionBy("mac").orderBy("beacon_id")
    marked = b.select(
        "mac",
        "beacon_id",
        "os_name",
        F.when(
            F.lag("os_name").over(w).isNull()
            | (F.lag("os_name").over(w) != F.col("os_name")),
            1,
        )
        .otherwise(0)
        .alias("is_change"),
    )
    islands = marked.select(
        "mac",
        "beacon_id",
        "os_name",
        F.sum("is_change")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    return islands.groupBy("mac", "island", "os_name").agg(
        F.min("beacon_id").alias("from_id"),
        F.max("beacon_id").alias("to_id"),
        F.count(F.lit(1)).alias("n_beacons"),
    ).drop("island")


# --- 6. MAC normalization across wire formats ------------------------------

_MAC_FIXTURES = [
    (0, "aa-bb-cc-dd-ee-0f"),
    (1, "AA:BB:CC:DD:EE:1F"),
    (2, "aabb.ccdd.ee2f"),
    (3, "AABBCCDDEE3F"),
    (4, "aa-bb-cc-dd-ee"),      # 10 hex digits -> invalid
    (5, "not a mac"),
    (6, "0a:1B:2c:3D:4e:5F"),
]


def _py_mac_norm(s: str) -> str | None:
    import re

    h = re.sub(r"[^0-9a-fA-F]", "", s).lower()
    return "-".join(h[i : i + 2] for i in range(0, 12, 2)) if len(h) == 12 else None


@register(
    "domain_mac_normalize",
    oracle=f"""
SELECT * FROM {_values([(i, s, _py_mac_norm(s)) for i, s in _MAC_FIXTURES], ["id", "raw", "mac"])}
""",
    tags=("domain", "net", "scalar"),
)
def domain_mac_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAC normalization (functions/net.py): dash/colon/dotted/bare wire
    formats -> canonical `aa-bb-cc-dd-ee-ff`, NULL for invalid — pure
    Column expressions, oracle = an independent python regex impl."""
    from ..functions.net import mac_normalize

    prep(spark)
    df = spark.createDataFrame(_MAC_FIXTURES, "id int, raw string")
    return df.select("id", "raw", mac_normalize("raw").alias("mac"))


# --- 7. command-session log (D3) -------------------------------------------
# Session/command analytics over the COMMAND/REPLY record family
# (server/client_session.h:29-72, dispatch client_session.c:504-568).
# Deterministic fixture: 300 sessions across the fleet's MACs.

_COMMANDS_D3 = ("UPLOAD", "EXECUTE", "DOWNLOAD", "DELETE", "SHUTDOWN", "LAUNCHTRUESHELL", "EXIT")


def _session_fixture() -> list[tuple]:
    import random

    rng = random.Random(1337)
    macs = sorted({r["mac"] for r in _RECORDS})
    rows = []
    for sid in range(300):
        mac = macs[sid % len(macs)]
        start_min = sid * 7 + rng.randint(0, 5)
        dur_s = rng.randint(5, 3600)  # SESSION_TIMEOUT is 1h
        cmd = _COMMANDS_D3[rng.randint(0, len(_COMMANDS_D3) - 1)]
        path = f"/tmp/file_{sid % 17}.bin" if cmd in ("UPLOAD", "DOWNLOAD", "DELETE") else None
        size = rng.randint(100, 4_000_000) if cmd in ("UPLOAD", "DOWNLOAD") else None
        reply = 0 if rng.random() > 0.08 else rng.randint(1, 4)
        rows.append((sid, mac, start_min, dur_s, cmd, path, size, reply))
    return rows


_SESSIONS = _session_fixture()


def _py_session_stats() -> list[tuple]:
    agg: dict[str, list] = {}
    for (_sid, _mac, _start, dur, cmd, _path, size, reply) in _SESSIONS:
        a = agg.setdefault(cmd, [0, 0, 0, 0])  # n, fails, total_dur, total_size
        a[0] += 1
        a[1] += 1 if reply != 0 else 0
        a[2] += dur
        a[3] += size or 0
    return [
        (cmd, a[0], a[1], a[2], round(a[2] / a[0], 6), a[3])
        for cmd, a in sorted(agg.items())
    ]


@register(
    "domain_session_commands",
    oracle=f"""
SELECT command, CAST(n AS BIGINT) AS n, CAST(n_failed AS BIGINT) AS n_failed,
       CAST(total_dur_s AS BIGINT) AS total_dur_s,
       ROUND(CAST(total_dur_s AS DOUBLE) / n, 6) AS avg_dur_s,
       CAST(total_bytes AS BIGINT) AS total_bytes
FROM {_values(_py_session_stats(), ["command", "n", "n_failed", "total_dur_s", "avg_dur_s_ref", "total_bytes"])}
""",
    tags=("domain", "sessions", "agg"),
)
def domain_session_commands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Command-mix analytics over the session log (D3): per command —
    volume, failure count (reply != 0, client_session.c:147 semantics),
    duration, transfer bytes."""
    prep(spark)
    df = spark.createDataFrame(
        _SESSIONS,
        "session_id long, mac string, start_min int, dur_s int, command string, "
        "path string, size long, reply int",
    )
    return df.groupBy("command").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("reply") != 0, 1).otherwise(0)).alias("n_failed"),
        F.sum("dur_s").cast("bigint").alias("total_dur_s"),
        F.round(F.sum("dur_s").cast("double") / F.count(F.lit(1)), 6).alias("avg_dur_s"),
        F.sum(F.coalesce(F.col("size"), F.lit(0))).alias("total_bytes"),
    )


def _py_sockets() -> list[tuple]:
    rows = []
    for r in _RECORDS:
        if not r["netstat_an"]:
            continue
        for line in r["netstat_an"].split("\n"):
            proto, local, remote, state = line.split()
            l_addr, l_port = local.rsplit(":", 1)
            r_addr, r_port = remote.rsplit(":", 1)
            rows.append((r["beacon_id"], proto, l_addr, int(l_port), r_addr, int(r_port), state))
    return rows


def _py_socket_rollup() -> list[tuple]:
    agg: dict[tuple, list] = {}
    for (_b, proto, _la, _lp, ra, rp, state) in _py_sockets():
        a = agg.setdefault((proto, state), [0, set(), set()])
        a[0] += 1
        a[1].add(ra)
        a[2].add(rp)
    return [
        (proto, state, a[0], len(a[1]), len(a[2]))
        for (proto, state), a in sorted(agg.items())
    ]


@register(
    "domain_sockets_explode",
    oracle=f"""
SELECT proto, state, CAST(n_sockets AS BIGINT) AS n_sockets,
       CAST(n_remote_addrs AS BIGINT) AS n_remote_addrs,
       CAST(n_remote_ports AS BIGINT) AS n_remote_ports
FROM {_values(_py_socket_rollup(), ["proto", "state", "n_sockets", "n_remote_addrs", "n_remote_ports"])}
""",
    tags=("domain", "text-parse", "sockets"),
)
def domain_sockets_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """netstat_an text blob -> sockets silver table (A5; busybox netstat
    shape per server/netstat_an.c) -> per (proto, state) rollup with
    distinct remote endpoints — the fleet's connection census."""
    prep(spark)
    # Guard empty-string blobs too (the oracle's python mirror skips
    # falsy blobs, not just nulls), and split on any whitespace run —
    # real busybox netstat output is column-padded.
    b = bronze_beacons(spark).where(
        F.col("netstat_an").isNotNull() & (F.col("netstat_an") != "")
    )
    f = F.split(F.trim(F.regexp_replace("line", "\\s+", " ")), " ")
    socks = (
        b.select("beacon_id", F.explode(F.split("netstat_an", "\n")).alias("line"))
        .where(F.trim("line") != "")
        .select(
            "beacon_id",
            F.element_at(f, 1).alias("proto"),
            F.regexp_extract(F.element_at(f, 2), "^(.*):([0-9]+)$", 1).alias("local_addr"),
            F.regexp_extract(F.element_at(f, 2), "^(.*):([0-9]+)$", 2).cast("int").alias("local_port"),
            F.regexp_extract(F.element_at(f, 3), "^(.*):([0-9]+)$", 1).alias("remote_addr"),
            F.regexp_extract(F.element_at(f, 3), "^(.*):([0-9]+)$", 2).cast("int").alias("remote_port"),
            F.element_at(f, 4).alias("state"),
        )
    )
    return socks.groupBy("proto", "state").agg(
        F.count(F.lit(1)).alias("n_sockets"),
        F.countDistinct("remote_addr").alias("n_remote_addrs"),
        F.countDistinct("remote_port").alias("n_remote_ports"),
    )


# --- trigger payload (D2) parse --------------------------------------------

def _trigger_fixtures() -> list[tuple[int, bytes, dict]]:
    """Deterministic good/bad trigger-payload matrix (the shape of the
    reference's manual fixture specs, ilm-client/goodLocal*/bad*): valid
    payloads across the seed domain, one CRC-corrupted, one truncated."""
    import hashlib as _h

    from ..functions.codecs import decode_trigger, encode_trigger

    out = []
    for i in range(10):
        seed = (i * 37 + 5) % 256
        addr = (10 << 24) | (i << 16) | (2 * i << 8) | (i + 1)
        port = 1024 + 53 * i
        kh = _h.sha1(f"trigger-key-{i}".encode()).digest()
        blob = encode_trigger(seed, addr, port, kh)
        if i == 7:  # corrupt a body byte AFTER encoding: CRC must fail
            blob = blob[:5] + bytes([blob[5] ^ 0xFF]) + blob[6:]
        if i == 9:  # truncated datagram
            blob = blob[:12]
        out.append((i, blob, decode_trigger(blob)))
    return out


_TRIG = _trigger_fixtures()
_TRIG_COLS = ["trigger_id", "seed", "callback_ip", "callback_port", "key_hash_hex", "crc_ok"]


@register(
    "domain_trigger_parse",
    oracle=(
        "SELECT CAST(trigger_id AS BIGINT) AS trigger_id, CAST(seed AS INT) AS seed, "
        "callback_ip, CAST(callback_port AS INT) AS callback_port, key_hash_hex, crc_ok FROM "
        + _values(
            [
                (i, d["seed"], d["callback_ip"], d["callback_port"], d["key_hash_hex"], d["crc_ok"])
                for i, _, d in _TRIG
            ],
            _TRIG_COLS,
        )
    ),
    tags=("domain", "codec", "udf"),
)
def domain_trigger_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 trigger-payload parse (SURVEY.md §1 D2): 29-byte packed structs
    -> seed-XOR deobfuscate -> CRC16 validate -> typed rows, via
    mapInPandas over a binary column. Bad records (corrupt CRC, short
    blob) surface as crc_ok=false rows, never task failures."""
    import pandas as _pd

    from pyspark.sql.types import (
        BinaryType,
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..functions.codecs import decode_trigger

    prep(spark)
    blobs = spark.createDataFrame(
        [(i, bytearray(b)) for i, b, _ in _TRIG],
        StructType([StructField("trigger_id", LongType()), StructField("blob", BinaryType())]),
    )
    out_schema = StructType(
        [
            StructField("trigger_id", LongType()),
            StructField("seed", IntegerType()),
            StructField("callback_ip", StringType()),
            StructField("callback_port", IntegerType()),
            StructField("key_hash_hex", StringType()),
            StructField("crc_ok", BooleanType()),
        ]
    )

    def parse(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for tid, blob in zip(pdf["trigger_id"], pdf["blob"]):
                d = decode_trigger(bytes(blob))
                rows.append(
                    (int(tid), d["seed"], d["callback_ip"], d["callback_port"],
                     d["key_hash_hex"], d["crc_ok"])
                )
            yield _pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return blobs.mapInPandas(parse, schema=out_schema)
