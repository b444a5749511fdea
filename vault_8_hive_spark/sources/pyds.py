"""Python DataSource API (Spark 4) transport for the beacon landing zone.

The reference's listening post receives beacon datagrams over its own
transport (server/beacon.c receive loop; honeycomb's hcOwt/Swift pull,
hcOwt.py:1-60) — a byte stream no builtin Spark source speaks. This
module re-expresses that transport Spark-natively with the Python
DataSource API (pyspark.sql.datasource): a custom `hive_beacons` format
usable from both `spark.read` and `spark.readStream`, serving framed
datagram shard files as (shard, beacon_id, blob) rows. Decode stays
where it already lives (sources/beacons.from_hive_beacon) — source =
transport, operator = decode, exactly the bronze-layer split.

Wire format per shard file (a UDP capture log, effectively):
    magic 'HDG1' | repeat: u32 payload_len | u64 beacon_id | payload

Scale posture:
- Batch: one InputPartition per shard file — reads parallelize across
  executors with no driver-side data movement; at 100 TB the landing
  zone is thousands of shard files and the partition list is the only
  driver-side state.
- Partition pruning via `pushFilters`: comparison/IN filters on the
  `shard` column prune whole files BEFORE any byte is read (the Python
  answer to parquet partition pruning); all other filters are returned
  to Spark for post-scan evaluation.
- Streaming: SimpleDataSourceStreamReader serving one shard per
  micro-batch in shard order — offsets are {"shard": k}, replayable
  (readBetweenOffsets) so checkpoint recovery re-serves exactly the
  committed range, and arrival order is deterministic.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

_MAGIC = b"HDG1"
N_SHARDS = 8
FORMAT_NAME = "hive_beacons"


def shard_of(beacon_id: int) -> int:
    return beacon_id % N_SHARDS


def _shard_path(path: str, shard: int) -> str:
    return os.path.join(path, f"shard_{shard:04d}.dat")


def write_datagram_shards(path: str, records: list[tuple[int, bytes]]) -> None:
    """Materialize the framed shard files from (beacon_id, blob) pairs."""
    os.makedirs(path, exist_ok=True)
    by_shard: dict[int, list[tuple[int, bytes]]] = {s: [] for s in range(N_SHARDS)}
    for bid, blob in records:
        by_shard[shard_of(bid)].append((bid, blob))
    for shard, recs in by_shard.items():
        _write_frames(_shard_path(path, shard), recs)


def read_datagram_file(fname: str, shard: int) -> Iterator[tuple[int, int, bytes]]:
    """Yield (shard, beacon_id, blob) from one framed datagram file."""
    with open(fname, "rb") as fh:
        if fh.read(4) != _MAGIC:
            raise ValueError(f"bad datagram shard magic in {fname}")
        while True:
            header = fh.read(12)
            if not header:
                return
            n, bid = struct.unpack("<IQ", header)
            yield (shard, bid, fh.read(n))


def read_shard(path: str, shard: int) -> Iterator[tuple[int, int, bytes]]:
    yield from read_datagram_file(_shard_path(path, shard), shard)


def _landing_files(path: str) -> list[str]:
    """Sorted datagram files; the `shard` column is a file's position in
    this listing (transport provenance, not data), so writer-produced
    names (shard_<batch>_<task>.dat) and fixture names (shard_NNNN.dat)
    both work."""
    return [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.startswith("shard_") and f.endswith(".dat")
    ]


def _write_frames(fname: str, rows) -> int:
    n = 0
    with open(fname, "wb") as fh:
        fh.write(_MAGIC)
        for bid, blob in rows:
            payload = bytes(blob)
            fh.write(struct.pack("<IQ", len(payload), int(bid)))
            fh.write(payload)
            n += 1
    return n


class DatagramPartition(InputPartition):
    def __init__(self, path: str, shard: int):
        self.path = path
        self.shard = shard


class BeaconDatagramReader(DataSourceReader):
    """Batch reader: shard files -> partitions, with shard pruning."""

    def __init__(self, options):
        self.path = options["path"]
        self.files = _landing_files(self.path)
        self.shards = list(range(len(self.files)))

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            handled = False
            if getattr(f, "attribute", None) == ("shard",):
                if isinstance(f, EqualTo):
                    self.shards = [s for s in self.shards if s == f.value]
                    handled = True
                elif isinstance(f, In):
                    keep = set(f.value)
                    self.shards = [s for s in self.shards if s in keep]
                    handled = True
                elif isinstance(f, LessThan):
                    self.shards = [s for s in self.shards if s < f.value]
                    handled = True
                elif isinstance(f, LessThanOrEqual):
                    self.shards = [s for s in self.shards if s <= f.value]
                    handled = True
                elif isinstance(f, GreaterThan):
                    self.shards = [s for s in self.shards if s > f.value]
                    handled = True
                elif isinstance(f, GreaterThanOrEqual):
                    self.shards = [s for s in self.shards if s >= f.value]
                    handled = True
            if not handled:
                yield f  # Spark evaluates what the source didn't absorb

    def partitions(self) -> Sequence[InputPartition]:
        return [DatagramPartition(self.files[s], s) for s in self.shards]

    def read(self, partition: DatagramPartition) -> Iterator[tuple]:
        yield from read_datagram_file(partition.path, partition.shard)


class BeaconDatagramStreamReader(SimpleDataSourceStreamReader):
    """Streaming reader: one shard per micro-batch, offsets replayable."""

    def __init__(self, options):
        self.path = options["path"]
        self.files = _landing_files(self.path)
        self.n_shards = len(self.files)

    def initialOffset(self) -> dict:
        return {"shard": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        shard = start["shard"]
        if shard >= self.n_shards:
            return iter(()), start  # caught up; no new datagrams
        # Materialized, not a generator: the prefetch cache copies the
        # returned iterator for offset replay, and one shard is bounded
        # (the 100 TB path would use DataSourceStreamReader with
        # per-partition reads instead of the driver-side simple reader).
        return iter(list(read_datagram_file(self.files[shard], shard))), {"shard": shard + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for shard in range(start["shard"], end["shard"]):
            yield from read_datagram_file(self.files[shard], shard)


class DatagramCommit(WriterCommitMessage):
    def __init__(self, tmp: str, n: int):
        self.tmp = tmp
        self.n = n


class BeaconDatagramWriter(DataSourceWriter):
    """Batch writer with a real two-phase commit: each task frames its
    rows into a hidden temp file and returns it as the commit message;
    only the DRIVER's commit() publishes them under reader-visible
    shard_NNNN.dat names (task order, empty tasks dropped), and abort()
    removes the temps — a half-failed write is never readable."""

    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> DatagramCommit:
        import uuid as _uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{_uuid.uuid4().hex}.dat")
        n = _write_frames(tmp, ((r["beacon_id"], r["blob"]) for r in iterator))
        return DatagramCommit(tmp, n)

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in _landing_files(self.path):
                os.remove(f)
        i = 0
        for m in messages:
            if m.n:
                os.replace(m.tmp, os.path.join(self.path, f"shard_{i:04d}.dat"))
                i += 1
            else:
                os.remove(m.tmp)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp)
            except OSError:
                pass


class BeaconDatagramStreamWriter(DataSourceStreamWriter):
    """Streaming sink: per-micro-batch two-phase commit. Target names
    embed the batch id (shard_<batch>_<task>.dat) and commit() clears
    that batch's namespace before publishing, so an at-least-once replay
    of a batch rewrites its own files instead of duplicating datagrams —
    idempotent by construction, same contract as the foreachBatch
    partition-overwrite sink."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator) -> DatagramCommit:
        import uuid as _uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{_uuid.uuid4().hex}.dat")
        n = _write_frames(tmp, ((r["beacon_id"], r["blob"]) for r in iterator))
        return DatagramCommit(tmp, n)

    def commit(self, messages, batchId: int) -> None:
        prefix = f"shard_{batchId:06d}_"
        for f in os.listdir(self.path):
            if f.startswith(prefix) and f.endswith(".dat"):
                os.remove(os.path.join(self.path, f))
        i = 0
        for m in messages:
            if m.n:
                os.replace(m.tmp, os.path.join(self.path, f"{prefix}{i:02d}.dat"))
                i += 1
            else:
                os.remove(m.tmp)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            try:
                os.remove(m.tmp)
            except OSError:
                pass


class BeaconDatagramDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "shard int, beacon_id bigint, blob binary"

    def reader(self, schema) -> BeaconDatagramReader:
        return BeaconDatagramReader(self.options)

    def writer(self, schema, overwrite: bool) -> BeaconDatagramWriter:
        return BeaconDatagramWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> BeaconDatagramStreamWriter:
        return BeaconDatagramStreamWriter(self.options)

    def simpleStreamReader(self, schema) -> BeaconDatagramStreamReader:
        return BeaconDatagramStreamReader(self.options)


def register_datasource(spark) -> None:
    """Idempotent registration of the hive_beacons format (and the
    runtime conf its pushFilters implementation requires)."""
    if spark.conf.get("spark.sql.python.filterPushdown.enabled", "false") != "true":
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(BeaconDatagramDataSource)
