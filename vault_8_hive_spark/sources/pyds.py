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
        with open(_shard_path(path, shard), "wb") as fh:
            fh.write(_MAGIC)
            for bid, blob in recs:
                fh.write(struct.pack("<IQ", len(blob), bid))
                fh.write(blob)


def read_shard(path: str, shard: int) -> Iterator[tuple[int, int, bytes]]:
    """Yield (shard, beacon_id, blob) from one framed shard file."""
    fname = _shard_path(path, shard)
    with open(fname, "rb") as fh:
        if fh.read(4) != _MAGIC:
            raise ValueError(f"bad datagram shard magic in {fname}")
        while True:
            header = fh.read(12)
            if not header:
                return
            n, bid = struct.unpack("<IQ", header)
            yield (shard, bid, fh.read(n))


def _landing_shards(path: str) -> list[int]:
    return sorted(
        int(f[len("shard_") : -len(".dat")])
        for f in os.listdir(path)
        if f.startswith("shard_") and f.endswith(".dat")
    )


class DatagramPartition(InputPartition):
    def __init__(self, path: str, shard: int):
        self.path = path
        self.shard = shard


class BeaconDatagramReader(DataSourceReader):
    """Batch reader: shard files -> partitions, with shard pruning."""

    def __init__(self, options):
        self.path = options["path"]
        self.shards = _landing_shards(self.path)

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
        return [DatagramPartition(self.path, s) for s in self.shards]

    def read(self, partition: DatagramPartition) -> Iterator[tuple]:
        yield from read_shard(partition.path, partition.shard)


class BeaconDatagramStreamReader(SimpleDataSourceStreamReader):
    """Streaming reader: one shard per micro-batch, offsets replayable."""

    def __init__(self, options):
        self.path = options["path"]
        self.n_shards = len(_landing_shards(self.path))

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
        return iter(list(read_shard(self.path, shard))), {"shard": shard + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for shard in range(start["shard"], end["shard"]):
            yield from read_shard(self.path, shard)


class BeaconDatagramDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "shard int, beacon_id bigint, blob binary"

    def reader(self, schema) -> BeaconDatagramReader:
        return BeaconDatagramReader(self.options)

    def simpleStreamReader(self, schema) -> BeaconDatagramStreamReader:
        return BeaconDatagramStreamReader(self.options)


def register_datasource(spark) -> None:
    """Idempotent registration of the hive_beacons format."""
    spark.dataSource.register(BeaconDatagramDataSource)
