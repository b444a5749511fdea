"""Python DataSource API source (sources/pyds.py): framing, partition
pruning via pushFilters, and streaming offset replay."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.datasource import EqualTo, GreaterThan, In, LessThan

from vault_8_hive_spark.sources.pyds import (
    N_SHARDS,
    BeaconDatagramReader,
    BeaconDatagramStreamReader,
    read_shard,
    register_datasource,
    shard_of,
    write_datagram_shards,
)


@pytest.fixture(scope="module")
def landing(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pyds"))
    recs = [(i, bytes([i % 251]) * (10 + i % 13)) for i in range(100)]
    write_datagram_shards(path, recs)
    return path, recs


def test_framing_roundtrip(landing):
    path, recs = landing
    got = {
        bid: blob
        for s in range(N_SHARDS)
        for (_, bid, blob) in read_shard(path, s)
    }
    assert got == dict(recs)
    # shard assignment matches the documented rule
    for s in range(N_SHARDS):
        for shard, bid, _ in read_shard(path, s):
            assert shard == s == shard_of(bid)


def test_push_filters_prune_partitions(landing):
    path, _ = landing
    r = BeaconDatagramReader({"path": path})
    leftover = list(r.pushFilters([LessThan(("shard",), 3), EqualTo(("os",), 1)]))
    # the shard filter is absorbed; the non-shard filter is returned
    assert leftover == [EqualTo(("os",), 1)]
    assert [p.shard for p in r.partitions()] == [0, 1, 2]

    r2 = BeaconDatagramReader({"path": path})
    assert list(r2.pushFilters([In(("shard",), (1, 5))])) == []
    assert [p.shard for p in r2.partitions()] == [1, 5]

    r3 = BeaconDatagramReader({"path": path})
    assert list(r3.pushFilters([GreaterThan(("shard",), 6)])) == []
    assert [p.shard for p in r3.partitions()] == [7]


def test_batch_read_with_pruned_scan(spark, landing):
    path, recs = landing
    register_datasource(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = spark.read.format("hive_beacons").option("path", path).load()
    assert df.count() == len(recs)
    pruned = df.where(F.col("shard") == 2)
    expect = [bid for bid, _ in recs if shard_of(bid) == 2]
    assert sorted(r.beacon_id for r in pruned.collect()) == sorted(expect)
    # blob payloads survive the binary column round trip
    one = pruned.where(F.col("beacon_id") == expect[0]).collect()[0]
    assert bytes(one.blob) == dict(recs)[expect[0]]


def test_stream_reader_offsets_replayable(landing):
    path, recs = landing
    r = BeaconDatagramStreamReader({"path": path})
    assert r.initialOffset() == {"shard": 0}
    off = r.initialOffset()
    seen = []
    for _ in range(N_SHARDS):
        rows, off = r.read(off)
        seen.extend(rows)
    assert len(seen) == len(recs)
    # caught up: no rows, offset unchanged
    rows, off2 = r.read(off)
    assert list(rows) == [] and off2 == off
    # replay of a committed range returns exactly those shards' rows
    replay = list(r.readBetweenOffsets({"shard": 2}, {"shard": 5}))
    expect = [bid for bid, _ in recs if shard_of(bid) in (2, 3, 4)]
    assert sorted(b for (_, b, _) in replay) == sorted(expect)


def test_batch_writer_two_phase_commit(spark, tmp_path):
    """Temp files are invisible to the reader until the driver commits;
    the published names are deterministic task-ordered shard files."""
    import os

    from vault_8_hive_spark.sources.pyds import (
        BeaconDatagramWriter,
        DatagramCommit,
    )

    d = str(tmp_path / "sink")
    w = BeaconDatagramWriter({"path": d}, overwrite=True)

    class Row(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    m1 = w.write(iter([Row(beacon_id=1, blob=b"aa"), Row(beacon_id=2, blob=b"bb")]))
    m2 = w.write(iter([]))  # empty task: no published file
    assert isinstance(m1, DatagramCommit) and m1.n == 2 and m2.n == 0
    # nothing visible pre-commit
    assert [f for f in os.listdir(d) if not f.startswith(".tmp-")] == []
    w.commit([m1, m2])
    assert sorted(os.listdir(d)) == ["shard_0000.dat"]

    # abort path: temps removed, nothing published
    w2 = BeaconDatagramWriter({"path": d}, overwrite=False)
    m3 = w2.write(iter([Row(beacon_id=3, blob=b"cc")]))
    w2.abort([m3])
    assert sorted(os.listdir(d)) == ["shard_0000.dat"]


def test_stream_writer_batch_replay_idempotent(tmp_path):
    """Re-committing the same batch id rewrites its namespace instead of
    appending duplicates (at-least-once replay safety)."""
    import os

    from vault_8_hive_spark.sources.pyds import BeaconDatagramStreamWriter

    d = str(tmp_path / "ssink")

    class Row(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    w = BeaconDatagramStreamWriter({"path": d})
    w.commit([w.write(iter([Row(beacon_id=1, blob=b"x")])),
              w.write(iter([Row(beacon_id=2, blob=b"y")]))], batchId=7)
    first = sorted(os.listdir(d))
    assert first == ["shard_000007_00.dat", "shard_000007_01.dat"]
    # replay batch 7 with one task this time: old namespace cleared
    w.commit([w.write(iter([Row(beacon_id=1, blob=b"x"),
                            Row(beacon_id=2, blob=b"y")]))], batchId=7)
    assert sorted(os.listdir(d)) == ["shard_000007_00.dat"]
