"""Arbitrary stateful streaming v2: transformWithStateInPandas.

Spark 4's successor to applyInPandasWithState (the operator behind
streaming/ops.stateful_user_stats): a StatefulProcessor owning typed,
independently-evolvable state primitives — ValueState (running totals),
MapState (per-event-type counters, point-updatable without rewriting the
whole state row), ListState (append-only id log) — backed by the RocksDB
state store, which is what makes per-key state practical at 100 TB:
updates hit only the touched keys/columns instead of rewriting a packed
state row per key per batch, and state snapshots/changelogs ship to the
checkpoint incrementally.

Numeric discipline: money totals accumulate as integer cents (exact,
order/batch-slicing independent); the float conversion happens once in
the finalization projection. Every emitted column is slicing-invariant
(counts, mins/maxes, cent sums), so the multi-batch streaming result is
hash-identical to the batch dual however the files slice into batches.

Env note: the TWS python worker needs google.protobuf (state-server
protocol). compat/protobuf_alias provides it from the machine's Cloud
SDK copy via PYTHONPATH — which must be exported BEFORE the JVM starts
to reach worker subprocesses. On a pre-existing JVM without it, run()
falls back to the v1 operator computing the identical result (engine
flag reports which path ran; the pytest pins 'tws' in our own harness).
"""

from __future__ import annotations

import tempfile
import uuid

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_cents bigint, n_types bigint, "
    "top_type string, n_ids bigint, min_id bigint, max_id bigint"
)

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


# --- map-side pre-reduction (round 8) ---------------------------------------
# The stateful operator's cost at scale is the Arrow/python boundary: one
# row per EVENT crossing into the state worker made the operator 31x the
# batch dual at native sf1 (BASELINE §3g-bis — python-compute bound, not
# state-store bound). Every emitted stat is decomposable, so each Arrow
# batch is first reduced STATELESSLY to per-(user, event_type) partials —
# the map-side-combine discipline the interval join's stream_partial_agg
# already uses — and the shuffle + state boundary carry keys, not events.
# At 100 TB this is the difference between state traffic proportional to
# the event rate and proportional to the active-key rate.
PARTIAL_SCHEMA = (
    "user_id bigint, event_type string, n bigint, m bigint, cents bigint, "
    "min_id bigint, max_id bigint"
)

_PARTIAL_COLS = ["user_id", "event_type", "n", "m", "cents", "min_id", "max_id"]


def _pre_reduce(it):
    """Stateless per-Arrow-batch reduce: (user, type) -> (n, in-domain m,
    exact integer cents, id lo/hi).

    Cents are per-row HALF_UP int64 (floor(x*100 + 0.5) — matching both
    engines' DECIMAL ROUND, unlike pandas' banker's rounding), summed
    exactly; partial sums merge associatively so the result is
    batch-slicing invariant.

    Finite-measure contract (extremes-sweep finding): a float column
    reaching pandas cannot distinguish SQL NULL from NaN, and numpy's
    int64 cast of a non-finite is the INT64-MIN sentinel — one poisoned
    row would silently corrupt the running state by -9.2e18. Out-of-
    domain measures (non-finite or past the 1e12 money bound) contribute
    nothing, exactly like the batch dual's dec() NULL — and the
    in-domain count m rides along so a key with zero in-domain measures
    reports SQL's SUM-over-empty NULL instead of 0."""
    import numpy as np

    for pdf in it:
        if not len(pdf):
            continue
        v = pdf["value"].to_numpy(dtype="float64", na_value=float("nan"))
        ok = np.isfinite(v) & (np.abs(v) < 1e12)
        cents = np.floor(np.where(ok, v, 0.0) * 100 + 0.5).astype("int64")
        cents[~ok] = 0
        g = (
            pd.DataFrame(
                {
                    "user_id": pdf["user_id"].to_numpy(),
                    "event_type": pdf["event_type"],
                    "n": np.ones(len(pdf), dtype="int64"),
                    "m": ok.astype("int64"),
                    "cents": cents,
                    "min_id": pdf["event_id"].to_numpy(),
                    "max_id": pdf["event_id"].to_numpy(),
                }
            )
            # dropna=False: a null event_type must still count toward n
            # (the per-event path counted every row; value_counts-style
            # NaN dropping applies only to the TYPE map, downstream)
            .groupby(["user_id", "event_type"], as_index=False, dropna=False)
            .agg(
                {
                    "n": "sum",
                    "m": "sum",
                    "cents": "sum",
                    "min_id": "min",
                    "max_id": "max",
                }
            )
        )
        yield g[_PARTIAL_COLS]


def _make_processor():
    """Build the StatefulProcessor class lazily: importing
    pyspark.sql.streaming pulls the protobuf-backed state client, which
    only resolves after compat installs the alias."""
    from pyspark.sql.streaming import StatefulProcessor

    class UserActivityStats(StatefulProcessor):
        def init(self, handle):
            self.totals = handle.getValueState(
                "totals", "n bigint, cents bigint, m bigint, lo bigint, hi bigint"
            )
            self.types = handle.getMapState("types", "t string", "c bigint")
            # Append-only id-watermark log: one (lo) + one (hi) entry per
            # incoming PARTIAL, not per event — min/max over the list
            # equal the per-event extremes, and the ListState primitive
            # stays exercised with state bounded by partial count (an
            # unbounded per-event id log was itself a 100 TB hazard).
            # The log is WRITE-only in the hot path (its production role
            # is out-of-band audit/replay); the emitted min/max ride the
            # totals ValueState so no per-key-per-batch list read is
            # paid — reading the growing log each batch was one more
            # protocol round trip per key (see cost discipline below).
            self.ids = handle.getListState("ids", "id bigint")
            # Reused emission template (see handleInputRows): object
            # dtype so the nullable bigint columns can hold None.
            self._out = pd.DataFrame(
                [[None] * 8],
                columns=[
                    "user_id",
                    "n_events",
                    "total_cents",
                    "n_types",
                    "top_type",
                    "n_ids",
                    "min_id",
                    "max_id",
                ],
                dtype=object,
            )

        def handleInputRows(self, key, rows, timerValues):
            # Per-key cost discipline (round 8): with ~15k keys per
            # micro-batch, every state-server round trip and every
            # per-key pandas operation multiplies by the key count —
            # measured 36.8 s (tws) vs 16.9 s (v1, in-plan state) vs
            # 0.26 s (batch) on 1M rows/15k users, i.e. the operator is
            # PROTOCOL-bound, not data-bound. So: ValueState.get()
            # without the redundant exists() probe, the type map read
            # ONCE via iterator() and point-updated only for types seen
            # in this batch (was containsKey+getValue+updateValue per
            # type), and plain dict/zip accumulation instead of a pandas
            # groupby over a <=dozens-row partial frame.
            tot = self.totals.get()
            n, cents, m, lo, hi = (
                tot if tot is not None else (0, 0, 0, None, None)
            )
            delta: dict = {}
            marks = []
            for pdf in rows:
                if not len(pdf):
                    continue
                nn = pdf["n"].to_numpy()
                n += int(nn.sum())
                m += int(pdf["m"].sum())
                cents += int(pdf["cents"].sum())
                # None/NaN-typed partials count toward n above but never
                # enter the type map — same as value_counts' NaN drop in
                # the per-event formulation.
                for t, c in zip(pdf["event_type"].tolist(), nn.tolist()):
                    if t is not None and t == t:
                        delta[t] = delta.get(t, 0) + int(c)
                blo, bhi = int(pdf["min_id"].min()), int(pdf["max_id"].max())
                lo = blo if lo is None else min(lo, blo)
                hi = bhi if hi is None else max(hi, bhi)
                marks.append((blo,))
                marks.append((bhi,))
            if marks:
                self.ids.appendList(marks)
            self.totals.update((n, cents, m, lo, hi))
            current = {k[0]: v[0] for k, v in self.types.iterator()}
            for t, c in delta.items():
                current[t] = current.get(t, 0) + c
                self.types.updateValue((t,), (current[t],))
            items = list(current.items())
            top_type = min(items, key=lambda kv: (-kv[1], kv[0]))[0]
            # Emission rides a REUSED one-row object-dtype template:
            # constructing a fresh 1-row pandas DataFrame costs ~210 us
            # (BlockManager setup), x 15k keys x 4 batches ~ 12 s — half
            # the operator's wall clock. Reuse is safe because the TWS
            # serializer chain is lazy one-at-a-time: each yielded frame
            # is converted to its own Arrow RecordBatch
            # (ArrowStreamPandasUDFSerializer.dump_stream ->
            # _create_batch) BEFORE the generator resumes, so the
            # mutation never races the copy. (The v1 serializer
            # ACCUMULATES yielded frames by reference up to
            # arrowMaxRecordsPerBatch — reuse is NOT safe there; v1
            # keeps fresh frames.)
            out = self._out
            out.iat[0, 0] = key[0]
            out.iat[0, 1] = n
            out.iat[0, 2] = cents if m > 0 else None  # SUM over empty = NULL
            out.iat[0, 3] = len(items)
            out.iat[0, 4] = top_type
            out.iat[0, 5] = n  # n_ids: every event carries one id
            out.iat[0, 6] = lo
            out.iat[0, 7] = hi
            yield out

        def close(self):
            pass

    return UserActivityStats()


# --- packed-ValueState variant (round 8): the production posture for a
# SMALL FIXED fan-out. The MapState processor above pays ~9 state-server
# round trips per key per batch (get, update, appendList, iterator, one
# updateValue per seen type) — the price of exercising the point-
# updatable primitive. When the per-key fan-out is small and bounded
# (a handful of event types, not an open-ended key space), the whole
# state packs into ONE ValueState row (counts + a sorted-JSON type map)
# and the hot path drops to exactly 2 round trips: get + update.
# BASELINE §3g-bis recorded this as "the design rule, not applied";
# this operator applies it, registered beside the MapState row so both
# postures stay measured. MapState still earns its keep when the map is
# large or dynamic — rewriting a packed row then costs O(map) per batch
# versus O(touched keys).

_PACKED_STATE = (
    "n bigint, cents bigint, m bigint, types string, lo bigint, hi bigint"
)


def _make_packed_processor():
    """Single-ValueState StatefulProcessor computing the same per-user
    stats as UserActivityStats (see _make_processor): the type counters
    ride a canonical sorted-JSON string inside the packed row."""
    import json

    from pyspark.sql.streaming import StatefulProcessor

    class PackedUserStats(StatefulProcessor):
        def init(self, handle):
            self.s = handle.getValueState("s", _PACKED_STATE)
            # Reused emission template — safe under the TWS serializer
            # for the reason documented in UserActivityStats.
            self._out = pd.DataFrame(
                [[None] * 8],
                columns=[
                    "user_id",
                    "n_events",
                    "total_cents",
                    "n_types",
                    "top_type",
                    "n_ids",
                    "min_id",
                    "max_id",
                ],
                dtype=object,
            )

        def handleInputRows(self, key, rows, timerValues):
            cur = self.s.get()  # round trip 1 of 2
            if cur is None:
                n, cents, m, types, lo, hi = 0, 0, 0, {}, None, None
            else:
                n, cents, m, tj, lo, hi = cur
                types = json.loads(tj)
            for pdf in rows:
                if not len(pdf):
                    continue
                nn = pdf["n"].to_numpy()
                n += int(nn.sum())
                m += int(pdf["m"].sum())
                cents += int(pdf["cents"].sum())
                # NaN/None-typed partials count toward n but never enter
                # the type map (value_counts NaN-drop semantics).
                for t, c in zip(pdf["event_type"].tolist(), nn.tolist()):
                    if t is not None and t == t:
                        types[t] = types.get(t, 0) + int(c)
                blo, bhi = int(pdf["min_id"].min()), int(pdf["max_id"].max())
                lo = blo if lo is None else min(lo, blo)
                hi = bhi if hi is None else max(hi, bhi)
            self.s.update(  # round trip 2 of 2
                (n, cents, m, json.dumps(types, sort_keys=True), lo, hi)
            )
            items = list(types.items())
            top_type = min(items, key=lambda kv: (-kv[1], kv[0]))[0]
            out = self._out
            out.iat[0, 0] = key[0]
            out.iat[0, 1] = n
            out.iat[0, 2] = cents if m > 0 else None  # SUM over empty = NULL
            out.iat[0, 3] = len(items)
            out.iat[0, 4] = top_type
            out.iat[0, 5] = n
            out.iat[0, 6] = lo
            out.iat[0, 7] = hi
            yield out

        def close(self):
            pass

    return PackedUserStats()


def transform_user_stats_packed(
    spark: SparkSession, events: DataFrame, allow_fallback: bool = True
) -> tuple[DataFrame, str]:
    """Packed-ValueState dual of transform_user_stats: identical result,
    2 state round trips per key-batch instead of ~9. Same v1 fallback
    (whose JSON-string state row is already the packed layout)."""
    from ..compat.protobuf_alias import ensure_tws_env

    grouped = events.mapInPandas(_pre_reduce, PARTIAL_SCHEMA).groupBy("user_id")
    if ensure_tws_env():
        prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
        try:
            out = grouped.transformWithStateInPandas(
                _make_packed_processor(),
                outputStructType=OUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
            return _finalize(_run_update_stream(out)), "tws"
        except Exception:
            if not allow_fallback:
                raise
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    elif not allow_fallback:
        raise RuntimeError("TWS environment unavailable and fallback disabled")
    out = grouped.applyInPandasWithState(
        _v1_stats,
        outputStructType=OUT_SCHEMA,
        stateStructType=_V1_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    return _finalize(_run_update_stream(out)), "v1"


# --- v1 fallback (applyInPandasWithState; no protobuf dependency) ----------

_V1_STATE = (
    "n bigint, cents bigint, m bigint, types string, n_ids bigint, "
    "min_id bigint, max_id bigint"
)


def _v1_stats(key, pdf_iter, state):
    # Consumes the SAME pre-reduced partials as the v2 processor.
    import json

    if state.exists:
        n, cents, m, types_json, n_ids, min_id, max_id = state.get
        types = dict(json.loads(types_json))
    else:
        n, cents, m, types, n_ids, min_id, max_id = 0, 0, 0, {}, 0, None, None
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        nn = pdf["n"].to_numpy()
        dn = int(nn.sum())
        n += dn
        m += int(pdf["m"].sum())
        cents += int(pdf["cents"].sum())
        for t, c in zip(pdf["event_type"].tolist(), nn.tolist()):
            if t is not None and t == t:
                types[t] = types.get(t, 0) + int(c)
        n_ids += dn
        lo, hi = int(pdf["min_id"].min()), int(pdf["max_id"].max())
        min_id = lo if min_id is None else min(min_id, lo)
        max_id = hi if max_id is None else max(max_id, hi)
    state.update(
        (n, cents, m, json.dumps(types, sort_keys=True), n_ids, min_id, max_id)
    )
    top_type = sorted(types.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    yield pd.DataFrame(
        [(key[0], n, cents if m > 0 else None, len(types), top_type,
          n_ids, min_id, max_id)],
        columns=[
            "user_id",
            "n_events",
            "total_cents",
            "n_types",
            "top_type",
            "n_ids",
            "min_id",
            "max_id",
        ],
    )


def _finalize(emissions: DataFrame) -> DataFrame:
    """Update-mode emissions -> final snapshot per user: n_events grows
    strictly per emission of a key, so max_by picks the last state."""
    cols = ["n_events", "total_cents", "n_types", "top_type", "n_ids", "min_id", "max_id"]
    return (
        emissions.groupBy("user_id")
        .agg(F.max_by(F.struct(*cols), "n_events").alias("s"))
        .select("user_id", "s.*")
    )


def _run_update_stream(out: DataFrame) -> DataFrame:
    spark = out.sparkSession
    name = f"tws_{uuid.uuid4().hex[:10]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="tws_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emissions = spark.table(name)
    try:
        # Same driver-flood guard as streaming/ops.py run_to_memory: the
        # emissions here are per-user aggregates (key-bounded) so this is
        # safe today — the guard is for the future caller who routes an
        # unaggregated stream through this drain without checking.
        n = emissions.count()
        if n > 1_000_000:
            raise RuntimeError(
                f"memory sink {name} holds {n} rows; _run_update_stream is "
                "for aggregated (key-bounded) emission streams only"
            )
        rows, schema = emissions.collect(), emissions.schema
    finally:
        # Drop on BOTH paths so a rejected result set is not pinned.
        spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, schema)


def transform_user_stats(
    spark: SparkSession, events: DataFrame, allow_fallback: bool = True
) -> tuple[DataFrame, str]:
    """Run the per-user activity-stats operator over an event stream.
    Returns (final per-user snapshot, engine) with engine 'tws' when the
    v2 operator ran, 'v1' when the applyInPandasWithState fallback did."""
    from ..compat.protobuf_alias import ensure_tws_env

    # Map-side pre-reduction (see _pre_reduce): the stateful operator
    # receives per-(user, type) partials, so the state-boundary Arrow
    # traffic scales with active keys per batch, not events.
    grouped = events.mapInPandas(_pre_reduce, PARTIAL_SCHEMA).groupBy("user_id")
    if ensure_tws_env():
        prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
        try:
            out = grouped.transformWithStateInPandas(
                _make_processor(),
                outputStructType=OUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
            return _finalize(_run_update_stream(out)), "tws"
        except Exception:
            if not allow_fallback:
                raise
            # pre-existing JVM without the protobuf PYTHONPATH: workers
            # can't speak the state protocol — use the v1 operator
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    elif not allow_fallback:
        raise RuntimeError("TWS environment unavailable and fallback disabled")
    out = grouped.applyInPandasWithState(
        _v1_stats,
        outputStructType=OUT_SCHEMA,
        stateStructType=_V1_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    return _finalize(_run_update_stream(out)), "v1"
