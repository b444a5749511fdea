"""Unit tests for custom operators (as-of join edge semantics)."""

from __future__ import annotations

import datetime as dt

from vault_8_hive_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "L1"),
            (1, _ts("2024-01-01T12:00:00"), "L2"),
            (2, _ts("2024-01-01T09:00:00"), "L3"),
        ],
        "k int, t timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 10.0),
            (1, _ts("2024-01-01T12:00:00"), 20.0),  # exactly at L2's time
            (2, _ts("2024-01-01T09:30:00"), 30.0),  # after L3 — never matches
        ],
        "k int, rt timestamp, v double",
    )
    return left, right


def test_asof_inclusive_takes_equal_time(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], r["lbl"]): r["v"]
        for r in asof_join(left, right, ["k"], "t", "rt", ["v"], strict=False).collect()
    }
    assert out[(1, "L1")] == 10.0
    assert out[(1, "L2")] == 20.0  # inclusive: equal timestamp matches
    assert out[(2, "L3")] is None  # nothing at or before


def test_asof_strict_skips_equal_time(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], r["lbl"]): r["v"]
        for r in asof_join(left, right, ["k"], "t", "rt", ["v"], strict=True).collect()
    }
    assert out[(1, "L2")] == 10.0  # strict: equal timestamp is NOT prior
    assert out[(2, "L3")] is None


def test_asof_preserves_genuine_null_payload(spark):
    """A matched right row whose value is genuinely NULL must yield NULL —
    not an older row's value — and multi-column payloads must never mix
    fields from different right rows."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T03:00:00"), "L")], "k int, t timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T01:00:00"), 5.0, "a"),
            (1, _ts("2024-01-01T02:00:00"), None, None),  # the true as-of match
        ],
        "k int, rt timestamp, v double, tag string",
    )
    rows = asof_join(left, right, ["k"], "t", "rt", ["v", "tag"]).collect()
    assert rows[0]["v"] is None and rows[0]["tag"] is None


def test_asof_rejects_colliding_value_cols(spark):
    import pytest

    left = spark.createDataFrame([(1, _ts("2024-01-01T03:00:00"), 0.0)], "k int, t timestamp, v double")
    right = spark.createDataFrame([(1, _ts("2024-01-01T01:00:00"), 5.0)], "k int, rt timestamp, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "t", "rt", ["v"])


def test_asof_randomized_vs_duckdb(spark):
    """Cross-engine fuzz: asof_join must equal DuckDB's native ASOF JOIN
    on seeded random data (unique right timestamps per key, NULL payloads
    included), in both inclusive and strict modes."""
    import random

    import duckdb

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        base = dt.datetime(2024, 1, 1)
        lrows = [
            (k, base + dt.timedelta(seconds=rng.randint(0, 50_000)), f"L{k}-{i}")
            for i, k in enumerate(rng.choices(range(6), k=60))
        ]
        # unique right times per key (ties are caller-contract-excluded)
        rrows = []
        for k in range(6):
            times = rng.sample(range(0, 50_000), 25)
            rrows += [
                (
                    k,
                    base + dt.timedelta(seconds=s),
                    None if rng.random() < 0.2 else round(rng.uniform(0, 100), 3),
                )
                for s in times
            ]
        left = spark.createDataFrame(lrows, "k int, t timestamp, lbl string")
        right = spark.createDataFrame(rrows, "k int, rt timestamp, v double")

        conn = duckdb.connect()
        conn.register("l", left.toPandas())
        conn.register("r", right.toPandas())
        for strict, cmp in ((False, ">="), (True, ">")):
            got = {
                (row["k"], row["lbl"]): row["v"]
                for row in asof_join(
                    left, right, ["k"], "t", "rt", ["v"], strict=strict
                ).collect()
            }
            exp = {
                (row[0], row[1]): row[2]
                for row in conn.execute(
                    f"SELECT l.k, l.lbl, r.v FROM l ASOF LEFT JOIN r"
                    f" ON l.k = r.k AND l.t {cmp} r.rt"
                ).fetchall()
            }
            assert got == exp, (seed, strict)


def test_asof_forward_equal_ts_semantics(spark):
    """Forward as-of at EQUAL timestamps: non-strict must match the
    same-instant right row; strict must skip to the next one."""
    from vault_8_hive_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, "a")], "k int, t int, lbl string")
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0)], "k int, rt int, v double"
    )
    loose = asof_join(
        left, right, on=["k"], left_time="t", right_time="rt",
        value_cols=["v"], strict=False, direction="forward",
    ).collect()
    assert loose[0].v == 100.0
    tight = asof_join(
        left, right, on=["k"], left_time="t", right_time="rt",
        value_cols=["v"], strict=True, direction="forward",
    ).collect()
    assert tight[0].v == 200.0


def test_asof_forward_no_following_match(spark):
    """A left row after the last right row must null-extend."""
    from vault_8_hive_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 99, "late")], "k int, t int, lbl string")
    right = spark.createDataFrame([(1, 10, 1.0)], "k int, rt int, v double")
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="rt",
        value_cols=["v"], direction="forward",
    ).collect()
    assert out[0].v is None


def test_asof_forward_randomized_vs_duckdb(spark):
    """Cross-engine fuzz for the FORWARD direction: asof_join must equal
    DuckDB's native ASOF JOIN with the inequality reversed, strict and
    non-strict, NULL payloads included."""
    import random

    import duckdb

    for seed in (5, 41):
        rng = random.Random(seed)
        base = dt.datetime(2024, 1, 1)
        lrows = [
            (k, base + dt.timedelta(seconds=rng.randint(0, 50_000)), f"L{k}-{i}")
            for i, k in enumerate(rng.choices(range(6), k=60))
        ]
        rrows = []
        for k in range(6):
            times = rng.sample(range(0, 50_000), 25)
            rrows += [
                (
                    k,
                    base + dt.timedelta(seconds=s),
                    None if rng.random() < 0.2 else round(rng.uniform(0, 100), 3),
                )
                for s in times
            ]
        left = spark.createDataFrame(lrows, "k int, t timestamp, lbl string")
        right = spark.createDataFrame(rrows, "k int, rt timestamp, v double")
        conn = duckdb.connect()
        conn.register("l", left.toPandas())
        conn.register("r", right.toPandas())
        for strict, cmp in ((False, "<="), (True, "<")):
            got = {
                (row["k"], row["lbl"]): row["v"]
                for row in asof_join(
                    left, right, ["k"], "t", "rt", ["v"],
                    strict=strict, direction="forward",
                ).collect()
            }
            exp = {
                (row[0], row[1]): row[2]
                for row in conn.execute(
                    f"SELECT l.k, l.lbl, r.v FROM l ASOF LEFT JOIN r"
                    f" ON l.k = r.k AND l.t {cmp} r.rt"
                ).fetchall()
            }
            assert got == exp, (seed, strict)
