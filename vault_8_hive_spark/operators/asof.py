"""As-of join — nearest-prior-event join, Spark-first.

Spark SQL has no native ASOF JOIN (DuckDB does — it is the oracle). The
engine implements it as a *union-merge*: tag both sides, union on
(key, time), then a single window pass takes the running `last` of the
right side's payload. One shuffle on the key, no per-row Python, scales to
arbitrary group sizes (contrast `pd.merge_asof` per group, which needs the
whole group in one pandas frame).

Semantics (pinned per SURVEY.md §7 risk register): BACKWARD — for each
left row, the right row with the greatest right_time <= left_time
(strict=True: < left_time). Equal right_time ties must be pre-aggregated
away by the caller for a deterministic result.

Reference parity: the reference's only join-like logic is the
gateway<->interface longest-prefix match (honeycomb/processRSI.py:287-320);
as-of is part of the declared engine surface (SURVEY.md §2B "Join/as-of").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """As-of join; returns all left columns + value_cols from right.

    direction="backward" (default): greatest right_time <= left_time
    (< when strict). direction="forward": smallest right_time >=
    left_time (> when strict) — the same union-merge with the window
    frame mirrored (first(ignorenulls) over current..following) and the
    equal-timestamp tag ordering inverted.

    Union-merge plan:
      1. project both sides to (key..., __t, __tag, payloads) with the
         other side's payload columns nulled at matching types;
      2. union; window partitionBy(key) orderBy(__t, __tag) carries
         last(right payload, ignorenulls) over preceding..current;
      3. keep left rows; the carried payload is the as-of match.

    Tag ordering encodes strictness at equal timestamps: right rows get
    tag 0 (sort before left, inclusive <=) or tag 2 (sort after left,
    strict <) around the left rows' tag 1, so the running `last` either
    sees or skips same-time right rows.
    """
    l_types = {f.name: f.dataType for f in left.schema.fields}
    l_payload = [c for c in left.columns if c not in on]
    overlap = set(value_cols) & set(l_payload)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    if direction == "forward":
        # Forward frame sees current..following: same-ts right rows sort
        # AFTER left (tag 2) to be visible (non-strict) or BEFORE left
        # (tag 0) to fall outside the frame (strict).
        right_tag = 0 if strict else 2
    else:
        right_tag = 2 if strict else 0

    # The right payload rides as ONE struct: `last(ignorenulls)` must skip
    # left-row placeholders but still deliver right rows whose individual
    # value columns are genuinely NULL — and must never mix fields from
    # different right rows. A struct is NULL only for the placeholder.
    r_struct = F.struct(*[F.col(c) for c in value_cols])
    r_struct_type = right.select(r_struct.alias("s")).schema["s"].dataType

    # NULL semantics must match SQL ASOF (null-flood sweep, round 7):
    # a right row with a NULL time or NULL key can never satisfy
    # `l.time >= r.time AND l.key = r.key` — but in the union-merge a
    # NULL time sorts NULLS-FIRST (carried into EVERY left row) and the
    # window's partitionBy groups NULL keys together (SQL equality
    # never matches NULL). Drop them before the union.
    right = right.where(F.col(right_time).isNotNull())
    for k in on:
        right = right.where(F.col(k).isNotNull())

    l_proj = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        *l_payload,
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_proj = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(right_tag).alias("__tag"),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in l_payload],
        r_struct.alias("__r"),
    )

    if direction == "forward":
        w = (
            Window.partitionBy(*on)
            .orderBy("__t", "__tag")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("__r", ignorenulls=True)
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy("__t", "__tag")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("__r", ignorenulls=True)
    carried = l_proj.unionByName(r_proj).select(
        "*", carry.over(w).alias("__asof")
    )
    # A left row with a NULL time matches nothing in SQL ASOF (the
    # comparison is NULL); backward gets that for free (NULLS FIRST sees
    # no prior right row) but FORWARD would hand it the first future
    # right row — gate the carried payload on a present left time.
    return carried.where(F.col("__tag") == 1).select(
        *on,
        *l_payload,
        *[
            F.when(F.col("__t").isNotNull(), F.col(f"__asof.{c}")).alias(c)
            for c in value_cols
        ],
    )
