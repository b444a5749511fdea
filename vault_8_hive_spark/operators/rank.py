"""Scalable global ranking.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY makes Spark
move the ENTIRE input to one partition (WindowExec warns "Moving all
data to a single partition") — a single-task serialization that is fine
on a 3k-row daily series and fatal on a 100 TB fact. The scalable
spelling is the classic two-pass zipWithIndex shape, kept fully
declarative:

1. range-repartition by the order key (parallel range sort),
2. per-partition ``row_number`` (each task ranks only its slice),
3. add each partition's start offset (a P-row cumulative sum, broadcast
   back).

The produced rank is identical to the single-partition spelling no
matter where the range boundaries fall, PROVIDED the order is a total
order (callers must include a unique tie-break column): a row's global
rank is determined by the order alone, not by the partitioning.

NTILE is derived from the global rank with the SQL-standard remainder
rule (first N mod k buckets get one extra row), so oracle SQL can keep
using native NTILE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Floor on range partitions for the parallel sort; the live count follows
# the session's defaultParallelism (rank values do not depend on this
# number, so it is purely a parallelism knob — on a 1000-executor cluster
# it tracks the core count instead of serializing the sort into 8 tasks).
_RANGE_PARTS = 8


def _range_parts(df: DataFrame) -> int:
    return max(_RANGE_PARTS, df.sparkSession.sparkContext.defaultParallelism)


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out: str = "rn",
    total: str | None = None,
) -> DataFrame:
    """Append a 1-based global row number over a TOTAL order.

    order_cols must uniquely order the rows (include a key column as the
    final tie-break) — uniqueness is what makes the result independent
    of the range boundaries.

    If ``total`` is given, a column of that name carries the TOTAL row
    count, computed from the same P-row offsets aggregate the rank
    already needs — callers that want NTILE/percentile denominators
    must NOT add a separate count branch (a crossJoin(df.agg(count))
    re-scans the whole source for one scalar the offsets table already
    knows).
    """
    ranged = df.repartitionByRange(_range_parts(df), *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = F.row_number().over(
        Window.partitionBy("_pid").orderBy(*order_cols)
    )
    with_local = ranged.withColumn("_lrn", local)
    # P-row offset table: rows before each partition (cumulative count),
    # plus (optionally) the grand total from the same tiny window pass.
    off_w = Window.orderBy("_pid")
    off_cols = [
        F.col("_pid"),
        F.coalesce(
            F.sum("_pn").over(off_w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_off"),
    ]
    if total is not None:
        off_cols.append(
            F.sum("_pn")
            .over(
                off_w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias(total)
        )
    offsets = (
        with_local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_pn"))
        .select(*off_cols)
    )
    return (
        with_local.join(F.broadcast(offsets), "_pid")
        .withColumn(out, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def global_cumsum(
    df: DataFrame, order_cols: list[str], value_col: str, out: str = "cum"
) -> DataFrame:
    """Append an INCLUSIVE running sum of value_col over a total order,
    with the same two-pass range-partitioned shape as global_row_number
    (per-partition cumsum + broadcast partition offsets) — never a
    single-partition window. The running sum keeps the type Spark's SUM
    promotes the value column to (long for integers, double/decimal kept
    as-is) — no narrowing cast."""
    ranged = df.repartitionByRange(_range_parts(df), *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = F.sum(value_col).over(
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_local = ranged.withColumn("_lcum", local)
    offsets = (
        with_local.groupBy("_pid")
        .agg(F.sum(value_col).alias("_ps"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_ps").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_off")
    )
    return (
        with_local.join(F.broadcast(offsets), "_pid")
        .withColumn(out, F.col("_off") + F.col("_lcum"))
        .drop("_pid", "_lcum", "_off")
    )


def ntile_from_rank(rn: Column, n_total: Column, k: int) -> Column:
    """SQL-standard NTILE(k) from a 1-based global rank and total count.

    base = N div k; the first (N mod k) buckets hold base+1 rows.
    """
    base = F.floor(n_total / k).cast("long")
    rem = n_total - base * k
    big = (base + 1) * rem  # rows covered by the base+1-sized buckets
    return (
        F.when(rn <= big, F.floor((rn - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((rn - 1 - big) / base) + 1)
        .cast("int")
    )
