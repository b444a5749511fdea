"""Skew-resistant aggregation: the salting pattern (SCALE.md "Skew").

For a grouped aggregate where a few keys carry a disproportionate share
of rows (one chatty implant, one viral document), a plain groupBy puts
every row of the hot key into one reduce task. Salting splits each key
into S sub-keys, aggregates partials on (key, salt), then merges the S
partials — both stages stay partial-aggregated and the hot key's rows
never meet in a single task.

AQE's skew-join handling covers *joins*; this is the aggregation-side
equivalent, useful when a single group's partial state is itself big
(e.g. collect-style or distinct-ish aggregations).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: Callable[[], list[Column]],
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    partial_aggs: aggregate expressions for stage 1 (per key+salt); each
      must be aliased, and merge_aggs() must produce the matching merge
      expressions over those aliases (e.g. partial sum -> sum of sums,
      partial count -> sum of counts, partial min -> min of mins).
    salt_on: column whose hash spreads rows across salts (defaults to a
      uniform spread via monotonically_increasing_id — deterministic
      per-partition layout is NOT guaranteed; pass a real column when
      exact reproducibility across runs matters).
    """
    salt_src = F.col(salt_on) if salt_on else F.monotonically_increasing_id()
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_src), F.lit(salt_buckets)))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs())
