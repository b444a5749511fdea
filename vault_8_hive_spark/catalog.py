"""Table catalog: loaders for the driver-generated parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings, one parquet file per table under an sf dir.

Scale note (100 TB design point): these are plain parquet scans — Catalyst
pushes predicates and prunes columns into the vectorized parquet reader.
On a cluster the fact tables (lineitem/orders/events/documents) would be
written partitioned (e.g. by month of the time column) so partition pruning
kicks in; the small dims (region: 5 rows, nation: 25 rows) are always
broadcast — `dim()` wraps them in an explicit broadcast hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables small enough (fixed cardinality, independent of SF) to always broadcast.
BROADCAST_TABLES = frozenset({"region", "nation"})


# Memo of lazy DataFrame handles: spark.read.parquet does an eager file
# listing + footer schema read per call, which dominates latency for
# repeated small queries. DataFrames are immutable, so reusing the handle
# per (application, path) is safe. Keyed by applicationId (stable per
# SparkContext, never recycled) rather than id(spark): CPython can reuse
# an id() after a stopped session is collected, which would hand back
# handles bound to a dead session.
_HANDLES: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .session import prep

    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key in _HANDLES:
        return _HANDLES[key]
    prep(spark)  # idempotent; needed before schema resolution (nanos conf)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts arrives as raw int64 nanos (see session.prep); truncate to
        # micros exactly like DuckDB reads the same file, so both engines
        # see identical timestamps.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    _HANDLES[key] = df
    return df


def dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A dimension table wrapped in a broadcast hint (skips the shuffle)."""
    return F.broadcast(table(spark, sf_dir, name))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can see them."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
