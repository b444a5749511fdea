"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``vault_8_hive_spark``; this module adapts its query
registry (one named query per SURVEY.md §2B capability, each carrying its
DuckDB oracle SQL) to the driver's verify interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from vault_8_hive_spark.queries import driver_queries  # noqa: E402

# Export the protobuf-shim PYTHONPATH at import time: if the caller
# creates its JVM after importing this module, transformWithState workers
# inherit it and the v2 engine runs for real; on an already-running JVM
# the operator's documented v1 fallback keeps results identical.
try:  # noqa: SIM105
    from vault_8_hive_spark.compat.protobuf_alias import ensure_tws_env  # noqa: E402

    ensure_tws_env()
except Exception:
    pass

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "top_segment_revenue"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return driver_queries()[_FLAGSHIP].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per SURVEY.md §2 capability row — the <=50-name driver
    registry (the driver's correctness file holds ~50 verdicts, so
    operator variants are consolidated into composite entries; the full
    fine-grained registry stays under pytest in tests/test_oracle.py)."""
    return {name: q.fn for name, q in sorted(driver_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return {
        name: q.oracle
        for name, q in sorted(driver_queries().items())
        if q.oracle is not None
    }
