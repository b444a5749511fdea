"""Query registry — the engine's judged capability surface.

Every operator/capability from SURVEY.md §2B is exposed as a named query:
a Spark callable ``fn(spark, sf_dir) -> DataFrame`` plus (where the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string producing
the identical result. The driver's correctness gate runs both at sf0.01 and
compares row-count + schema + order-insensitive value hash; our own pytest
harness (tests/test_oracle.py) runs the same comparison locally.

Determinism discipline (the §7 risk register):
- money aggregates go through exact decimal sums then a final cast to
  double (see functions/exact.py) so float summation order cannot diverge;
- every LIMIT/top-k query carries a total order (tie-break keys);
- collect_list is always array_sort-ed;
- column names are aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


QUERIES: dict[str, Query] = {}

_MODULES = (
    "tpch",
    "joins",
    "aggregates",
    "windows",
    "setops",
    "scalars",
    "events",
    "text",
    "vectors",
    "domain",
    "streaming_batch",
    "formats",
    "udfs",
    "multimodal",
)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: register fn(spark, sf_dir) under `name` with its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tags, bench=bench, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    return QUERIES
