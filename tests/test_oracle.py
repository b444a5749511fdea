"""t2-mirror: every registered query with an oracle must match DuckDB.

Parametrized over the whole registry; queries without an oracle get a
rows-only smoke run (mirrors the driver's weaker check).
"""

from __future__ import annotations

import pytest

from vault_8_hive_spark.oracle import compare, run_oracle
from vault_8_hive_spark.queries import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, sf_dir):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    spdf = sdf.toPandas()
    if q.oracle is None:
        assert spdf is not None  # rows-only smoke: plan executed
        return
    opdf = run_oracle(q.oracle, sf_dir)
    rep = compare(name, spdf, opdf)
    assert rep.ok, f"{name}: {rep.detail}"
    assert rep.exact, (
        f"{name}: values only match within tolerance, not exactly — "
        f"driver hash would fail: {rep.detail}"
    )
