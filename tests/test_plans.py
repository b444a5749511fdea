"""Plan-shape assertions: the scale posture, checked mechanically.

A query that silently loses predicate pushdown, column pruning, or a
broadcast hint still passes correctness tests — these tests fail instead.
"""

from __future__ import annotations

from vault_8_hive_spark.plans.explain import (
    codegen_stage_count,
    formatted_plan,
    has_broadcast_join,
    has_pushed_filter,
    read_schema_columns,
)
from vault_8_hive_spark.queries import all_queries

QUERIES = all_queries()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = QUERIES["top_segment_revenue"].fn(spark, sf_dir)
    assert has_pushed_filter(df, "o_orderdate"), formatted_plan(df)


def test_column_pruning(spark, sf_dir):
    """pricing_summary needs 7 of lineitem's 11 columns — the scan must
    not read the others."""
    df = QUERIES["pricing_summary"].fn(spark, sf_dir)
    cols = set(read_schema_columns(df))
    assert "l_orderkey" not in cols and "l_partkey" not in cols, cols
    assert {"l_quantity", "l_extendedprice", "l_returnflag"} <= cols


def test_dim_join_broadcasts(spark, sf_dir):
    df = QUERIES["join_inner_equi"].fn(spark, sf_dir)
    assert has_broadcast_join(df), formatted_plan(df)


def test_band_join_is_broadcast_nested_loop(spark, sf_dir):
    """The tier band join must broadcast the 4-row dim, never shuffle."""
    plan = formatted_plan(QUERIES["join_band_nonequi"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_whole_stage_codegen_everywhere(spark, sf_dir):
    """Scalar-family plans must be a single codegen'd scan-project."""
    for name in ("scalar_string", "scalar_math", "scalar_conditional"):
        df = QUERIES[name].fn(spark, sf_dir)
        assert codegen_stage_count(df) >= 1, name
        assert "BatchEvalPython" not in formatted_plan(df), f"{name} fell back to Python"


def test_no_python_in_relational_plans(spark, sf_dir):
    """Every non-UDF query must stay fully JVM-side."""
    py_tags = {"udf", "domain", "streaming", "multimodal"}
    for name, q in QUERIES.items():
        if py_tags & set(q.tags) or name == "text_simhash":
            continue
        plan = formatted_plan(q.fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} unexpectedly contains a Python eval node"
        )
