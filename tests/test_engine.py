"""Engine facade tests: the user-facing sql/table/run surface."""

from __future__ import annotations

from vault_8_hive_spark.engine import Engine


def test_engine_surface(spark, sf_dir):
    eng = Engine(sf_dir, spark=spark)
    assert eng.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"] > 0
    assert eng.table("nation").count() == 25
    assert len(eng.run("top_segment_revenue").collect()) == 5
    assert "lineitem" in eng.tables()
