"""Engine facade: the user-facing entry point.

A user of the reference switching to this engine gets one object that
wires the session, catalog, and query registry together:

    from vault_8_hive_spark.engine import Engine
    eng = Engine(sf_dir="/root/testdata/sf0.01")
    eng.sql("SELECT count(*) FROM lineitem").show()   # SQL API
    eng.table("orders").groupBy(...)                   # DataFrame API
    eng.run("top_segment_revenue")                     # registry query
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLES, register_views, table
from .queries import all_queries
from .session import get_spark, prep


class Engine:
    def __init__(self, sf_dir: str, spark: SparkSession | None = None):
        self.sf_dir = sf_dir
        self.spark = spark or get_spark()
        prep(self.spark)
        register_views(self.spark, sf_dir)

    def sql(self, query: str) -> DataFrame:
        """ANSI SQL over the registered table views (Catalyst-planned)."""
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return table(self.spark, self.sf_dir, name)

    def run(self, query_name: str) -> DataFrame:
        """Execute a registered capability query by name."""
        return all_queries()[query_name].fn(self.spark, self.sf_dir)

    def tables(self) -> tuple[str, ...]:
        return TABLES
