"""pandas API on Spark (pyspark.pandas): the drop-in pandas surface over
distributed data — the on-ramp for users whose existing pipelines are
pandas scripts. The same lazy Catalyst plans run underneath; .to_spark()
hands the result back to the DataFrame world.

Determinism discipline: no default-index materialization (the groupby
result's index is the grouping key), and money goes through HALF_UP
integer cents with a floor(x*100 + 0.5) arithmetic spelled in pandas ops
(pandas' own .round() is banker's rounding and would diverge from SQL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling modules)

from ..session import prep
from . import register


@register(
    "api_pandas_on_spark",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_cust,
       SUM(CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,4)) * 100, 0) AS BIGINT)) AS bal_cents,
       MIN(c_custkey) AS min_key,
       MAX(c_custkey) AS max_key
FROM customer
WHERE c_acctbal > 0.0
GROUP BY c_mktsegment
""",
    tags=("api", "pandas-on-spark"),
)
def api_pandas_on_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A pandas-script-shaped pipeline (read_parquet -> boolean-mask
    filter -> derived column -> groupby().agg() -> reset_index) executed
    distributed by pyspark.pandas, then handed back via to_spark(). The
    cents column is floor(bal*100 + 0.5) in pandas arithmetic — HALF_UP,
    matching the oracle's DECIMAL ROUND — so the pandas boundary is
    numerically exact. Scale: every step is a lazy Catalyst plan (the
    mask is a pushed filter, the groupby a hash aggregate); nothing here
    collects to the driver."""
    import pyspark.pandas as ps

    prep(spark)
    psdf = ps.read_parquet(f"{sf_dir}/customer.parquet")
    psdf = psdf[psdf["c_acctbal"] > 0.0]
    psdf = psdf.assign(bal_cents=((psdf["c_acctbal"] * 100 + 0.5) // 1).astype("int64"))
    # dropna=False: pandas groupby silently DROPS NaN group keys by
    # default, SQL GROUP BY keeps the NULL group — the null-flood sweep
    # caught the 5-vs-6-group divergence (round 7).
    out = (
        psdf.groupby("c_mktsegment", dropna=False)
        .agg(
            n_cust=("c_custkey", "count"),
            bal_cents=("bal_cents", "sum"),
            min_key=("c_custkey", "min"),
            max_key=("c_custkey", "max"),
        )
        .reset_index()
    )
    return out.to_spark()
