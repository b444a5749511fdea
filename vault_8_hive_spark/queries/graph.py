"""Iterative graph analytics over relational data (beside
operators/components.py's connected components): PageRank on the
customer-supplier trading graph.

Numeric discipline for a cross-engine iterative float algorithm: every
iteration's rank is rounded to 1e-9 on BOTH engines before feeding the
next — float summation order differs across engines at ~1e-16 per
reduction, and without the per-iteration clamp that drift compounds
through the power iteration (the same trick vec_kmeans_clusters'
unrolled-CTE oracle uses for centroid distances).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..session import prep
from . import register

_DAMP = 0.85
_ITERS = 3
_SUPP_BASE = 100000  # supplier node ids offset past customer keys


def _pagerank_oracle() -> str:
    edges = f"""
SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
UNION
SELECT DISTINCT {_SUPP_BASE} + l_suppkey AS src, o_custkey AS dst
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""
    iters = []
    prev = "r0"
    for i in range(1, _ITERS + 1):
        iters.append(f"""
r{i} AS (
  SELECT n.node,
         ROUND(0.15 / (SELECT COUNT(*) FROM nodes)
               + {_DAMP} * COALESCE(SUM({prev}.rank / d.outdeg), 0), 9) AS rank
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN {prev} ON {prev}.node = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY n.node
)""")
        prev = f"r{i}"
    return f"""
WITH edges AS ({edges}),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, ROUND(1.0 / (SELECT COUNT(*) FROM nodes), 9) AS rank FROM nodes),
{", ".join(i.strip() for i in iters)}
SELECT node, rank FROM {prev}
ORDER BY rank DESC, node
LIMIT 20
"""


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative", "pagerank"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 damped power iterations, symmetrized customer<->
    supplier trading edges): which parties sit at the center of the
    trading network. The loop builds pure DataFrame lineage — each
    iteration is contributions = edges ⋈ ranks, one shuffle on dst;
    only the plan, never data, passes through the driver (kmeans-style;
    at more iterations you'd checkpoint lineage every ~5 rounds). The
    oracle unrolls the identical three iterations as DuckDB CTEs; both
    engines round each iteration to 1e-9, which absorbs reduction-order
    float drift (see module docstring).

    Scale: edges come from one distinct over the order-lines join;
    ranks is |nodes| rows; every iteration shuffles contributions by
    dst — the canonical distributed PageRank shape, with AQE free to
    broadcast the (small) rank side at low SF."""
    prep(spark)
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            (F.lit(_SUPP_BASE) + F.col("l_suppkey")).alias("supp"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
        .unionByName(
            pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
        )
        .distinct()
    )
    edges = edges.persist()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n_nodes = nodes.count()  # one scalar to the driver (teleport term)
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n_nodes), 9).alias("rank")
    )
    for _ in range(_ITERS):
        contribs = (
            edges.join(deg, "src")
            .join(ranks, F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                F.round(
                    F.lit(0.15 / n_nodes)
                    + _DAMP * F.coalesce("contrib", F.lit(0.0)),
                    9,
                ).alias("rank"),
            )
        )
    out = ranks.orderBy(F.desc("rank"), "node").limit(20)
    return out
