"""Connected components via min-label propagation (iterative operator).

The dedup-cluster step of a training-data pipeline: near-duplicate PAIRS
(from MinHash-LSH / SimHash banding) must become GROUPS so one canonical
document survives per group. Components = transitive closure of the pair
graph; cluster id = the minimum doc id reachable.

Scale: each iteration is one shuffle join on the node key + a grouped min
— the standard Pregel-style plan. Label state is eagerly localCheckpointed
per iteration so lineage stays flat (without it, iteration k replays all
k-1 prior joins AND the upstream pair pipeline). Convergence needs at most
diameter(graph) iterations; near-dup graphs are shallow (dup groups are
cliques or short chains), so the loop exits after 2-3 rounds in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, a: str = "src", b: str = "dst", max_iter: int = 20
) -> DataFrame:
    """(a, b) edge list -> (node, cluster_id) with cluster_id = min node
    of the component. Deterministic; raises if not converged in max_iter
    (a near-dup graph that deep means the banding upstream is broken)."""
    und = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)  # edges may come from an expensive pipeline
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            und.join(labels, und.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        new = (
            labels.join(nbr, labels.node == nbr.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(labels.withColumnRenamed("label", "old"), "node")
            .where(F.col("label") < F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")
