#!/usr/bin/env python
"""Round-8 candidate probe: registered spelling vs CANDIDATE rewrite.

Same interleaved one-session methodology as ab_probe_r08.py (cross-run
comparisons on this box are noise-archaeology), but the comparison runs
the CURRENT registered query against a candidate spelling under
consideration, so a rewrite is measured before it is adopted. Candidates
that win move into the registered query (and their old spelling is then
frozen into ab_probe_r08.py); candidates that lose are recorded in
OPTIMIZATION_r08.md "tried and reverted" with their numbers.

Usage: python tools/cand_probe_r08.py [name ...] [--runs=N] [--sf=DIR]
Measurement tooling only; run exclusively (no concurrent Spark jobs).
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from vault_8_hive_spark.catalog import table  # noqa: E402
from vault_8_hive_spark.session import prep  # noqa: E402


# ------------------------------------------------------------- candidates


def cand_setsim_ckpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate A: lazy-localCheckpoint the shingled relation.

    The registered plan reuses only the raw-documents Exchange; the
    shingling projection ABOVE it is recomputed by every consumer (tok
    feeds dfreq and ranked separately, plus the x and y verify sides =
    4 evaluations of the most CPU-dense per-row work in the bench).
    Checkpointing sh computes it once; the blocks stay hash(doc_id)
    partitioned, so the verify joins keep their co-partitioning."""
    prep(spark)
    from pyspark.sql import Window

    from vault_8_hive_spark.queries.text import _shingled

    par = spark.sparkContext.defaultParallelism
    sh = (
        _shingled(table(spark, sf_dir, "documents").repartition(par, "doc_id"))
        .localCheckpoint(eager=False)
    )
    tok = sh.select(
        "doc_id", F.size("shingles").alias("n"), F.explode("shingles").alias("s")
    )
    dfreq = tok.groupBy("s").agg(F.count(F.lit(1)).alias("nd"))
    wd = Window.partitionBy("doc_id").orderBy("nd", "s")
    ranked = tok.join(dfreq, "s").select(
        "doc_id", "s", "n", F.row_number().over(wd).alias("pos")
    )
    pref = ranked.where(
        F.col("pos") <= F.col("n") - F.ceil(0.5 * F.col("n")) + 1
    ).select("doc_id", "s")
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "s")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    x = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    ).repartition(par, "doc_a")
    y = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    ).repartition(par, "doc_b")
    ni = F.size(F.array_intersect("sh_a", "sh_b"))
    nab = F.size("sh_a") + F.size("sh_b")
    return (
        cand.repartition(par, "doc_a")
        .join(x, "doc_a")
        .join(y, "doc_b")
        .where(3 * ni >= nab)
        .select(
            "doc_a",
            "doc_b",
            ni.cast("bigint").alias("n_inter"),
            F.round(ni.cast("double") / (nab - ni).cast("double"), 9).alias(
                "jaccard"
            ),
        )
    )


def cand_setsim_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate B: A + PPJoin length & positional candidate filters.

    Both are NECESSARY conditions of jaccard >= 0.5 on distinct sets,
    so the final pair set is unchanged (they only prune pairs the
    verify filter would reject):
      length:     min(na, nb) >= 0.5 * max(na, nb)   (inter <= min,
                  union >= max)
      positional: at a prefix match at (pos_a, pos_b) in the SAME
                  (df, shingle) total order both docs are sorted by,
                  inter <= min(na - pos_a, nb - pos_b) + 1; the bound
                  shrinks as pos grows, so any-match-passes iff the
                  earliest match passes (the PPJoin rule applied per
                  matched row before distinct is exact).
      required:   3 * inter >= na + nb  (the verify threshold).
    """
    prep(spark)
    from pyspark.sql import Window

    from vault_8_hive_spark.queries.text import _shingled

    par = spark.sparkContext.defaultParallelism
    sh = (
        _shingled(table(spark, sf_dir, "documents").repartition(par, "doc_id"))
        .localCheckpoint(eager=False)
    )
    tok = sh.select(
        "doc_id", F.size("shingles").alias("n"), F.explode("shingles").alias("s")
    )
    dfreq = tok.groupBy("s").agg(F.count(F.lit(1)).alias("nd"))
    wd = Window.partitionBy("doc_id").orderBy("nd", "s")
    ranked = tok.join(dfreq, "s").select(
        "doc_id", "s", "n", F.row_number().over(wd).alias("pos")
    )
    pref = ranked.where(
        F.col("pos") <= F.col("n") - F.ceil(0.5 * F.col("n")) + 1
    ).select("doc_id", "s", "n", "pos")
    a, b = pref.alias("a"), pref.alias("b")
    an, bn = F.col("a.n"), F.col("b.n")
    bound = (
        F.least(an - F.col("a.pos"), bn - F.col("b.pos")) + 1
    )
    cand = (
        a.join(b, "s")
        .where(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (2 * F.least(an, bn) >= F.greatest(an, bn))
            & (3 * bound >= an + bn)
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    x = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    ).repartition(par, "doc_a")
    y = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    ).repartition(par, "doc_b")
    ni = F.size(F.array_intersect("sh_a", "sh_b"))
    nab = F.size("sh_a") + F.size("sh_b")
    return (
        cand.repartition(par, "doc_a")
        .join(x, "doc_a")
        .join(y, "doc_b")
        .where(3 * ni >= nab)
        .select(
            "doc_a",
            "doc_b",
            ni.cast("bigint").alias("n_inter"),
            F.round(ni.cast("double") / (nab - ni).cast("double"), 9).alias(
                "jaccard"
            ),
        )
    )


def _cc_fused(edges: DataFrame, a: str = "src", b: str = "dst",
              max_iter: int = 20) -> DataFrame:
    """Candidate components loop: TWO propagation rounds per
    materialization/convergence check. A round that changes nothing is
    a fixed point, so checking every other round converges to the same
    labels (the improved flag ORs across the pair of rounds); the loop
    halves its driver round-trips + per-job Catalyst compiles at the
    cost of one wasted round when convergence lands on an odd round."""
    und = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .repartition("dst")
        .localCheckpoint(eager=False)
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(max_iter):
        nbr_a = (
            und.join(labels, und.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        lab_a = labels.join(nbr_a, labels.node == nbr_a.src, "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
            (F.col("nbr_min") < F.col("label")).alias("improved"),
        )
        half = lab_a.select("node", "label")
        nbr_b = (
            und.join(half, und.dst == half.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min2"))
        )
        new = (
            lab_a.join(nbr_b, lab_a.node == nbr_b.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_min2", "label")).alias(
                    "label"
                ),
                (
                    F.col("improved") | (F.col("nbr_min2") < F.col("label"))
                ).alias("improved"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new.where("improved").count()
        labels = new.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError("no convergence")


def cand_er_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate: er_pipeline with the fused two-rounds-per-job
    components loop (upstream block/score/canonicalize unchanged)."""
    from pyspark.sql import Window

    from vault_8_hive_spark.functions.exact import scaled_long
    from vault_8_hive_spark.queries.pipeline import _ER_SHIFT

    prep(spark)
    cust = table(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        scaled_long("c_acctbal").alias("cents"),
    )
    mutated = cust.where(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + _ER_SHIFT).alias("c_custkey"),
        F.regexp_replace("c_name", "#0", "#O").alias("c_name"),
        "c_nationkey",
        "c_mktsegment",
        scaled_long("c_acctbal").alias("cents"),
    )
    corpus = base.unionByName(mutated)
    b = corpus.select(
        F.col("c_custkey").alias("kb"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.col("cents").alias("cents_b"),
    )
    pairs = (
        corpus.join(
            b,
            (F.col("c_nationkey") == F.col("nk"))
            & (F.col("c_mktsegment") == F.col("seg"))
            & (F.col("c_custkey") < F.col("kb")),
        )
        .where(
            (F.col("cents") == F.col("cents_b"))
            & (F.levenshtein("c_name", "name_b") <= 2)
        )
        .select(F.col("c_custkey").alias("ka"), "kb")
    )
    labels = _cc_fused(pairs, "ka", "kb")
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    w = Window.orderBy(F.desc("cluster_size"), "cluster_id")
    return (
        sizes.select(
            F.col("cluster_id").cast("bigint").alias("canonical_key"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            F.row_number().over(w).cast("int").alias("rk"),
        )
        .where(F.col("rk") <= 20)
        .orderBy("rk")
    )


CANDIDATES = {
    "text_setsim_prefix_join": {
        "ckpt": cand_setsim_ckpt,
        "ppjoin": cand_setsim_ppjoin,
    },
    "er_pipeline": {
        "fused_cc": cand_er_fused,
    },
}


def timed_run(spark, fn, sf_dir) -> float:
    import gc

    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.toPandas()
    dt = time.perf_counter() - t0
    del df
    gc.collect()
    spark._jvm.System.gc()
    time.sleep(0.3)
    return dt


def main() -> None:
    from vault_8_hive_spark.queries import all_queries
    from vault_8_hive_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 5
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])
        if a.startswith("--sf"):
            sf_dir = a.split("=")[1]
    names = args or sorted(CANDIDATES)

    spark = get_spark(app_name="cand-probe-r08")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    from vault_8_hive_spark.catalog import optimize_tables

    optimize_tables(spark, sf_dir, chunks=4)

    reg = all_queries()
    for name in names:
        cur_fn = reg[name].fn
        for cname, cfn in CANDIDATES[name].items():
            # value check first: candidate must be row-identical to the
            # registered spelling on this sf_dir before any timing.
            import pandas as pd

            def canon(pdf):
                pdf = pdf[sorted(pdf.columns)]
                return sorted(
                    tuple(repr(v) for v in r)
                    for r in pdf.itertuples(index=False)
                )

            if canon(cur_fn(spark, sf_dir).toPandas()) != canon(
                cfn(spark, sf_dir).toPandas()
            ):
                print(f"{name}/{cname}: VALUE MISMATCH — not timed", flush=True)
                continue
            timed_run(spark, cur_fn, sf_dir)
            timed_run(spark, cfn, sf_dir)
            curs, cands = [], []
            for _ in range(runs):
                curs.append(timed_run(spark, cur_fn, sf_dir))
                cands.append(timed_run(spark, cfn, sf_dir))
            cm, nm = statistics.median(curs), statistics.median(cands)
            print(
                f"{name}/{cname}: cur={cm:.3f}s cand={nm:.3f}s "
                f"speedup={cm / nm:.2f}x "
                f"(cur runs {[round(x, 2) for x in curs]}, "
                f"cand runs {[round(x, 2) for x in cands]})",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
