#!/usr/bin/env python
"""Round-8 A/B attribution probe: old vs new spelling, one session.

Cross-run bench totals on this box swing ±30-60% per query with host
conditions (BASELINE.md §3h second-data-point note; re-confirmed this
round: two identical-code bench runs put er_pipeline at 1.46 s and
1.94 s). Attributing an optimization from two separate bench runs is
therefore noise-archaeology. This probe times the OLD and NEW spelling
of each rewritten query INTERLEAVED in one SparkSession (same JIT, same
page cache, same GC state), fresh-build per run (benchlib methodology),
median of `runs` — the within-session pairing cancels the box swing.

The old spellings are frozen copies of the r7 code (pre-5e4cee2..HEAD
working tree), kept here verbatim so the comparison stays reproducible
after the registered queries move on.

Usage: python tools/ab_probe_r08.py [query ...] [--runs N] [--sf DIR]
Measurement tooling only (like scale_probe.py); run exclusively.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from vault_8_hive_spark.catalog import table  # noqa: E402
from vault_8_hive_spark.session import prep  # noqa: E402

_SUPP_BASE = 100000
_ITERS = 3


# ---------------------------------------------------------------- old code


def old_connected_components(
    edges: DataFrame, a: str = "src", b: str = "dst", max_iter: int = 20
) -> DataFrame:
    """r7 operators/components.py: per-iteration eager checkpoint with
    un-co-partitioned joins plus a SECOND join per round for the
    convergence count."""
    und = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
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
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias(
                    "label"
                ),
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
    raise RuntimeError("no convergence")


def old_er_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    labels = old_connected_components(pairs, "ka", "kb")
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


def old_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7 spelling: per-round unionByName(labels) self-vote (doubles the
    lineage each round), row_number window pick, persisted edges."""
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
        .persist()
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    pick = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(_ITERS):
        votes = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
            .unionByName(labels)
        )
        counted = votes.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            counted.withColumn("rn", F.row_number().over(pick))
            .where(F.col("rn") == 1)
            .select("node", "label")
        )
    out = (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
    )
    # the r7 registered fn left the cache alive; a probe must not leak
    # cache entries across arms, so unpersist after each timed run
    out._ab_unpersist = edges  # type: ignore[attr-defined]
    return out


def old_text_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vault_8_hive_spark.queries.text import _shingled

    prep(spark)
    sh = _shingled(table(spark, sf_dir, "documents"))
    tok = sh.select("doc_id", F.explode("shingles").alias("s"))
    dfreq = tok.groupBy("s").agg(F.count(F.lit(1)).alias("nd"))
    rk = dfreq.select(
        "s",
        F.row_number()
        .over(Window.partitionBy(F.col("nd") * 0).orderBy("nd", "s"))
        .alias("r"),
    )
    wd = Window.partitionBy("doc_id").orderBy("r")
    ranked = tok.join(rk, "s").select(
        "doc_id",
        "r",
        F.row_number().over(wd).alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("n"),
    )
    pref = ranked.where(
        F.col("pos") <= F.col("n") - F.ceil(0.5 * F.col("n")) + 1
    ).select("doc_id", "r")
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "r")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    x = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .where(jac >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            inter.cast("bigint").alias("n_inter"),
            F.round(jac, 9).alias("jaccard"),
        )
    )


def old_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7 spelling: each split branch re-scans documents at the file
    count's parallelism and shingles its own slice."""
    prep(spark)
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    split = docs.select(
        "doc_id",
        F.when(bucket < 90, "train").otherwise("eval").alias("split"),
        F.transform(
            F.regexp_extract_all("text", F.lit("[A-Za-z0-9]+"), 0), F.lower
        ).alias("ws"),
    )
    sh = split.where(F.size("ws") >= 8).select(
        "doc_id",
        "split",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 7), "
                "i -> named_struct("
                "'h1', xxhash64(slice(ws, i, 8)), "
                "'h2', xxhash64(9L, slice(ws, i, 8))))"
            )
        ).alias("g"),
    ).select("doc_id", "split", "g.h1", "g.h2").distinct()
    ev = sh.where(F.col("split") == "eval").select(
        F.col("doc_id").alias("eval_doc"), "h1", "h2"
    )
    tr = sh.where(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc"), "h1", "h2"
    )
    hits = ev.join(tr, ["h1", "h2"])
    return hits.groupBy("eval_doc").agg(
        F.countDistinct("h1", "h2").alias("n_shared_shingles"),
        F.countDistinct("train_doc").alias("n_train_docs"),
        F.min("train_doc").cast("bigint").alias("first_train_doc"),
    )


OLD = {
    "er_pipeline": old_er_pipeline,
    "graph_label_propagation": old_graph_label_propagation,
    "text_setsim_prefix_join": old_text_setsim_prefix_join,
    "text_decontaminate": old_text_decontaminate,
}


def timed_run(spark, fn, sf_dir) -> float:
    import gc

    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.toPandas()
    dt = time.perf_counter() - t0
    cached = getattr(df, "_ab_unpersist", None)
    if cached is not None:
        cached.unpersist()
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
    names = args or sorted(OLD)

    spark = get_spark(app_name="ab-probe-r08")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    from vault_8_hive_spark.catalog import optimize_tables

    optimize_tables(spark, sf_dir, chunks=4)

    reg = all_queries()
    for name in names:
        new_fn, old_fn = reg[name].fn, OLD[name]
        # one untimed warmup each (JIT, codegen cache, footers)
        timed_run(spark, old_fn, sf_dir)
        timed_run(spark, new_fn, sf_dir)
        olds, news = [], []
        for _ in range(runs):  # interleaved: box drift hits both arms
            olds.append(timed_run(spark, old_fn, sf_dir))
            news.append(timed_run(spark, new_fn, sf_dir))
        om, nm = statistics.median(olds), statistics.median(news)
        print(
            f"{name}: old={om:.3f}s new={nm:.3f}s speedup={om / nm:.2f}x "
            f"(old runs {[round(x, 2) for x in olds]}, "
            f"new runs {[round(x, 2) for x in news]})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
