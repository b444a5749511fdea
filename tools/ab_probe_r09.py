#!/usr/bin/env python
"""Round-9 A/B attribution probe: old vs new spelling, one session.

Same methodology as tools/ab_probe_r08.py (interleaved fresh-build runs
in ONE SparkSession, median of --runs=N paired runs — cross-run bench
totals on this box swing ±30-60% with host weather, so attribution must
come from within-session pairing). Old spellings are frozen copies of
the r8 code (c64f07a tree), kept verbatim.

r9 arms:
- text_minhash_lsh: r8's df-cap count-window (an Exchange+Sort+Window
  per consumer of the capped relation) vs r9's groupBy-count +
  broadcast-anti-join (_cap_banded).
- vec_cosine_neardup_pairs: same guard swap on the LSH bucket key.
- text_incremental_neardup: same guard swap, asymmetric join consumer.

Each arm's first paired run also asserts the two spellings return the
SAME rows (sorted-frame comparison on exact integer/string cols, exact
equality on the rounded jaccard — both arms round identically from
identical integers).

Usage: python tools/ab_probe_r09.py [query ...] [--runs=N] [--sf=DIR]
Measurement tooling only; run exclusively.
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


# ---------------------------------------------------------------- old code
# r8 df-cap: per-row group size from a count window, audit scalar from a
# max over the SAME windowed relation, broadcast-crossJoin gate.


def _old_cap_sized(spark, rel, k_col, mx=None):
    from vault_8_hive_spark.queries.text import DF_CLIFF, _df_cap_mode

    mode, cap = _df_cap_mode(spark)
    if mode == "off":
        return rel
    if mode == "static":
        return rel.where(F.col(k_col) <= F.lit(cap))
    if mx is None:
        mx = rel.agg(F.max(k_col).alias("_df_mx"))
    return (
        rel.crossJoin(F.broadcast(mx))
        .where((F.col("_df_mx") <= F.lit(DF_CLIFF)) | (F.col(k_col) <= F.lit(cap)))
        .drop("_df_mx")
    )


def old_text_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vault_8_hive_spark.queries.text import _minhash_bands, _shingled

    prep(spark)
    par = spark.sparkContext.defaultParallelism
    sh = (
        _shingled(table(spark, sf_dir, "documents"))
        .where(F.col("doc_id").isNotNull())
        .repartition(par, "doc_id")
    )
    bands = _minhash_bands(sh)
    wb = bands.withColumn(
        "k", F.count(F.lit(1)).over(Window.partitionBy("band_key"))
    )
    safe = _old_cap_sized(spark, wb, "k").drop("k")
    b2 = safe.select(F.col("doc_id").alias("doc_b"), F.col("band_key").alias("bk"))
    cand = (
        safe.join(b2, (safe.band_key == b2.bk) & (safe.doc_id < b2.doc_b))
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 9).alias("jaccard"))
    )


def old_vec_cosine_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vault_8_hive_spark.operators.similarity import (
        cosine,
        lsh_signature,
        to_double,
    )
    from vault_8_hive_spark.queries.vectors import PLANES, _nz

    prep(spark)
    emb = _nz(table(spark, sf_dir, "embeddings"))
    base = (
        emb.where(F.col("vec_id").isNotNull())
        .select("vec_id", "embedding")
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
    )
    sigs = base.select(
        "vec_id", "embedding", lsh_signature(to_double("embedding"), PLANES).alias("bucket")
    )
    wb = sigs.withColumn("k", F.count(F.lit(1)).over(Window.partitionBy("bucket")))
    safe = _old_cap_sized(spark, wb, "k").drop("k")
    right = safe.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), F.col("bucket").alias("bk")
    )
    pairs = safe.join(right, (safe.bucket == right.bk) & (safe.vec_id < right.vec_b))
    cos = cosine(to_double("embedding"), to_double("emb_b"))
    return pairs.where(cos >= 0.3).select(
        F.col("vec_id").alias("vec_a"), "vec_b", F.round(cos, 6).alias("cos_sim")
    )


def old_text_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vault_8_hive_spark.queries.text import _minhash_bands, _shingled

    prep(spark)
    par = spark.sparkContext.defaultParallelism
    sh = (
        _shingled(table(spark, sf_dir, "documents"))
        .where(F.col("doc_id").isNotNull())
        .repartition(par, "doc_id")
    )
    bands = _minhash_bands(sh)
    wb = bands.withColumn(
        "k", F.count(F.lit(1)).over(Window.partitionBy("band_key"))
    )
    safe = _old_cap_sized(spark, wb, "k").drop("k")
    new_b = safe.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("new_doc"), "band_key"
    )
    old_b = safe.where(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("old_doc"), F.col("band_key").alias("bk")
    )
    cand = (
        new_b.join(old_b, new_b.band_key == old_b.bk)
        .select("new_doc", "old_doc")
        .distinct()
    )
    sn = sh.select(F.col("doc_id").alias("new_doc"), F.col("shingles").alias("sh_n"))
    so = sh.select(F.col("doc_id").alias("old_doc"), F.col("shingles").alias("sh_o"))
    jac = F.size(F.array_intersect("sh_n", "sh_o")).cast("double") / F.size(
        F.array_union("sh_n", "sh_o")
    )
    return (
        cand.join(sn, "new_doc")
        .join(so, "old_doc")
        .where(jac >= 0.2)
        .select("new_doc", "old_doc", F.round(jac, 9).alias("jaccard"))
    )


def old_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8 spelling: max_by(label, struct(c, -label)) pick — the struct
    aggregation buffer forces SortAggregate in the pick stage."""
    from vault_8_hive_spark.queries.graph import _ITERS, _SUPP_BASE

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
    nodes = edges.select(F.col("src").alias("node")).distinct()
    edges_sl = (
        edges.unionByName(
            nodes.select(F.col("node").alias("src"), F.col("node").alias("dst"))
        )
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(_ITERS):
        votes = edges_sl.join(labels, edges_sl.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        counted = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        labels = counted.groupBy("node").agg(
            F.max_by(
                "label", F.struct(F.col("c"), (-F.col("label")).alias("nl"))
            ).alias("label")
        )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
    )


def old_text_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8 spelling: prefix-collision candidates with NO length/position
    pruning — every colliding pair reaches the distinct + verify joins."""
    from vault_8_hive_spark.queries.text import _shingled

    prep(spark)
    par = spark.sparkContext.defaultParallelism
    sh = _shingled(
        table(spark, sf_dir, "documents").repartition(par, "doc_id")
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
            F.round(
                ni.cast("double") / (nab - ni).cast("double"), 9
            ).alias("jaccard"),
        )
    )


def old_ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8 spelling: per-distinct-residual counts through the
    range-partitioned global_cumsum, no checkpoint."""
    from vault_8_hive_spark.functions.exact import scaled_long
    from vault_8_hive_spark.operators.rank import global_cumsum

    prep(spark)
    v = table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    ).select(
        scaled_long("l_quantity").alias("x"),
        scaled_long("l_extendedprice").alias("y"),
        "l_orderkey",
        "l_linenumber",
    )
    s = v.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    b = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    fit = s.select(n.alias("n"), b.alias("b"), ((sy - b * sx) / n).alias("a"))
    pred = F.col("a") + F.col("b") * F.col("x")
    res = (
        v.crossJoin(F.broadcast(fit))
        .where(pred.isNotNull())
        .select(
            F.round(F.abs(F.col("y") - pred), 0).cast("long").alias("r"),
            "l_orderkey",
            "l_linenumber",
        )
    )
    per_r = res.groupBy("r").agg(F.count(F.lit(1)).alias("c"))
    tot = per_r.agg(F.sum("c").alias("n")).select(
        "n",
        F.least(
            F.ceil((F.col("n") + 1) * 0.9).cast("long"), F.col("n")
        ).alias("k"),
    )
    cum = global_cumsum(per_r, ["r"], "c")
    q = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("cum") >= F.col("k"))
        .orderBy("r")
        .limit(1)
    )
    return q.select(
        F.col("n").cast("bigint").alias("n"),
        (F.col("r").cast("double") / 100.0).alias("q_hat"),
        F.round(F.col("cum").cast("double") / F.col("n"), 6).alias(
            "coverage"
        ),
    )


OLD = {
    "text_minhash_lsh": old_text_minhash_lsh,
    "ml_conformal_interval": old_ml_conformal_interval,
    "vec_cosine_neardup_pairs": old_vec_cosine_neardup_pairs,
    "text_incremental_neardup": old_text_incremental_neardup,
    "graph_label_propagation": old_graph_label_propagation,
    "text_setsim_prefix_join": old_text_setsim_prefix_join,
}


def timed_run(spark, fn, sf_dir) -> tuple[float, object]:
    import gc

    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    pdf = df.toPandas()
    dt = time.perf_counter() - t0
    del df
    gc.collect()
    spark._jvm.System.gc()
    time.sleep(0.3)
    return dt, pdf


def canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return sorted(tuple(r) for r in pdf.itertuples(index=False))


def main() -> None:
    from vault_8_hive_spark.queries import all_queries
    from vault_8_hive_spark.session import get_spark

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 5
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    names = names or sorted(OLD)

    spark = get_spark(app_name="ab-probe-r09")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    from vault_8_hive_spark.catalog import optimize_tables

    optimize_tables(spark, sf_dir, chunks=4)

    reg = all_queries()
    for name in names:
        new_fn, old_fn = reg[name].fn, OLD[name]
        _, p_old = timed_run(spark, old_fn, sf_dir)  # warmup + equality rows
        _, p_new = timed_run(spark, new_fn, sf_dir)
        eq = canon(p_old) == canon(p_new)
        olds, news = [], []
        for _ in range(runs):  # interleaved: box drift hits both arms
            olds.append(timed_run(spark, old_fn, sf_dir)[0])
            news.append(timed_run(spark, new_fn, sf_dir)[0])
        om, nm = statistics.median(olds), statistics.median(news)
        print(
            f"{name}: old={om:.3f}s new={nm:.3f}s speedup={om / nm:.2f}x "
            f"rows_equal={eq} (old runs {[round(x, 2) for x in olds]}, "
            f"new runs {[round(x, 2) for x in news]})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
