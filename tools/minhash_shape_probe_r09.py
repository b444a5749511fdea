#!/usr/bin/env python
"""Round-9 shape probe for text_minhash_lsh's df-cap guard.

Three arms, interleaved in one session (ab_probe methodology), all
returning identical rows (asserted):

- win   — the r8 count-window guard (fold 1x into the window's shared
          exchange; 3 window sorts; BNLJ audit over the windowed rel).
- anti  — the first r9 rewrite (_cap_banded): groupBy-count + broadcast
          anti-join. Stage probe showed PushDownLeftSemiAntiJoin splits
          the subtrees so the minhash FOLD RUNS TWICE (~3.2 + 3.9 s of
          8.6 s total task time at sf0.1) — the windows it removed were
          trivial next to that.
- ckpt  — bands repartitioned by band_key then LAZY localCheckpoint
          (hard barrier: no pushdown/pruning can split consumers; fold
          exactly once into the blocks), cap as a one-sided broadcast
          anti-join against the offending-key set (capping one join
          side is pair-set-equivalent: a pair needs its band_key on
          BOTH sides, and the bucket size is a key property).

Usage: python tools/minhash_shape_probe_r09.py [--runs=N] [--sf=DIR]
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
from vault_8_hive_spark.queries.text import (  # noqa: E402
    DF_CLIFF,
    _df_cap_mode,
    _minhash_bands,
    _shingled,
)
from vault_8_hive_spark.session import prep  # noqa: E402


def _sh(spark, sf_dir):
    par = spark.sparkContext.defaultParallelism
    return (
        _shingled(table(spark, sf_dir, "documents"))
        .where(F.col("doc_id").isNotNull())
        .repartition(par, "doc_id")
    )


def _verify(sh, cand):
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


def arm_win(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    sh = _sh(spark, sf_dir)
    bands = _minhash_bands(sh)
    wb = bands.withColumn("k", F.count(F.lit(1)).over(Window.partitionBy("band_key")))
    mode, cap = _df_cap_mode(spark)
    mx = wb.agg(F.max("k").alias("_df_mx"))
    safe = (
        wb.crossJoin(F.broadcast(mx))
        .where((F.col("_df_mx") <= F.lit(DF_CLIFF)) | (F.col("k") <= F.lit(cap)))
        .drop("_df_mx")
        .drop("k")
    )
    b2 = safe.select(F.col("doc_id").alias("doc_b"), F.col("band_key").alias("bk"))
    cand = (
        safe.join(b2, (safe.band_key == b2.bk) & (safe.doc_id < b2.doc_b))
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    return _verify(sh, cand)


def arm_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vault_8_hive_spark.queries.text import _cap_banded

    prep(spark)
    sh = _sh(spark, sf_dir)
    bands = _minhash_bands(sh)
    safe = _cap_banded(spark, bands, "band_key")
    b2 = safe.select(F.col("doc_id").alias("doc_b"), F.col("band_key").alias("bk"))
    cand = (
        safe.join(b2, (safe.band_key == b2.bk) & (safe.doc_id < b2.doc_b))
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    return _verify(sh, cand)


def arm_ckpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    sh = _sh(spark, sf_dir)
    bands = _minhash_bands(sh)
    ex = (
        bands.where(F.col("band_key").isNotNull())
        .repartition("band_key")
        .localCheckpoint(eager=False)
    )
    mode, cap = _df_cap_mode(spark)
    kc = ex.groupBy("band_key").agg(F.count(F.lit(1)).alias("_df_k"))
    mx = kc.agg(F.max("_df_k").alias("_df_mx"))
    bad = kc.crossJoin(F.broadcast(mx)).where(
        (F.col("_df_mx") > F.lit(DF_CLIFF)) & (F.col("_df_k") > F.lit(cap))
    )
    safe = ex.join(F.broadcast(bad.select("band_key")), ["band_key"], "left_anti")
    b2 = ex.select(F.col("doc_id").alias("doc_b"), F.col("band_key").alias("bk"))
    cand = (
        safe.join(b2, (safe.band_key == b2.bk) & (safe.doc_id < b2.doc_b))
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    return _verify(sh, cand)


ARMS = {"win": arm_win, "anti": arm_anti, "ckpt": arm_ckpt}


def timed_run(spark, fn, sf_dir):
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
    from vault_8_hive_spark.catalog import optimize_tables
    from vault_8_hive_spark.session import get_spark

    runs = 5
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    spark = get_spark(app_name="minhash-shape-probe-r09")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    optimize_tables(spark, sf_dir, chunks=4)

    ref = None
    for name, fn in ARMS.items():
        _, pdf = timed_run(spark, fn, sf_dir)  # warmup + rows
        if ref is None:
            ref = canon(pdf)
        else:
            print(f"{name} rows_equal={canon(pdf) == ref}", flush=True)
    times: dict[str, list[float]] = {n: [] for n in ARMS}
    for _ in range(runs):
        for name, fn in ARMS.items():
            times[name].append(timed_run(spark, fn, sf_dir)[0])
    for name, ts in times.items():
        print(
            f"{name}: median={statistics.median(ts):.3f}s "
            f"runs={[round(x, 2) for x in ts]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
