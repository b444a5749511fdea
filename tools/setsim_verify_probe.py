#!/usr/bin/env python
"""Round-8 probe: setsim verify stage — array_intersect vs count-join.

text_setsim_prefix_join's verify joins the full shingle ARRAYS onto every
candidate pair and evaluates array_intersect in both the Filter and the
Project (Catalyst inlines the projected expression into the pushed
predicate — OPTIMIZATION_r08 "not yet" #4). The alternative spelling
computes |A∩B| as an integer COUNT: explode the candidate pairs by A's
tokens, equi-join B's tokens on (doc_b, s), groupBy pair — no array ever
shuffled, no intersect evaluated, and Jaccard is derived from (ni, na,
nb) integers (bit-identical doubles: same integer inputs, same ops).

Interleaved A/B in one session (ab_probe_r08 methodology), plus a
row-set equality check between the two spellings at the probe SF.

Usage: python tools/setsim_verify_probe.py [--runs N] [--sf DIR]
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


def _cand_parts(spark: SparkSession, sf_dir: str):
    """The shared candidate-generation prefix of both spellings
    (verbatim from queries/text.py::text_setsim_prefix_join)."""
    from vault_8_hive_spark.queries.text import _shingled

    prep(spark)
    par = spark.sparkContext.defaultParallelism
    sh = _shingled(table(spark, sf_dir, "documents").repartition(par, "doc_id"))
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
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return sh, tok, cand, par


def arm_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current registered spelling (r8 HEAD): array verify."""
    sh, _tok, cand, par = _cand_parts(spark, sf_dir)
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


def arm_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate verify by integer counting: no arrays past cand-gen."""
    sh, tok, cand, par = _cand_parts(spark, sf_dir)
    ta = tok.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "s")
    tb = tok.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "s")
    ni_df = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    nab = F.col("na") + F.col("nb")
    ni = F.col("ni")
    return (
        ni_df.where(3 * ni >= nab)
        .select(
            "doc_a",
            "doc_b",
            ni.cast("bigint").alias("n_inter"),
            F.round(ni.cast("double") / (nab - ni).cast("double"), 9).alias(
                "jaccard"
            ),
        )
    )


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
    from vault_8_hive_spark.catalog import optimize_tables
    from vault_8_hive_spark.session import get_spark

    runs = 5
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])
        if a.startswith("--sf"):
            sf_dir = a.split("=")[1]

    spark = get_spark(app_name="setsim-verify-probe")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    optimize_tables(spark, sf_dir, chunks=4)

    # equality first: same rows or the timing is moot
    a_pdf = arm_array(spark, sf_dir).toPandas()
    c_pdf = arm_count(spark, sf_dir).toPandas()
    key = ["doc_a", "doc_b"]
    a_s = a_pdf.sort_values(key).reset_index(drop=True)[
        ["doc_a", "doc_b", "n_inter", "jaccard"]
    ]
    c_s = c_pdf.sort_values(key).reset_index(drop=True)[
        ["doc_a", "doc_b", "n_inter", "jaccard"]
    ]
    print(f"rows: array={len(a_s)} count={len(c_s)} equal={a_s.equals(c_s)}",
          flush=True)
    # candidate volume for the record
    _sh, _tok, cand, _par = _cand_parts(spark, sf_dir)
    print(f"candidates: {cand.count()}", flush=True)

    timed_run(spark, arm_array, sf_dir)
    timed_run(spark, arm_count, sf_dir)
    olds, news = [], []
    for _ in range(runs):
        olds.append(timed_run(spark, arm_array, sf_dir))
        news.append(timed_run(spark, arm_count, sf_dir))
    om, nm = statistics.median(olds), statistics.median(news)
    print(
        f"setsim verify: array={om:.3f}s count={nm:.3f}s "
        f"speedup={om / nm:.2f}x\n"
        f"  array runs {[round(x, 2) for x in olds]}\n"
        f"  count runs {[round(x, 2) for x in news]}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
