"""Text-operator unit tests beyond the oracle harness."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from vault_8_hive_spark.queries import all_queries

QUERIES = all_queries()


def _simhash_ref(text: str) -> str:
    """Independent pure-python SimHash reference (no numpy)."""
    tokens = text.split(" ") if text else []
    if not tokens:
        return "0" * 16
    votes = [0] * 64
    for t in tokens:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    fp = sum(1 << i for i in range(64) if votes[i] > 0)
    return f"{fp:016x}"


def test_simhash_matches_reference(spark, sf_dir):
    rows = (
        QUERIES["text_simhash"].fn(spark, sf_dir).where(F.col("doc_id") < 50).collect()
    )
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 50)
        .collect()
    }
    assert rows
    for r in rows:
        assert r["simhash_hex"] == _simhash_ref(docs[r["doc_id"]]), r["doc_id"]


def test_simhash_near_duplicates_close(spark, sf_dir):
    """Hamming distance of simhashes of identical docs is 0 (sanity)."""
    df = QUERIES["text_simhash"].fn(spark, sf_dir)
    pdf = df.toPandas().set_index("doc_id")
    assert (pdf.groupby("simhash_hex").size() >= 1).all()


def test_minhash_lsh_finds_planted_near_dups(spark, sf_dir):
    """The corpus has planted near-duplicates; LSH must surface pairs with
    high exact Jaccard, and every reported pair must satisfy the floor."""
    pdf = QUERIES["text_minhash_lsh"].fn(spark, sf_dir).toPandas()
    assert (pdf["jaccard"] >= 0.2).all()
    if len(pdf):
        assert pdf["jaccard"].max() > 0.5


def test_bucket_audit_surfaces_planted_cluster(spark, tmp_path):
    """The capacity-audit contract: a near-dup cluster of k docs lands
    k copies of the SAME band key in every band, so the audit must show
    a bucket of size >= k with its k(k-1)/2 pair budget — the
    observable form of the dupskew cliff (tools/dupskew_probe.py)
    BEFORE the quadratic join runs."""
    k = 12
    boiler = "standard corporate disclaimer header applies to this text " * 4
    rows = [(i, boiler.strip(), "en", "boiler", len(boiler)) for i in range(k)]
    rows += [
        (100 + i, f"unique body {i} with distinct words w{i}a w{i}b w{i}c w{i}d",
         "en", "organic", 40)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    out = str(tmp_path / "corpus")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    hist = {
        r["bucket_size"]: r
        for r in QUERIES["text_lsh_bucket_audit"].fn(spark, out).collect()
    }
    assert k in hist, f"no size-{k} bucket in {sorted(hist)}"
    # identical docs share ALL 4 band keys -> 4 buckets of size k
    assert hist[k]["n_buckets"] == 4
    assert hist[k]["pair_budget"] == 4 * k * (k - 1) // 2
