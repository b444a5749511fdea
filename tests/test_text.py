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


# --- df-cap skew guard (round 8) -------------------------------------------
# The registered near-dup/span operators must SURVIVE the dupskew
# boilerplate corpus (tools/dupskew_probe.py's measured OOM cliff) by
# auto-engaging the high-DF cap, while staying byte-exact on every corpus
# whose worst posting list / bucket is below DF_CLIFF — including corpora
# with groups ABOVE the cap value itself (auto must not fire early).

BOILER8 = "standard corporate disclaimer header applies to this document"


def _docs_dir(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = str(tmp_path / "corpus")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def _span_corpus(n_boiler):
    """n_boiler docs sharing exactly ONE 8-gram (unique tails) plus a
    genuine pair sharing a unique 16-token run (expected span = 16)."""
    rows = [
        (i, f"{BOILER8} tail{i}a tail{i}b", "en", "boiler", 80)
        for i in range(n_boiler)
    ]
    run = " ".join(f"g{j}zq" for j in range(16))
    rows.append((9000001, f"aprefix1 aprefix2 {run}", "en", "organic", 120))
    rows.append((9000002, f"bprefix1 bprefix2 {run}", "en", "organic", 120))
    return rows


def test_dup_spans_df_cap_auto_disengaged_below_cliff(spark, tmp_path):
    """300 boilerplate docs exceed the CAP (256) but not the CLIFF
    (2048): auto mode must leave the plan exact — every boilerplate
    pair reported, not silently capped."""
    out = _docs_dir(spark, tmp_path, _span_corpus(300))
    res = QUERIES["text_dup_spans"].fn(spark, out)
    assert res.count() == 300 * 299 // 2 + 1
    gen = res.where(F.col("doc_a") == 9000001).collect()
    assert len(gen) == 1 and gen[0]["max_span_tokens"] == 16


def test_dup_spans_df_cap_engages_on_boilerplate(spark, tmp_path):
    """Past the cliff (2150 > DF_CLIFF) the registered operator must
    complete on the boilerplate corpus with the template gram dropped
    and the genuine span intact — the production df-cap posture wired
    into the live plan, not just the probe's variant."""
    out = _docs_dir(spark, tmp_path, _span_corpus(2150))
    rows = QUERIES["text_dup_spans"].fn(spark, out).collect()
    assert len(rows) == 1
    assert rows[0]["doc_a"] == 9000001 and rows[0]["doc_b"] == 9000002
    assert rows[0]["max_span_tokens"] == 16 and rows[0]["n_spans"] == 1


def test_dup_spans_df_cap_static_conf(spark, tmp_path):
    """spark.vault8.dedup.dfCap=<int> forces the cap unconditionally —
    the operator honors the override even below the cliff."""
    from vault_8_hive_spark.queries.text import DF_CAP_CONF

    out = _docs_dir(spark, tmp_path, _span_corpus(300))
    spark.conf.set(DF_CAP_CONF, "8")
    try:
        rows = QUERIES["text_dup_spans"].fn(spark, out).collect()
    finally:
        spark.conf.set(DF_CAP_CONF, "auto")
    assert len(rows) == 1 and rows[0]["doc_a"] == 9000001


def test_band_joins_df_cap_engages_on_hot_bucket(spark, tmp_path):
    """text_minhash_lsh and text_incremental_neardup drop an LSH bucket
    past the cliff (2100 identical docs) while keeping the small genuine
    near-dup bucket — both complete where the uncapped band join would
    expand k(k-1)/2 candidates in one task."""
    hot = "hot cluster boilerplate text shared by every copy of this template"
    rare = "rare pair document with its own distinctive words right here"
    rows = [(i, hot, "en", "boiler", 60) for i in range(2100)]
    rows += [(2200, rare, "en", "organic", 60), (2201, rare, "en", "organic", 60)]
    out = _docs_dir(spark, tmp_path, rows)

    lsh = QUERIES["text_minhash_lsh"].fn(spark, out).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in lsh] == [
        (2200, 2201, 1.0)
    ]
    # incremental: 2200 is on the new side (%10==0), 2201 on the old side
    inc = QUERIES["text_incremental_neardup"].fn(spark, out).collect()
    assert [(r["new_doc"], r["old_doc"], r["jaccard"]) for r in inc] == [
        (2200, 2201, 1.0)
    ]
