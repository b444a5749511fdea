"""Vector-operator tests beyond the oracle harness: ANN quality."""

from __future__ import annotations

from vault_8_hive_spark.queries import all_queries

QUERIES = all_queries()


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    """LSH-bucketed ANN top-5 should overlap the brute-force top-20 for
    the same query vector (recall of the scale path vs the baseline)."""
    brute = QUERIES["vec_cosine_topk"].fn(spark, sf_dir).toPandas()
    ann = QUERIES["vec_lsh_ann"].fn(spark, sf_dir).toPandas()
    assert len(ann) > 0, "query vector's bucket contains no other vectors"
    brute_ids = set(brute["vec_id"])
    hit = sum(1 for v in ann["vec_id"] if v in brute_ids)
    assert hit / len(ann) >= 0.6, f"ANN recall too low: {hit}/{len(ann)}"


def test_lsh_buckets_partition_corpus(spark, sf_dir):
    """Bucket sizes must sum to the corpus size (it's a partition)."""
    pdf = QUERIES["vec_lsh_buckets"].fn(spark, sf_dir).toPandas()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert pdf["n_vecs"].sum() == n
    assert len(pdf) > 1, "all vectors hashed to one bucket — planes broken"


def test_kmeans_converges_and_deterministic(spark, sf_dir):
    from vault_8_hive_spark.operators.kmeans import kmeans

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a1, c1, inertia = kmeans(emb, "embedding", "vec_id", k=4, iters=3, dim=64)
    assert inertia[0] >= inertia[-1], inertia  # Lloyd's never increases
    n = emb.count()
    sizes = {r["cluster"]: r["n"] for r in a1.groupBy("cluster").agg(__import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")).collect()}
    assert sum(sizes.values()) == n
    _, c2, _ = kmeans(emb, "embedding", "vec_id", k=4, iters=3, dim=64)
    assert c1 == c2  # deterministic end to end


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    """IVF (3/10 lists probed) top-10 should largely agree with the
    brute-force top-20; and the probe must actually skip most lists."""
    brute = QUERIES["vec_cosine_topk"].fn(spark, sf_dir).toPandas()
    ivf = QUERIES["vec_ivf_topk"].fn(spark, sf_dir).toPandas()
    assert len(ivf) == 10
    brute_ids = set(brute["vec_id"])
    hit = sum(1 for v in ivf["vec_id"] if v in brute_ids)
    assert hit / len(ivf) >= 0.5, f"IVF recall too low: {hit}/{len(ivf)}"


def test_multitable_lsh_recall_dominates_single(spark, sf_dir):
    """The recall probe's reason to exist: multi-table LSH must buy real
    recall over the single table, monotonically with table count, and
    the densest configuration must clear 0.5 mean recall@10 — if a plane
    bank change ever flattens this curve, the ANN path is silently
    degraded and this fails."""
    pdf = QUERIES["vec_ann_recall"].fn(spark, sf_dir).toPandas()
    mean = pdf.groupby("method")["recall_at_10"].mean()
    assert mean["tables_8x4"] > mean["tables_4x6"] > mean["single_8"], dict(mean)
    assert mean["tables_8x4"] >= 0.5, dict(mean)
    # And the recall is bought with visibly larger candidate sets — the
    # cost side of the curve must be real too.
    cand = pdf.groupby("method")["n_candidates"].mean()
    assert cand["tables_8x4"] > cand["tables_4x6"] > cand["single_8"], dict(cand)
