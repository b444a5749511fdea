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


def test_pq_ann_candidates_capture_true_neighbors(spark, sf_dir):
    """PQ/ADC quality floor: for each query, the exact-reranked PQ
    result must share at least 2 of the true brute-force top-5 (sampled
    8-codeword codebook on 500 synthetic vectors is coarse by design —
    the invariant worth pinning is that ADC candidates are not noise,
    plus determinism across runs)."""
    from vault_8_hive_spark.queries import all_queries

    pq = all_queries()["vec_pq_ann"].fn(spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    import pandas as pd

    pdf = emb.toPandas()
    import numpy as np

    mat = np.array([np.array(v, dtype=float) for v in pdf.embedding])
    ids = pdf.vec_id.to_numpy()
    for qid in sorted(pq.qid.unique()):
        qvec = mat[ids == qid][0]
        d2 = ((mat - qvec) ** 2).sum(axis=1)
        order = np.argsort(d2, kind="stable")
        true_top = [int(ids[i]) for i in order if int(ids[i]) != qid][:5]
        got = set(pq[pq.qid == qid].vec_id)
        assert len(got & set(true_top)) >= 2, (qid, true_top, sorted(got))
    # Determinism: a second run returns the identical frame.
    pq2 = all_queries()["vec_pq_ann"].fn(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(
        pq.sort_values(["qid", "rn"]).reset_index(drop=True),
        pq2.sort_values(["qid", "rn"]).reset_index(drop=True),
    )


def test_mmr_is_greedy_optimal_per_round(spark, sf_dir):
    """Each MMR pick must maximize lambda*rel - (1-lambda)*max_sim over
    the remaining candidates (recomputed independently in numpy), and
    the selected set must be strictly more diverse than plain top-k."""
    import numpy as np

    from vault_8_hive_spark.queries import all_queries

    out = (
        all_queries()["vec_mmr_rerank"].fn(spark, sf_dir)
        .toPandas()
        .sort_values("rnk")
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    mat = np.array([np.array(v, dtype=float) for v in emb.embedding])
    ids = emb.vec_id.to_numpy()
    qvec = mat[ids == 0][0]

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    rel = {int(i): cos(mat[k], qvec) for k, i in enumerate(ids) if i != 0}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:20]
    sel: list[int] = []
    for _, row in out.iterrows():
        remaining = [c for c in cand if c not in sel]
        if not sel:
            scores = {c: rel[c] for c in remaining}
        else:
            scores = {
                c: round(
                    0.7 * rel[c]
                    - 0.3
                    * max(
                        cos(mat[ids == c][0], mat[ids == s][0]) for s in sel
                    ),
                    6,
                )
                for c in remaining
            }
        best = sorted(scores, key=lambda c: (-scores[c], c))[0]
        assert int(row.vec_id) == best, (row.rnk, best, row.vec_id)
        sel.append(best)
    # Diversity: max pairwise sim among MMR picks <= among plain top-5.
    def max_pair_sim(group):
        return max(
            cos(mat[ids == a][0], mat[ids == b][0])
            for i, a in enumerate(group)
            for b in group[i + 1:]
        )

    assert max_pair_sim(sel) <= max_pair_sim(cand[:5]) + 1e-9


def test_semdedup_prunes_all_planted_duplicates(spark, sf_dir):
    """Every scaled copy (cosine exactly 1 with its original) must be
    pruned, and nothing in a singleton bucket may be pruned."""
    from vault_8_hive_spark.queries import all_queries

    out = all_queries()["vec_semdedup"].fn(spark, sf_dir).toPandas()
    n_planted = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        "vec_id % 9 = 0"
    ).count()
    assert out.n_pruned.sum() >= n_planted, (out.n_pruned.sum(), n_planted)
    singletons = out[out.n_vecs == 1]
    assert (singletons.n_pruned == 0).all()
    # Keeper is always lower than the shift band where a pair exists.
    assert (out[out.n_dup_pairs > 0].sample_keeper < 5000).all()
