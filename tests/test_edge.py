"""Degenerate-row robustness: the adversarial-corpus pin.

tools/edge_corpus.py appends the rows real pipelines carry but synthetic
generators rarely draw — empty/whitespace/punctuation-only/sub-8-token/
NULL documents, an all-zero embedding vector, duplicate vectors, events
tied on the same timestamp, an order with no lineitems. Round 7's full
348-query sweep over that corpus surfaced 15 latent failures in two
mechanism classes, both pinned here:

1. ANSI partial expressions evaluated out of filter order: whole-stage
   codegen's subexpression elimination can evaluate a Filter predicate's
   shared subexpression BEFORE the short-circuiting domain conjunct in
   the same Filter (a pushed-down isnotnull(shingles) hoisted the
   3-gram transform above `size(words) >= 3` and ANSI element_at threw
   on a 1-token doc). Fix class: expressions must be TOTAL — guarded
   with when()/greatest() so they are safe on ANY row (text._shingled,
   similarity.cosine).

2. Cross-engine domain divergence on undefined inputs: Spark ANSI
   aborts on /0 where DuckDB quietly yields NULL (zero-norm cosine,
   1/n_chars A-ES weights), and DuckDB string_split('') is [''] where a
   Python tokenizer sees zero tokens (simhash). Fix class: the domain
   guard is EXPLICIT in both spellings (corpus reads through a
   zero-norm / zero-token / zero-weight filter on both engines).

This suite re-runs exactly the 15 once-failing queries on a fresh edge
corpus — cheap (small scale), permanent (a regression in either class
resurfaces as a crash or a hash mismatch here, not in a future advisory).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from vault_8_hive_spark.oracle import compare, run_oracle
from vault_8_hive_spark.queries import all_queries

QUERIES = all_queries()

# The round-7 edge-sweep failure set (CORRECTNESS class: would have been
# a job abort or a silent divergence at 100 TB).
EDGE_PINNED = [
    "text_corpus_mgmt",
    "text_neardup",
    "text_setsim_prefix_join",
    "text_simhash",
    "text_simhash_neardup",
    "text_weighted_sample",
    "vec_ann",
    "vec_ann_recall",
    "vec_cosine_neardup_pairs",
    "vec_cosine_topk",
    "vec_knn_batch",
    "vec_lsh_family",
    "vec_matryoshka_rerank",
    "vec_mmr_rerank",
    "vec_semdedup",
]


@pytest.fixture(scope="session")
def edge_dir(tmp_path_factory) -> str:
    from edge_corpus import edge

    out = tmp_path_factory.mktemp("edge") / "edge_corpus"
    edge(out, seed=4242, scale=0.2)
    return str(out)


@pytest.mark.parametrize("name", EDGE_PINNED)
def test_query_survives_degenerate_rows(name, spark, edge_dir):
    q = QUERIES[name]
    spdf = q.fn(spark, edge_dir).toPandas()  # crash = class-1 regression
    opdf = run_oracle(q.oracle, edge_dir)
    rep = compare(name, spdf, opdf)
    assert rep.ok, f"{name} on edge corpus: {rep.detail}"
    assert rep.exact, f"{name} on edge corpus: inexact — {rep.detail}"


# The round-7 EMPTY-corpus failure set: queries that aborted (or
# diverged from the oracle) when every table has zero rows — the
# empty-slice case a 100 TB pipeline hits on a new tenant or an empty
# date partition. Mechanisms: driver-side derefs of first()/collect()
# scalars (pagerank teleport, IVF query vector, kmeans seeds, the
# stream-stream flush sentinel), schema inference over data-file-less
# fixture writes (partitionBy/bucketBy of zero rows emits no files),
# ANSI aborts on arr[0]/negative slice lengths of empty array_agg
# results, footer-stats COUNT pushdown answering NULL where SQL says 0,
# and Spark's zero-rows-on-empty grouping-set semantics vs the
# standard's grand-total row (aligned in the oracles via
# HAVING COUNT(*) > 0).
EMPTY_PINNED = [
    "agg_cube",
    "agg_grouping_multi",
    "agg_grouping_sets",
    "agg_rollup",
    "agg_sketch_hll",
    "agg_sketch_kll",
    "agg_sketch_merge",
    "graph_pagerank",
    "graph_personalized_pagerank",
    "io_formats",
    "join_bucketed_smj",
    "join_cbo_reorder",
    "join_dynamic_partition_pruning",
    "join_equi_family",
    "scan_agg_pushdown",
    "scan_binary_files",
    "scan_json_corrupt",
    "sink_partitioned_parquet",
    "stream_foreach_batch_upsert",
    "stream_stateful_sink",
    "stream_stream_full_outer",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_stream_left_semi",
    "stream_stream_right_outer",
    "tpch_scalar_metrics",
    "vec_ann",
    "vec_ivf_topk",
    "vec_kmeans_clusters",
]


@pytest.fixture(scope="session")
def empty_dir(tmp_path_factory, spark) -> str:
    import duckdb

    out = tmp_path_factory.mktemp("empty") / "empty_corpus"
    out.mkdir()
    con = duckdb.connect()
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' LIMIT 0) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(out)


@pytest.mark.parametrize("name", EMPTY_PINNED)
def test_query_survives_empty_slice(name, spark, empty_dir):
    q = QUERIES[name]
    spdf = q.fn(spark, empty_dir).toPandas()  # abort = regression
    opdf = run_oracle(q.oracle, empty_dir)
    rep = compare(name, spdf, opdf)
    assert rep.ok, f"{name} on empty corpus: {rep.detail}"
    assert rep.exact, f"{name} on empty corpus: inexact — {rep.detail}"


# The round-7 SINGLE-ROW failure set (n=1 in every fact table):
# degenerate-moment and under-seeded-algorithm edges — Spark's builtin
# corr ABORTS under ANSI on a zero-variance series where DuckDB says
# NULL (degree assortativity of a two-node graph), bootstrap replicas
# with all-zero Poisson weights rank NULL means at opposite ends in the
# two engines (Spark NULLS FIRST vs DuckDB NULLS LAST — now excluded as
# empty resamples on both), PCA's power iteration divides by max|u| = 0
# on a rank-0 centered Gram, k-means has fewer seeds than k, and the
# drift monitor's half-split leaves one half empty.
ONE_ROW_PINNED = [
    "agg_bootstrap_ci",
    "agg_core",
    "graph_degree_stats",
    "tpch_scalar_metrics",
    "vec_ann",
    "vec_embedding_drift",
    "vec_kmeans_clusters",
    "vec_pca_power",
]


@pytest.fixture(scope="session")
def one_row_dir(tmp_path_factory, spark) -> str:
    import duckdb

    out = tmp_path_factory.mktemp("onerow") / "one_corpus"
    out.mkdir()
    con = duckdb.connect()
    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        lim = "" if t in ("region", "nation") else " ORDER BY 1 LIMIT 1"
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet'{lim}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(out)


@pytest.mark.parametrize("name", ONE_ROW_PINNED)
def test_query_survives_single_row(name, spark, one_row_dir):
    q = QUERIES[name]
    spdf = q.fn(spark, one_row_dir).toPandas()  # abort = regression
    opdf = run_oracle(q.oracle, one_row_dir)
    rep = compare(name, spdf, opdf)
    assert rep.ok, f"{name} on one-row corpus: {rep.detail}"
    assert rep.exact, f"{name} on one-row corpus: inexact — {rep.detail}"


# The round-7 ALL-TIES sweep (every non-key column constant, keys
# unique — the harshest tie-break stress: with everything tied, any
# ordering without a TOTAL tie-break diverges between engines). The
# full 348-query sweep passed 346/348 on first contact — the repo-wide
# row_number/top-k/argmin tie-break discipline held under total ties —
# with two failures, both the same mechanism: a zero total holding
# time (all samples at one instant) turned TWAP's SUM/SUM into 0/0,
# which DuckDB answers NULL and ANSI Spark answered with a job abort
# (now try_divide). Pinned: the two fixed queries plus tie-sensitive
# representatives of each ranking family.
TIES_PINNED = [
    "events_twap",
    "events_time_windows",
    "win_topk_per_group",
    "vec_cosine_topk",
    "text_minhash_lsh",
    "agg_approx_topk",
    "events_sessionize",
    "reco_item_cosine",
]


@pytest.fixture(scope="session")
def ties_dir(tmp_path_factory, spark) -> str:
    from edge_corpus import ties

    out = tmp_path_factory.mktemp("ties") / "ties_corpus"
    ties(out, scale=0.2)
    return str(out)


@pytest.mark.parametrize("name", TIES_PINNED)
def test_query_survives_total_ties(name, spark, ties_dir):
    q = QUERIES[name]
    spdf = q.fn(spark, ties_dir).toPandas()  # abort = regression
    opdf = run_oracle(q.oracle, ties_dir)
    rep = compare(name, spdf, opdf)
    assert rep.ok, f"{name} on all-ties corpus: {rep.detail}"
    assert rep.exact, f"{name} on all-ties corpus: inexact — {rep.detail}"


# The round-7 NULL-FLOOD sweep (every nullable non-key column ~30% NULL,
# FKs and event timestamps ~5%) failed 88/348 on first contact — the
# largest haul of any wave. Mechanisms (FIXTURES.md "NULL-flood
# robustness"): engine-default NULL placement shifting every frame/cut
# (Spark ASC = NULLS FIRST vs DuckDB = NULLS LAST), the event-time
# domain (F.window silently drops NULL event times, state ops crash on
# NaT), SQL-equality NULL semantics vs positional operators (the as-of
# union-merge; DuckDB ASOF's NULLS-LAST artifact), non-total splits and
# blocking keys (ts<cut/ts>=cut both reject NULL; split_part(NULL)=''
# forged a giant block), and per-function semantics (concat vs
# concat_ws, to_json null fields, COALESCE-'ALL' label collisions,
# pandas dropna). Pinned: one representative per mechanism class.
NULL_PINNED = [
    "events_sessionize",          # event-time + user domain
    "events_anomaly_zscore",      # trailing frame under NULL placement
    "win_analytic",               # explicit NULLS LAST window order
    "win_frames",                 # RANGE frame needs a dated timeline
    "agg_sketch_kll",             # GROUPING() vs real NULL group key
    "agg_salted_skew",            # COUNT(key) vs COUNT(*) in two-phase
    "incremental_rollup_merge",   # total split: NULLs route explicitly
    "join_asof_prior_spend",      # asof no-time-no-match contract
    "join_fuzzy_linkage",         # blocking keys exclude NULL
    "scalar_json",                # to_json ignoreNullFields=false
    "udf_cogrouped_asof",         # merge_asof refuses NaT; NULL groups
    "udf_grouped_agg_trimmed",    # NaN poisons a numpy trim
    "vec_ivf_topk",               # labeled-vector index domain
    "stream_tumbling_counts",     # streaming source declares its domain
    "stream_stream_left_outer",   # keyed interval-join landing domain
    "orders_open_backlog",        # delta timeline excludes undated spans
]


@pytest.fixture(scope="session")
def nulls_dir(tmp_path_factory, spark) -> str:
    from edge_corpus import nulls

    out = tmp_path_factory.mktemp("nulls") / "null_corpus"
    nulls(out, scale=0.2)
    return str(out)


@pytest.mark.parametrize("name", NULL_PINNED)
def test_query_survives_null_flood(name, spark, nulls_dir):
    q = QUERIES[name]
    spdf = q.fn(spark, nulls_dir).toPandas()  # abort = regression
    opdf = run_oracle(q.oracle, nulls_dir)
    rep = compare(name, spdf, opdf)
    assert rep.ok, f"{name} on null-flood corpus: {rep.detail}"
    assert rep.exact, f"{name} on null-flood corpus: inexact — {rep.detail}"


# The round-7 MULTILINGUAL sweep (CJK/RTL/NFD/emoji/fullwidth documents)
# failed 5/348, one mechanism: engine case-mapping tables ran BEFORE
# token extraction (JVM lower('İ') = 'i'+U+0307, DuckDB = 'i' — the two
# engines tokenized DIFFERENT strings). Tokenizers now extract
# [A-Za-z0-9]+ from RAW text and case-fold per ASCII token.
MULTILINGUAL_PINNED = [
    "text_bm25_search",
    "text_pmi_collocations",
    "text_profile",
    "text_readability",
    "text_vocab_coverage",
]


@pytest.fixture(scope="session")
def multilingual_dir(tmp_path_factory, spark) -> str:
    from edge_corpus import multilingual

    out = tmp_path_factory.mktemp("ml") / "ml_corpus"
    multilingual(out, scale=0.2)
    return str(out)


@pytest.mark.parametrize("name", MULTILINGUAL_PINNED)
def test_query_survives_multilingual(name, spark, multilingual_dir):
    q = QUERIES[name]
    spdf = q.fn(spark, multilingual_dir).toPandas()
    opdf = run_oracle(q.oracle, multilingual_dir)
    rep = compare(name, spdf, opdf)
    assert rep.ok, f"{name} on multilingual corpus: {rep.detail}"
    assert rep.exact, f"{name} on multilingual corpus: inexact — {rep.detail}"


# The round-7 EXTREMES sweep (NaN/Inf/-0.0/denormal measures, 1970/2262
# date edges, INT64-max keys, malformed JSON, overflow/underflow vectors,
# token-flood documents) failed 96/348 on first contact — one contract
# closed it: finite-measure money (functions/exact.py treats non-finite
# or |x| >= 1e12 as NULL in BOTH spellings, since an ANSI decimal cast
# of NaN ABORTS the job), positive-FINITE vector norms (Spark's total
# ordering ranks NaN above zero, so ~isnan is spelled explicitly), and
# finite-only reduction in pandas-state operators (a float column
# reaching pandas cannot distinguish SQL NULL from NaN). This pin covers
# each mechanism class; the full-registry sweep ran once (FIXTURES.md).
EXTREMES_PINNED = [
    # -- the full-registry re-sweep's 13-failure set (session 2): --
    "agg_anova_f",         # cents^2 widening + DECIMAL(38,6) k-way term sum
    "agg_ols_multi",       # Gram products widen BEFORE the multiply
    "agg_psi_drift",       # finite domain + total bucket clamp
    "agg_welch_ttest",     # Inf drives VAR_SAMP out of range (DuckDB raises)
    "events_burstiness",   # 292-year gap squares past INT64
    "events_rolling_median",   # n_window counts rows, not collect_list len
    "events_time_windows",     # composite projections total on INT64-max ids
    "feature_quantile_normalize",  # NULL rank keys rank at opposite ends
    "stream_dedup_watermark",      # bounded event-time domain (flaky class)
    "stream_stream_left_outer",    # flushed landing carries the domain
    "stream_transform_with_state", # pandas finite-measure + SUM-empty NULL
    # -- the original mechanism-class pin: --
    "agg_core",            # money sums + exact moments over NaN/Inf/1e9 rows
    "agg_approx_moments",  # builtin double-path moments at the margin
    "agg_regression",      # regr_* over non-finite measures
    "pricing_summary",     # the flagship money aggregate
    "tpch_scalar_metrics", # money + graph composite
    "events_ewma",         # recursive time-series over extreme values
    "scalar_json",         # malformed-JSON parse path
    "stream_stateful_user_stats",  # pandas-state finite-only max
    "udf_surface",         # Arrow boundary with non-finite floats
    "vec_ann",             # cosine ladder over overflow/underflow vectors
    "vec_kmeans_clusters", # distance iteration under _finite domain
    "vec_semdedup",        # LSH-coarse cosine under _nz domain
    "vec_embedding_drift", # centroid drift over denormal vectors
    "vec_pca_power",       # integer Gram under overflow vectors
]


@pytest.fixture(scope="session")
def extremes_dir(tmp_path_factory, spark) -> str:
    from edge_corpus import extremes

    out = tmp_path_factory.mktemp("extremes") / "extremes_corpus"
    extremes(out, seed=4242, scale=0.3)
    return str(out)


@pytest.mark.parametrize("name", EXTREMES_PINNED)
def test_query_survives_extremes(name, spark, extremes_dir):
    q = QUERIES[name]
    spdf = q.fn(spark, extremes_dir).toPandas()
    opdf = run_oracle(q.oracle, extremes_dir)
    rep = compare(name, spdf, opdf)
    assert rep.ok, f"{name} on extremes corpus: {rep.detail}"
    assert rep.exact, f"{name} on extremes corpus: inexact — {rep.detail}"
