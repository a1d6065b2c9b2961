"""Spec-driven composition surface (SURVEY.md §2.7): the JSON 'query
language' the reference's viewser API ships."""

import pytest

from conftest import collect_panel, make_panel
from views_transformation_library_spark import REGISTRY, transform, transform_json


def test_transform_folds_spec_chain(spark):
    pn = make_panel(spark, [(t, 1, float(t)) for t in range(5)])
    out = transform(pn, [
        {"type": "tlag", "args": [1]},
        {"type": "greater_or_equal", "args": [2.0]},
    ])
    got = {t: v for (_, t, v) in collect_panel(out)}
    # tlag(1): t=0 has no predecessor (NULL, preserved through the
    # comparison); times 3,4 see lagged values 2,3 -> 1.0
    assert got == {0: None, 1: 0.0, 2: 0.0, 3: 1.0, 4: 1.0}


def test_transform_json_and_unknown_step(spark):
    pn = make_panel(spark, [(t, 1, float(t)) for t in range(3)])
    out = transform_json(pn, '[{"type": "decay", "args": [1.0]}]')
    assert out.count() == 3
    with pytest.raises(KeyError, match="unknown transform"):
        transform(pn, [{"type": "no_such_op"}])


def test_registry_covers_new_r2_surface():
    for name in ("containment_pairs", "normalize_text", "pack_windows",
                 "repetition_stats", "impute_mice_draw",
                 "embedding_neardup_pairs"):
        assert name in REGISTRY, name


def test_registry_impute_mice_draw_returns_frame(spark):
    rows = [(t, 1, float(t) if t % 2 else None, float(t)) for t in range(1, 9)]
    df = make_panel(spark, rows, cols=("time_id", "unit_id", "a", "b"))
    out = transform(df, [{"type": "impute_mice_draw", "kwargs": {"n_shards": 1, "n_imputations": 1}}])
    res = out.toPandas()
    assert res["a"].notna().all()


def test_pipeline_spec_steps(spark):
    """The r4 pipeline spec steps compose: with_expr derives, where_expr
    filters, dedup_keep keeps the min-id representative per exact group."""
    rows = [
        (1, "the cat sat"), (2, "THE  cat   sat"), (3, "a dog ran"),
        (4, "the cat sat"), (5, "unique text here"),
    ]
    df = spark.range(0).sparkSession.createDataFrame(
        rows, schema="doc_id long, text string"
    )
    out = transform(df, [
        {"type": "dedup_keep", "kwargs": {"id_col": "doc_id", "text_col": "text"}},
        {"type": "with_expr", "args": ["parity", "doc_id % 2"]},
        {"type": "where_expr", "args": ["parity = 1"]},
    ])
    got = sorted(r["doc_id"] for r in out.collect())
    # doc 2 and 4 dedup onto doc 1 (case/whitespace-normalized fingerprint);
    # survivors {1, 3, 5} then filtered to odd ids
    assert got == [1, 3, 5]


# ---------------------------------------------------------------------------
# Full-surface round trip (VERDICT r5 #8): EVERY registry name executes
# through transform() on a small frame. The spec map below must stay in
# 1:1 correspondence with REGISTRY — test_registry_specs_complete fails
# the moment an operator is registered without a coverage entry here.
# ---------------------------------------------------------------------------

_DIRECT = object()  # sentinel: op not foldable (first arg is not a frame)


def _registry_specs(spark):
    """name -> (input_frame, args, kwargs) for every REGISTRY entry."""
    import numpy as np
    from pyspark.sql import functions as F

    from views_transformation_library_spark.operators import multimodal, retrieval

    panel = make_panel(spark, [(t, u, float(t + u)) for t in range(6) for u in (1, 2)])
    panel2 = make_panel(
        spark,
        [(t, u, float(t + u), float(t * u + 1)) for t in range(6) for u in (1, 2)],
        cols=("time_id", "unit_id", "a", "b"),
    )
    panel_missing = make_panel(
        spark,
        [(t, u, float(t) if t % 2 else None, float(u)) for t in range(1, 7) for u in (1, 2)],
        cols=("time_id", "unit_id", "a", "b"),
    )
    tick_panel = make_panel(
        spark,
        [(t, 1, 1.0 if t == 3 else 0.0, float(t % 3)) for t in range(1, 6)],
        cols=("time_id", "unit_id", "event", "ts"),
    )
    rng = np.random.RandomState(7)
    grid_vals = rng.rand(3, 3) * 10
    grid = make_panel(
        spark,
        [
            (m, lat * 720 + lon, float(grid_vals[lon, lat]) * m)
            for m in (5, 6)
            for lat in range(3)
            for lon in range(3)
        ],
    )
    country_panel = make_panel(spark, [(229, c, float(c)) for c in (57, 59, 237)])
    edges = spark.createDataFrame(
        [(229, 57, 59), (229, 59, 57), (229, 59, 237), (229, 237, 59)],
        "month_id long, a_id long, b_id long",
    )
    centroids = spark.createDataFrame(
        [(57, 1.0, 2.0), (59, 3.0, 4.0), (237, 5.0, 5.0)],
        "country_id long, lat double, lon double",
    )
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
        "the quick brown fox jumps over the lazy dog",
        "how vexingly quick daft zebras jump",
        "jived fox nymph grabs quick waltz",
        "two driven jocks help fax my big quiz",
    ]
    docs = spark.createDataFrame(
        [
            (i, t, ("web", "code")[i % 2], ("train", "test")[i % 3 == 0], float(i + 1))
            for i, t in enumerate(texts)
        ],
        "doc_id long, text string, source string, split string, w double",
    )
    bin_docs = multimodal.attach_binary(docs).withColumn(
        "duration_ms", F.lit(2500)
    )
    docs_target = docs.withColumn("is_target", F.col("doc_id") % 2 == 0)
    from views_transformation_library_spark.operators import text as text_ops
    events = spark.createDataFrame(
        [
            (u, int(ts * 60 * 1_000_000_000), et, i, 1.5, ts // 1440, int(ts * 60_000_000))
            for i, (u, ts, et) in enumerate(
                [(1, 0, "click"), (1, 10, "view"), (1, 50, "click"),
                 (2, 5, "view"), (2, 2000, "click"), (3, 1, "click")]
            )
        ],
        "user_id long, ts long, event_type string, event_id long, value double,"
        " __day long, __us long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "a long, b long")
    pr_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long"
    )
    dim = 4
    vecs = rng.rand(20, dim) * 2 - 1
    vectors = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    vqueries = spark.createDataFrame(
        [(100 + i, [float(x) for x in vecs[i] + 0.01]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    json_df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, '{"k": 7}')], "doc_id long, props string"
    )
    kt = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "b")], "k long, t string"
    )
    left = spark.createDataFrame([(1, 10), (1, 20), (2, 15)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 9, 1.0), (1, 19, 2.0), (2, 11, 3.0)], "k long, rts long, x double"
    )
    points = spark.createDataFrame([(1, 5), (2, 12)], "pid long, ts_s long")
    intervals = spark.createDataFrame(
        [(10, 0, 7), (11, 10, 20)], "iid long, start_s long, end_s long"
    )
    rank1 = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, neighbor_id long, rank long"
    )
    rank2 = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id long, neighbor_id long, rank long"
    )

    return {
        # scalar
        "identity": (panel, [], {}),
        "ln": (panel, [], {}),
        "decay": (panel, [2.0], {}),
        "greater_or_equal": (panel, [3.0], {}),
        "smaller_or_equal": (panel, [3.0], {}),
        "in_range": (panel, [1.0, 4.0], {}),
        "add_column": (panel2, [], {}),
        "subtract_column": (panel2, [], {}),
        "multiply_column": (panel2, [], {}),
        "divide_column": (panel2, [], {}),
        # temporal
        "tlag": (panel, [1], {}),
        "tlead": (panel, [1], {}),
        "delta": (panel, [1], {}),
        "moving_average": (panel, [2], {}),
        "moving_sum": (panel, [2], {}),
        "rollmax": (panel, [2], {}),
        "mean": (panel, [], {}),
        "demean": (panel, [], {}),
        "cweq": (panel, [3.0], {}),
        "time_since": (panel, [3.0], {}),
        "onset_possible": (panel, [2], {}),
        "onset": (panel, [2], {}),
        "tick_time_since": (tick_panel, ["event", "ts"], {}),
        "tlags3d": (panel, [], {}),
        "temporal_entropy": (panel, [2], {}),
        "standardize": (panel, [], {}),
        "ewma": (panel, [0.5], {}),
        "cusum": (panel, [], {}),
        "winsorize": (panel, [], {}),
        "mad_outliers": (panel, [], {}),
        "rolling_median": (panel, [3], {}),
        # missing
        "replace_na": (panel_missing, [], {}),
        "fill": (panel_missing, [], {}),
        "extrapolate": (panel_missing, [], {}),
        "fill_with_group_and_global_means": (panel_missing, [], {}),
        "fill_groups_with_time_means": (panel_missing, [], {}),
        "impute_mice_draw": (panel_missing, [], {"n_shards": 1, "n_imputations": 1}),
        "densify": (panel, [], {"time_range": True}),
        # spatial / trees / fourier
        "splag4d": (grid, [], {}),
        "splag_country": (country_panel, [edges], {}),
        "spacetime_distances": (grid, [], {}),
        "fourier_lag": (grid, [], {}),
        "temporal_tree_lag": (panel, [0.7, "uniform"], {}),
        "spatial_tree_lag": (grid, [0.7], {}),
        "grid_lag": (grid, [50.0], {}),
        "neighbour_ring": (edges, [1, 1], {}),
        "nth_order_reachability": (edges, [1], {}),
        "centroid_distances": (centroids, [], {}),
        "with_grid_coords": (grid, [], {}),
        # relational
        "sessionize": (events, [], {}),
        "pivot_counts": (kt, ["k", "t", ["a", "b"]], {}),
        "rollup_sum": (docs, [["source"], "w", "s"], {}),
        "topk_per_group": (docs, ["source", "w", 2], {}),
        "asof_join": (left, [right, "k", "ts", "rts", ["x"]], {}),
        "interval_join": (points, [intervals, "ts_s", "start_s", "end_s", 7], {}),
        "time_bucket_rollup": (events, [], {}),
        "funnel": (events, [["click", "view"]], {}),
        "transition_counts": (events, [], {}),
        "cohort_retention": (events, [], {}),
        "parse_json_fields": (json_df, ["props", {"k": "long"}], {}),
        "with_expr": (docs, ["x", "doc_id % 2"], {}),
        "where_expr": (docs, ["doc_id > 1"], {}),
        "select_cols": (docs, ["doc_id", "text"], {}),
        # text
        "token_count": (docs, [], {}),
        "token_count_bpe": (docs, [], {}),
        "lang_id": (docs, [], {}),
        "text_stats": (docs, [], {}),
        "quality_score": (docs, [], {}),
        "fingerprint": (docs, [], {}),
        "normalize_text": (docs, [], {}),
        "repetition_stats": (docs, [], {}),
        "ngram_repetition_stats": (docs, [], {}),
        "mask_pii": (docs, [], {}),
        "gopher_filter": (docs, [], {"min_tokens": 2}),
        "c4_filter": (docs, [], {"min_words_per_line": 1}),
        "unigram_logprob": (docs, [], {}),
        "bigram_logprob": (docs, [], {}),
        "quality_classifier_score": (docs, [{"a": 1.0, "b": -1.0}], {}),
        "vocab_top_terms": (docs, [10], {}),
        "corpus_mix": (docs, [], {"strata_cols": ("source",)}),
        "pack_windows": (docs, [16], {}),
        "pack_bins": (docs, [16], {}),
        # dedup
        "exact_dedup": (docs, [], {}),
        "dedup_keep": (docs, [], {}),
        "passage_dedup": (docs, [], {}),
        "ngram_jaccard_pairs": (docs, [], {}),
        "minhash_lsh_pairs": (docs, [], {"n_hashes": 8, "bands": 2}),
        "fuzzy_dedup_keep": (docs, [], {"n_hashes": 8, "bands": 2}),
        "split_leakage": (docs, [], {"n_hashes": 8, "bands": 2}),
        "simhash": (docs, [], {}),
        "simhash_pairs": (docs, [], {}),
        "containment_pairs": (docs, [docs], {}),
        "connected_components": (pairs, [], {}),
        "pagerank": (pr_edges, [], {}),
        # sampling
        "stratified_sample": (docs, [{"web": 1.0, "code": 0.5}, "source"], {}),
        "weighted_sample": (docs, [3, "w"], {}),
        "split_column": (docs, [], {}),
        "cap_per_group": (docs, ["source", 2], {}),
        "mixture_sample": (docs, [{"web": 0.5, "code": 0.5}], {}),
        "temperature_mix": (docs, [], {}),
        # similarity
        "quantize_embeddings": (vectors, [], {}),
        "cosine_topk": (vectors, [vqueries, 3], {}),
        "quantized_cosine_topk": (vectors, [vqueries, 3], {}),
        "lsh_topk": (vectors, [vqueries, 3], {"n_planes": 4}),
        "ivf_topk": (vectors, [vqueries, 3], {"n_centroids": 2}),
        "pq_topk": (vectors, [vqueries, 3], {"m": 2, "k_codes": 4}),
        "knn_graph": (vectors, [2], {"n_centroids": 2}),
        "ann_join": (vectors, [vqueries, 2], {"n_centroids": 2}),
        "semantic_dedup": (vectors, [], {"n_clusters": 2}),
        "embedding_neardup_pairs": (vectors, [], {"n_blocks": 2}),
        "embedding_pca": (vectors, [2], {}),
        # retrieval
        "chunk_text": (docs, [], {"size": 8, "overlap": 2}),
        "rrf_fuse": (_DIRECT, [[rank1, rank2]], {}),
        "tfidf": (docs, [], {}),
        "bm25_topk": (docs, [["quick", "fox"]], {}),
        "term_frequencies": (docs, [["quick", "fox"]], {}),
        # profiling
        "profile": (docs, [["w"]], {}),
        "profile_approx": (docs, [["w"]], {}),
        "profile_sketch": (docs, [["w"]], {"p": 4}),
        "approx_quantiles_hist": (docs, ["w", 0.0, 100.0], {"n_buckets": 16}),
        # multimodal
        "attach_binary": (docs, [], {}),
        "attach_image": (docs, [], {}),
        "attach_video": (docs, [], {}),
        "extract_features": (bin_docs, [], {}),
        "frame_sample": (bin_docs, [], {}),
        "resize": (bin_docs, [8, 8], {}),
        # r10 curation + sketch + tokenizer families
        "decontaminate": (docs, [docs.filter(F.col("doc_id") % 3 == 0)], {"n": 3}),
        "duplicate_spans": (docs, [], {"k": 3, "min_tokens": 4}),
        "dsir_weights": (docs_target, [], {"n": 2, "n_buckets": 32}),
        "dsir_select": (docs_target, [3], {"n": 2, "n_buckets": 32}),
        "hll_distinct": (docs, ["text"], {"p": 4}),
        "kmv_distinct": (docs, ["text"], {"k": 4}),
        "cm_sketch": (docs, ["text"], {"depth": 2, "width": 16}),
        "cm_estimate": (docs, ["text", ["the", "fox"]], {"depth": 2, "width": 16}),
        "bloom_prefilter": (docs, ["doc_id", docs, "doc_id"], {"n_bits": 256, "n_hashes": 3}),
        "hll_overlap": (docs, [docs, "text"], {"p": 4}),
        "bpe_train": (docs, [], {"num_merges": 5, "min_count": 1}),
        "bpe_encode": (docs, [text_ops.bpe_learn({"the": 3, "quick": 2}, 3)], {}),
        "exact_quantiles": (docs, ["w"], {"percents": (50, 90)}),
        "collocations": (docs, [], {"min_count": 1, "k": 10}),
        "hll_time_rollup": (
            events.select(F.col("__us").alias("us"), "event_type", "user_id"),
            ["us", "user_id"],
            {"key_cols": ("event_type",), "p": 4},
        ),
    }


@pytest.fixture(scope="module")
def registry_specs(spark):
    return _registry_specs(spark)


def test_registry_specs_complete(registry_specs):
    """The coverage map and REGISTRY are the same set: registering an
    operator without a round-trip entry (or vice versa) fails here."""
    assert set(registry_specs) == set(REGISTRY)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_name_executes(spark, registry_specs, name):
    frame, args, kwargs = registry_specs[name]
    if frame is _DIRECT:
        out = REGISTRY[name](*args, **kwargs)
    else:
        out = transform(frame, [{"type": name, "args": args, "kwargs": kwargs}])
    from pyspark.sql import DataFrame

    assert isinstance(out, DataFrame), name
    out.limit(50).collect()  # the plan must actually execute


def test_densify_registry_step_repairs_gapped_axis(spark):
    """VERDICT r4 #7 round-trip: temporal_tree_lag on a gapped time axis
    raises an error that names the densify registry step, and running that
    exact step first makes the same spec succeed."""
    # time 2 missing for EVERY unit -> gapped integer axis
    rows = [(t, u, float(t + u)) for t in (0, 1, 3, 4) for u in (1, 2)]
    pn = make_panel(spark, rows)
    with pytest.raises(ValueError, match=r'\{"type": "densify"'):
        transform(pn, [{"type": "temporal_tree_lag", "args": [0.7, "oneovert"]}])
    out = transform(pn, [
        {"type": "densify", "kwargs": {"time_range": True}},
        {"type": "temporal_tree_lag", "args": [0.7, "oneovert"]},
    ])
    assert out.count() == 10  # 5 times x 2 units after axis repair
    # plain densify (observed times only) must NOT repair it — the axis gap
    # is invisible to a distinct; the kwarg is the documented remedy
    with pytest.raises(ValueError, match="gapless"):
        transform(pn, [
            {"type": "densify"},
            {"type": "temporal_tree_lag", "args": [0.7, "oneovert"]},
        ])
