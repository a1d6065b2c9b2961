"""Name -> callable registry and spec-driven composition (SURVEY.md §2.7).

The reference's only "query language" is an ordered JSON list of
``{"type": <name>, "args": [...]}`` steps applied to a panel variable
(`README.md:27-29` of the reference). ``transform`` folds such a spec over a
DataFrame left-to-right; the whole chain stays one lazy Catalyst plan, so a
`tlag -> cweq -> decay` spec compiles into a single stage pipeline with one
unit_id shuffle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from . import panel as _panel
from .operators import (
    dedup,
    fourier,
    missing,
    multimodal,
    profiling,
    relational,
    retrieval,
    sampling,
    scalar,
    similarity,
    sketches,
    spacetime,
    spatial_graph,
    spatial_grid,
    temporal,
    text,
    trees,
)

REGISTRY: dict[str, Callable[..., DataFrame]] = {
    # scalar (§2.1)
    "identity": scalar.identity,
    "ln": scalar.ln,
    "decay": scalar.decay,
    "greater_or_equal": scalar.greater_or_equal,
    "smaller_or_equal": scalar.smaller_or_equal,
    "in_range": scalar.in_range,
    "add_column": scalar.add_column,
    "subtract_column": scalar.subtract_column,
    "multiply_column": scalar.multiply_column,
    "divide_column": scalar.divide_column,
    # temporal (§2.2)
    "tlag": temporal.tlag,
    "tlead": temporal.tlead,
    "delta": temporal.delta,
    "moving_average": temporal.moving_average,
    "moving_sum": temporal.moving_sum,
    "rollmax": temporal.rollmax,
    "mean": temporal.mean,
    "demean": temporal.demean,
    "cweq": temporal.cweq,
    "time_since": temporal.time_since,
    "onset_possible": temporal.onset_possible,
    "onset": temporal.onset,
    "tick_time_since": temporal.tick_time_since,
    "tlags3d": temporal.tlags3d,
    "temporal_entropy": temporal.temporal_entropy,
    # spatial (§2.4)
    "splag4d": spatial_grid.splag4d,
    "splag_country": spatial_graph.splag_country,
    "spacetime_distances": spacetime.spacetime_distances,
    "fourier_lag": fourier.fourier_lag,
    "temporal_tree_lag": trees.temporal_tree_lag,
    "spatial_tree_lag": trees.spatial_tree_lag,
    "grid_lag": trees.grid_lag,
    # relational surface (§2.5)
    "sessionize": relational.sessionize,
    "pivot_counts": relational.pivot_counts,
    "rollup_sum": relational.rollup_sum,
    "topk_per_group": relational.topk_per_group,
    "asof_join": relational.asof_join,
    # beyond-reference: text analysis / dedup / similarity / multimodal
    "token_count": text.token_count,
    "lang_id": text.lang_id,
    "text_stats": text.text_stats,
    "quality_score": text.quality_score,
    "fingerprint": text.fingerprint,
    "exact_dedup": dedup.exact_dedup,
    "dedup_keep": dedup.dedup_keep,
    "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
    "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
    "connected_components": dedup.connected_components,
    "token_count_bpe": text.token_count_bpe,
    "passage_dedup": dedup.passage_dedup,
    "fuzzy_dedup_keep": dedup.fuzzy_dedup_keep,
    "split_leakage": dedup.split_leakage,
    "pagerank": dedup.pagerank,
    "unigram_logprob": text.unigram_logprob,
    "bigram_logprob": text.bigram_logprob,
    "quality_classifier_score": text.quality_classifier_score,
    "quantize_embeddings": similarity.quantize_embeddings,
    "time_bucket_rollup": relational.time_bucket_rollup,
    "standardize": temporal.standardize,
    "ewma": temporal.ewma,
    "cusum": temporal.cusum,
    "winsorize": temporal.winsorize,
    "cap_per_group": sampling.cap_per_group,
    "mixture_sample": sampling.mixture_sample,
    "temperature_mix": sampling.temperature_mix,
    "rolling_median": temporal.rolling_median,
    "chunk_text": retrieval.chunk_text,
    "rrf_fuse": retrieval.rrf_fuse,
    "tfidf": retrieval.tfidf,
    "funnel": relational.funnel,
    "transition_counts": relational.transition_counts,
    "mad_outliers": temporal.mad_outliers,
    "cohort_retention": relational.cohort_retention,
    "quantized_cosine_topk": similarity.quantized_cosine_topk,
    "simhash": dedup.simhash,
    "simhash_pairs": dedup.simhash_pairs,
    "cosine_topk": similarity.cosine_topk,
    "lsh_topk": similarity.lsh_topk,
    "ivf_topk": similarity.ivf_topk,
    "embedding_neardup_pairs": similarity.embedding_neardup_pairs,
    "attach_binary": multimodal.attach_binary,
    "attach_image": multimodal.attach_image,
    "extract_features": multimodal.extract_features,
    "attach_video": multimodal.attach_video,
    "frame_sample": multimodal.frame_sample,
    "resize": multimodal.resize_image,
    # graph helpers are spec steps too: the folded frame IS the edge /
    # centroid table (transform() puts no constraint on what the frame is)
    "neighbour_ring": spatial_graph.neighbour_ring,
    "nth_order_reachability": spatial_graph.nth_order_reachability,
    "centroid_distances": spatial_graph.centroid_distances,
    "with_grid_coords": spatial_grid.with_grid_coords,
    "containment_pairs": dedup.containment_pairs,
    "normalize_text": text.normalize_text,
    "repetition_stats": text.repetition_stats,
    "ngram_repetition_stats": text.ngram_repetition_stats,
    "stratified_sample": sampling.stratified_sample,
    "split_column": sampling.split_column,
    "weighted_sample": sampling.weighted_sample,
    "mask_pii": text.mask_pii,
    "gopher_filter": text.gopher_filter,
    "c4_filter": text.c4_filter,
    "semantic_dedup": similarity.semantic_dedup,
    "pq_topk": similarity.pq_topk,
    "knn_graph": similarity.knn_graph,
    "embedding_pca": similarity.embedding_pca,
    "ann_join": similarity.ann_join,
    "bm25_topk": retrieval.bm25_topk,
    "term_frequencies": retrieval.term_frequencies,
    "profile": profiling.profile,
    "profile_approx": profiling.profile_approx,
    "profile_sketch": profiling.profile_sketch,
    "approx_quantiles_hist": profiling.approx_quantiles_hist,
    "corpus_mix": text.corpus_mix,
    "vocab_top_terms": text.vocab_top_terms,
    "parse_json_fields": relational.parse_json_fields,
    "with_expr": relational.with_expr,
    "where_expr": relational.where_expr,
    "select_cols": relational.select_cols,
    "interval_join": relational.interval_join,
    "pack_windows": text.pack_windows,
    "pack_bins": text.pack_bins,
    # panel contract: gap-free (time x unit) grid. The tree/fourier family
    # raises on a gapped time axis and its error message names this step —
    # `{"type": "densify"}` before the lag step repairs the axis in-spec.
    "densify": _panel.densify,
    # missing (§2.3)
    "replace_na": missing.replace_na,
    "fill": missing.fill,
    "extrapolate": missing.extrapolate,
    "fill_with_group_and_global_means": missing.fill_with_group_and_global_means,
    "fill_groups_with_time_means": missing.fill_groups_with_time_means,
    # impute_mice yields N frames; the spec surface (DataFrame -> DataFrame)
    # exposes one draw per step
    "impute_mice_draw": lambda df, *a, **k: missing.impute_mice(df, *a, **k)[0],
    # r10 curation + sketch + tokenizer families (multi-frame ops take
    # their second frame as an arg, the containment_pairs precedent)
    "decontaminate": dedup.decontaminate,
    "duplicate_spans": dedup.duplicate_spans,
    "dsir_weights": sampling.dsir_weights,
    "dsir_select": sampling.dsir_select,
    "hll_distinct": sketches.hll_distinct,
    "kmv_distinct": sketches.kmv_distinct,
    "cm_sketch": sketches.cm_sketch,
    "cm_estimate": sketches.cm_estimate,
    "bloom_prefilter": sketches.bloom_prefilter,
    "hll_overlap": sketches.hll_overlap,
    "bpe_train": text.bpe_train,
    "bpe_encode": text.bpe_encode,
    "exact_quantiles": profiling.exact_quantiles,
    "collocations": text.collocations,
    "hll_time_rollup": sketches.hll_time_rollup,
}


def register(name: str, fn: Callable[..., DataFrame]) -> None:
    REGISTRY[name] = fn


def transform_json(df: DataFrame, spec_json: str) -> DataFrame:
    """The remote-service surface: an ordered JSON list of steps exactly as
    the viewser API ships them (`{"type": <name>, "args": [...]}` — reference
    README.md:27-29), parsed and folded over the frame."""
    import json

    spec = json.loads(spec_json)
    if not isinstance(spec, list):
        raise ValueError("spec must be a JSON list of transform steps")
    return transform(df, spec)


def transform(df: DataFrame, spec: list[dict]) -> DataFrame:
    """Apply an ordered list of ``{"type": name, "args": [...]}`` steps.

    Optional per-step ``"kwargs"`` dict passes named arguments (e.g. a
    feature column). Unknown names raise with the available inventory.
    """
    out = df
    for step in spec:
        name = step["type"]
        fn = REGISTRY.get(name)
        if fn is None:
            raise KeyError(f"unknown transform {name!r}; available: {sorted(REGISTRY)}")
        out = fn(out, *step.get("args", []), **step.get("kwargs", {}))
    return out
