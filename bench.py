"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is timed end-to-end with
FULL evaluation: the timing action checksums every output column with
bit_xor(xxhash64(...)) — a bare count() would let Catalyst prune the very
window/projection expressions being benchmarked, timing only the shared
scan + panel build. Min of 3 full runs per query (single-run local-mode
jitter is ±30% on this VM).

Stall-robust protocol (r8, VERDICT r6 #6): this container shows 2-4
random ~10 s host stalls per benchmark session that SURVIVE min-of-3 and
move between queries run-to-run (BENCH_NOTES_r06), so a single session's
numbers carry ±1-2 phantom regressions. The committed number is therefore
the ELEMENT-WISE BEST OF TWO FRESH SESSIONS: the parent process spawns
two child runs (each its own python+JVM — codegen caches, GC state and
teardown debris do not carry over), idles briefly between them, and
merges per-query minima. Element-wise best across sessions reproduced
fresh-session spot checks in the r6 investigation. Set
SPARK_GRAFT_BENCH_SESSIONS=1 for the old single-session behavior (used
while iterating; the committed BENCH_r{N} uses the default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from views_transformation_library_spark.session import get_spark

# headline set: representative of each operator family + the flagship chain
HEADLINE = [
    "flagship_decay_time_since",
    "moving_average",
    "cweq",
    "temporal_entropy",
    "tlags3d",
    "extrapolate",
    "fill_with_group_and_global_means",
    "splag4d_weighted",
    "splag_country",
    "spacetime_distances",
    "fourier_lag",
    "temporal_tree_lag",
    "spatial_tree_lag",
    "grid_lag",
    "token_count",
    "exact_dedup",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash_pairs",
    "cosine_topk",
    "lsh_topk",
    "multimodal_features",
    # r2/r3 families (first baselined in BENCH_r03)
    "gopher_filter",
    "bm25_topk",
    "semantic_dedup",
    "pq_topk",
    "profile_lineitem",
    # the 100 TB profiling tier (HLL/KLL sketches, one plain hash agg —
    # no Expand): baselined alongside the exact tier so the scale path
    # has a number
    "profile_approx_lineitem",
    # r12: the strict sketch tier (md5-register HLL distinct + exact
    # stats; the rows-only surface above is KLL quantiles alone now)
    "profile_sketch_lineitem",
    "knn_graph",
    # r4 end-to-end corpus pipeline flagship (one scan + two shuffles)
    "llm_pipeline",
    # r4 additions: cleaning/repetition rules, corpus-level passage +
    # fuzzy dedup, LM quality scoring, PCA + int8-quantized similarity
    "c4_filter",
    "ngram_repetition",
    "passage_dedup",
    "fuzzy_dedup_keep",
    "unigram_logprob",
    "embedding_pca",
    "quantized_cosine_topk",
    "time_bucket_rollup",
    "zorder_key",
    # session-2 families: event analytics, robust stats, IR, graph
    "funnel",
    "mad_outliers",
    "ewma",
    "tfidf",
    "pagerank",
    "cusum",
    "curation_pipeline",
    # r5 additions: whole-doc FFD packing, temperature-flattened mixing,
    # cross-split leakage audit, bigram-LM quality scoring
    "pack_bins",
    "temperature_mix",
    "split_leakage",
    "bigram_logprob",
    # r9/r10 families folded into the committed headline in r11 (VERDICT
    # r10 #5): mergeable sketches, BPE, exact quantiles, curation tier —
    # regression tracking previously rode ad-hoc SKETCH_WALLS artifacts
    "hll_distinct",
    "hll_time_rollup",
    "kmv_distinct",
    "cm_estimate",
    "bloom_prefilter",
    "hll_overlap",
    "bpe_train",
    "bpe_encode",
    "collocations",
    "exact_quantiles",
    # r12: strict bounded-error histogram quantiles (mergeable tier)
    "approx_quantiles_hist",
    "decontaminate",
    "duplicate_spans",
    "dsir_weights",
    # r13: learned linear quality classifier (inference)
    "quality_classifier",
]


def main():
    sessions = int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "2"))
    if sessions > 1 and not os.environ.get("SPARK_GRAFT_BENCH_CHILD"):
        return orchestrate(sessions)
    run_session()


def orchestrate(sessions: int) -> None:
    """Element-wise best of N fresh child sessions (see module docstring).
    Each child is a separate python+JVM process; the parent merges
    per-query minima and prints the single protocol JSON line."""
    import subprocess

    results = []
    for i in range(sessions):
        if i:
            time.sleep(15)  # let the previous JVM's teardown debris settle
        env = dict(os.environ, SPARK_GRAFT_BENCH_CHILD="1")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        # stderr passes through live only when not captured; echo it so
        # progress lines stay visible and failures carry the child's trace
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            raise RuntimeError(
                f"bench child session {i + 1}/{sessions} exited "
                f"rc={proc.returncode}; stderr tail:\n"
                + "\n".join(proc.stderr.splitlines()[-20:])
            )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(
                f"bench child session {i + 1}/{sessions} produced no JSON "
                f"line (rc=0); stdout tail:\n"
                + "\n".join(proc.stdout.splitlines()[-10:])
            )
        results.append(json.loads(lines[-1]))
        print(f"# session {i + 1}/{sessions}: {results[-1]['value']}s",
              file=sys.stderr)
    merged = dict(results[0])
    merged["queries"] = {
        name: min(r["queries"][name] for r in results if name in r["queries"])
        for name in results[0]["queries"]
    }
    merged["value"] = round(sum(merged["queries"].values()), 3)
    merged["sessions"] = sessions
    print(json.dumps(merged))


def run_session():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    except ValueError:  # e.g. .sfdata/sf1skew
        sf = -1.0
    spark = get_spark("bench")
    # warm the JVM / codegen / shuffle machinery so the first timed query
    # does not carry session-startup cost. Synthetic data only — the warmup
    # must exercise the *machinery* (codegen, exchange, window exec,
    # broadcast, Arrow python workers), not precompute any query input.
    from pyspark.sql import functions as F  # noqa: F811

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(10_000).repartition(8, "id").selectExpr("count(distinct id)").collect()
    spark.read.parquet(f"{sf_dir}/events.parquet").count()  # parquet reader + fs cache
    warm = spark.range(10_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("t"), F.rand(7).alias("v")
    )
    from pyspark.sql import Window

    warm.select(F.lag("v", 1).over(Window.partitionBy("k").orderBy("t"))).agg(
        F.count(F.lit(1))
    ).collect()  # window exec + sort
    warm.join(F.broadcast(warm.groupBy("k").count()), "k").agg(F.sum("count")).collect()
    warm.groupBy("k").applyInPandas(lambda p: p, schema="k long, t long, v double").agg(
        F.count(F.lit(1))
    ).collect()  # Arrow + python worker pool spin-up
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    from pyspark.sql import functions as F

    # SPARK_GRAFT_BENCH_ONLY=a,b,c restricts to a subset (r9: the
    # superlinear-family scaling sweep times 3 queries at 4 corpora —
    # running all 50 per corpus would be wasted hours). Committed
    # BENCH_r{N} artifacts never set it.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    headline = (
        [q for q in HEADLINE if q in set(only.split(","))] if only else HEADLINE
    )
    for name in headline:
        if name not in qs:
            continue
        # best of 3 full runs per query: single-run local-mode timings
        # jitter by +/-30% (GC, JIT recompiles, VM host neighbours); the
        # minimum is the steady-state cost of the plan. Each run rebuilds
        # the query from scratch — nothing is cached between them beyond
        # what any repeated production job would share (code, page cache).
        best, n_rows = None, 0
        for _ in range(3):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            # checksum EVERY output column: a bare count() would let Catalyst
            # prune the very window/projection expressions being benchmarked,
            # timing only the shared scan + panel build
            cols = ", ".join(f"`{c}`" for c in df.columns)
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.expr(f"bit_xor(xxhash64({cols}))").alias("checksum"),  # overflow-free
            ).collect()[0]
            elapsed = round(time.time() - t0, 3)
            best = elapsed if best is None else min(best, elapsed)
            n_rows = row["n"]
        timings[name] = best
        print(f"# {name}: {timings[name]:.3f}s ({n_rows} rows)", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
