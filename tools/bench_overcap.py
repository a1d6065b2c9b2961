"""Bench the runtime-gated SLOW (over-cap / distributed) paths against
their fast paths at the same data volume, and verify the paths agree
(VERDICT r4 #1: "the 100 TB story needs a number").

Every gated operator picks its fast path at sf0.1 (the caps all sit above
the sf0.1 volumes), so the paths that would actually execute at cluster
scale had zero timing evidence. This tool forces each gate (driver_cap=0 /
broadcast cap=0) on the SAME sf0.1 inputs, times both paths bench-style
(full checksummed evaluation, min of N runs), and diffs the outputs:

  spacetime_distances  driver_cap=0  -> staged block-pruned joins + theta-join
  dedup_clusters (CC)  driver_cap=0  -> distributed min-label propagation
  pagerank             driver_cap=0  -> distributed join-aggregate loop
  fuzzy_dedup_keep     driver_cap=0  -> CC distributed path inside the pipeline
  grid_lag             mesh cap=0    -> shuffle join instead of mesh broadcast
  pq_topk              query cap=0   -> in-plan distributed ADC table build

Agreement: spacetime / CC / fuzzy / grid_lag paths are exact by design ->
byte checksum equality after the gate-standard 6dp round. pagerank's two
paths are independent float fixpoints -> max |delta| via a node join
(threshold 1e-6; both converge to tol=1e-9).

Usage: python tools/bench_overcap.py [sf_dir] [--runs N] [--only name,...]
Prints one JSON line; also appends a markdown table to stdout (redirect to
BENCH_NOTES_r05.md by hand — the notes file carries commentary too).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from pyspark.sql import DataFrame, functions as F
from views_transformation_library_spark.operators import (
    dedup,
    similarity,
    spacetime,
    trees,
)
from views_transformation_library_spark.session import get_spark


def checksum(df: DataFrame) -> tuple[int, int]:
    """(n_rows, bit_xor(xxhash64(all cols))) — full evaluation."""
    cols = ", ".join(f"`{c}`" for c in df.columns)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"bit_xor(xxhash64({cols}))").alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def timed(build, runs: int) -> tuple[float, int, int]:
    """bench.py convention: the timer wraps BUILD + full evaluation — the
    gated operators do eager driver work (counts, collects, union-find)
    inside the build, which is part of the cost being measured."""
    best = None
    for _ in range(runs):
        t0 = time.time()
        n, h = checksum(build())
        sec = round(time.time() - t0, 3)
        best = sec if best is None else min(best, sec)
    return best, n, h


def _pagerank_edges(spark, d):
    return (
        spark.read.parquet(f"{d}/lineitem.parquet")
        .select("l_orderkey", F.col("l_suppkey").alias("src"))
        .join(
            spark.read.parquet(f"{d}/orders.parquet").select(
                F.col("o_orderkey").alias("l_orderkey"),
                (F.col("o_custkey") + F.lit(1_000_000)).alias("dst"),
            ),
            "l_orderkey",
        )
        .select("src", "dst")
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = 3
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1]) if "=" in a else runs
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    spark = get_spark("bench_overcap")
    # same machinery warmup as bench.py (abbreviated)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    spark.range(10_000).withColumn("k", F.col("id") % 64).groupBy("k").applyInPandas(
        lambda p: p, schema="id long, k long"
    ).count()

    cases = {}

    # --- spacetime: per-slice numpy (fast) vs staged joins + theta (slow)
    def spacetime_build(cap):
        def _b():
            pn = entry._event_panel(spark, sf_dir)
            return entry._r6(
                spacetime.spacetime_distances(
                    pn, "distances", k=2, nu=1.0,
                    stride=entry.GRID_STRIDE, driver_cap=cap,
                )
            )
        return _b

    cases["spacetime_distances"] = dict(
        fast=spacetime_build(spacetime.DENSE_DRIVER_CAP),
        slow=spacetime_build(0),
        compare="checksum",
    )

    # --- connected components: union-find (fast) vs min-label rounds (slow)
    def cc_build(cap):
        def _b():
            pairs = dedup.ngram_jaccard_pairs(
                entry._docs(spark, sf_dir), n=3, threshold=0.5, max_doc_freq=1000
            )
            return dedup.connected_components(pairs, driver_cap=cap)
        return _b

    cases["dedup_clusters"] = dict(
        fast=cc_build(2_000_000), slow=cc_build(0), compare="checksum"
    )

    # --- fuzzy dedup pipeline with the CC stage forced distributed
    def fuzzy_build(cap):
        def _b():
            return dedup.fuzzy_dedup_keep(
                entry._docs(spark, sf_dir), n=3, n_hashes=24, bands=6,
                threshold=0.8, driver_cap=cap,
            ).select("doc_id", "source", "n_chars")
        return _b

    cases["fuzzy_dedup_keep"] = dict(
        fast=fuzzy_build(2_000_000), slow=fuzzy_build(0), compare="checksum"
    )

    # --- pagerank: numpy power iteration (fast) vs join-agg loop (slow)
    def pr_build(cap):
        def _b():
            return dedup.pagerank(
                _pagerank_edges(spark, sf_dir), max_iters=20, driver_cap=cap
            )
        return _b

    cases["pagerank"] = dict(
        fast=pr_build(2_000_000), slow=pr_build(0), compare="float:1e-6"
    )

    # --- grid_lag: mesh broadcast (fast) vs shuffle join (slow)
    def grid_build(cap):
        def _b():
            old = trees.GRID_MESH_BROADCAST_CAP
            trees.GRID_MESH_BROADCAST_CAP = cap
            try:
                return entry._r6(
                    trees.grid_lag(
                        entry._panel(spark, sf_dir), entry.GRID_LAG_THRESHOLD,
                        0, stride=entry.GRID_STRIDE,
                    )
                )
            finally:
                trees.GRID_MESH_BROADCAST_CAP = old
        return _b

    cases["grid_lag"] = dict(
        fast=grid_build(2_000_000), slow=grid_build(0), compare="checksum"
    )

    # --- pq_topk: driver-side ADC build (fast) vs in-plan distributed
    # table (slow) — the r6 query-count gate (VERDICT r5 #3)
    def pq_build(cap):
        def _b():
            old = similarity.PQ_QUERY_DRIVER_CAP
            similarity.PQ_QUERY_DRIVER_CAP = cap
            try:
                return similarity.pq_topk(
                    entry._embs(spark, sf_dir), entry._queries(spark, sf_dir),
                    k=10, m=8, k_codes=16, rerank=8,
                )
            finally:
                similarity.PQ_QUERY_DRIVER_CAP = old
        return _b

    cases["pq_topk"] = dict(
        fast=pq_build(similarity.PQ_QUERY_DRIVER_CAP),
        slow=pq_build(0),
        compare="checksum",
    )

    results = {}
    for name, c in cases.items():
        if only and name not in only:
            continue
        t_fast, n_fast, h_fast = timed(c["fast"], runs)
        t_slow, n_slow, h_slow = timed(c["slow"], runs)
        if c["compare"] == "checksum":
            agree = (n_fast == n_slow) and (h_fast == h_slow)
            detail = f"hash {'==' if agree else '!='}"
        else:
            tol = float(c["compare"].split(":")[1])
            a, b = c["fast"]().alias("a"), c["slow"]().alias("b")
            key = a.columns[0]
            joined = a.join(b, F.col(f"a.{key}") == F.col(f"b.{key}"), "full")
            val = a.columns[1]
            dmax = joined.agg(
                F.max(F.abs(F.col(f"a.{val}") - F.col(f"b.{val}"))).alias("d"),
                F.sum(
                    (F.col(f"a.{key}").isNull() | F.col(f"b.{key}").isNull())
                    .cast("long")
                ).alias("miss"),
            ).collect()[0]
            agree = (dmax["miss"] == 0) and (dmax["d"] is not None and dmax["d"] < tol)
            detail = f"max|delta|={dmax['d']:.2e}, unmatched={dmax['miss']}"
        results[name] = {
            "fast_sec": t_fast,
            "slow_sec": t_slow,
            "ratio": round(t_slow / t_fast, 2) if t_fast else None,
            "rows": n_fast,
            "agree": bool(agree),
            "detail": detail,
        }
        print(
            f"# {name}: fast {t_fast:.2f}s, slow {t_slow:.2f}s "
            f"({results[name]['ratio']}x), {n_fast} rows, "
            f"agree={agree} [{detail}]",
            file=sys.stderr,
        )

    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "overcap": results}))
    print("\n| operator | fast path s | forced slow path s | slow/fast | rows | paths agree |")
    print("|---|---|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| {name} | {r['fast_sec']:.2f} | {r['slow_sec']:.2f} "
            f"| {r['ratio']}x | {r['rows']} | {r['agree']} ({r['detail']}) |"
        )


if __name__ == "__main__":
    main()
