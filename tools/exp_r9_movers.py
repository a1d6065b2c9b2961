"""ABBA adjudication of BENCH_r08's knn_graph mover (VERDICT r8 #2).

knn_graph moved 1.68 -> 3.21 s at sf0.1 in r8. The hypothesis (stated in
ANN_FRONTIER_r08.md:34 but never A/B-measured): the auto_graph_params
policy (nc = ceil(n/64), nprobe = max(4, ceil(nc^(2/3)))) deliberately
spends ~1.39x the pair budget of the old fixed nc=8/nprobe=2 index at
sf0.1 to buy recall 0.50 -> 0.75. This tool isolates the params effect
from VM drift with the COUNTERBALANCED protocol (BENCH_NOTES_r06): one
session, per round A B B A (A = old fixed params, B = auto policy),
full checksummed evaluation, discard-first-round, min per arm.

The other three >1.3x movers (moving_average 1.37x, flagship 1.31x,
simhash_pairs 1.31x) are code-unchanged since r7 — their adjudication is
the fresh 2-session BENCH_r09 numbers (same protocol as r7/r8), not an
A/B: if they return to r7 levels the r8 lines were the documented
host-stall/warm-in class.

Usage: python tools/exp_r9_movers.py [sf_dir] [--rounds=N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from pyspark.sql import functions as F
from views_transformation_library_spark.operators import similarity
from views_transformation_library_spark.session import get_spark

OLD_NC, OLD_NPROBE = 8, 2  # the r4-r7 fixed index shape


def checksum(df):
    cols = ", ".join(f"`{c}`" for c in df.columns)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"bit_xor(xxhash64({cols}))").alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    rounds = 4
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
    spark = get_spark("exp_r9_movers")
    # warm the JVM + arrow path the way bench.py's first queries do
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(10_000).withColumn("k", F.col("id") % 64).groupBy("k").applyInPandas(
        lambda p: p, schema="id long, k long"
    ).count()

    embs = entry._embs(spark, sf_dir)
    n = embs.count()
    auto = similarity.auto_graph_params(n, entry.KNN_GRAPH_BUCKET_TARGET)

    def arm_old():
        return similarity.knn_graph(
            embs, k=entry.KNN_GRAPH_K, n_centroids=OLD_NC, nprobe=OLD_NPROBE
        )

    def arm_new():
        return similarity.knn_graph(
            embs, k=entry.KNN_GRAPH_K,
            n_centroids=auto["n_centroids"], nprobe=auto["nprobe"],
        )

    def run(build):
        t0 = time.monotonic()
        nrows, h = checksum(build())
        return time.monotonic() - t0, nrows, h

    times = {"old": [], "new": []}
    for r in range(rounds):
        # counterbalanced: A B B A — teardown debris taxes both arms equally
        for arm, build in (("old", arm_old), ("new", arm_new),
                           ("new", arm_new), ("old", arm_old)):
            sec, nrows, h = run(build)
            if r > 0:  # discard the whole first round (session warm-in)
                times[arm].append(sec)
            print(f"# round {r} arm={arm} {sec:.3f}s rows={nrows}",
                  file=sys.stderr)
    out = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "old_params": {"n_centroids": OLD_NC, "nprobe": OLD_NPROBE},
        "new_params": auto,
        "rounds_kept": rounds - 1,
        "old_min_s": round(min(times["old"]), 3),
        "new_min_s": round(min(times["new"]), 3),
        "new_over_old": round(min(times["new"]) / min(times["old"]), 3),
        "old_all": [round(t, 3) for t in times["old"]],
        "new_all": [round(t, 3) for t in times["new"]],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
