"""Stage attribution for knn_graph at a given sf dir (r9 scaling sweep).

The sf3->sf5 local wall exponent measured 2.26 — above the pair-budget
model (n^(5/3), e=1.67 locally) AND above the train/assign model (flops
∝ n·nc ∝ n², e=2.0). This tool splits the wall into stages so the excess
is attributed, not guessed (the r9 lesson: profile stages before
believing pair-budget math):

  scan    embeddings count (the cheap input pass)
  train   train_ivf_centroids wall (driver GEMM k-means on the capped
          sample; flops ∝ min(n,1e5)·nc·dim)
  assign  assign_probes_arrow + a count-style evaluation (flops ∝
          n·nc·dim in vectorized batches)
  full    the complete operator, checksummed (bench-equivalent)

score+rank ≈ full − assign − train (the cogrouped pair scorer and the
per-query ranking window; Catalyst fuses them with the assignment scan,
so the subtraction is attribution, not an exact stage wall).

Usage: python tools/exp_knn_stages.py [sf_dir] [--runs=N]
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


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    spark = get_spark("exp_knn_stages")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(10_000).withColumn("k", F.col("id") % 64).groupBy("k").applyInPandas(
        lambda p: p, schema="id long, k long"
    ).count()
    embs = entry._embs(spark, sf_dir)
    n = embs.count()
    p = similarity.auto_graph_params(n, entry.KNN_GRAPH_BUCKET_TARGET)
    nc, nprobe = p["n_centroids"], p["nprobe"]

    stages = {"scan": [], "train": [], "assign": [], "full": []}
    cents = None
    for r in range(runs + 1):  # run 0 is warm-in, discarded
        t0 = time.monotonic()
        embs.count()
        t1 = time.monotonic()
        cents = similarity.train_ivf_centroids(embs, nc)
        t2 = time.monotonic()
        # measure the SAME assignment path knn_graph takes at these params
        # (r10: two-level when it restricts, flat Arrow otherwise)
        base = embs.select(F.col("vec_id").alias("__id"),
                           F.col("embedding").alias("__v"))
        if similarity.two_level_engages(len(cents), nprobe):
            tl = similarity.two_level_index(cents, nprobe)
            assigned = similarity.assign_probes_two_level(
                base, "__v", cents, nprobe, tl
            )
        else:
            assigned = similarity.assign_probes_arrow(base, "__v", cents, nprobe)
        assigned.agg(F.count("__probes"), F.sum(F.col("__probes")[0])).collect()
        t3 = time.monotonic()
        g = similarity.knn_graph(
            embs, k=entry.KNN_GRAPH_K, n_centroids=None, nprobe=None,
            bucket_target=entry.KNN_GRAPH_BUCKET_TARGET,
        )
        cols = ", ".join(f"`{c}`" for c in g.columns)
        g.agg(F.expr(f"bit_xor(xxhash64({cols}))")).collect()
        t4 = time.monotonic()
        row = {"scan": t1 - t0, "train": t2 - t1,
               "assign": t3 - t2, "full": t4 - t3}
        print(f"# run {r} " + " ".join(f"{k}={v:.2f}s" for k, v in row.items()),
              file=sys.stderr)
        if r > 0:
            for k, v in row.items():
                stages[k].append(v)
    mins = {k: round(min(v), 3) for k, v in stages.items()}
    out = {
        "sf_dir": sf_dir, "n": n, "nc": nc, "nprobe": nprobe,
        "runs_kept": runs, **{f"{k}_min_s": v for k, v in mins.items()},
        "score_rank_approx_s": round(
            mins["full"] - mins["assign"] - mins["train"], 3),
        "all": {k: [round(x, 3) for x in v] for k, v in stages.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
