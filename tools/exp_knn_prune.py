"""Interleaved A/B of knn_graph's candidate-buffer prune (VERDICT r4 #2).

The r4 margin-safe buffer prune bounds hot-bucket task memory but costs
bookkeeping on even buckets; r4's bench showed knn_graph 2.67 -> 3.34 s
without isolating whether that was the prune or VM drift. Protocol
(BENCH_NOTES_r03/r04): ONE session, arms alternating ON/OFF within each
round (so drift hits both arms equally), min-of-N checksummed FULL
evaluation per arm, two corpora:

  even  — the sf0.1 embeddings table as-is (driver-gate parameterization)
  hot   — same rows, but 50% of vectors overwritten with one tight
          cluster direction (+0.01 jitter), scored with explicit
          centroids whose first entry IS the hot direction: a guaranteed
          50%-hot bucket (the tests/test_beyond.py:1118 construction at
          corpus scale)

Prune OFF = similarity.PRUNE_AT >= 2^60 (fully disables both the
mid-stream and final prunes — the pre-r4 scorer).

Usage: python tools/exp_knn_prune.py [sf_dir] [--rounds N]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# historical r4-r7 entry parameterization this A/B was designed around
# (the r8 entry derives its index shape from the corpus count instead)
KNN_CENTROIDS = 8
KNN_NPROBE = 2
from pyspark.sql import functions as F
from views_transformation_library_spark.operators import similarity
from views_transformation_library_spark.session import get_spark

PRUNE_OFF = 1 << 62


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
    rounds = 3
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
    spark = get_spark("exp_knn_prune")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(10_000).withColumn("k", F.col("id") % 64).groupBy("k").applyInPandas(
        lambda p: p, schema="id long, k long"
    ).count()

    embs_pdf = entry._embs(spark, sf_dir).toPandas()
    dim = len(embs_pdf["embedding"].iloc[0])
    n = len(embs_pdf)
    rng = np.random.RandomState(5)
    hot_dir = rng.randn(dim)
    hot_pdf = embs_pdf.copy()
    half = n // 2
    jitter = rng.randn(half, dim) * 0.01
    hot_vecs = [
        [float(x) for x in hot_dir + jitter[j]] for j in range(half)
    ]
    hot_pdf = hot_pdf.reset_index(drop=True)
    for j in range(half):
        hot_pdf.at[j, "embedding"] = hot_vecs[j]
    hot_cents = [list(map(float, hot_dir))] + [
        list(map(float, rng.randn(dim) * 5))
        for _ in range(KNN_CENTROIDS - 1)
    ]

    def even_build():
        return similarity.knn_graph(
            entry._embs(spark, sf_dir), k=entry.KNN_GRAPH_K,
            n_centroids=KNN_CENTROIDS, nprobe=KNN_NPROBE,
        )

    hot_df = spark.createDataFrame(
        hot_pdf, schema="vec_id long, embedding array<float>"
    ).localCheckpoint()  # pin: corpus build cost must not enter the timing

    def hot_build():
        return similarity.knn_graph(
            hot_df, k=entry.KNN_GRAPH_K, centroids=hot_cents,
            nprobe=KNN_NPROBE,
        )

    results = {}
    for corpus, build in (("even", even_build), ("hot50", hot_build)):
        times = {"on": [], "off": []}
        sums = {}
        for r in range(rounds):
            for arm, pa in (("on", 262_144), ("off", PRUNE_OFF)):
                similarity.PRUNE_AT = pa
                t0 = time.time()
                nh = checksum(build())
                times[arm].append(round(time.time() - t0, 3))
                sums[arm] = nh
        similarity.PRUNE_AT = 262_144
        results[corpus] = {
            "on_sec": min(times["on"]),
            "off_sec": min(times["off"]),
            "on_runs": times["on"],
            "off_runs": times["off"],
            "ratio_on_off": round(min(times["on"]) / min(times["off"]), 3),
            "rows": sums["on"][0],
            "checksums_equal": sums["on"] == sums["off"],
        }
        print(f"# {corpus}: {results[corpus]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "rounds": rounds, "knn_prune_ab": results}))


if __name__ == "__main__":
    main()
