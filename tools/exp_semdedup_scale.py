"""ABBA A/B: semantic_dedup fixed n_clusters=8 (the r3-r8 entry
parameterization) vs the r9 auto policy (n_clusters=None →
ceil(n / SEMDEDUP_CLUSTER_TARGET)).

Why: the r9 sf3/sf5 sweep (SCALING_r09.md) measured the fixed-cluster
entry at ~quadratic wall (pair work Σ|c|² ≈ n²/8 with a constant cluster
count) — exactly the class the r8 knn_graph policy fix addressed. This
tool isolates the params effect from VM drift with the counterbalanced
protocol (BENCH_NOTES_r06): one session, per round A B B A, full
checksummed evaluation, discard-first-round, min per arm.

Note the two arms produce DIFFERENT outputs by design (cluster geometry
changes which duplicate pairs are compared); the checksum lines document
that, not parity. Parity for the auto path is held by the strict DuckDB
gate (oracle derives the same cluster count) and
test_semantic_dedup_auto_clusters.

Usage: python tools/exp_semdedup_scale.py [sf_dir] [--rounds=N]
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

OLD_NC = 8  # the r3-r8 fixed entry cluster count


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
    spark = get_spark("exp_semdedup_scale")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(10_000).withColumn("k", F.col("id") % 64).groupBy("k").applyInPandas(
        lambda p: p, schema="id long, k long"
    ).count()
    embs = entry._embs(spark, sf_dir)
    n = embs.count()
    auto_nc = max(1, -(-n // similarity.SEMDEDUP_CLUSTER_TARGET))

    def arm(nc):
        return similarity.semantic_dedup(
            embs, threshold=entry.SEMANTIC_DEDUP_THRESHOLD, n_clusters=nc
        ).select("vec_id", "cluster", F.col("keep").cast("int").alias("keep"))

    def run(nc):
        t0 = time.monotonic()
        nrows, h = checksum(arm(nc))
        return time.monotonic() - t0, nrows, h

    times = {"old": [], "new": []}
    for r in range(rounds):
        for name, nc in (("old", OLD_NC), ("new", auto_nc),
                         ("new", auto_nc), ("old", OLD_NC)):
            sec, nrows, h = run(nc)
            if r > 0:
                times[name].append(sec)
            print(f"# round {r} arm={name} nc={nc} {sec:.3f}s rows={nrows}",
                  file=sys.stderr)
    out = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "old_n_clusters": OLD_NC,
        "new_n_clusters": auto_nc,
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
