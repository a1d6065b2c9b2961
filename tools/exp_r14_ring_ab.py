"""In-session ABBA: r14 hop-composition neighbour_ring (arm A) vs the r13
running union-distinct BFS with per-hop materialize (arm B, inlined from
git 9c8d25a). Queries: splag_country_ring2, splag_country_weighted.
Checksums asserted equal. ORDER=AB / ORDER=BA across fresh sessions.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F
from views_transformation_library_spark.session import get_spark
from views_transformation_library_spark.operators import spatial_graph
from views_transformation_library_spark.operators.spatial_graph import (
    nth_order_reachability,
)
from views_transformation_library_spark.panel import materialize

NAMES = ["splag_country_ring2", "splag_country_weighted"]


def old_neighbour_ring(edges, kernel_inner, kernel_width):
    # verbatim r13 implementation (git 9c8d25a, spatial_graph.py:48-106)
    ninner = int(kernel_inner) - 1
    nouter = ninner + int(kernel_width)
    if nouter < 0 or nouter < ninner:
        return nth_order_reachability(edges, 0).limit(0)
    if ninner == 0 and nouter == 1:
        return (
            edges.select("month_id", F.col("a_id").alias("c"), F.col("b_id").alias("n_id"))
            .filter(F.col("n_id") != F.col("c"))
            .distinct()
        )
    r = (
        edges.select("month_id", F.col("a_id").alias("c"))
        .distinct()
        .select("month_id", "c", F.col("c").alias("n_id"))
    )
    inner_snapshot = r if ninner == 0 else None
    step_edges = edges.select(
        "month_id", F.col("a_id").alias("n_id"), F.col("b_id").alias("next_id")
    )
    for i in range(1, nouter + 1):
        r = materialize(r)
        step = r.join(step_edges, ["month_id", "n_id"]).select(
            "month_id", "c", F.col("next_id").alias("n_id")
        )
        r = r.union(step).distinct()
        if i == ninner:
            r = materialize(r)
            inner_snapshot = r
    if ninner < 0:
        return r
    if ninner == 0:
        return r.filter(F.col("n_id") != F.col("c"))
    return r.join(inner_snapshot, ["month_id", "c", "n_id"], "left_anti")


def timed(spark, qs, name, sf_dir):
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    cols = ", ".join(f"`{c}`" for c in df.columns)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"bit_xor(xxhash64({cols}))").alias("checksum"),
    ).collect()[0]
    return round(time.time() - t0, 3), (row["n"], row["checksum"])


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    order = os.environ.get("ORDER", "AB")
    reps = int(os.environ.get("REPS", "3"))
    spark = get_spark("exp_r14_ring_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    qs = entrymod.queries()
    new_impl = spatial_graph.neighbour_ring
    res = {n: {"A": [], "B": []} for n in NAMES}
    sums = {n: {} for n in NAMES}

    def set_arm(arm):
        spatial_graph.neighbour_ring = new_impl if arm == "A" else old_neighbour_ring

    arms = list(order) + list(order[::-1])
    for arm in sorted(set(arms)):
        set_arm(arm)
        for n in NAMES:
            _, chk = timed(spark, qs, n, sf_dir)
            sums[n][arm] = chk
    for n in NAMES:
        assert sums[n]["A"] == sums[n]["B"], f"{n}: checksum mismatch {sums[n]}"
    for arm in arms:
        set_arm(arm)
        for n in NAMES:
            best = min(timed(spark, qs, n, sf_dir)[0] for _ in range(reps))
            res[n][arm].append(best)
    spatial_graph.neighbour_ring = new_impl
    out = {"order": order, "reps": reps, "results": res, "checksums_equal": True}
    for n in NAMES:
        a, b = min(res[n]["A"]), min(res[n]["B"])
        out.setdefault("summary", {})[n] = {
            "new_s": a, "old_s": b, "new_over_old": round(a / b, 3)
        }
        print(f"# {n}: NEW {a:.3f}s vs OLD {b:.3f}s -> {a/b:.3f}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
