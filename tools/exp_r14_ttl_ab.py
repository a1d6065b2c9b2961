"""Counterbalanced ABBA: r14 temporal_tree_lag signed-boundary rewrite
(arm A = new code) vs the r13 units×nodes cross-join + two-SMJ shape
(arm B = the old implementation, inlined below verbatim from git HEAD
bb400f7). Protocol per CLAUDE.md r6: ABBA within the session, one
throwaway warm rep per arm, min-of-3 per arm per block, full checksummed
evaluation; run twice (ORDER=AB / ORDER=BA) in fresh sessions and take
element-wise mins. Also asserts the two arms' checksums agree.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import Window, functions as F
from views_transformation_library_spark.session import get_spark
from views_transformation_library_spark.operators import trees
from views_transformation_library_spark.panel import (
    TIME, TIME_AXIS_CAP, UNIT, collect_axis, feature_cols, materialize,
)
from views_transformation_library_spark.operators.trees import (
    GRID_SUM_SCALE, _temporal_interactions_cached,
)

NAMES = ["temporal_tree_lag"]


def old_temporal_tree_lag(df, thetacrit, weight_functions="uniform", sigma=1.0):
    # verbatim r13 implementation (git bb400f7, trees.py:233-325)
    if isinstance(weight_functions, str):
        weight_functions = [weight_functions]
    feats = feature_cols(df)
    spark = df.sparkSession
    df = materialize(df)
    times = collect_axis(df, TIME, TIME_AXIS_CAP, "time axis")
    inter = _temporal_interactions_cached(
        times, thetacrit, tuple(weight_functions), sigma
    )
    inter_df = spark.createDataFrame(
        inter, schema="tnow long, s long, e long, fn string, w double"
    )
    nodes = sorted({(s, e) for (_, s, e, _, _) in inter})
    nodes_df = spark.createDataFrame(nodes, schema="s long, e long")

    filled = df.na.fill(0.0, subset=feats)
    w_cum = Window.partitionBy(UNIT).orderBy(TIME).rowsBetween(Window.unboundedPreceding, 0)
    cum = filled.select(
        TIME,
        UNIT,
        *[
            F.sum(F.floor(F.col(c) * F.lit(GRID_SUM_SCALE)).cast("long"))
            .over(w_cum)
            .alias(f"__cum_{c}")
            for c in feats
        ],
    )
    units = df.select(UNIT).distinct()
    base = units.crossJoin(F.broadcast(nodes_df))
    cum_e = cum.select(
        F.col(UNIT).alias("__u"), (F.col(TIME) + 1).alias("__e"),
        *[F.col(f"__cum_{c}").alias(f"__ce_{c}") for c in feats],
    )
    cum_s = cum.select(
        F.col(UNIT).alias("__u2"), (F.col(TIME) + 1).alias("__s"),
        *[F.col(f"__cum_{c}").alias(f"__cs_{c}") for c in feats],
    )
    node_sums = (
        base.join(cum_e, (F.col(UNIT) == F.col("__u")) & (F.col("e") == F.col("__e")), "left")
        .join(cum_s, (F.col(UNIT) == F.col("__u2")) & (F.col("s") == F.col("__s")), "left")
        .select(
            UNIT, "s", "e",
            *[
                (
                    (
                        F.coalesce(F.col(f"__ce_{c}"), F.lit(0).cast("long"))
                        - F.coalesce(F.col(f"__cs_{c}"), F.lit(0).cast("long"))
                    )
                    / F.lit(GRID_SUM_SCALE)
                ).alias(c)
                for c in feats
            ],
        )
    )
    joined = node_sums.join(F.broadcast(inter_df), ["s", "e"])
    aggs = []
    out_names = []
    for c in feats:
        for fn in weight_functions:
            name = c if len(weight_functions) == 1 else f"{c}_{fn}"
            out_names.append(name)
            aggs.append(
                (
                    F.sum(
                        F.when(
                            F.col("fn") == fn,
                            F.floor(F.col(c) * F.col("w") * F.lit(GRID_SUM_SCALE)).cast("long"),
                        ).otherwise(F.lit(0).cast("long"))
                    )
                    / F.lit(GRID_SUM_SCALE)
                ).alias(name)
            )
    res = joined.groupBy(F.col("tnow").alias(TIME), F.col(UNIT)).agg(*aggs)
    grid = df.select(TIME, UNIT)
    out = grid.join(res, [TIME, UNIT], "left").na.fill(0.0, subset=out_names)
    return out


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
    spark = get_spark("exp_r14_ttl_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    qs = entrymod.queries()
    new_impl = trees.temporal_tree_lag
    res = {n: {"A": [], "B": []} for n in NAMES}
    sums = {n: {} for n in NAMES}

    def set_arm(arm):
        trees.temporal_tree_lag = new_impl if arm == "A" else old_temporal_tree_lag

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
    trees.temporal_tree_lag = new_impl
    out = {"order": order, "reps": reps, "results": res,
           "checksums_equal": True}
    for n in NAMES:
        a, b = min(res[n]["A"]), min(res[n]["B"])
        out.setdefault("summary", {})[n] = {
            "new_s": a, "old_s": b, "new_over_old": round(a / b, 3)
        }
        print(f"# {n}: NEW {a:.3f}s vs OLD {b:.3f}s -> new/old {a/b:.3f}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
