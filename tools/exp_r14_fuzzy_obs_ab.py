"""In-session ABBA: fuzzy_dedup_keep with the observation-counter size
gate (arm A = materialize_counted) vs the r13 materialize + .count()
pair (arm B, monkeypatched below). Checksums asserted equal.
ORDER=AB / ORDER=BA across fresh sessions, element-wise mins.
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
from views_transformation_library_spark.operators import dedup
from views_transformation_library_spark.panel import materialize

NAMES = ["fuzzy_dedup_keep"]


def plain_materialize_counted(df):
    out = materialize(df)
    return out, out.count


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
    spark = get_spark("exp_r14_fuzzy_obs_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    qs = entrymod.queries()
    new_impl = dedup.materialize_counted
    res = {n: {"A": [], "B": []} for n in NAMES}
    sums = {n: {} for n in NAMES}

    def set_arm(arm):
        dedup.materialize_counted = (
            new_impl if arm == "A" else plain_materialize_counted
        )

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
    dedup.materialize_counted = new_impl
    out = {"order": order, "reps": reps, "results": res, "checksums_equal": True}
    for n in NAMES:
        a, b = min(res[n]["A"]), min(res[n]["B"])
        out.setdefault("summary", {})[n] = {
            "obs_s": a, "plain_s": b, "obs_over_plain": round(a / b, 3)
        }
        print(f"# {n}: OBS {a:.3f}s vs PLAIN {b:.3f}s -> {a/b:.3f}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
