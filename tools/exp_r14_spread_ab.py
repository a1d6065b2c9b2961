"""Counterbalanced ABBA adjudication of the r13 `_spread` wraps on
minhash_lsh / ngram_jaccard (VERDICT r13 item 1: the driver's clean c8 arm
mildly contradicted the builder's 0.90-0.95x claims — keep or revert on a
quiet-host 32-core ABBA).

Arms: A = current code (spread ON), B = entrymod._spread monkeypatched to
identity (spread OFF). Per CLAUDE.md r6: counterbalanced order (ABBA within
the session), one throwaway warm rep per arm discarded, min-of-3 per arm per
block, full checksummed evaluation (bench.py protocol). Run the script twice
with ORDER=AB and ORDER=BA in fresh sessions and take element-wise mins.
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

NAMES = os.environ.get("AB_NAMES", "minhash_lsh,ngram_jaccard").split(",")


def timed(spark, qs, name, sf_dir):
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    cols = ", ".join(f"`{c}`" for c in df.columns)
    df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"bit_xor(xxhash64({cols}))").alias("checksum"),
    ).collect()
    return round(time.time() - t0, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    order = os.environ.get("ORDER", "AB")
    reps = int(os.environ.get("REPS", "3"))
    spark = get_spark("exp_r14_spread_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    qs = entrymod.queries()
    real_spread = entrymod._spread
    res = {n: {"A": [], "B": []} for n in NAMES}

    def set_arm(arm):
        entrymod._spread = real_spread if arm == "A" else (lambda df: df)

    arms = list(order) + list(order[::-1])  # e.g. A B B A
    # throwaway warm rep per arm (discarded; codegen/broadcast machinery)
    for arm in sorted(set(arms)):
        set_arm(arm)
        for n in NAMES:
            timed(spark, qs, n, sf_dir)
    for arm in arms:
        set_arm(arm)
        for n in NAMES:
            best = min(timed(spark, qs, n, sf_dir) for _ in range(reps))
            res[n][arm].append(best)
    entrymod._spread = real_spread
    out = {"order": order, "reps": reps, "results": res}
    for n in NAMES:
        a, b = min(res[n]["A"]), min(res[n]["B"])
        out.setdefault("summary", {})[n] = {
            "spread_on_s": a, "spread_off_s": b, "on_over_off": round(a / b, 3)
        }
        print(f"# {n}: ON {a:.3f}s vs OFF {b:.3f}s -> on/off {a/b:.3f}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
