"""Interleaved A/B: is the r3 flagship_decay_time_since driver regression
(1.13 -> 1.80 s) real code cost or session drift?

The only r2->r3 change on the flagship path is panel.materialize going
eager -> lazy localCheckpoint. Same session, variants interleaved across
rounds, min of 3 full checksummed evaluations per cell (the bench.py
protocol), controls included.

Run: python tools/exp_flagship.py [sf_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from views_transformation_library_spark import panel as P
from views_transformation_library_spark.session import get_spark

QUERIES = ["flagship_decay_time_since", "moving_average", "cweq"]


def mat_eager(df):
    if df.isStreaming:
        return df
    return df.localCheckpoint(eager=True)


def mat_lazy(df):
    if df.isStreaming:
        return df
    return df.localCheckpoint(eager=False)


VARIANTS = {"A_eager_r2": mat_eager, "B_lazy_r3": mat_lazy}


def run(spark, qs, sf_dir, name):
    best = None
    for _ in range(3):
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        cols = ", ".join(f"`{c}`" for c in df.columns)
        df.agg(F.count(F.lit(1)).alias("n"),
               F.expr(f"bit_xor(xxhash64({cols}))").alias("cs")).collect()
        el = round(time.time() - t0, 3)
        best = el if best is None else min(best, el)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp_flagship")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    qs = entrymod.queries()
    results = {}
    for rnd in range(3):
        for vname, fn in VARIANTS.items():
            P.materialize.__code__ = fn.__code__
            for q in QUERIES:
                t = run(spark, qs, sf_dir, q)
                key = f"{vname}.{q}"
                results[key] = min(results.get(key, 1e9), t)
                print(f"# round{rnd} {key}: {t:.3f}", file=sys.stderr)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
