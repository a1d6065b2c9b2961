"""Interleaved A/B: bigram_logprob vs unigram_logprob at sf0.1 (VERDICT r5
task #2 — reconcile the 1.45 s notes number vs the 3.666 s committed
BENCH_r05 artifact). Alternates A/B per rep in ONE session so VM drift
hits both arms equally; full checksummed evaluation (bench.py protocol)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F
from views_transformation_library_spark.session import get_spark


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
    reps = int(os.environ.get("REPS", "4"))
    spark = get_spark("exp_bigram_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    qs = entrymod.queries()
    names = ["unigram_logprob", "bigram_logprob"]
    res = {n: [] for n in names}
    # one throwaway warm rep per arm (codegen/broadcast machinery)
    for n in names:
        timed(spark, qs, n, sf_dir)
    for _ in range(reps):
        for n in names:
            res[n].append(timed(spark, qs, n, sf_dir))
    for n in names:
        print(n, res[n], "min", min(res[n]))


if __name__ == "__main__":
    main()
