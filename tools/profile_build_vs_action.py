"""Per-query decomposition: DataFrame BUILD time (gates, eager
checkpoints, driver collects that run while the query callable
constructs its frame) vs ACTION time (the bench checksum agg), plus the
number of Spark jobs each phase launches.

Usage: python tools/profile_build_vs_action.py [sf_dir] [names...]

One session, one run per query (coarse — for attribution, not for
committed numbers; the bench protocol stays min-of-3 x 2 sessions).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from views_transformation_library_spark.session import get_spark
from bench import HEADLINE


def n_jobs(sc) -> int:
    # statusTracker keeps all job ids for the app (bounded by retained
    # jobs; fine for a single profiling session)
    return len(sc.statusTracker().getJobIdsForGroup())


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or HEADLINE
    spark = get_spark("profile_build_vs_action")
    sc = spark.sparkContext
    from pyspark.sql import functions as F

    # warm up (mirrors bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    spark.range(10_000).select((F.col("id") % 7).alias("k")).groupBy("k").applyInPandas(
        lambda p: p, schema="k long"
    ).count()

    qs = entrymod.queries()
    out = {}
    for name in names:
        if name not in qs:
            continue
        bb = ba = None
        for rep in range(3):
            sc.setJobDescription(f"build:{name}")
            j0 = n_jobs(sc)
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            j1 = n_jobs(sc)
            sc.setJobDescription(f"action:{name}")
            cols = ", ".join(f"`{c}`" for c in df.columns)
            df.agg(
                F.count(F.lit(1)).alias("n"),
                F.expr(f"bit_xor(xxhash64({cols}))").alias("checksum"),
            ).collect()
            t2 = time.time()
            j2 = n_jobs(sc)
            sc.setJobDescription(None)
            bb = (t1 - t0) if bb is None else min(bb, t1 - t0)
            ba = (t2 - t1) if ba is None else min(ba, t2 - t1)
        out[name] = {
            "build_s": round(bb, 3),
            "action_s": round(ba, 3),
            "build_jobs": j1 - j0,
            "action_jobs": j2 - j1,
        }
        print(
            f"# {name}: build {out[name]['build_s']:.2f}s/{out[name]['build_jobs']}j "
            f"action {out[name]['action_s']:.2f}s/{out[name]['action_jobs']}j",
            file=sys.stderr,
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
