"""Step-level job attribution for the build phase of one query.

Usage: python tools/exp_r14_jobsteps.py [sf_dir] [query]
Steps through the known build pipeline of the tree-lag/panel queries and
prints the job-count delta + wall seconds per step.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: F401  (path setup)
from views_transformation_library_spark.session import get_spark
from views_transformation_library_spark import panel as P
from views_transformation_library_spark.operators import trees


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2] if len(sys.argv) > 2 else "spatial_tree_lag"
    spark = get_spark("jobsteps")
    sc = spark.sparkContext
    from pyspark.sql import functions as F

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    jobs = lambda: len(sc.statusTracker().getJobIdsForGroup())
    t = [time.time(), jobs()]

    def step(name):
        now, j = time.time(), jobs()
        print(f"{name:40s} +{j - t[1]:2d} jobs  {now - t[0]:6.3f}s")
        t[0], t[1] = now, j

    for rep in range(2):
        print(f"--- rep {rep}")
        ev = P.read_events(spark, sf_dir)
        agg = ev.groupBy(
            P.epoch_day(ev).alias(P.TIME), F.col("user_id").alias(P.UNIT)
        ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value"))
        step("build agg plan")
        mat = P.materialize(agg)
        step("materialize(agg) [panel build]")
        pn = P.densify(mat, fill=0.0)
        step("densify plan")
        if which == "spatial_tree_lag":
            from __spark_entry__ import GRID_STRIDE
            df = P.materialize(pn)
            step("materialize(panel) [operator]")
            pgids = P.collect_axis(df, P.UNIT, P.UNIT_AXIS_CAP, "unit axis")
            step("collect_axis(pgids)")
            out = trees.spatial_tree_lag(df, 0.9, 0, stride=GRID_STRIDE)
            step("rest of spatial_tree_lag build")
        elif which == "temporal_tree_lag":
            df = P.materialize(pn)
            step("materialize(panel) [operator]")
            times = P.collect_axis(df, P.TIME, P.TIME_AXIS_CAP, "time axis")
            step("collect_axis(times)")
            out = trees.temporal_tree_lag(df, 0.7, "oneovert")
            step("rest of temporal_tree_lag build")
        elif which == "grid_lag":
            from __spark_entry__ import GRID_STRIDE, GRID_LAG_THRESHOLD
            out = trees.grid_lag(pn, GRID_LAG_THRESHOLD, 0, stride=GRID_STRIDE)
            step("grid_lag build")
        cols = ", ".join(f"`{c}`" for c in out.columns)
        chk = out.selectExpr(f"count(*) as n", *[f"sum(xxhash64({c})) as h{i}" for i, c in enumerate(out.columns)])
        chk.collect()
        step("action (checksum)")


if __name__ == "__main__":
    main()
