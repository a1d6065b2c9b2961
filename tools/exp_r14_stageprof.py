"""Stage-level attribution for one query via the local Spark UI REST API.

Usage: python tools/exp_r14_stageprof.py [sf_dir] [query ...]
Prints per-stage executorRunTime / task counts / shuffle bytes for the
build+action of each query (one run each, warm session).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F
from views_transformation_library_spark.session import get_spark


def stages(ui, app):
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
        return json.load(r)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    SparkSession.builder.config("spark.ui.enabled", "true")  # noqa: builder is shared
    import views_transformation_library_spark.session as sess
    _orig = sess.get_spark
    def _ui_spark(app_name="stageprof", cpus=None):
        import os as _os
        cpus = cpus or int(_os.environ.get("SPARK_GRAFT_CPUS", "32"))
        b = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
        for k, v in [
            ("spark.sql.shuffle.partitions", str(max(cpus, 4))),
            ("spark.sql.adaptive.enabled", "true"),
            ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
            ("spark.sql.session.timeZone", "UTC"),
            ("spark.sql.legacy.parquet.nanosAsLong", "true"),
            ("spark.sql.execution.arrow.pyspark.enabled", "true"),
            ("spark.driver.memory", "24g"),
            ("spark.sql.files.openCostInBytes", "262144"),
            ("spark.ui.enabled", "true"),
        ]:
            b = b.config(k, v)
        return b.getOrCreate()
    spark = _ui_spark()
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app = sc.applicationId
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    qs = entrymod.queries()
    for name in names:
        # warm rep
        df = qs[name](spark, sf_dir)
        cols = ", ".join(f"`{c}`" for c in df.columns)
        df.agg(F.expr(f"bit_xor(xxhash64({cols}))")).collect()
        seen = {s["stageId"] for s in stages(ui, app)}
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.agg(F.expr(f"bit_xor(xxhash64({cols}))")).collect()
        wall = time.time() - t0
        time.sleep(0.5)
        new = [s for s in stages(ui, app) if s["stageId"] not in seen]
        new.sort(key=lambda s: -s["executorRunTime"])
        print(f"== {name}: wall {wall:.2f}s, {len(new)} stages")
        for s in new[:12]:
            print(
                f"  stage {s['stageId']:4d} tasks {s['numCompleteTasks']:3d} "
                f"run {s['executorRunTime']/1000:7.2f}s "
                f"in {s.get('inputBytes',0)>>20:5d}M shW {s.get('shuffleWriteBytes',0)>>20:4d}M "
                f"shR {s.get('shuffleReadBytes',0)>>20:4d}M  {s['name'].split()[0]}"
            )


if __name__ == "__main__":
    main()
