"""SparkSession factory tuned for this engine.

Local mode for tests/bench; the same config keys are the ones you would set
on a real cluster (AQE on, Arrow on, sane shuffle partitioning). UTC pinned
so timestamp-derived keys match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vtl_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata stores TIMESTAMP(NANOS) which Spark's parquet reader
        # rejects; read as long (nanos since epoch) instead
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode: ONE JVM holds driver + all executor threads, so this
        # bounds every shuffle/broadcast/checkpoint buffer in the process.
        # 8g was fine through sf0.1; sf1's ~60M-row pair expansions OOM'd
        # a broadcast build under it (r6) — the machine has 128 GiB, a
        # real cluster sizes executors separately.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # Spark floors every file split at openCostInBytes (default 4 MiB),
        # so a multi-row-group parquet file under ~128 MiB still scans as
        # 1-2 tasks — narrow stages over a corpus-sized table then run on
        # one core of 32 (sf1 cosine scoring measured 30x slower than its
        # parallel shape). 256 KiB lets maxSplitBytes follow
        # totalBytes/defaultParallelism for small-to-mid files while
        # changing nothing for cluster-scale files (bytesPerCore
        # dominates long before 256 KiB matters).
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
