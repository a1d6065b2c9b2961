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
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
