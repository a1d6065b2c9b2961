"""Parquet table readers for the driver's star schema (TESTDATA.md).

Plain `spark.read.parquet` so Catalyst keeps predicate pushdown, column
pruning, and partition pruning. CSV/JSON/JDBC variants are thin wrappers;
lakehouse formats (Delta/Iceberg) need jars not present in this image and
are gated behind import-try.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in (names or TABLES)}
