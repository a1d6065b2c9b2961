"""Skew-handling helpers for hot keys at scale.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in `session.get_spark`) covers sort-merge joins at runtime. For
*aggregations* over pathologically hot keys — e.g. a shingle appearing in
millions of documents, or one unit owning half the panel — two-phase salted
aggregation keeps every task bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    agg_cols: list[str],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase sum: groupBy(keys, salt) partial-aggregates hot keys across
    `n_salts` tasks, then a second tiny groupBy(keys) combines. Equivalent
    to a plain groupBy().sum() but the first shuffle spreads each key over
    n_salts reducers.

    (Spark's hash aggregate already does map-side partial aggregation; the
    salt matters when the *reduce* side of a single key exceeds one task —
    i.e. high-cardinality values per key with memory-heavy aggregates.)
    """
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[F.sum(c).alias(c) for c in agg_cols]
    )
    return partial.groupBy(*key_cols).agg(*[F.sum(c).alias(c) for c in agg_cols])


def with_salted_key(df: DataFrame, key_col: str, n_salts: int = 16, out: str = "__salted_key") -> DataFrame:
    """Append a salted join key for replicate-broadcast skew joins: the
    skewed fact side gets key||salt(random-ish but deterministic per row);
    the dim side must be exploded across all salts via `explode_salts`."""
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))
    return df.withColumn(out, F.concat_ws("#", F.col(key_col).cast("string"), salt.cast("string")))


def explode_salts(dim: DataFrame, key_col: str, n_salts: int = 16, out: str = "__salted_key") -> DataFrame:
    """Replicate each dim row across every salt value so a salted fact key
    always finds its match."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    return dim.withColumn("__s", salts).withColumn(
        out, F.concat_ws("#", F.col(key_col).cast("string"), F.col("__s").cast("string"))
    ).drop("__s")
