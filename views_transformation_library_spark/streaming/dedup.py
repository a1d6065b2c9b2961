"""Streaming exact deduplication (beyond-reference surface).

A streaming ingest pipeline drops exact duplicates as documents arrive:
fingerprint each document (same normalized-md5 as batch
``dedup.exact_dedup``) and keep the first occurrence per fingerprint.
``dropDuplicates`` with a watermark bounds the dedup state: fingerprints
older than the watermark horizon are evicted, so state is (active
fingerprints within horizon), not the full history — the standard
bounded-state streaming dedup. Exactly mirrors batch semantics for any
duplicate arriving within the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 day",
) -> DataFrame:
    """Drop exact-duplicate documents from a stream, keeping firsts.

    Output: the input rows minus later duplicates, plus the fingerprint
    column (useful downstream for cross-batch joins)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    with_fp = stream.withColumn("fingerprint", F.md5(norm))
    return with_fp.withWatermark(ts_col, watermark).dropDuplicates(["fingerprint"])
