"""Streaming trailing-window aggregates (SURVEY.md §2.8 extension).

The reference's moving_sum/moving_average are batch row-frame windows; when
the panel arrives as a stream of timestamped events, the equivalents are
sliding event-time windows with a watermark for late data — semantics the
reference does not have (batch-only), provided here as the streaming
extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sliding_sum_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    window: str = "7 days",
    slide: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Per-key sliding-window sum over event time with late-data handling.

    Output: (window_start, window_end, key, moving_sum, n_events). The
    watermark bounds state: windows older than (max event time - watermark)
    are finalized and dropped from the state store — constant memory per key
    regardless of stream length.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window, slide).alias("__w"),
            F.col(key_col).alias("unit_id"),
        )
        .agg(
            F.sum(value_col).alias("moving_sum"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            "unit_id",
            "moving_sum",
            "n_events",
        )
    )
