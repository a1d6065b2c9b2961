"""Incremental panel maintenance (SURVEY.md §2.8 extension).

The engine's domain object — the (time_id, unit_id, value) panel — is a
per-day per-unit aggregate of the events stream (`panel.panel_from_events`
in batch). At 100 TB the batch rebuild re-reads the whole history for the
sake of the newest day; this streaming form maintains the same aggregate
incrementally: one windowed streaming aggregation, watermark-bounded
state, each finalized (day, unit) cell emitted exactly once (append mode)
when the watermark proves the day complete.

Same float discipline as batch: the cell value is an exact DECIMAL(18,2)
sum cast to double, so a cell emitted by the stream is BYTE-IDENTICAL to
the batch aggregate of the same events (batch-equivalence tested) —
accumulation order never enters. Densify (grid completion) remains a
batch/post step by design: absent cells are a property of the finished
grid, not of any event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..panel import TIME, UNIT


def panel_from_events_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    unit_col: str = "user_id",
    value_col: str = "value",
    event_type: str | None = None,
    type_col: str = "event_type",
    watermark: str = "2 days",
) -> DataFrame:
    """Streaming (time_id, unit_id, value) aggregation over an event
    stream with a TIMESTAMP ``ts_col``.

    State per key is one running DECIMAL sum for each (day window, unit)
    inside the watermark horizon — evicted when the watermark passes the
    day's end, at which point the cell is emitted (append mode). Output
    schema matches the batch panel: time_id = epoch day of the window
    start, unit_id, value = exact decimal sum in double.
    """
    ev = stream
    if event_type is not None:
        ev = ev.filter(F.col(type_col) == event_type)
    agg = (
        ev.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), "1 day").alias("__day"),
            F.col(unit_col).alias(UNIT),
        )
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("value")
        )
    )
    return agg.select(
        # TZ-independent epoch day: F.window's 1-day buckets are UTC-epoch
        # aligned, but to_date() reads the session TZ — in a non-UTC driver
        # session every time_id would shift a day vs the batch panel (which
        # forces UTC on itself in read_events). Integer div on unix_micros
        # never consults the session TZ.
        F.expr("unix_micros(__day.start) div 86400000000")
        .cast("long")
        .alias(TIME),
        UNIT,
        "value",
    )
