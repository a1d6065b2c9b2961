"""Streaming tick_time_since (SURVEY.md §2.8).

The reference's `tick_time_since` (views_2.py:385-418) is explicitly an
*incremental* operator — O(1) per step with state = last (event, time_since)
per unit, built for simulation loops because full recompute per step is too
slow (views_2.py:391-394). That is precisely Structured Streaming keyed
state: `applyInPandasWithState` keyed by unit_id, update
ts = 0 if prev_event else prev_ts + 1.

This is an extension beyond the reference (which is batch-only and has no
late-data semantics): feed it micro-batches of panel rows and it maintains
the counter continuously. Batches are assumed time-ordered per unit within
and across micro-batches (the simulation-loop contract of the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..panel import TIME, UNIT

OUTPUT_SCHEMA = f"{TIME} long, {UNIT} long, event double, time_since long"
STATE_SCHEMA = "last_event double, last_ts long"


def _update(key, pdfs, state: GroupState):
    import pandas as pd

    (unit,) = key
    if state.exists:
        last_event, last_ts = state.get
    else:
        last_event, last_ts = None, None
    # materialize and sort the WHOLE group: Arrow may deliver one unit's
    # batch as several chunks in shuffle order, and a per-chunk sort would
    # process later times first, corrupting the counter and the stored state
    all_pdfs = [p for p in pdfs if len(p)]
    rows = []
    if all_pdfs:
        pdf = pd.concat(all_pdfs).sort_values(TIME)
        for t, ev in zip(pdf[TIME], pdf["event"]):
            if last_event is None:
                ts = 0  # no history: counter starts at 0
            elif last_event != 0.0:
                ts = 0
            else:
                ts = last_ts + 1
            rows.append((int(t), int(unit), float(ev), ts))
            last_event, last_ts = float(ev), ts
    state.update((last_event, last_ts))
    yield pd.DataFrame(rows, columns=[TIME, UNIT, "event", "time_since"])


def tick_time_since_stream(events: DataFrame) -> DataFrame:
    """events: *streaming* DataFrame with columns (time_id, unit_id, event).

    Returns a streaming frame (time_id, unit_id, event, time_since) in
    append mode. Keyed state is one (last_event, last_ts) pair per unit —
    constant memory per key, shuffled once by unit_id.
    """
    return (
        events.groupBy(UNIT)
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
