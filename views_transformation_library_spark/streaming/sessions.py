"""Streaming sessionization (beyond-reference surface).

The batch `relational.sessionize` is the classic gaps-and-islands double
window; when events arrive as a stream the same 30-minute-gap session
semantics become *keyed state*: one open session per user, closed either by
an explicit gap (a later event arrives more than `gap` after the session's
end) or by event-time timeout (the watermark passes session_end + gap, so
no in-horizon event can extend it — exactly the gap rule, enforced lazily).

`applyInPandasWithState` keyed by user with EventTimeTimeout: state is a
single (start, end, n_events) triple per user — constant memory per key —
and sessions are emitted only when they CLOSE (append mode). A streaming
engine cannot retro-label individual events with their session id without
holding every event in state, so the streaming surface emits per-session
summaries; the batch operator remains the per-event labeling path. Late
events beyond the watermark are dropped by the engine before they reach
the state function (standard watermark contract).

Timestamps are carried in state as epoch microseconds (long) — the state
schema stays primitive and timezone-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start_us long, end_us long, n long"


def _make_update(gap_us: int):
    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        (user,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            closed.append((user, start_us, end_us, n))
            state.remove()
        else:
            all_pdfs = [p for p in pdfs if len(p)]
            # the open session participates in the sweep as an interval, so
            # an in-watermark event that precedes it (out-of-order arrival,
            # e.g. watermark > gap) merges or splits correctly instead of
            # being folded into a session that started after it
            intervals: list[tuple[int, int, int]] = (
                [state.get] if state.exists else []
            )
            if all_pdfs:
                pdf = pd.concat(all_pdfs)
                # NULL event times arrive as NaT (they pass the engine's
                # late-row predicate) — drop them before they poison state
                ts = pd.to_datetime(pdf["ts"]).dropna()
                intervals.extend((int(t.value) // 1000,) * 2 + (1,) for t in ts)
            # gap-rule sessionization == interval merging on the start-sorted
            # set (single sweep; Arrow chunk order is irrelevant)
            cur = None
            for s_us, e_us, n in sorted(intervals):
                if cur is None:
                    cur = (s_us, e_us, n)
                elif s_us - cur[1] > gap_us:
                    closed.append((user, *cur))
                    cur = (s_us, e_us, n)
                else:
                    cur = (cur[0], max(cur[1], e_us), cur[2] + n)
            if cur is not None:
                state.update(cur)
                # close when no in-horizon event can extend the session
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in closed],
                "session_start": pd.to_datetime([r[1] for r in closed], unit="us"),
                "session_end": pd.to_datetime([r[2] for r in closed], unit="us"),
                "n_events": [r[3] for r in closed],
            }
        )

    return _update


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """events: *streaming* frame with (ts_col timestamp, user_col long).

    Returns a streaming frame (user_id, session_start, session_end,
    n_events) in append mode; one row per closed session. State is one open
    session per user, shuffled once by user — the partitioning a 1000-node
    cluster wants (state store per user-hash partition, no global ordering
    anywhere).
    """
    from pyspark.sql import functions as F

    gap_us = int(gap_minutes) * 60 * 1_000_000
    keyed = (
        events.withWatermark(ts_col, watermark)
        .select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
        .groupBy("user_id")
    )
    return keyed.applyInPandasWithState(
        _make_update(gap_us),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
