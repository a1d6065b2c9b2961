"""Streaming sessionization (beyond-reference surface).

The batch `relational.sessionize` is the classic gaps-and-islands double
window; when events arrive as a stream the same gap-rule session semantics
become *keyed state*. The invariant that makes the streamed output
batch-EQUIVALENT (tests/test_streaming.py::test_sessionize_stream_batch_equivalence)
is: a session may close ONLY when the event-time watermark has passed
session_end + gap — before that, an in-watermark out-of-order event can
still extend it or BRIDGE it with a later session (observed: watermark 2h,
gap 30min, a deferred middle event re-joining two provisional sessions).
Closing on gap evidence alone (a later event > gap away) is NOT sufficient
when watermark > gap.

State is therefore a bounded LIST of provisional sessions per user —
merged intervals that the watermark has not yet sealed. The bound is
ceil(watermark_horizon / gap) + 1 intervals (each unfinalized session
spans at least one gap of silence inside the watermark horizon), i.e.
constant memory per key; with the common watermark <= gap configuration
the list is length 1. Sessions are emitted when sealed, either on new
data for the key or via EventTimeTimeout (set to the earliest unsealed
session's deadline, so silence seals sessions exactly like data does).

`applyInPandasWithState` keyed by user, shuffled once — the partitioning a
1000-node cluster wants (state store per user-hash partition, no global
ordering anywhere). A streaming engine cannot retro-label individual
events with their session id without holding every event in state, so the
streaming surface emits per-session summaries; the batch operator remains
the per-event labeling path. Late events beyond the watermark are dropped
by the engine before they reach the state function (standard watermark
contract).

Timestamps are carried in state as epoch microseconds (long) — the state
schema stays primitive and timezone-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "starts array<long>, ends array<long>, ns array<long>"


def _make_update(gap_us: int):
    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        (user,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        intervals: list[tuple[int, int, int]] = []
        if state.exists:
            starts, ends, ns = state.get
            intervals.extend(zip(starts, ends, ns))
        if not state.hasTimedOut:
            all_pdfs = [p for p in pdfs if len(p)]
            if all_pdfs:
                pdf = pd.concat(all_pdfs)
                # NULL event times arrive as NaT (they pass the engine's
                # late-row predicate) — drop them before they poison state
                ts = pd.to_datetime(pdf["ts"]).dropna()
                intervals.extend((int(t.value) // 1000,) * 2 + (1,) for t in ts)
        # gap-rule sessionization == interval merging on the start-sorted
        # set (single sweep; Arrow chunk order is irrelevant). Provisional
        # state sessions re-enter the sweep so a bridging event merges them.
        merged: list[tuple[int, int, int]] = []
        for s_us, e_us, n in sorted(intervals):
            if merged and s_us - merged[-1][1] <= gap_us:
                ls, le, ln = merged[-1]
                merged[-1] = (ls, max(le, e_us), ln + n)
            else:
                merged.append((s_us, e_us, n))
        # seal only what the watermark guarantees immutable: any future
        # event has ts >= watermark, and it could touch (s, e) only with
        # ts <= e + gap — so strictly e + gap < watermark means sealed.
        closed = [r for r in merged if r[1] + gap_us < wm_us]
        kept = [r for r in merged if r[1] + gap_us >= wm_us]
        if kept:
            state.update((
                [r[0] for r in kept],
                [r[1] for r in kept],
                [r[2] for r in kept],
            ))
            # fire when the watermark passes the EARLIEST unsealed deadline
            # (ceil to ms so the µs deadline is never undershot)
            deadline_ms = -(-(kept[0][1] + gap_us) // 1000)
            state.setTimeoutTimestamp(deadline_ms)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user] * len(closed),
                "session_start": pd.to_datetime([r[0] for r in closed], unit="us"),
                "session_end": pd.to_datetime([r[1] for r in closed], unit="us"),
                "n_events": [r[2] for r in closed],
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
    n_events) in append mode; one row per closed session, emitted once the
    watermark seals it (batch-equivalent semantics — see module docstring).
    State is a bounded list of provisional sessions per user, shuffled once
    by user.
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
