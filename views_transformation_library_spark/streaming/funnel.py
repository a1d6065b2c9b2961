"""Streaming ordered-funnel analysis (beyond-reference §2.8 extension).

The batch operator (relational.funnel) is K stacked conditional
window-mins; the streaming form keeps per-user state and RE-DERIVES the
greedy chain from retained candidate times each batch, which makes it
batch-equivalent even under out-of-order arrival: a late step-1 event can
lower t_1, which can make a previously-rejected EARLIER step-2 event
eligible — so per step we retain exactly the candidate times that could
still be chosen (times <= the currently chosen t_k; later times can never
win because chosen times only decrease as events arrive). Emits the
user's current funnel row every time it changes (update mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def funnel_stream(
    stream: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    watermark: str = "1 day",
    state_ttl: str | None = None,
) -> DataFrame:
    """Per-user streaming funnel over event time.

    Output (update mode): (user_id, step_1_ts..step_K_ts, steps_reached)
    — the greedy earliest-completion chain over every event seen so far,
    identical to the batch operator on the same events (batch-equivalence
    tested). State per user: per-step pruned candidate lists (epoch-µs
    longs).

    ``state_ttl`` (e.g. "7 days") bounds TOTAL state at stream scale: a
    user idle for longer than the TTL past the watermark is evicted
    (event-time timeout), so state is (users active within the TTL
    horizon), not (users ever seen). Eviction trades exact all-history
    batch equivalence for bounded memory — an evicted user's later events
    start a fresh funnel (the standard streaming trade, same as
    dropDuplicates' watermark eviction). None (default) keeps exact
    unbounded-history semantics."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    if not steps:
        raise ValueError("funnel_stream needs at least one step")
    k = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}

    out_type = StructType(
        [StructField("user_id", LongType())]
        + [StructField(f"step_{i+1}_ts", LongType()) for i in range(k)]
        + [StructField("steps_reached", IntegerType())]
    )
    state_type = StructType(
        [StructField(f"c{i}", ArrayType(LongType())) for i in range(k)]
    )

    def _chain(cands):
        chosen = []
        prev = None
        for i in range(k):
            best = None
            for t in cands[i]:
                if (prev is None or t > prev) and (best is None or t < best):
                    best = t
            chosen.append(best)
            if best is None:
                break
            prev = best
        while len(chosen) < k:
            chosen.append(None)
        return chosen

    import pandas as pd

    ttl_ms = (
        None if state_ttl is None else int(pd.Timedelta(state_ttl).total_seconds() * 1000)
    )

    def _update(key, pdfs, state):
        import pandas as pd

        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        cands = [list(state.get[i]) for i in range(k)] if state.exists else [
            [] for _ in range(k)
        ]
        before = _chain(cands)
        changed = False
        for pdf in pdfs:
            for et, ts in zip(pdf["__type"].values, pdf["__ts_us"].values):
                i = step_idx.get(et)
                if i is None:
                    continue
                cands[i].append(int(ts))
                changed = True
        if not changed:
            return
        chosen = _chain(cands)
        # prune: per step keep only candidates <= the chosen time (chosen
        # times only decrease, so later candidates can never win)
        for i in range(k):
            if chosen[i] is not None:
                cands[i] = sorted(t for t in cands[i] if t <= chosen[i])
            else:
                cands[i] = sorted(set(cands[i]))
        state.update(tuple(cands))
        if ttl_ms is not None:
            # evict once the event-time watermark is TTL past now — state
            # is (users active within the TTL horizon), never all users
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttl_ms)
        if chosen != before:
            reached = sum(1 for t in chosen if t is not None)
            yield pd.DataFrame(
                [[key[0], *chosen, reached]],
                columns=["user_id"]
                + [f"step_{i+1}_ts" for i in range(k)]
                + ["steps_reached"],
            )

    prepared = stream.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("__ts"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__ts_us"),
        F.col(type_col).alias("__type"),
    )
    return (
        prepared.withWatermark("__ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            out_type,
            state_type,
            "update",
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.EventTimeTimeout,
        )
    )
