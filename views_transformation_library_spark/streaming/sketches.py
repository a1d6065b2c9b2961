"""Streaming HyperLogLog distinct counting (SURVEY.md §2.8 extension).

Continuous approximate distinct-count per group over an unbounded
stream — the classic streaming-sketch use case (how many distinct users
per event type, ever, in O(m) state per group). The batch operator
(operators/sketches.py:hll_distinct) is a max-aggregate over md5-derived
registers, which makes the streaming form exact-by-construction:

  * the (register index, rank) computation runs JVM-side with the SAME
    column expressions the batch operator uses (operators.sketches._h60,
    unpadded bin() rank) — so streamed state and batch registers can
    never diverge on the hashing;
  * keyed state is one m-byte register array per group (max rho is
    61-p < 256, one byte each) merged by per-element max — idempotent
    and commutative, so replays and out-of-order batches are harmless
    (no watermark needed: the sketch never seals, it only grows);
  * each micro-batch emits the group's updated integer summary
    (n_zero, s_scaled) in update mode. The float estimate is NOT
    computed in python (python round is half-even, Spark round is
    HALF_UP — CLAUDE.md float rules); downstream batch consumers apply
    :func:`operators.sketches.hll_estimate_from_scaled`.

Batch equivalence (the r4 invariant: every stateful streaming op ships
with a streamed == batch test): the final update per group equals
hll_distinct's (n_zero, s_scaled) on the union of all micro-batches —
integer-exact, asserted in tests/test_streaming.py and
tools/check_stream_equiv.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.profiling import _check_percents
from ..operators.sketches import _h60


def hll_distinct_stream(
    events: DataFrame,
    value_col: str,
    group_col: str,
    p: int = 8,
) -> DataFrame:
    """Streaming frame (group_col, n_zero int, s_scaled long), update
    mode: one row per group per micro-batch that touched it, carrying
    the group's current HLL summary. State: m = 2^p bytes per group."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll_distinct_stream: p must be in [4, 16], got {p}")
    m = 1 << p
    bits_w = 60 - p
    kscale = bits_w + 1
    gtype = events.schema[group_col].dataType.simpleString()
    output_schema = f"{group_col} {gtype}, n_zero int, s_scaled long"

    h = _h60(value_col)
    w = F.expr(f"CAST(__hll_h DIV {m} AS BIGINT)")
    rho = F.when(w == 0, F.lit(kscale)).otherwise(
        F.lit(bits_w) - F.length(F.bin(w)) + F.lit(1)
    )
    prep = events.select(F.col(group_col), h.alias("__hll_h")).select(
        group_col,
        (F.col("__hll_h") % m).cast("int").alias("__idx"),
        rho.cast("int").alias("__rho"),
    )

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        (group,) = key
        regs = bytearray(state.get[0]) if state.exists else bytearray(m)
        for pdf in pdfs:
            for idx, r in zip(pdf["__idx"], pdf["__rho"]):
                i = int(idx)
                if r > regs[i]:
                    regs[i] = int(r)
        state.update((bytes(regs),))
        n_zero = sum(1 for b in regs if b == 0)
        s_scaled = sum(1 << (kscale - b) for b in regs)
        yield pd.DataFrame(
            [(group, n_zero, s_scaled)], columns=[group_col, "n_zero", "s_scaled"]
        )

    return prep.groupBy(group_col).applyInPandasWithState(
        _update,
        outputStructType=output_schema,
        stateStructType="regs binary",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

def hist_quantiles_stream(
    events: DataFrame,
    value_col: str,
    group_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 1024,
    percents: list[int] | tuple[int, ...] = (25, 50, 75),
) -> DataFrame:
    """Streaming quantiles per group via the mergeable equi-width
    histogram (the streaming tier of
    :func:`operators.profiling.approx_quantiles_hist`, VERDICT r12 #3).

    Same division of labor as :func:`hll_distinct_stream`:

      * bucket assignment runs JVM-side with the IDENTICAL column
        expression the batch operator uses (clamped
        floor((x − lo)/w), NULL and NaN dropped) — streamed state and
        batch histograms can never diverge on the float step, and the
        Python state function only ever sees integers;
      * keyed state is one int64 count per bucket (8·n_buckets bytes
        per group), merged by element-wise ADDITION — associative and
        commutative, so out-of-order batches are harmless and the
        sketch never seals (no watermark). Unlike the HLL max-merge
        this is NOT idempotent under re-delivery of the same rows;
        exactly-once state updates are the engine's checkpoint
        guarantee (each micro-batch's state version commits atomically
        with the batch), the same contract every counting stream has;
      * each micro-batch emits the group's current quantile selection —
        ALL-INTEGER in Python: cumulative long sums, the exact_quantiles
        ceil rank (p·N + 99) DIV 100, and a searchsorted for the first
        bucket whose cumulative count reaches the rank (provably the
        batch operator's cum >= rank AND cum − c < rank pick: at the
        first such index the previous cumulative is < rank). No float
        is ever computed in Python (CLAUDE.md float rules); edge
        reconstruction lo + bucket·w stays a batch-side projection.

    Output (update mode): (group_col, percent int, bucket int,
    rank long, n long) — the integer columns of the batch operator;
    batch equivalence is asserted in tests/test_streaming.py and
    tools/check_stream_equiv.py.
    """
    percents = _check_percents(percents, "hist_quantiles_stream")
    lo, hi = float(lo), float(hi)
    if not lo < hi:
        raise ValueError(f"hist_quantiles_stream: need lo < hi, got [{lo}, {hi})")
    if n_buckets < 1:
        raise ValueError("hist_quantiles_stream: n_buckets must be >= 1")
    w = (hi - lo) / float(n_buckets)
    gtype = events.schema[group_col].dataType.simpleString()
    output_schema = f"{group_col} {gtype}, percent int, bucket int, rank long, n long"

    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(w)),
        ),
    )
    prep = events.filter(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col).cast("double"))
    ).select(F.col(group_col), bucket.cast("int").alias("__b"))

    def _update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        (group,) = key
        counts = (
            np.frombuffer(state.get[0], dtype="<i8").copy()
            if state.exists
            else np.zeros(n_buckets, dtype="<i8")
        )
        for pdf in pdfs:
            counts += np.bincount(
                pdf["__b"].to_numpy(), minlength=n_buckets
            ).astype("<i8")
        state.update((counts.tobytes(),))
        cum = np.cumsum(counts)
        n = int(cum[-1])
        rows = []
        if n > 0:
            for p in percents:
                rank = (p * n + 99) // 100
                b = int(np.searchsorted(cum, rank, side="left"))
                rows.append((group, p, b, rank, n))
        yield pd.DataFrame(
            rows, columns=[group_col, "percent", "bucket", "rank", "n"]
        )

    return prep.groupBy(group_col).applyInPandasWithState(
        _update,
        outputStructType=output_schema,
        stateStructType="counts binary",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
