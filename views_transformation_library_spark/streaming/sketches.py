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
