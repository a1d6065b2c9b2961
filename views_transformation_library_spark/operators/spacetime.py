"""Spacetime kNN distances (SURVEY.md §2.4 #38, reference spacetime_distance.py).

The reference rebuilds a cKDTree over all past events for every timestep and
queries every grid cell against it (`spacetime_distance.py:84-211`), with a
hard cap at 600 timesteps as a performance workaround (`:127`).

Spark-first re-expression: events (cells with value > 0) are *sparse*
relative to the grid in the conflict-data setting, so the whole event set
collapses into one broadcast array row, and each target cell filters/
scores/sorts/slices it with higher-order array functions — exact top-k
with ZERO shuffles and no 600-step cap; work is |cells| x |events| fused
distance evaluations inside whole-stage codegen. (For dense event sets,
fall back to a per-time-slice applyInPandas cKDTree — not needed for
parity tests.)

Distance space (reference `:110,135-140`): (lon·0.5°, lat·0.5°, ν·t) with t
in *index* units — for a dense time axis, differences of raw time_ids equal
index differences, and distances only use differences, so raw keys work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..panel import KEYS, TIME, UNIT, one_feature
from .spatial_grid import PG_STRIDE, with_grid_coords

PGID_TO_DEGREES = 0.5  # reference spacetime_distance.py:110
NO_EVENT_SENTINEL = 999.0  # reference spacetime_distance.py:151


def spacetime_distances(
    df: DataFrame,
    return_values: str = "distances",
    k: int = 1,
    nu: float = 1.0,
    power: float = 0.0,
    stride: int = PG_STRIDE,
    col: str | None = None,
    out: str | None = None,
) -> DataFrame:
    """For every (cell, t): the k nearest past-or-present events (value > 0)
    in (x, y, ν·t) space; returns the mean distance ('distances') or the
    mean of event_size/d^power with d==0 ⇒ raw size ('weights')
    (reference `spacetime_distance.py:151-182`). Cells with no events yet
    get 999.0.

    Divergences (documented): no 600-timestep cap (reference `:127`); when
    fewer than k events exist the mean is over the available ones (cKDTree
    pads with inf distances); equidistant ties broken deterministically by
    (t_e, unit_e).
    """
    col = col or one_feature(df)
    cells = with_grid_coords(df, stride)
    events = cells.filter(F.col(col) > 0).select(
        F.col(TIME).alias("__te"),
        F.col(UNIT).alias("__ue"),
        F.col("__lon").alias("__elon"),
        F.col("__lat").alias("__elat"),
        F.col(col).alias("__size"),
    )
    # ZERO-shuffle plan: the sparse event set is collapsed into ONE array row
    # and broadcast-cross-joined; per target cell, filter/score/sort/slice the
    # array with higher-order functions — all whole-stage codegen, no 20M-row
    # join output, no window shuffle. Ranking is on squared distance (sqrt
    # deferred to the k winners); struct field order (d2, te, ue) makes
    # array_sort reproduce the deterministic tie-break.
    ev_row = events.agg(
        F.collect_list(F.struct("__te", "__ue", "__elon", "__elat", "__size")).alias("__evs")
    )
    targets = cells.select(*KEYS, "__lon", "__lat")
    joined = targets.crossJoin(F.broadcast(ev_row))
    t, lon, lat = F.col(TIME), F.col("__lon"), F.col("__lat")
    past = F.filter("__evs", lambda e: e["__te"] <= t)
    scored = F.transform(
        past,
        lambda e: F.struct(
            (
                ((lon - e["__elon"]) * PGID_TO_DEGREES) ** 2
                + ((lat - e["__elat"]) * PGID_TO_DEGREES) ** 2
                + (F.lit(float(nu)) * (t - e["__te"])) ** 2
            ).alias("d2"),
            e["__te"].alias("te"),
            e["__ue"].alias("ue"),
            e["__size"].alias("sz"),
        ),
    )
    topk = F.slice(F.array_sort(scored), 1, k)
    n = F.size(topk)
    if return_values == "distances":
        total = F.aggregate(topk, F.lit(0.0), lambda acc, e: acc + F.sqrt(e["d2"]))
    else:
        total = F.aggregate(
            topk,
            F.lit(0.0),
            lambda acc, e: acc
            + F.when(e["d2"] == 0.0, e["sz"]).otherwise(
                e["sz"] / F.pow(e["d2"], F.lit(float(power) / 2.0))
            ),
        )
    val = F.when(n > 0, total / n).otherwise(F.lit(NO_EVENT_SENTINEL))
    return joined.select(TIME, UNIT, val.alias(out or col))
