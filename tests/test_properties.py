"""Property-based tests (hypothesis) for algebraic operator laws
(SURVEY.md §5 point 4 — absent in the reference, added here)."""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from conftest import collect_panel, make_panel
from views_transformation_library_spark.operators import missing, scalar, temporal

panel_values = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False).map(lambda x: round(x, 3)),
    min_size=4,
    max_size=10,
)


@settings(max_examples=6, deadline=None)
@given(vals=panel_values, k=st.integers(min_value=1, max_value=3))
def test_tlag_tlead_roundtrip(spark, vals, k):
    rows = [(t, 1, v) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    out = collect_panel(temporal.tlead(temporal.tlag(df, k), k))
    # interior rows recover the original; edges are null
    for (u, t, v) in out:
        if k <= t < len(vals) - k:
            assert v == pytest.approx(vals[t])


@settings(max_examples=6, deadline=None)
@given(vals=panel_values)
def test_delta_is_s_minus_tlag(spark, vals):
    rows = [(t, 1, v) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    d = [v for (_, _, v) in collect_panel(temporal.delta(df, 1))]
    lag = [v for (_, _, v) in collect_panel(temporal.tlag(df, 1))]
    for i in range(len(vals)):
        if lag[i] is None:
            assert d[i] is None
        else:
            assert d[i] == pytest.approx(vals[i] - lag[i])


@settings(max_examples=6, deadline=None)
@given(vals=st.lists(st.sampled_from([0.0, 0.0, 1.0, 2.0]), min_size=4, max_size=12))
def test_cweq_resets_on_break(spark, vals):
    rows = [(t, 1, v) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    out = [v for (_, _, v) in collect_panel(temporal.cweq(df, 0))]
    run = 0
    for i, v in enumerate(vals):
        run = run + 1 if v == 0.0 else 0
        assert out[i] == run


@settings(max_examples=6, deadline=None)
@given(vals=panel_values)
def test_moving_sum_window_one_is_identity(spark, vals):
    rows = [(t, 1, v) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    out = [v for (_, _, v) in collect_panel(temporal.moving_sum(df, 1))]
    assert out == pytest.approx(vals)


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(min_value=-10, max_value=10, allow_nan=False)),
        min_size=4,
        max_size=10,
    )
)
def test_fill_both_leaves_no_nulls_unless_all_null(spark, vals):
    rows = [(t, 1, v) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    out = [v for (_, _, v) in collect_panel(missing.fill(df, "both", None))]
    if all(v is None for v in vals):
        assert all(v is None for v in out)
    else:
        assert all(v is not None for v in out)


@settings(max_examples=6, deadline=None)
@given(vals=st.lists(st.floats(min_value=0, max_value=50, allow_nan=False), min_size=3, max_size=8))
def test_entropy_bounds(spark, vals):
    rows = [(t, 1, v) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    w = 3
    out = [v for (_, _, v) in collect_panel(temporal.temporal_entropy(df, w, offset=1.0))]
    for v in out:
        assert -1e-9 <= v <= math.log2(w) + 1e-9


@settings(max_examples=6, deadline=None)
@given(vals=panel_values, hl=st.floats(min_value=0.5, max_value=50))
def test_decay_monotone_and_unit_at_zero(spark, vals, hl):
    rows = [(t, 1, abs(v)) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    out = collect_panel(scalar.decay(df, hl))
    for (_, t, v) in out:
        x = abs(vals[t])
        assert v == pytest.approx(2 ** (-x / hl))
