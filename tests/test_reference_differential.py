"""Differential tests against the reference library itself (SURVEY.md §5.2).

The reference's core window/scalar module (views_2.py) is pure pandas/numpy
and importable straight from the read-only checkout — no copying, we *run*
it as the behavioral oracle on random panels and assert frame equality with
the Spark operators. Skipped automatically when the checkout (or its deps)
is absent, so the repo stays standalone.
"""

import importlib.util
import os

import numpy as np
import pandas as pd
import pytest

from conftest import collect_panel, make_panel
from views_transformation_library_spark.operators import scalar, temporal

REF = "/root/reference/views_transformation_library/views_2.py"


def _load_reference():
    spec = importlib.util.spec_from_file_location("ref_views_2", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod

ref = None
if os.path.exists(REF):
    try:
        ref = _load_reference()
    except Exception:
        ref = None

pytestmark = pytest.mark.skipif(ref is None, reason="reference checkout not importable")


@pytest.fixture(scope="module")
def rand_panel():
    rng = np.random.RandomState(99)
    times = list(range(100, 124))
    units = [3, 7, 11]
    rows = []
    for u in units:
        for t in times:
            v = float(rng.choice([0.0, 0.0, 0.0, rng.randint(1, 50)]))
            rows.append((t, u, v))
    pdf = pd.DataFrame(rows, columns=["month", "pgid", "ged"])
    series = pdf.set_index(["month", "pgid"]).sort_index()["ged"]
    return rows, series


def _spark_vals(df):
    return {(t, u): v for (u, t, v) in collect_panel(df)}


def _assert_matches(spark_df, ref_series, nullable_prefix=False):
    got = _spark_vals(spark_df)
    for idx, rv in ref_series.items():
        # reference ops built on groupby.apply (rollmax, onset_*) prepend the
        # group key: (pgid, month, pgid) — take the trailing (month, pgid)
        t, u = idx[-2], idx[-1]
        sv = got.get((t, u))
        if pd.isna(rv):
            assert sv is None, (t, u, sv)
        else:
            assert sv == pytest.approx(rv), (t, u, sv, rv)


def test_tlag_matches_reference(spark, rand_panel):
    rows, s = rand_panel
    df = make_panel(spark, rows)
    for k in (1, 3):
        _assert_matches(temporal.tlag(df, k), ref.tlag(s, k))


def test_tlead_matches_reference(spark, rand_panel):
    rows, s = rand_panel
    df = make_panel(spark, rows)
    _assert_matches(temporal.tlead(df, 2), ref.tlead(s, 2))


def test_delta_matches_reference(spark, rand_panel):
    rows, s = rand_panel
    df = make_panel(spark, rows)
    _assert_matches(temporal.delta(df, 2), ref.delta(s, 2))


def test_moving_ops_match_reference(spark, rand_panel):
    rows, s = rand_panel
    df = make_panel(spark, rows)
    _assert_matches(temporal.moving_average(df, 5), ref.moving_average(s, 5))
    _assert_matches(temporal.moving_sum(df, 4), ref.moving_sum(s, 4))
    _assert_matches(temporal.rollmax(df, 3), ref.rollmax(s, 3))


def test_mean_demean_match_reference(spark, rand_panel):
    rows, s = rand_panel
    df = make_panel(spark, rows)
    _assert_matches(temporal.mean(df), ref.mean(s))
    _assert_matches(temporal.demean(df), ref.demean(s))


def test_cweq_matches_reference(spark, rand_panel):
    rows, s = rand_panel
    df = make_panel(spark, rows)
    _assert_matches(temporal.cweq(df, 0), ref.cweq(s, 0))
    _assert_matches(temporal.cweq(df, 0, seed=7), ref.cweq(s, 0, seed=7))


def test_time_since_matches_reference(spark, rand_panel):
    rows, s = rand_panel
    df = make_panel(spark, rows)
    got = _spark_vals(temporal.time_since(df, 0))
    expected = ref.time_since(s, 0)
    # reference output drops the first timestep (lag->dropna); exact keyset match
    assert set(got) == set(expected.index.swaplevel(0, 0))
    for (t, u), rv in expected.items():
        assert got[(t, u)] == rv, (t, u)


def test_onset_matches_reference(spark, rand_panel):
    rows, s = rand_panel
    df = make_panel(spark, rows)
    try:
        expected_op = ref.onset_possible(s, 4)
        expected_on = ref.onset(s, 4)
    except Exception as exc:
        # the reference's own onset_possible crashes on modern pandas
        # (groupby.apply index reordering inside rollmax-of-lag);
        # covered instead by the golden-value tests in test_temporal.py
        pytest.skip(f"reference onset_possible not runnable here: {exc}")
    _assert_matches(temporal.onset_possible(df, 4), expected_op)
    _assert_matches(temporal.onset(df, 4), expected_on)


def test_scalar_ops_match_reference(spark, rand_panel):
    rows, s = rand_panel
    df = make_panel(spark, rows)
    _assert_matches(scalar.ln(df), ref.ln(s))
    _assert_matches(scalar.decay(df, 6.0), ref.decay(s, 6.0))
    _assert_matches(scalar.greater_or_equal(df, 10.0), ref.greater_or_equal(s, 10.0))
    _assert_matches(scalar.smaller_or_equal(df, 10.0), ref.smaller_or_equal(s, 10.0))
    _assert_matches(scalar.in_range(df, 5.0, 20.0), ref.in_range(s, 5.0, 20.0))
