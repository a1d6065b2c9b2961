import math

import pytest

from conftest import collect_panel, make_panel
from views_transformation_library_spark.operators import temporal


def vals(df):
    return [v for (_, _, v) in collect_panel(df)]


@pytest.fixture()
def two_units(spark):
    # unit 10: 1,2,3,4 ; unit 11: 10,20,30,40 over times 1..4
    rows = [(t, 10, float(t)) for t in range(1, 5)] + [
        (t, 11, 10.0 * t) for t in range(1, 5)
    ]
    return make_panel(spark, rows)


def test_tlag_tlead_delta(two_units):
    assert vals(temporal.tlag(two_units, 1)) == [None, 1.0, 2.0, 3.0, None, 10.0, 20.0, 30.0]
    assert vals(temporal.tlead(two_units, 2)) == [3.0, 4.0, None, None, 30.0, 40.0, None, None]
    assert vals(temporal.delta(two_units, 1)) == [None, 1.0, 1.0, 1.0, None, 10.0, 10.0, 10.0]
    with pytest.raises(ValueError):
        temporal.tlag(two_units, 0)


def test_moving_windows(two_units):
    # min_periods=0 semantics: window shrinks at start, no nulls introduced
    assert vals(temporal.moving_average(two_units, 2)) == [1.0, 1.5, 2.5, 3.5, 10.0, 15.0, 25.0, 35.0]
    assert vals(temporal.moving_sum(two_units, 3)) == [1.0, 3.0, 6.0, 9.0, 10.0, 30.0, 60.0, 90.0]
    assert vals(temporal.rollmax(two_units, 2)) == [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0]
    # moving_sum(1) == identity (property from SURVEY §5)
    assert vals(temporal.moving_sum(two_units, 1)) == vals(two_units)


def test_mean_demean(two_units):
    assert vals(temporal.mean(two_units)) == [2.5] * 4 + [25.0] * 4
    assert vals(temporal.demean(two_units)) == [-1.5, -0.5, 0.5, 1.5, -15.0, -5.0, 5.0, 15.0]


def test_cweq_reference_docstring_example(spark):
    # reference views_2.py:255-258: event 0,0,1,1,0,0 -> cweq(value=0): 1,2,0,0,1,2
    rows = [(t, 1, v) for t, v in zip(range(1, 7), [0.0, 0.0, 1.0, 1.0, 0.0, 0.0])]
    df = make_panel(spark, rows)
    assert vals(temporal.cweq(df, 0)) == [1, 2, 0, 0, 1, 2]


def test_time_since_reference_docstring_example(spark):
    # reference views_2.py:255-258: tisiev: ., 1, 2, 0, 0, 1 (first time dropped)
    rows = [(t, 1, v) for t, v in zip(range(1, 7), [0.0, 0.0, 1.0, 1.0, 0.0, 0.0])]
    df = make_panel(spark, rows)
    out = collect_panel(temporal.time_since(df, 0))
    assert [t for (_, t, _) in out] == [2, 3, 4, 5, 6]
    assert [v for (_, _, v) in out] == [1, 2, 0, 0, 1]


def test_cweq_seed(spark):
    # seed preloads the count at the first timestep when condition holds there
    rows = [(t, 1, v) for t, v in zip(range(1, 5), [0.0, 0.0, 1.0, 0.0])]
    df = make_panel(spark, rows)
    assert vals(temporal.cweq(df, 0, seed=100)) == [100, 101, 0, 1]
    # seed NOT applied when condition fails at first timestep
    rows2 = [(t, 1, v) for t, v in zip(range(1, 5), [5.0, 0.0, 0.0, 0.0])]
    df2 = make_panel(spark, rows2)
    assert vals(temporal.cweq(df2, 0, seed=100)) == [0, 1, 2, 3]


def test_cweq_multi_unit_and_nulls(spark):
    rows = [
        (1, 1, 0.0), (2, 1, None), (3, 1, 0.0), (4, 1, 2.0),
        (1, 2, 0.0), (2, 2, 0.0), (3, 2, 0.0), (4, 2, 0.0),
    ]
    df = make_panel(spark, rows)
    out = collect_panel(temporal.cweq(df, 0))
    # null row dropped (reference dropna views_2.py:211); count continues across it
    assert out == [(1, 1, 1), (1, 3, 2), (1, 4, 0), (2, 1, 1), (2, 2, 2), (2, 3, 3), (2, 4, 4)]


def test_onset(spark):
    # values: 0,0,0,5,0,0,7 ; window=2
    rows = [(t, 1, v) for t, v in zip(range(1, 8), [0.0, 0.0, 0.0, 5.0, 0.0, 0.0, 7.0])]
    df = make_panel(spark, rows)
    assert vals(temporal.onset_possible(df, 2)) == [1, 1, 1, 1, 0, 0, 1]
    assert vals(temporal.onset(df, 2)) == [0, 0, 0, 1, 0, 0, 1]
    # window=3: onset at t=7 no longer possible (5.0 at t=4 within 3 lagged rows)
    assert vals(temporal.onset(df, 3)) == [0, 0, 0, 1, 0, 0, 0]


def test_tick_time_since(spark):
    rows = [
        (t, 1, ev, ts)
        for t, ev, ts in [
            (1, 0.0, 1.0), (2, 0.0, 2.0), (3, 1.0, 0.0), (4, 0.0, 1.0)
        ]
    ]
    df = make_panel(spark, rows, cols=("time_id", "unit_id", "event", "ts"))
    out = collect_panel(
        temporal.tick_time_since(df, "event", "ts"), value_cols=["tick_time_since"]
    )
    # t=2: no event at t=1 -> ts(1)+1 = 2 ; t=4: event at t=3 -> 0
    assert out == [(1, 2, 2.0), (1, 3, 3.0), (1, 4, 0.0)]


def test_tlags3d(spark):
    rows = [(t, 1, float(t), 100.0 + t) for t in range(1, 4)]
    df = make_panel(spark, rows, cols=("time_id", "unit_id", "a", "b"))
    out = temporal.tlags3d(df, lags=[1, 2])
    assert set(out.columns) == {"time_id", "unit_id", "a_tlag_1", "a_tlag_2", "b_tlag_1", "b_tlag_2"}
    got = collect_panel(out, value_cols=["a_tlag_1", "a_tlag_2", "b_tlag_1", "b_tlag_2"])
    # out-of-range lags are 0.0, not NULL (reference tensor zeros tlag3d.py:72-75)
    assert got[0] == (1, 1, 0.0, 0.0, 0.0, 0.0)
    assert got[1] == (1, 2, 1.0, 0.0, 101.0, 0.0)
    assert got[2] == (1, 3, 2.0, 1.0, 102.0, 101.0)


def test_temporal_entropy(spark):
    # window fully uniform -> entropy = log2(window)
    rows = [(t, 1, 1.0) for t in range(1, 5)]
    df = make_panel(spark, rows)
    out = vals(temporal.temporal_entropy(df, 3))
    assert out[0] == pytest.approx(0.0)  # single-element window
    assert out[1] == pytest.approx(1.0)
    assert out[2] == pytest.approx(math.log2(3))
    assert out[3] == pytest.approx(math.log2(3))
    # distribution (1,3): H = -(1/4 log2 1/4 + 3/4 log2 3/4)
    rows2 = [(1, 1, 1.0), (2, 1, 3.0)]
    df2 = make_panel(spark, rows2)
    expected = -(0.25 * math.log2(0.25) + 0.75 * math.log2(0.75))
    assert vals(temporal.temporal_entropy(df2, 2))[1] == pytest.approx(expected)


def test_standardize(two_units):
    # unit 10: 1,2,3,4 -> mean 2.5, pop sigma = sqrt(1.25)
    out = vals(temporal.standardize(two_units))
    sig = math.sqrt(1.25)
    exp = [round((x - 2.5) / sig, 6) for x in (1.0, 2.0, 3.0, 4.0)]
    assert out[:4] == pytest.approx(exp, abs=1e-9)
    # unit 11 is 10x unit 10: identical z-scores (scale invariance)
    assert out[4:] == out[:4]


def test_standardize_constant_series_is_null(spark):
    pn = make_panel(spark, [(t, 1, 7.0) for t in range(1, 4)])
    assert vals(temporal.standardize(pn)) == [None, None, None]


def test_rolling_median(spark):
    pn = make_panel(
        spark, [(t, 1, v) for t, v in enumerate([5.0, 1.0, 9.0, 3.0, 7.0])]
    )
    # window=3, lower-middle median: [5], [1,5], [1,5,9], [1,3,9], [3,7,9]
    assert vals(temporal.rolling_median(pn, 3)) == [5.0, 1.0, 5.0, 3.0, 7.0]


def test_mad_outliers(spark):
    # unit 1: tight cluster + one wild value; unit 2: constant (MAD 0)
    rows = [(t, 1, v) for t, v in enumerate([10.0, 11.0, 9.0, 10.0, 100.0])]
    rows += [(t, 2, 5.0) for t in range(3)]
    pn = make_panel(spark, rows)
    out = {(r["unit_id"], r["time_id"]): r
           for r in temporal.mad_outliers(pn, k=3.0).collect()}
    # unit 1: sorted [9,10,10,11,100] -> median 10; |x-10| sorted
    # [0,0,1,1,90] -> MAD 1; only 100 exceeds 10 +/- 3
    assert out[(1, 4)]["is_outlier"] == 1 and out[(1, 4)]["unit_mad"] == 1.0
    assert all(out[(1, t)]["is_outlier"] == 0 for t in range(4))
    # constant unit: MAD 0 -> nothing beats the threshold
    assert all(out[(2, t)]["is_outlier"] == 0 for t in range(3))


def test_ewma_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(11)
    rows = [(t, u, float(rng.randn())) for u in (1, 2) for t in range(40)]
    pn = make_panel(spark, rows)
    out = temporal.ewma(pn, alpha=0.25).collect()
    got = {(r["unit_id"], r["time_id"]): r["value"] for r in out}
    pdf = pd.DataFrame(rows, columns=["time_id", "unit_id", "value"])
    for u, grp in pdf.groupby("unit_id"):
        exp = grp.sort_values("time_id")["value"].ewm(alpha=0.25, adjust=False).mean()
        for t, e in zip(sorted(grp["time_id"]), exp):
            assert got[(u, t)] == pytest.approx(e, rel=1e-12)


def test_ewma_null_rows_skip_state(spark):
    pn = make_panel(spark, [(0, 1, 2.0), (1, 1, None), (2, 1, 4.0)])
    out = {r["time_id"]: r["value"] for r in temporal.ewma(pn, alpha=0.5).collect()}
    assert out[0] == 2.0 and out[1] is None
    assert out[2] == pytest.approx(0.5 * 4.0 + 0.5 * 2.0)


def test_ewma_alpha_validation(spark):
    pn = make_panel(spark, [(0, 1, 1.0)])
    with pytest.raises(ValueError):
        temporal.ewma(pn, alpha=0.0)


def test_cusum_detects_level_shift(spark):
    # flat series then a sustained +3σ-ish shift: alarm fires after the shift
    vals = [10.0, 10.2, 9.8, 10.0, 10.1, 9.9] * 3 + [14.0] * 6
    pn = make_panel(spark, [(t, 1, v) for t, v in enumerate(vals)])
    out = sorted(
        (r["time_id"], r["cusum_pos"], r["cusum_alarm"])
        for r in temporal.cusum(pn, k=0.5, h=4.0).collect()
    )
    pre = [a for (t, _, a) in out if t < 18]
    post = [a for (t, _, a) in out if t >= 21]
    assert not any(pre)
    assert all(post)
    # statistic is nonnegative and monotone while the shift persists
    shift = [p for (t, p, _) in out if t >= 18]
    assert all(b >= a for a, b in zip(shift, shift[1:]))


def test_cusum_constant_series_never_alarms(spark):
    pn = make_panel(spark, [(t, 1, 7.0) for t in range(5)])
    out = temporal.cusum(pn).collect()
    assert all(r["cusum_alarm"] == 0 and r["cusum_pos"] == 0.0 for r in out)


def test_winsorize_clips_to_data_values(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    pn = make_panel(spark, [(t, 1, v) for t, v in enumerate(vals)])
    out = sorted(r["value"] for r in temporal.winsorize(pn, 0.0, 0.75).collect())
    # qhi = sorted[floor(0.75*4)+1] = 4.0 -> 100 clips to 4; qlo = min
    assert out == [1.0, 2.0, 3.0, 4.0, 4.0]
    # identity when bounds are the full range
    ident = sorted(r["value"] for r in temporal.winsorize(pn, 0.0, 1.0).collect())
    assert ident == sorted(vals)
