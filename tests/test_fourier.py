"""Fourier lag: Spark plumbing differential vs the local slice solver, plus
the reference's output-scaling invariants (rescale to input max, zero level
subtracted)."""

import numpy as np
import pytest

from conftest import collect_panel, make_panel
from views_transformation_library_spark.operators import fourier


@pytest.fixture()
def grid16(spark):
    rng = np.random.RandomState(11)
    vals = rng.rand(4, 4) * 10
    rows = []
    for month in (5, 6):
        for lat in range(4):
            for lon in range(4):
                v = float(vals[lon, lat]) * (1 if month == 5 else 2)
                rows.append((month, lat * 720 + lon, v))
    return make_panel(spark, rows), vals


def test_fourier_matches_local_solver(grid16):
    df, vals = grid16
    got = {
        (t, u): v for (u, t, v) in collect_panel(fourier.fourier_lag(df))
    }
    lons = np.array([lon for lat in range(4) for lon in range(4)])
    lats = np.array([lat for lat in range(4) for lon in range(4)])
    elons, elats, ncells = fourier._embedding(lons, lats)
    for month, scale in ((5, 1.0), (6, 2.0)):
        grid = np.zeros((ncells, ncells))
        grid[elons, elats] = (vals * scale)[lons, lats]
        solved = fourier._solve_slice(grid)
        for i in range(16):
            u = lats[i] * 720 + lons[i]
            assert got[(month, u)] == pytest.approx(solved[elons[i], elats[i]]), (month, u)


def test_fourier_invariants(grid16):
    df, vals = grid16
    out = collect_panel(fourier.fourier_lag(df))
    by_month = {}
    for (u, t, v) in out:
        by_month.setdefault(t, []).append(v)
    for month, scale in ((5, 1.0), (6, 2.0)):
        mx = max(by_month[month])
        # rescaled so the slice max is bounded by the input max (phimax >= max -> <=)
        assert mx <= vals.max() * scale + 1e-9
        assert all(v >= -1e-9 for v in by_month[month])


def test_fourier_3d_matches_local_solver(grid16):
    df, vals = grid16
    got = {(t, u): v for (u, t, v) in collect_panel(fourier.fourier_lag(df, dimensionality=3))}
    lons = np.array([lon for lat in range(4) for lon in range(4)])
    lats = np.array([lat for lat in range(4) for lon in range(4)])
    elons, elats, ncells = fourier._embedding(lons, lats)
    grid = np.zeros((ncells, ncells))
    grid[elons, elats] = vals[lons, lats]
    solved = fourier._solve_slice_3d(grid)
    for i in range(16):
        u = lats[i] * 720 + lons[i]
        assert got[(5, u)] == pytest.approx(solved[elons[i], elats[i]]), u


def test_fourier_bad_dimensionality(grid16):
    df, _ = grid16
    with pytest.raises(ValueError):
        fourier.fourier_lag(df, dimensionality=4)


# ---------------------------------------------------------------------------
# Reference goldens: generated ONCE from /root/reference's get_fourier_lag
# run verbatim on this fixture (tools/gen_fourier_goldens.py; the reference's
# np.fft solvers run in this env with its unused scipy/xarray imports
# stubbed). A value-level cross-check beyond the local-solver differential.
REFERENCE_GOLDENS = {
    2: {
        (5, 0): 2.5615869078107214,
        (5, 1): 6.916854628096141,
        (5, 2): 2.907954052859134,
        (5, 720): 3.452530090664697,
        (5, 721): 8.662716069939036,
        (5, 722): 7.812012859395492,
        (5, 1440): 4.6648006544494445,
        (5, 1441): 8.426563855423762,
        (5, 1442): 9.418066523433662,
        (6, 0): 5.123173815621443,
        (6, 1): 13.833709256192282,
        (6, 2): 5.815908105718268,
        (6, 720): 6.905060181329394,
        (6, 721): 17.32543213987807,
        (6, 722): 15.624025718790984,
        (6, 1440): 9.329601308898889,
        (6, 1441): 16.853127710847524,
        (6, 1442): 18.836133046867324,
    },
    3: {
        (5, 0): 2.5615869562304074,
        (5, 1): 6.916854630581325,
        (5, 2): 2.907953604008537,
        (5, 720): 3.452529580390188,
        (5, 721): 8.662715484137587,
        (5, 722): 7.812012493564183,
        (5, 1440): 4.664800475477612,
        (5, 1441): 8.426563297145607,
        (5, 1442): 9.418066523433662,
        (6, 0): 5.123173912460815,
        (6, 1): 13.83370926116265,
        (6, 2): 5.815907208017074,
        (6, 720): 6.905059160780376,
        (6, 721): 17.325430968275175,
        (6, 1440): 9.329600950955223,
        (6, 722): 15.624024987128365,
        (6, 1441): 16.853126594291215,
        (6, 1442): 18.836133046867324,
    },
}


@pytest.fixture()
def grid9(spark):
    rng = np.random.RandomState(11)
    vals = rng.rand(3, 3) * 10
    rows = []
    for month in (5, 6):
        for lat in range(3):
            for lon in range(3):
                v = float(vals[lon, lat]) * (1 if month == 5 else 2)
                rows.append((month, lat * 720 + lon, v))
    return make_panel(spark, rows)


@pytest.mark.parametrize("dim", [2, 3])
def test_fourier_matches_reference_goldens(grid9, dim):
    got = {
        (t, u): v
        for (u, t, v) in collect_panel(fourier.fourier_lag(grid9, dimensionality=dim))
    }
    assert set(got) == set(REFERENCE_GOLDENS[dim])
    for key, expected in REFERENCE_GOLDENS[dim].items():
        assert got[key] == pytest.approx(expected, rel=1e-9), key
