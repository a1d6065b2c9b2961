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
