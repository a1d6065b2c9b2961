"""Spatial operators: golden values from the reference's own tests
(test_spacetime_distance.py, test_splag_country.py) + kernel properties."""

import math

import pytest
from pyspark.sql import functions as F

from conftest import collect_panel, make_panel
from views_transformation_library_spark.operators import spatial_grid, spatial_graph, spacetime


# ---------------------------------------------------------------------------
# splag4d

def test_kernel_offsets_ring():
    # inner=1, width=1 -> 8 neighbours, self excluded, weights 1
    offs = spatial_grid.kernel_offsets(1, 1, 0, 0)
    assert len(offs) == 8
    assert (0, 0, 1.0) not in offs
    assert all(w == 1.0 for _, _, w in offs)
    # norm_kernel=1 -> weights sum to 1 (splag4d.py:115-116)
    offs_n = spatial_grid.kernel_offsets(1, 1, 0, 1)
    assert sum(w for _, _, w in offs_n) == pytest.approx(1.0)
    # power weighting: diagonal neighbour at r=sqrt(2) gets 2^(-p/2)
    offs_p = dict(((dx, dy), w) for dx, dy, w in spatial_grid.kernel_offsets(1, 1, 2, 0))
    assert offs_p[(1, 0)] == pytest.approx(1.0)
    assert offs_p[(1, 1)] == pytest.approx(0.5)
    # inner=0 includes the centre with weight 1 (0^0 == 1)
    offs_0 = dict(((dx, dy), w) for dx, dy, w in spatial_grid.kernel_offsets(0, 1, 0, 0))
    assert offs_0[(0, 0)] == 1.0


@pytest.fixture()
def grid9(spark):
    # 3x3 pgid block (stride 720): lon 0..2, lat 0..2, single month
    pgids = [0, 1, 2, 720, 721, 722, 1440, 1441, 1442]
    rows = [(100, p, 1.0 if p == 721 else 0.0) for p in pgids]
    return make_panel(spark, rows)


def test_splag4d_single_event(grid9):
    # unit 721 = centre of the 3x3 block; 8-neighbour sum: neighbours get 1, centre 0
    out = {u: v for (u, _, v) in collect_panel(spatial_grid.splag4d(grid9, 1, 1, 0, 0))}
    assert out[721] == 0.0
    for p in [0, 1, 2, 720, 722, 1440, 1441, 1442]:
        assert out[p] == 1.0, p


def test_splag4d_identity_kernel(grid9):
    # inner=0, width=1 -> 1x1 kernel = pure identity (size 2*(0+1)-1 = 1)
    out = {u: v for (u, _, v) in collect_panel(spatial_grid.splag4d(grid9, 0, 1, 0, 0))}
    assert out[721] == 1.0  # self
    assert out[720] == 0.0  # own (zero) value, not the neighbour's


def test_splag4d_no_cross_month_leakage(spark):
    # different event cell per month: month 1 event at 721 (centre),
    # month 2 event at 0 (corner) — sums must stay within their month
    pgids = [0, 1, 2, 720, 721, 722, 1440, 1441, 1442]
    rows = [(1, p, 1.0 if p == 721 else 0.0) for p in pgids] + [
        (2, p, 1.0 if p == 0 else 0.0) for p in pgids
    ]
    df = make_panel(spark, rows)
    out = {(t, u): v for (u, t, v) in collect_panel(spatial_grid.splag4d(df, 1, 1, 0, 0))}
    assert out[(1, 721)] == 0.0 and out[(1, 720)] == 1.0
    assert out[(2, 0)] == 0.0 and out[(2, 721)] == 1.0  # corner's diagonal neighbour
    assert out[(2, 1442)] == 0.0  # far corner unaffected
    assert out[(1, 0)] == 1.0  # month 1: corner sees centre event diagonally


def test_splag4d_matches_scipy(spark):
    scipy = pytest.importorskip("scipy")
    import numpy as np
    from scipy import ndimage

    rng = np.random.RandomState(7)
    vals = rng.rand(4, 4)
    pgids = [lat * 720 + lon for lat in range(4) for lon in range(4)]
    rows = [(1, lat * 720 + lon, float(vals[lon, lat])) for lat in range(4) for lon in range(4)]
    df = make_panel(spark, rows)
    inner, width, power = 1, 2, 1.5
    got = {u: v for (u, _, v) in collect_panel(spatial_grid.splag4d(df, inner, width, power, 0))}
    kern = np.zeros((7, 7))
    for dx, dy, w in spatial_grid.kernel_offsets(inner, width, power, 0):
        kern[dx + 3, dy + 3] = w
    exp = ndimage.convolve(vals, kern, mode="constant", cval=0.0)
    for lat in range(4):
        for lon in range(4):
            assert got[lat * 720 + lon] == pytest.approx(exp[lon, lat]), (lon, lat)


# ---------------------------------------------------------------------------
# splag_country (golden behaviour from tests/test_splag_country.py:28-48)

@pytest.fixture()
def country_panel(spark):
    vals = {57: 0.0, 59: 281.0, 120: 0.0, 235: 18.0, 237: 18.0, 242: 0.0}
    return make_panel(spark, [(229, c, v) for c, v in vals.items()])


def edges_df(spark, pairs, months=(229,)):
    rows = []
    for m in months:
        for a, b in pairs:
            rows.append((m, a, b))
            rows.append((m, b, a))
    return spark.createDataFrame(rows, schema="month_id long, a_id long, b_id long")


@pytest.fixture()
def country_edges(spark):
    # 237 borders 59 and 235; other countries kept in the graph as isolated
    # self-loop-free nodes via a disjoint pair so identity has them
    return edges_df(spark, [(237, 59), (237, 235), (57, 120), (242, 57)])


def test_splag_country_empty_kernel(country_panel, country_edges):
    # inner=0, width=0 -> all zeros (test_splag_country.py:30)
    out = collect_panel(spatial_graph.splag_country(country_panel, country_edges, None, 0, 0))
    assert all(v == 0.0 for (_, _, v) in out)


def test_splag_country_identity(country_panel, country_edges):
    # inner=0, width=1 -> identity (test_splag_country.py:39)
    out = {u: v for (u, _, v) in collect_panel(
        spatial_graph.splag_country(country_panel, country_edges, None, 0, 1)
    )}
    assert out == {57: 0.0, 59: 281.0, 120: 0.0, 235: 18.0, 237: 18.0, 242: 0.0}


def test_splag_country_first_order(country_panel, country_edges):
    # inner=1, width=1 -> splag(237) = v(59) + v(235) = 299.0 (test_splag_country.py:48)
    out = {u: v for (u, _, v) in collect_panel(
        spatial_graph.splag_country(country_panel, country_edges, None, 1, 1)
    )}
    assert out[237] == 299.0
    assert out[59] == 18.0  # 237's value
    assert out[57] == 0.0  # neighbours 120, 242 both zero


def test_splag_country_distance_weights(spark, country_panel, country_edges):
    # centroids on a line: country_id -> (lat=id, lon=0); dist(a,b) = |a-b|
    cent = spark.createDataFrame(
        [(c, float(c), 0.0) for c in [57, 59, 120, 235, 237, 242]],
        schema="country_id long, lat double, lon double",
    )
    out = {u: v for (u, _, v) in collect_panel(
        spatial_graph.splag_country(country_panel, country_edges, cent, 1, 1, kernel_power=1)
    )}
    # splag(237) = 281*|237-59| + 18*|237-235| = 281*178 + 36
    assert out[237] == pytest.approx(281 * 178 + 18 * 2)


def test_splag_country_month_not_in_edges(spark, country_panel):
    # months absent from the edge table produce 0 (reference zeros init)
    e = edges_df(spark, [(237, 59)], months=(230,))
    out = collect_panel(spatial_graph.splag_country(country_panel, e, None, 1, 1))
    assert all(v == 0.0 for (_, _, v) in out)


# ---------------------------------------------------------------------------
# spacetime distances (golden values from tests/test_spacetime_distance.py)

@pytest.fixture()
def st_panel(spark):
    pgids = [0, 1, 2, 720, 721, 722, 1440, 1441, 1442]
    rows = []
    for month in (100, 101, 102):
        for p in pgids:
            rows.append((month, p, 1.0 if (month == 101 and p == 721) else 0.0))
    return make_panel(spark, rows)


def test_spacetime_distances_golden(st_panel):
    out = {
        (t, u): v
        for (u, t, v) in collect_panel(spacetime.spacetime_distances(st_panel, "distances", k=1))
    }
    assert out[(100, 721)] == 999.0  # no events yet (spacetime_distance.py:151)
    assert out[(101, 721)] == 0.0
    assert out[(101, 722)] == 0.5
    assert out[(101, 2)] == pytest.approx(1 / math.sqrt(2))
    assert out[(102, 721)] == 1.0
    assert out[(102, 720)] == pytest.approx(math.sqrt(1 + 0.25))


def test_spacetime_weights(st_panel):
    # weights mode, k=1, power=0: event size / d^0 = size = 1.0 wherever an event exists
    out = {
        (t, u): v
        for (u, t, v) in collect_panel(
            spacetime.spacetime_distances(st_panel, "weights", k=1, power=0.0)
        )
    }
    assert out[(101, 721)] == 1.0  # d=0 -> raw size
    assert out[(101, 722)] == 1.0  # size/d^0
    assert out[(100, 721)] == 999.0


def test_spacetime_weights_power(st_panel):
    out = {
        (t, u): v
        for (u, t, v) in collect_panel(
            spacetime.spacetime_distances(st_panel, "weights", k=1, power=2.0)
        )
    }
    assert out[(101, 722)] == pytest.approx(1.0 / 0.25)  # size/d^2 at d=0.5
    assert out[(101, 721)] == 1.0  # d=0 -> raw size, not inf


def test_spacetime_banded_path_matches_slice_path(st_panel):
    """driver_cap=0 forces the staged banded join + θ-join fallback; the
    result must be identical to the per-slice numpy path (both exact)."""
    for rv, power in (("distances", 0.0), ("weights", 2.0)):
        a = sorted(collect_panel(spacetime.spacetime_distances(st_panel, rv, k=1, power=power)))
        b = sorted(
            collect_panel(
                spacetime.spacetime_distances(st_panel, rv, k=1, power=power, driver_cap=0)
            )
        )
        assert a == pytest.approx(b)


def test_spacetime_banded_candidates_sublinear_in_history(spark):
    """The stage join's candidate count must grow ~linearly with panel
    length (events-in-band), unlike the full θ-join's ~quadratic growth —
    this is the scale property that replaces the reference's 600-step cap."""
    from views_transformation_library_spark.operators.spacetime import (
        _banded_candidates,
    )
    from views_transformation_library_spark.operators.spatial_grid import (
        with_grid_coords,
    )

    counts = {}
    for T in (20, 40):
        rows = [
            (t, u, 1.0 if (u + t) % 7 == 0 else 0.0)
            for t in range(T)
            for u in range(64)
        ]
        pn = with_grid_coords(make_panel(spark, rows), 8)
        events = pn.filter(F.col("value") > 0).select(
            F.col("time_id").alias("__te"),
            F.col("unit_id").alias("__ue"),
            F.col("__lon").alias("__elon"),
            F.col("__lat").alias("__elat"),
            F.col("value").alias("__size"),
        )
        targets = pn.select("time_id", "unit_id", "__lon", "__lat")
        counts[T] = (
            _banded_candidates(targets, events, 2, 1).count(),
            targets.join(events, F.col("__te") <= F.col("time_id")).count(),
        )
    band_ratio = counts[40][0] / counts[20][0]
    full_ratio = counts[40][1] / counts[20][1]
    assert band_ratio < 2.5  # ~linear in T
    assert full_ratio > 3.0  # ~quadratic in T
