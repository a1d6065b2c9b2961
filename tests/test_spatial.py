"""Spatial operators: golden values from the reference's own tests
(test_spacetime_distance.py, test_splag_country.py) + kernel properties."""

import math

import numpy as np
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


def test_neighbour_ring1_closed_form_matches_bfs_definition(spark):
    """The ring-1 closed form (r13 opt: distinct non-self edges, no hop
    loop) must equal the BFS definition ({self} ∪ 1-hop) \\ {self} on a
    table with duplicates, an asymmetric edge, and a self-loop."""
    rows = [
        (229, 1, 2), (229, 1, 2),          # duplicate edge
        (229, 2, 1),
        (229, 9, 10),                      # asymmetric: no 10 -> 9
        (229, 3, 3),                       # self-loop
        (230, 1, 5),                       # second month
    ]
    edges = spark.createDataFrame(rows, "month_id long, a_id long, b_id long")
    got = {
        (r["month_id"], r["c"], r["n_id"])
        for r in spatial_graph.neighbour_ring(edges, 1, 1).collect()
    }
    # BFS definition: c ranges over distinct a_id; one hop adds (c, b) per
    # edge (c, b); filtering n_id != c drops self rows and the self-loop
    expected = {(m, a, b) for (m, a, b) in rows if a != b}
    assert got == expected


def test_neighbour_ring_general_k_matches_bfs_definition(spark):
    """The r14 hop-composition closed form must equal the reference BFS
    ring definition (R_nouter \\ R_ninner, self included at order 0) for
    every (kernel_inner, kernel_width) shape — on a graph with duplicate
    edges, an asymmetric edge, a self-loop, a chain long enough for
    3-hop rings, and a disconnected month."""
    rows = [
        (229, 1, 2), (229, 1, 2),          # duplicate edge
        (229, 2, 1),
        (229, 2, 3), (229, 3, 2),
        (229, 3, 4), (229, 4, 3),
        (229, 4, 5), (229, 5, 4),
        (229, 9, 10),                      # asymmetric: no 10 -> 9
        (229, 6, 6),                       # self-loop
        (230, 1, 5),                       # second month
    ]
    edges = spark.createDataFrame(rows, "month_id long, a_id long, b_id long")

    def bfs_ring(inner: int, width: int):
        # reference semantics: R_n = n iterated hop-unions from {self}
        # over the month's adjacency (self included, order 0 = {self});
        # ring = R_{inner-1+width} \ R_{inner-1}
        months = {m for (m, _, _) in rows}
        adj: dict = {}
        nodes: dict = {}
        for (m, a, b) in rows:
            adj.setdefault(m, {}).setdefault(a, set()).add(b)
            nodes.setdefault(m, set()).add(a)
        ninner, nouter = inner - 1, inner - 1 + width
        if nouter < 0 or nouter < ninner:
            return set()
        out = set()
        for m in months:
            reach = {c: {c} for c in nodes.get(m, set())}
            snaps = {0: {c: set(v) for c, v in reach.items()}}
            for i in range(1, nouter + 1):
                reach = {
                    c: v | {nb for x in v for nb in adj[m].get(x, set())}
                    for c, v in reach.items()
                }
                snaps[i] = {c: set(v) for c, v in reach.items()}
            for c in reach:
                ring = snaps[nouter][c] - (
                    snaps[ninner][c] if ninner >= 0 else set()
                )
                out |= {(m, c, n) for n in ring}
        return out

    for inner, width in [(1, 2), (2, 1), (2, 2), (0, 2), (1, 3), (3, 1)]:
        got = {
            (r["month_id"], r["c"], r["n_id"])
            for r in spatial_graph.neighbour_ring(edges, inner, width).collect()
        }
        assert got == bfs_ring(inner, width), (inner, width)


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


def test_splag_country_nonpositive_width(country_panel, country_edges):
    """kernel_width <= 0 with kernel_inner >= 2 (r6 guard): the ring
    R_nouter \\ R_ninner is empty by construction (nouter < ninner) — the
    old single-iteration rewrite never took the inner snapshot and
    crashed on a None join. Lag over an empty ring is all zeros."""
    out = collect_panel(
        spatial_graph.splag_country(country_panel, country_edges, None, 2, 0)
    )
    assert out and all(v == 0.0 for (_, _, v) in out)
    out2 = collect_panel(
        spatial_graph.splag_country(country_panel, country_edges, None, 3, -1)
    )
    assert out2 and all(v == 0.0 for (_, _, v) in out2)


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



# ---------------------------------------------------------------------------
# Reference goldens: generated ONCE from /root/reference's get_splag4d run
# verbatim on a 3x3 fixture (tools/gen_splag4d_goldens.py; the single
# runtime scipy call — ndimage.convolve, symmetric kernel, constant/0
# padding — is shimmed with a numpy zero-padded correlation). Value-level
# cross-check of kernel build + convolution against the reference itself.
# Keyed by (kernel_inner, kernel_width, kernel_power, norm_kernel).
SPLAG4D_REFERENCE_GOLDENS = {
    (1, 1, 0, 0): {
        (5, 0): 14.504038110435793,
        (5, 1): 22.448875204881425,
        (5, 2): 8.95883673693796,
        (5, 720): 24.724209357097287,
        (5, 721): 43.759721930807856,
        (5, 722): 19.748548428190976,
        (5, 1440): 18.542300523139335,
        (5, 1441): 29.43962540191213,
        (5, 1442): 12.9970991496415,
        (6, 0): 29.008076220871587,
        (6, 1): 44.89775040976285,
        (6, 2): 17.91767347387592,
        (6, 720): 49.448418714194574,
        (6, 721): 87.51944386161571,
        (6, 722): 39.49709685638195,
        (6, 1440): 37.08460104627867,
        (6, 1441): 58.87925080382426,
        (6, 1442): 25.994198299283,
    },
    (1, 2, 2, 1): {
        (5, 0): 2.050571784378126,
        (5, 1): 2.223563657129155,
        (5, 2): 1.6390307226075704,
        (5, 720): 2.4651218657079887,
        (5, 721): 3.672524831079786,
        (5, 722): 2.1800418217793527,
        (5, 1440): 2.3993461438812016,
        (5, 1441): 2.727193827947691,
        (5, 1442): 1.904253735159092,
        (6, 0): 4.101143568756252,
        (6, 1): 4.44712731425831,
        (6, 2): 3.278061445215141,
        (6, 720): 4.9302437314159775,
        (6, 721): 7.345049662159572,
        (6, 722): 4.360083643558705,
        (6, 1440): 4.798692287762403,
        (6, 1441): 5.454387655895382,
        (6, 1442): 3.808507470318184,
    },
    (2, 1, 1, 0): {
        (5, 0): 11.67207436689068,
        (5, 1): 9.618364662512743,
        (5, 2): 15.686884057537384,
        (5, 720): 5.473695696220066,
        (5, 721): 0.0,
        (5, 722): 10.471479596973833,
        (5, 1440): 9.285646146962575,
        (5, 1441): 4.47287492530483,
        (5, 1442): 11.989777136199713,
        (6, 0): 23.34414873378136,
        (6, 1): 19.236729325025486,
        (6, 2): 31.373768115074768,
        (6, 720): 10.947391392440132,
        (6, 721): 0.0,
        (6, 722): 20.942959193947665,
        (6, 1440): 18.57129229392515,
        (6, 1441): 8.94574985060966,
        (6, 1442): 23.979554272399426,
    },
}


@pytest.mark.parametrize("params", sorted(SPLAG4D_REFERENCE_GOLDENS))
def test_splag4d_matches_reference_goldens(spark, params):
    rng = np.random.RandomState(23)
    vals = rng.rand(3, 3) * 10
    rows = []
    for month in (5, 6):
        for lat in range(3):
            for lon in range(3):
                v = float(vals[lon, lat]) * (1 if month == 5 else 2)
                rows.append((month, lat * 720 + lon, v))
    df = make_panel(spark, rows)
    ki, kw, kp, nk = params
    got = {
        (t, u): v
        for (u, t, v) in collect_panel(spatial_grid.splag4d(df, ki, kw, kp, nk))
    }
    expected = SPLAG4D_REFERENCE_GOLDENS[params]
    assert set(got) == set(expected)
    for key, val in expected.items():
        assert got[key] == pytest.approx(val, rel=1e-9), key
