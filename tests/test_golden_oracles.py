"""Pins for tools/golden_oracles.py — the local generators behind the
fourier_lag / impute_mice inlined-VALUES driver oracles.

Three independent anchors:
- `spark_hash_long` / `spark_pmod_hash_long` == Spark's `F.hash` / pmod on
  LongType (the shard key replication must be exact, not probabilistic);
- the tool's slice solvers + embedding reproduce the committed REFERENCE
  goldens (generated from /root/reference's get_fourier_lag verbatim by
  tools/gen_fourier_goldens.py) — validating the golden math against the
  reference WITHOUT going through the Spark operator;
- the tool's embedding == the operator's `embed_coords` on random extents
  (integer-exact, so equality is required).

End-to-end byte-parity of golden vs Spark is attested by
tools/check_oracle.py --strict (fourier_lag, fourier_lag_3d, impute_mice).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tools import golden_oracles as G
from views_transformation_library_spark.operators.spatial_grid import embed_coords
from test_fourier import REFERENCE_GOLDENS


def test_spark_hash_long_parity(spark):
    vals = [0, 1, -1, 42, 97, 12345678901234, -987654321, 2**62, -(2**62)]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "x long")
        .select("x", F.hash("x").alias("h"), F.pmod(F.hash("x"), F.lit(8)).alias("p"))
        .collect()
    )
    for r in rows:
        assert G.spark_hash_long(r["x"]) == r["h"], r["x"]
        assert G.spark_pmod_hash_long(r["x"], 8) == r["p"], r["x"]


@pytest.mark.parametrize("dim", [2, 3])
def test_golden_solver_matches_reference(dim):
    """The 3x3 fixture of tools/gen_fourier_goldens.py, solved by the TOOL's
    own embedding + solvers (never touching the Spark operator), must land
    on the committed reference-generated goldens."""
    import pandas as pd

    rng = np.random.RandomState(11)
    vals = rng.rand(3, 3) * 10
    rows = []
    for month in (5, 6):
        for lat in range(3):
            for lon in range(3):
                v = float(vals[lon, lat]) * (1 if month == 5 else 2)
                rows.append((month, lat * 720 + lon, v))
    panel = pd.DataFrame(rows, columns=["time_id", "unit_id", "value"])
    got = {
        (t, u): v for t, u, v in G.fourier_golden_rows(panel, dim, stride=720)
    }
    assert got.keys() == REFERENCE_GOLDENS[dim].keys()
    for k, want in REFERENCE_GOLDENS[dim].items():
        assert got[k] == pytest.approx(want, rel=1e-9), k


def test_golden_embed_matches_operator():
    rng = np.random.RandomState(7)
    for _ in range(20):
        n = rng.randint(2, 40)
        lons = rng.randint(0, 50, size=n)
        lats = rng.randint(0, 50, size=n)
        gl, ga, nc = G._embed(lons, lats)
        ol, oa, onc = embed_coords(lons, lats)
        assert nc == onc
        assert (gl == ol).all() and (ga == oa).all()


def test_mice_golden_deterministic_and_complete(tmp_path):
    """The golden generator is a pure function of the panel: same input ->
    identical floats; every null hole is filled; observed cells unchanged."""
    import pandas as pd

    rng = np.random.RandomState(3)
    rows = []
    for t in range(6):
        for u in range(40):
            v = float(rng.rand() * 10) if rng.rand() > 0.2 else np.nan
            rows.append((t, u, v))
    panel = pd.DataFrame(rows, columns=["time_id", "unit_id", "value"])
    a = G.mice_golden_rows(panel, n_shards=4)
    b = G.mice_golden_rows(panel, n_shards=4)
    assert a == b
    got = {(t, u): (v1, v2) for t, u, v1, v2 in a}
    assert len(got) == len(panel)
    for t, u, v in rows:
        v1, v2 = got[(t, u)]
        assert not (np.isnan(v1) or np.isnan(v2))
        if not np.isnan(v):
            assert v1 == v and v2 == 2 * v


def test_multimodal_synth_matches_operators(spark):
    """_synth_image/_synth_video must replicate attach_image/attach_video
    byte-for-byte (ADVICE r8: the goldens re-derive the synthesis; widths
    and frame_ms now come off the operator signatures, and this test pins
    the remaining shared formula h = 8 + id % 8)."""
    from views_transformation_library_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(0, "alpha"), (3, "beta gamma"), (7, None), (12, "x" * 200)],
        "doc_id long, text string",
    )
    imgs = {r["media_id"]: bytes(r["payload"]) for r in M.attach_image(df).collect()}
    vids = {
        r["media_id"]: (bytes(r["payload"]), r["duration_ms"])
        for r in M.attach_video(df).collect()
    }
    for did, text in [(0, "alpha"), (3, "beta gamma"), (7, None), (12, "x" * 200)]:
        assert G._synth_image(did, text) == imgs[did], did
        frames, dur = G._synth_video(did, text)
        assert b"".join(frames) == vids[did][0], did
        assert dur == vids[did][1], did
