"""Spec-driven composition surface (SURVEY.md §2.7): the JSON 'query
language' the reference's viewser API ships."""

import pytest

from conftest import collect_panel, make_panel
from views_transformation_library_spark import REGISTRY, transform, transform_json


def test_transform_folds_spec_chain(spark):
    pn = make_panel(spark, [(t, 1, float(t)) for t in range(5)])
    out = transform(pn, [
        {"type": "tlag", "args": [1]},
        {"type": "greater_or_equal", "args": [2.0]},
    ])
    got = {t: v for (_, t, v) in collect_panel(out)}
    # tlag(1): t=0 has no predecessor (NULL, preserved through the
    # comparison); times 3,4 see lagged values 2,3 -> 1.0
    assert got == {0: None, 1: 0.0, 2: 0.0, 3: 1.0, 4: 1.0}


def test_transform_json_and_unknown_step(spark):
    pn = make_panel(spark, [(t, 1, float(t)) for t in range(3)])
    out = transform_json(pn, '[{"type": "decay", "args": [1.0]}]')
    assert out.count() == 3
    with pytest.raises(KeyError, match="unknown transform"):
        transform(pn, [{"type": "no_such_op"}])


def test_registry_covers_new_r2_surface():
    for name in ("containment_pairs", "normalize_text", "pack_windows",
                 "repetition_stats", "impute_mice_draw",
                 "embedding_neardup_pairs"):
        assert name in REGISTRY, name


def test_registry_impute_mice_draw_returns_frame(spark):
    rows = [(t, 1, float(t) if t % 2 else None, float(t)) for t in range(1, 9)]
    df = make_panel(spark, rows, cols=("time_id", "unit_id", "a", "b"))
    out = transform(df, [{"type": "impute_mice_draw", "kwargs": {"n_shards": 1, "n_imputations": 1}}])
    res = out.toPandas()
    assert res["a"].notna().all()


def test_pipeline_spec_steps(spark):
    """The r4 pipeline spec steps compose: with_expr derives, where_expr
    filters, dedup_keep keeps the min-id representative per exact group."""
    rows = [
        (1, "the cat sat"), (2, "THE  cat   sat"), (3, "a dog ran"),
        (4, "the cat sat"), (5, "unique text here"),
    ]
    df = spark.range(0).sparkSession.createDataFrame(
        rows, schema="doc_id long, text string"
    )
    out = transform(df, [
        {"type": "dedup_keep", "kwargs": {"id_col": "doc_id", "text_col": "text"}},
        {"type": "with_expr", "args": ["parity", "doc_id % 2"]},
        {"type": "where_expr", "args": ["parity = 1"]},
    ])
    got = sorted(r["doc_id"] for r in out.collect())
    # doc 2 and 4 dedup onto doc 1 (case/whitespace-normalized fingerprint);
    # survivors {1, 3, 5} then filtered to odd ids
    assert got == [1, 3, 5]


def test_densify_registry_step_repairs_gapped_axis(spark):
    """VERDICT r4 #7 round-trip: temporal_tree_lag on a gapped time axis
    raises an error that names the densify registry step, and running that
    exact step first makes the same spec succeed."""
    # time 2 missing for EVERY unit -> gapped integer axis
    rows = [(t, u, float(t + u)) for t in (0, 1, 3, 4) for u in (1, 2)]
    pn = make_panel(spark, rows)
    with pytest.raises(ValueError, match=r'\{"type": "densify"'):
        transform(pn, [{"type": "temporal_tree_lag", "args": [0.7, "oneovert"]}])
    out = transform(pn, [
        {"type": "densify", "kwargs": {"time_range": True}},
        {"type": "temporal_tree_lag", "args": [0.7, "oneovert"]},
    ])
    assert out.count() == 10  # 5 times x 2 units after axis repair
    # plain densify (observed times only) must NOT repair it — the axis gap
    # is invisible to a distinct; the kwarg is the documented remedy
    with pytest.raises(ValueError, match="gapless"):
        transform(pn, [
            {"type": "densify"},
            {"type": "temporal_tree_lag", "args": [0.7, "oneovert"]},
        ])
