"""Edge-case robustness: single-unit / single-row / empty panels must not
crash any core operator (driver-grade hardening)."""

import pytest

from conftest import collect_panel, make_panel
from views_transformation_library_spark.operators import (
    missing,
    scalar,
    spatial_grid,
    temporal,
)

CORE_OPS = [
    lambda df: scalar.ln(df),
    lambda df: scalar.decay(df, 2.0),
    lambda df: temporal.tlag(df, 1),
    lambda df: temporal.moving_average(df, 3),
    lambda df: temporal.cweq(df, 0),
    lambda df: temporal.onset(df, 2),
    lambda df: temporal.temporal_entropy(df, 3, offset=1.0),
    lambda df: missing.fill(df, "both", None),
    lambda df: missing.extrapolate(df, "both", None),
    lambda df: missing.fill_with_group_and_global_means(df),
    lambda df: spatial_grid.splag4d(df, 1, 1, 0, 0, stride=4),
]


@pytest.mark.parametrize("op_idx", range(len(CORE_OPS)))
def test_single_row_panel(spark, op_idx):
    df = make_panel(spark, [(1, 1, 2.0)])
    out = CORE_OPS[op_idx](df)
    assert out.count() == 1  # no crash, row preserved


@pytest.mark.parametrize("op_idx", range(len(CORE_OPS)))
def test_empty_panel(spark, op_idx):
    df = make_panel(spark, [(1, 1, 2.0)]).filter("time_id < 0")
    out = CORE_OPS[op_idx](df)
    assert out.count() == 0


def test_single_unit_many_times(spark):
    rows = [(t, 1, float(t)) for t in range(1, 11)]
    df = make_panel(spark, rows)
    assert temporal.cweq(df, 0).count() == 10
    assert missing.fill(df, "both").count() == 10


def test_all_null_single_unit(spark):
    rows = [(t, 1, None) for t in range(1, 5)]
    df = make_panel(spark, rows)
    out = [v for (_, _, v) in collect_panel(missing.extrapolate(df, "both", None))]
    assert out == [None] * 4
    # cweq drops all null rows -> empty
    assert temporal.cweq(df, 0).count() == 0
