import math

import pytest

from conftest import collect_panel, make_panel
from views_transformation_library_spark.operators import scalar


@pytest.fixture()
def panel(spark):
    return make_panel(
        spark,
        [(1, 10, 0.0), (2, 10, 1.0), (3, 10, 4.0), (1, 11, 2.0), (2, 11, None), (3, 11, 9.0)],
    )


def vals(df):
    return [v for (_, _, v) in collect_panel(df)]


def test_identity(panel):
    assert vals(scalar.identity(panel)) == [0.0, 1.0, 4.0, 2.0, None, 9.0]


def test_ln(panel):
    out = vals(scalar.ln(panel))
    assert out[0] == 0.0
    assert out[1] == pytest.approx(math.log(2.0))
    assert out[4] is None


def test_decay(panel):
    out = vals(scalar.decay(panel, 2.0))
    assert out[0] == 1.0
    assert out[1] == pytest.approx(2 ** -0.5)
    assert out[2] == pytest.approx(0.25)


def test_threshold_ops(panel):
    assert vals(scalar.greater_or_equal(panel, 1.0)) == [0, 1, 1, 1, None, 1]
    assert vals(scalar.smaller_or_equal(panel, 1.0)) == [1, 1, 0, 0, None, 0]
    assert vals(scalar.in_range(panel, 1.0, 4.0)) == [0, 1, 1, 1, None, 0]


def test_multi_column(spark):
    df = make_panel(
        spark,
        [(1, 10, 6.0, 3.0), (2, 10, 5.0, 0.0), (3, 10, None, 2.0)],
        cols=("time_id", "unit_id", "a", "b"),
    )
    assert vals(scalar.add_column(df)) == [9.0, 5.0, None]
    assert vals(scalar.subtract_column(df)) == [3.0, 5.0, None]
    assert vals(scalar.multiply_column(df)) == [18.0, 0.0, None]
    # divide by zero -> NULL (documented divergence from pandas inf)
    assert vals(scalar.divide_column(df)) == [2.0, None, None]
    # result column keeps the left name
    assert scalar.add_column(df).columns == ["time_id", "unit_id", "a"]


def test_two_col_contract(spark):
    df = make_panel(spark, [(1, 10, 1.0)], cols=("time_id", "unit_id", "a"))
    with pytest.raises(ValueError):
        scalar.add_column(df)
