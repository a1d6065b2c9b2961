"""Scalar / column-expression operators (SURVEY.md §2.1, #1-#10).

All are single Column expressions — pure Catalyst, whole-stage-codegen'd,
zero shuffle. Reference parity targets cited per function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..panel import KEYS, feature_cols, one_feature


def _apply(df: DataFrame, col: str | None, expr_fn, out: str | None = None) -> DataFrame:
    """Replace feature `col` (default: the single feature) with expr_fn(col)."""
    col = col or one_feature(df)
    return df.withColumn(out or col, expr_fn(F.col(col)))


def identity(df: DataFrame, col: str | None = None) -> DataFrame:
    """Pass-through (reference `identity.py:3-7`)."""
    return df


def ln(df: DataFrame, col: str | None = None, out: str | None = None) -> DataFrame:
    """Natural log of s+1 (reference `views_2.py:308-319`, np.log1p)."""
    return _apply(df, col, F.log1p, out)


def decay(df: DataFrame, halflife: float, col: str | None = None, out: str | None = None) -> DataFrame:
    """2**(-s/halflife) exponential decay (reference `views_2.py:279-293`)."""
    return _apply(df, col, lambda c: F.pow(F.lit(2.0), -c / F.lit(float(halflife))), out)


def greater_or_equal(df: DataFrame, value: float, col: str | None = None, out: str | None = None) -> DataFrame:
    """1 if s >= value else 0 (reference `views_2.py:26-42`)."""
    return _apply(df, col, lambda c: (c >= F.lit(value)).cast("int"), out)


def smaller_or_equal(df: DataFrame, value: float, col: str | None = None, out: str | None = None) -> DataFrame:
    """1 if s <= value else 0 (reference `views_2.py:44-60`)."""
    return _apply(df, col, lambda c: (c <= F.lit(value)).cast("int"), out)


def in_range(df: DataFrame, low: float, high: float, col: str | None = None, out: str | None = None) -> DataFrame:
    """1 if low <= s <= high else 0 (reference `views_2.py:62-80`)."""
    return _apply(df, col, lambda c: c.between(F.lit(low), F.lit(high)).cast("int"), out)


def _left_right(df: DataFrame) -> tuple[str, str]:
    """Two-feature contract of `multi_column.get_left_right`
    (`multi_column.py:49-61`): exactly two feature columns; result takes the
    left column's name."""
    feats = feature_cols(df)
    if len(feats) != 2:
        raise ValueError(f"expected exactly two feature columns, got {feats}")
    return feats[0], feats[1]


def _combine(df: DataFrame, op) -> DataFrame:
    left, right = _left_right(df)
    return df.select(*KEYS, op(F.col(left), F.col(right)).alias(left))


def add_column(df: DataFrame) -> DataFrame:
    """left + right (reference `multi_column.py:5-13`)."""
    return _combine(df, lambda a, b: a + b)


def subtract_column(df: DataFrame) -> DataFrame:
    """left - right (reference `multi_column.py:16-24`)."""
    return _combine(df, lambda a, b: a - b)


def multiply_column(df: DataFrame) -> DataFrame:
    """left * right (reference `multi_column.py:27-35`)."""
    return _combine(df, lambda a, b: a * b)


def divide_column(df: DataFrame) -> DataFrame:
    """left / right (reference `multi_column.py:38-46`).

    Documented divergence: pandas emits +/-inf on divide-by-zero; SQL NULL is
    the engine-native missing marker here, so x/0 -> NULL (SURVEY.md §7 null
    contract)."""
    return _combine(df, lambda a, b: a / F.nullif(b, F.lit(0.0)))
