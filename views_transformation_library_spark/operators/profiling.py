"""Column profiling / sketching (beyond-reference surface): the
data-quality pass a pipeline runs before training on a new table.

Two tiers, same output shape (one row per profiled column):

- ``profile``        exact — count / nulls / exact distinct / min / max /
                     DECIMAL-exact sum and mean. Oracle-gated.
- ``profile_approx`` sketch — HyperLogLog++ distinct (approx_count_distinct)
                     and KLL-style quantiles (percentile_approx) instead of
                     the exact distinct; the 100 TB default. One ordinary
                     hash aggregate, no Expand, bounded sketch memory per
                     column.

Scale note: k exact count(DISTINCT) aggregates in one pass compile to an
Expand (k× the scan rows feed the shuffle) — fine for a handful of
columns, wasteful for wide tables; that is precisely what the sketch tier
is for. Everything else partial-aggregates map-side. Sums route through
DECIMAL(38,6) so they are order-independent and engine-exact for
fixed-decimal data (CLAUDE.md float-parity rules); mean is the decimal
sum divided by the count in double — one deterministic division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SUM_DECIMAL = "decimal(38,6)"


def _stack(df_1row: DataFrame, cols: list[str], fields: list[str]) -> DataFrame:
    """Melt a 1-row aggregate with per-column field aliases `<field>_<i>`
    into one row per profiled column."""
    parts = []
    for i, c in enumerate(cols):
        parts.append(
            "'" + c.replace("'", "''") + "', " + ", ".join(f"`{f}_{i}`" for f in fields)
        )
    return df_1row.selectExpr(
        f"stack({len(cols)}, {', '.join(parts)}) as (column, {', '.join(fields)})"
    )


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact per-column profile: (column, n, n_null, n_distinct, min_val,
    max_val, sum_val, mean_val). Numeric columns only (min/max/sum surface
    as double; sums are DECIMAL(38,6)-exact underneath, rounded to 6dp).

    One aggregate pass over the table (count(DISTINCT) adds an Expand —
    see module docstring), then a stack() of the single aggregate row into
    |cols| output rows: nothing but the 1-row aggregate ever moves to one
    place.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"nn_{i}"),
            F.countDistinct(col).alias(f"nd_{i}"),
            F.min(col).cast("double").alias(f"mn_{i}"),
            F.max(col).cast("double").alias(f"mx_{i}"),
            F.sum(col.cast(_SUM_DECIMAL)).alias(f"sd_{i}"),
        ]
    one = df.agg(*aggs)
    proj = [F.col("__n_rows")]
    for i, _ in enumerate(cols):
        sum_dbl = F.col(f"sd_{i}").cast("double")
        proj += [
            F.col("__n_rows").alias(f"n_{i}"),
            (F.col("__n_rows") - F.col(f"nn_{i}")).alias(f"n_null_{i}"),
            F.col(f"nd_{i}").alias(f"n_distinct_{i}"),
            (F.round(F.col(f"mn_{i}"), 6) + F.lit(0.0)).alias(f"min_val_{i}"),
            (F.round(F.col(f"mx_{i}"), 6) + F.lit(0.0)).alias(f"max_val_{i}"),
            (F.round(sum_dbl, 6) + F.lit(0.0)).alias(f"sum_val_{i}"),
            (
                F.round(
                    sum_dbl / F.nullif(F.col(f"nn_{i}").cast("double"), F.lit(0.0)), 6
                )
                + F.lit(0.0)
            ).alias(f"mean_val_{i}"),
        ]
    return _stack(
        one.select(*proj),
        cols,
        ["n", "n_null", "n_distinct", "min_val", "max_val", "sum_val", "mean_val"],
    )


def profile_approx(
    df: DataFrame,
    cols: list[str],
    rsd: float = 0.02,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
) -> DataFrame:
    """Sketch-tier profile: (column, n, n_null, approx_distinct,
    min_val, max_val, q_25, q_50, q_75 ...). HyperLogLog++ distinct at
    relative error ``rsd`` and percentile_approx quantiles at
    ``accuracy`` — both mergeable sketches, so the whole profile is ONE
    hash aggregate with map-side partial merge and constant state per
    column; no Expand, no second pass, regardless of table width.

    Sketch results are deterministic for a fixed dataset but not
    engine-portable — covered by closeness tests against the exact tier,
    not by the DuckDB hash gate.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    qfields = [f"q_{int(q * 100)}" for q in quantiles]
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"nn_{i}"),
            F.approx_count_distinct(col, rsd).alias(f"ad_{i}"),
            F.min(col).cast("double").alias(f"mn_{i}"),
            F.max(col).cast("double").alias(f"mx_{i}"),
            F.percentile_approx(
                col.cast("double"), list(quantiles), accuracy
            ).alias(f"qs_{i}"),
        ]
    one = df.agg(*aggs)
    proj = []
    for i, _ in enumerate(cols):
        proj += [
            F.col("__n_rows").alias(f"n_{i}"),
            (F.col("__n_rows") - F.col(f"nn_{i}")).alias(f"n_null_{i}"),
            F.col(f"ad_{i}").alias(f"approx_distinct_{i}"),
            F.col(f"mn_{i}").alias(f"min_val_{i}"),
            F.col(f"mx_{i}").alias(f"max_val_{i}"),
        ]
        proj += [F.col(f"qs_{i}")[j].alias(f"{qf}_{i}") for j, qf in enumerate(qfields)]
    return _stack(
        one.select(*proj),
        cols,
        ["n", "n_null", "approx_distinct", "min_val", "max_val", *qfields],
    )


def exact_quantiles(
    df: DataFrame,
    col: str,
    percents: list[int] | tuple[int, ...] = (25, 50, 75),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT distributed quantiles by integer rank selection — the strict
    counterpart to profile_approx's percentile_approx (whose KLL sketch
    is engine-private and can only gate rows-only).

    Semantics: type-1 / lower quantile (DuckDB's quantile_disc): the
    smallest value v whose cumulative count reaches rank_p =
    ceil(p*N/100), computed ALL-INTEGER as (p*N + 99) DIV 100 — no float
    ever enters (the returned value is an input value, byte-exact by
    construction; NULLs are excluded from N like every SQL quantile).

    Scale shape: ONE map-side-combined value-count aggregate (shuffle
    payload = distinct values per task, not rows), a cumulative window
    over that aggregate, and a literal percent table joined in. Exactness
    at 100 TB therefore costs O(distinct values) shuffle — the right tool
    for fixed-decimal / discrete columns (prices, counts, scores). For
    genuinely continuous high-cardinality columns the aggregate
    degenerates toward O(rows) and profile_approx's sketch is the
    intended tier — the same exact/approx split as the dedup and ANN
    families.

    Output: group_cols + (percent int, value <input type>, rank long,
    n long), one row per (group, percent).
    """
    from pyspark.sql import Window

    for p in percents:
        if not 0 < int(p) <= 100:
            raise ValueError(
                f"exact_quantiles: percents must be in (0, 100], got {p}"
            )
    group_cols = list(group_cols or [])
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*group_cols, col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(col)
    wg = Window.partitionBy(*[F.col(c) for c in group_cols])
    cum = counts.select(
        *group_cols,
        col,
        "__c",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(wg).alias("__n"),
    )
    spark = df.sparkSession
    pcts = spark.createDataFrame([(int(p),) for p in percents], "percent int")
    joined = cum.crossJoin(F.broadcast(pcts))
    rank = F.expr("CAST((percent * __n + 99) DIV 100 AS BIGINT)")
    picked = joined.filter(
        (F.col("__cum") >= rank) & (F.col("__cum") - F.col("__c") < rank)
    )
    return picked.select(
        *group_cols,
        "percent",
        F.col(col).alias("value"),
        rank.alias("rank"),
        F.col("__n").alias("n"),
    )
