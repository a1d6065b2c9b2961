"""Window / time-series operators (SURVEY.md §2.2, #11-#25).

Every operator here is expressed with `pyspark.sql.Window` over
``partitionBy(unit_id).orderBy(time_id)`` — a single hash-shuffle on
`unit_id` that Catalyst reuses across chained window ops with the same
partitioning (one exchange for a whole tlag→cweq→decay chain).

Positional-shift parity (pandas groupby.shift, reference `views_2.py:97`)
holds on dense panels; use ``panel.densify`` first (the reference hard-asserts
completeness at `utilities.py:26-27`).

NULL contract: reference drops NaN before counting in `cweq`
(`views_2.py:211`); here null rows are excluded from the count windows via
filtering semantics documented per function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..panel import KEYS, TIME, UNIT, materialize, one_feature


def _w_unit() -> Window:
    return Window.partitionBy(UNIT).orderBy(TIME)


def _trailing(n: int) -> Window:
    return _w_unit().rowsBetween(-(n - 1), 0)


def tlag(df: DataFrame, time: int, col: str | None = None, out: str | None = None) -> DataFrame:
    """Shift back `time` steps within unit (reference `views_2.py:82-97`).

    Raises on time < 1 like the reference (`views_2.py:92-95`)."""
    if time < 1:
        raise ValueError(f"tlag needs time >= 1, got {time}")
    col = col or one_feature(df)
    return df.withColumn(out or col, F.lag(col, time).over(_w_unit()))


def tlead(df: DataFrame, time: int, col: str | None = None, out: str | None = None) -> DataFrame:
    """Shift forward `time` steps (reference `views_2.py:100-115`)."""
    if time < 1:
        raise ValueError(f"tlead needs time >= 1, got {time}")
    col = col or one_feature(df)
    return df.withColumn(out or col, F.lead(col, time).over(_w_unit()))


def delta(df: DataFrame, time: int = 1, col: str | None = None, out: str | None = None) -> DataFrame:
    """s(t) - s(t-time) (reference `views_2.py:12-24`)."""
    col = col or one_feature(df)
    return df.withColumn(out or col, F.col(col) - F.lag(col, time).over(_w_unit()))


def moving_average(df: DataFrame, time: int, col: str | None = None, out: str | None = None) -> DataFrame:
    """Trailing mean over `time` rows per unit (reference `views_2.py:117-142`).

    pandas min_periods=0: window shrinks at the series start — Spark row
    frames do exactly that at partition boundaries."""
    col = col or one_feature(df)
    return df.withColumn(out or col, F.avg(col).over(_trailing(time)))


def moving_sum(df: DataFrame, time: int, col: str | None = None, out: str | None = None) -> DataFrame:
    """Trailing sum over `time` rows (reference `views_2.py:144-169`)."""
    col = col or one_feature(df)
    return df.withColumn(out or col, F.sum(col).over(_trailing(time)))


def rollmax(df: DataFrame, window: int, col: str | None = None, out: str | None = None) -> DataFrame:
    """Trailing max over `window` rows (reference `views_2.py:337-352`)."""
    col = col or one_feature(df)
    return df.withColumn(out or col, F.max(col).over(_trailing(window)))


def mean(df: DataFrame, col: str | None = None, out: str | None = None) -> DataFrame:
    """Per-unit all-time mean broadcast to every row (reference `views_2.py:295-306`)."""
    col = col or one_feature(df)
    return df.withColumn(out or col, F.avg(col).over(Window.partitionBy(UNIT)))


def demean(df: DataFrame, col: str | None = None, out: str | None = None) -> DataFrame:
    """s - per-unit mean (reference `views_2.py:321-335`)."""
    col = col or one_feature(df)
    return df.withColumn(out or col, F.col(col) - F.avg(col).over(Window.partitionBy(UNIT)))


def cweq(
    df: DataFrame,
    value: float,
    seed: int | None = None,
    col: str | None = None,
    out: str | None = None,
) -> DataFrame:
    """Gaps-and-islands consecutive-equality counter (reference `views_2.py:172-242`).

    Running count of consecutive timesteps where s == value within each unit,
    reset to 0 on break. `seed` pre-loads the count at the panel's first
    timestep if the condition holds there (`views_2.py:186-208`: first time =
    global min of the time index).

    Null handling: reference drops NaN rows before counting (`views_2.py:211`)
    — here null rows are excluded from the output (positional parity).

    Plan shape: filter → two stacked window aggs over the same unit_id
    partitioning (block id = cumsum of breaks, then cumsum of the count
    within (unit, block)) → one shuffle total.
    """
    col = col or one_feature(df)
    base = df.filter(F.col(col).isNotNull())
    mask = (F.col(col) == F.lit(value)).cast("int")
    w_cum = _w_unit().rowsBetween(Window.unboundedPreceding, 0)
    blocked = base.withColumn("__block", F.sum(F.lit(1) - mask).over(w_cum))
    # Global (not per-unit) first timestep, per reference set_seed; computed
    # as a 1-row broadcast-joined aggregate to keep the plan lazy.
    if seed:
        min_t = base.agg(F.min(TIME).alias("__min_t"))
        blocked = blocked.crossJoin(F.broadcast(min_t))
        count_col = F.when((F.col(TIME) == F.col("__min_t")) & (mask == 1), F.lit(int(seed))).otherwise(mask)
    else:
        count_col = mask
    w_blk = (
        Window.partitionBy(UNIT, "__block")
        .orderBy(TIME)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    res = blocked.withColumn(out or col, F.sum(count_col).over(w_blk).cast("int"))
    return res.drop("__block", "__min_t") if seed else res.drop("__block")


def time_since(
    df: DataFrame,
    value: float = 0,
    seed: int | None = None,
    col: str | None = None,
    out: str | None = None,
) -> DataFrame:
    """cweq(tlag(s,1), value, seed) (reference `views_2.py:244-277`).

    The lag makes the first timestep null, which cweq's NaN-drop removes — so
    the output has no rows at the panel's first timestep, matching the
    reference exactly."""
    col = col or one_feature(df)
    lagged = tlag(df, 1, col=col)
    return cweq(lagged, value=value, seed=seed, col=col, out=out)


def onset_possible(df: DataFrame, window: int, col: str | None = None, out: str | None = None) -> DataFrame:
    """1 if no nonzero value in the `window` rows ending at t-1
    (reference `views_2.py:354-367`): ~rollmax(tlag(s,1).fillna(0), window)."""
    col = col or one_feature(df)
    lagged = F.coalesce(F.lag(col, 1).over(_w_unit()), F.lit(0.0))
    mx = F.max(lagged).over(_trailing(window))
    return df.withColumn(out or col, (~(mx.cast("boolean"))).cast("int"))


def onset(df: DataFrame, window: int, col: str | None = None, out: str | None = None) -> DataFrame:
    """1 where onset possible AND s != 0 (reference `views_2.py:369-383`)."""
    col = col or one_feature(df)
    tmp = onset_possible(df, window, col=col, out="__op")
    res = tmp.withColumn(
        out or col,
        (F.col("__op").cast("boolean") & F.col(col).cast("boolean")).cast("int"),
    )
    return res.drop("__op")


def tick_time_since(
    df: DataFrame,
    event_col: str,
    ts_col: str,
    out: str = "tick_time_since",
) -> DataFrame:
    """Batch form of the incremental time_since update (reference
    `views_2.py:385-418`): 0 if event(t-1) else ts(t-1)+1.

    Rows with no t-1 (first timestep per unit) are excluded, mirroring the
    reference's dropna on both lags. Streaming form:
    `streaming.tick.tick_time_since_stream` (keyed state per unit)."""
    ev_lag = F.lag(event_col, 1).over(_w_unit())
    ts_lag = F.lag(ts_col, 1).over(_w_unit())
    return (
        df.withColumn("__ev_lag", ev_lag)
        .withColumn("__ts_lag", ts_lag)
        .filter(F.col("__ev_lag").isNotNull() & F.col("__ts_lag").isNotNull())
        .withColumn(out, F.when(F.col("__ev_lag").cast("boolean"), F.lit(0.0)).otherwise(F.col("__ts_lag") + 1))
        .drop("__ev_lag", "__ts_lag")
    )


def tlags3d(df: DataFrame, lags: list[int] | None = None) -> DataFrame:
    """Multi-lag of every feature column at once (reference `tlag3d.py:6-54`).

    One Window shuffle, len(cols) * len(lags) lag expressions evaluated in a
    single pass. Output columns are suffixed `<col>_tlag_<L>` — the intended
    semantics; the reference's repack is buggy (undefined `df` at
    `tlag3d.py:130`, reused names at `tlag3d.py:98`), per SURVEY.md §7 we
    implement the documented behavior, not the bug.

    Out-of-range lags yield 0.0 (reference leaves tensor zeros,
    `tlag3d.py:72-75`), not NULL.
    """
    lags = lags or [1]
    feats = [c for c in df.columns if c not in KEYS]
    w = _w_unit()
    exprs = [
        F.coalesce(F.lag(c, int(L)).over(w), F.lit(0.0)).alias(f"{c}_tlag_{int(L)}")
        for c in feats
        for L in lags
    ]
    return df.select(*KEYS, *exprs)


def temporal_entropy(
    df: DataFrame,
    window: int,
    offset: float = 0.0,
    col: str | None = None,
    out: str | None = None,
) -> DataFrame:
    """Shannon entropy over a trailing window (reference `temporal_entropy.py:7-72`).

    H(t) = -Σ_i (x_i/X) log2(x_i/X) over the window, X = window sum, with
    `offset` added to every value (guards 0/0, `temporal_entropy.py:26-33`).

    Algebraic refactor keeps it pure-Catalyst (no collect_list, no UDF):
        H = log2(X) - S/X,  S = Σ x_i·log2(x_i)  (x_i := x_i + offset)
    i.e. two trailing-window sums over per-row expressions — identical math,
    one shuffle, whole-stage codegen. 0·log2(0) is taken as 0 (the limit).
    """
    col = col or one_feature(df)
    # reference fills NaN with 0 before adding the offset (temporal_entropy.py:40)
    x = F.coalesce(F.col(col), F.lit(0.0)) + F.lit(float(offset))
    xlog = F.when(x > 0, x * F.log2(x)).otherwise(F.lit(0.0))
    w = _trailing(window)
    X = F.sum(x).over(w)
    S = F.sum(xlog).over(w)
    h = F.when(X > 0, F.log2(X) - S / X).otherwise(F.lit(0.0))
    return df.withColumn(out or col, h)


def standardize(
    df: DataFrame, col: str | None = None, out: str | None = None
) -> DataFrame:
    """Per-unit z-score (beyond-reference; the feature-scaling companion of
    `demean`): (s - mean) / σ with population σ.

    Float-parity discipline: both moments go through exact DECIMAL sums —
    value is fixed-2dp so value² is fixed-4dp, and DECIMAL(18,2)/(38,4)
    sums are order-independent — then a fixed double expression
    (Σx²/n − mean², clamped at 0 for the all-equal fp case) computes σ.
    Zero σ yields NULL (constant series has no z-score) instead of an
    ANSI DIVIDE_BY_ZERO."""
    col = col or one_feature(df)
    w = Window.partitionBy(UNIT)
    n = F.count(col).over(w)
    mean_d = F.sum(F.col(col).cast("decimal(18,2)")).over(w).cast("double") / n
    sxx_d = (
        F.sum((F.col(col) * F.col(col)).cast("decimal(38,4)")).over(w).cast("double")
        / n
    )
    var = F.greatest(sxx_d - mean_d * mean_d, F.lit(0.0))
    z = (F.col(col) - mean_d) / F.nullif(F.sqrt(var), F.lit(0.0))
    return df.withColumn(out or col, F.round(z, 6) + F.lit(0.0))


def rolling_median(
    df: DataFrame, window: int, col: str | None = None, out: str | None = None
) -> DataFrame:
    """Exact discrete trailing median over the last ``window`` rows per
    unit (beyond-reference; the robust companion of `moving_average`):
    the lower-middle element of the sorted trailing values — always an
    ACTUAL data value, so no float arithmetic is invented and both
    engines agree exactly. Trailing ROWS frames are order-deterministic
    (the safe window-aggregate class). O(window log window) per row via
    collect+sort on the frame — fine for panel-sized windows (the
    reference's windows are 12-ish); a streaming histogram would replace
    it for window >> 10³."""
    col = col or one_feature(df)
    arr = F.array_sort(F.collect_list(col).over(_trailing(window)))
    med = F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int"))
    return df.withColumn(out or col, med)


def mad_outliers(
    df: DataFrame,
    k: float = 3.0,
    col: str | None = None,
) -> DataFrame:
    """Robust per-unit outlier flags via the median absolute deviation
    (beyond-reference): flag = |s - median| > k · MAD, with BOTH medians
    the exact lower-middle discrete statistic (actual data values — the
    rolling_median trick, so no float arithmetic is invented and both
    engines agree byte-exact; |s-med| and k·MAD are single IEEE ops).

    Adds (unit_median, unit_mad, is_outlier). Nulls flag NULL. One
    groupBy(unit) computes med and MAD from the SAME sorted array in one
    aggregate row; one join back (co-partitioned). A unit's full series
    sits in one task — the same bound every per-unit window op has.
    """
    col = col or one_feature(df)
    # the frame feeds TWO plan branches (the per-unit aggregate and the
    # join-back) — materialize so an expensive upstream pipeline (or the
    # panel's densify grid, observed duplicated in the r5 plan audit)
    # executes once, not per branch
    df = materialize(df)
    lower_mid = lambda arr: F.when(  # noqa: E731
        F.size(arr) > 0,
        F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int")),
    )
    agg = (
        df.groupBy(UNIT)
        .agg(F.array_sort(F.collect_list(col)).alias("__arr"))
        .select(UNIT, "__arr", lower_mid(F.col("__arr")).alias("unit_median"))
        .select(
            UNIT,
            "unit_median",
            lower_mid(
                F.array_sort(
                    F.transform(
                        F.col("__arr"),
                        lambda v: F.abs(v - F.col("unit_median")),
                    )
                )
            ).alias("unit_mad"),
        )
    )
    out = df.join(agg, UNIT)
    return out.withColumn(
        "is_outlier",
        (
            F.abs(F.col(col) - F.col("unit_median"))
            > F.lit(float(k)) * F.col("unit_mad")
        ).cast("int"),
    )


def ewma(
    df: DataFrame, alpha: float, col: str | None = None, out: str | None = None
) -> DataFrame:
    """Exponentially weighted moving average, recursive form (pandas
    ``ewm(alpha).mean(adjust=False)``): y_1 = s_1; y_t = α·s_t + (1−α)·y_{t−1}.
    The recursive companion of the reference's `decay` (which rescales
    time_since, not the series itself).

    The recursion is inherently sequential per unit, so units run through
    ONE Arrow-batched applyInPandas pass — SHARDED, not per-unit keyed:
    applyInPandas costs ~2.5 ms of dispatch per GROUP (measured: a no-op
    over 1500 unit-groups is ~4 s), so units hash into ``n_shards``
    groups and a single linear scan resets state at unit boundaries —
    the impute_mice shard shape, identical per-unit float sequences.
    Float parity: numpy evaluates α·x + β·y_prev with the SAME two
    products and one add (left-associated, β = 1−α precomputed once) as
    the oracle's recursive CTE, so doubles are bit-identical; output
    rounds to 6dp. Null inputs yield a null output row and leave the
    state unchanged (pandas semantics).
    """
    col = col or one_feature(df)
    out = out or col
    alpha = float(alpha)
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    beta = 1.0 - alpha
    n_shards = 64
    cols = [f.name for f in df.schema.fields]
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = out_fields if out in cols else f"{out_fields}, `{out}` double"

    def _run(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values([UNIT, TIME], kind="mergesort").reset_index(drop=True)
        x = pdf[col].to_numpy(dtype="float64", na_value=np.nan)
        units = pdf[UNIT].to_numpy()
        y = np.empty(len(x))
        state = np.nan
        prev_unit = None
        for i in range(len(x)):
            if prev_unit is None or units[i] != prev_unit:
                state = np.nan
                prev_unit = units[i]
            xi = x[i]
            if np.isnan(xi):
                y[i] = np.nan
            else:
                state = xi if np.isnan(state) else alpha * xi + beta * state
                y[i] = state
        s = pd.array(y, dtype="Float64")
        s[np.isnan(y)] = pd.NA  # Arrow null, not double NaN (oracle parity)
        pdf[out] = s
        return pdf.drop(columns=["__shard"]) if "__shard" in pdf else pdf

    sharded = df.withColumn("__shard", F.pmod(F.hash(UNIT), F.lit(n_shards)))
    return (
        sharded.groupBy("__shard")
        .applyInPandas(_run, schema=schema)
    )


def cusum(
    df: DataFrame,
    k: float = 0.5,
    h: float = 5.0,
    col: str | None = None,
) -> DataFrame:
    """Two-sided standardized CUSUM changepoint statistic per unit (Page
    1954; beyond-reference — the classic drift monitor for a panel
    series): with per-unit moments (μ, σ) and z_t = (s_t − μ)/σ,

        c⁺_t = max(0, c⁺_{t−1} + z_t − k)   c⁻_t = max(0, c⁻_{t−1} − z_t − k)

    and alarm_t = 1 iff max(c⁺, c⁻) > h. Adds (cusum_pos, cusum_neg,
    cusum_alarm).

    Float parity (the ewma pattern): moments go through exact DECIMAL
    sums (the standardize rule), numpy then steps the recursion with the
    SAME guarded expressions as the oracle's recursive CTE (σ=0 units
    contribute z=0; null observations carry state and emit null) — every
    intermediate is bit-identical; outputs round to 6dp. Units are
    SHARDED into the Arrow pass (the ewma lesson: per-group dispatch is
    ~2.5 ms, so one linear scan resets state at unit boundaries instead
    of one group per unit): two shuffles total.
    """
    col = col or one_feature(df)
    k = float(k)
    h = float(h)
    w = Window.partitionBy(UNIT)
    n = F.count(col).over(w)
    mean_d = F.sum(F.col(col).cast("decimal(18,2)")).over(w).cast("double") / n
    sxx_d = (
        F.sum((F.col(col) * F.col(col)).cast("decimal(38,4)")).over(w).cast("double")
        / n
    )
    sigma = F.sqrt(F.greatest(sxx_d - mean_d * mean_d, F.lit(0.0)))
    with_m = df.withColumn("__mu", mean_d).withColumn("__sigma", sigma)
    cols = [f.name for f in with_m.schema.fields]
    out_fields = ", ".join(
        f"`{c}` {t}" for c, t in with_m.dtypes
    )
    schema = (
        f"{out_fields}, `cusum_pos` double, `cusum_neg` double, `cusum_alarm` int"
    )

    def _run(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values([UNIT, TIME], kind="mergesort").reset_index(drop=True)
        x = pdf[col].to_numpy(dtype="float64", na_value=np.nan)
        units = pdf[UNIT].to_numpy()
        mu = pdf["__mu"].to_numpy(dtype="float64", na_value=np.nan)
        sg = pdf["__sigma"].to_numpy(dtype="float64", na_value=np.nan)
        cp = np.empty(len(x))
        cn = np.empty(len(x))
        sp = 0.0
        sn = 0.0
        prev_unit = None
        for i in range(len(x)):
            if prev_unit is None or units[i] != prev_unit:
                sp = 0.0
                sn = 0.0
                prev_unit = units[i]
            if np.isnan(x[i]):
                cp[i] = np.nan
                cn[i] = np.nan
                continue
            z = 0.0 if sg[i] == 0.0 else (x[i] - mu[i]) / sg[i]
            sp = max(0.0, sp + z - k)
            sn = max(0.0, sn - z - k)
            cp[i] = sp
            cn[i] = sn
        # RAW doubles out — rounding happens Spark-side (np.round is
        # half-even, a different animal from Spark/DuckDB round)
        pos = pd.array(cp, dtype="Float64")
        neg = pd.array(cn, dtype="Float64")
        pos[np.isnan(cp)] = pd.NA
        neg[np.isnan(cn)] = pd.NA
        alarm = pd.array(
            [
                pd.NA
                if np.isnan(cp[i])
                else int(max(cp[i], cn[i]) > h)
                for i in range(len(x))
            ],
            dtype="Int32",
        )
        pdf["cusum_pos"] = pos
        pdf["cusum_neg"] = neg
        pdf["cusum_alarm"] = alarm
        return pdf.drop(columns=["__shard"]) if "__shard" in pdf else pdf

    sharded = with_m.withColumn("__shard", F.pmod(F.hash(UNIT), F.lit(64)))
    return (
        sharded.groupBy("__shard")
        .applyInPandas(_run, schema=schema)
        .drop("__mu", "__sigma")
        .withColumn("cusum_pos", F.round("cusum_pos", 6) + F.lit(0.0))
        .withColumn("cusum_neg", F.round("cusum_neg", 6) + F.lit(0.0))
    )


def winsorize(
    df: DataFrame,
    lower: float = 0.05,
    upper: float = 0.95,
    col: str | None = None,
    out: str | None = None,
) -> DataFrame:
    """Per-unit winsorization at exact DISCRETE quantiles: clip s into
    [q_lower, q_upper] where q_p is the sorted series' element at 1-based
    index floor(p·(n−1)) + 1 — always an actual data value (the
    rolling_median/mad trick), so both engines agree byte-exact and no
    float arithmetic is invented; the clip itself is least/greatest on
    identical doubles.

    One groupBy(unit) computes both cut points from the same sorted
    array; one co-partitioned join back. The standard heavy-tail taming
    step before scaling/standardizing panel features.
    """
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError(f"need 0 <= lower <= upper <= 1, got {lower}, {upper}")
    col = col or one_feature(df)
    # two plan branches (quantile aggregate + join-back) — same
    # materialize rule as mad_outliers
    df = materialize(df)

    def _q(arr, p: float):
        idx = (F.floor(F.lit(p) * (F.size(arr) - 1)) + 1).cast("int")
        return F.when(F.size(arr) > 0, F.element_at(arr, idx))

    agg = (
        df.groupBy(UNIT)
        .agg(F.array_sort(F.collect_list(col)).alias("__arr"))
        .select(
            UNIT,
            _q(F.col("__arr"), lower).alias("__qlo"),
            _q(F.col("__arr"), upper).alias("__qhi"),
        )
    )
    res = df.join(agg, UNIT).withColumn(
        out or col,
        F.least(F.greatest(F.col(col), F.col("__qlo")), F.col("__qhi")),
    )
    return res.drop("__qlo", "__qhi")
