"""Missing-data operators (SURVEY.md §2.3, #26-#32).

ffill/bfill/interpolation are window arithmetic (`last(..., ignorenulls)` /
`first(..., ignorenulls)`) — no UDFs, one unit-partitioned shuffle shared by
the whole family. MICE is the one genuinely model-based op and runs inside
`applyInPandas` with a pure-numpy iterative ridge imputer (no sklearn
dependency — this environment does not ship it).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F

from ..panel import KEYS, TIME, UNIT, feature_cols, materialize


def _w_unit() -> Window:
    return Window.partitionBy(UNIT).orderBy(TIME)


def _w_cum() -> Window:
    return _w_unit().rowsBetween(Window.unboundedPreceding, 0)


def _w_fut() -> Window:
    return _w_unit().rowsBetween(0, Window.unboundedFollowing)


def replace_na(df: DataFrame, replacement: float = 0, cols: list[str] | None = None) -> DataFrame:
    """Replace NULL with a constant (reference `missing.py:18-28`)."""
    return df.na.fill(float(replacement), subset=cols or feature_cols(df))


def list_totally_missing(df: DataFrame) -> list[str]:
    """Names of all-null feature columns (reference `missing.py:30-38`).

    One aggregate job: count(col)==0 per column (partial+final hash agg)."""
    feats = feature_cols(df)
    if not feats:
        return []
    row = df.agg(*[F.count(c).alias(c) for c in feats]).collect()[0]
    return [c for c in feats if row[c] == 0]


def fill_groups_with_time_means(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """For units where *every* feature value is missing, fill each (time, col)
    cell with the cross-unit mean at that time (reference `missing.py:41-55`).

    Two window passes, no join: per-unit total-miss flag (count over unit
    partition) + per-time means (avg over time partition)."""
    cols = cols or feature_cols(df)
    w_unit_all = Window.partitionBy(UNIT)
    # unit is "completely missing" iff every value of every feature is null
    n_present = None
    for c in cols:
        cnt = F.count(c).over(w_unit_all)
        n_present = cnt if n_present is None else n_present + cnt
    out = df.withColumn("__all_missing", n_present == 0)
    w_time = Window.partitionBy(TIME)
    for c in cols:
        out = out.withColumn(
            c, F.when(F.col("__all_missing"), F.avg(c).over(w_time)).otherwise(F.col(c))
        )
    return out.drop("__all_missing")


def fill_with_group_and_global_means(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """NULL -> per-unit mean -> global column mean (reference `missing.py:58-69`).

    The reference fills the group means IN PLACE and only then takes
    ``df[col].mean()`` — so the global fallback is the mean of the
    ALREADY-group-filled column (group-mean-filled holes contribute to
    it), not of the original values. The r5 reference differential caught
    exactly this corner (an all-NaN unit next to partially-filled units);
    the global aggregate here therefore averages coalesce(x, unit_mean).

    coalesce over a per-unit window average and a broadcast one-row global
    aggregate. The global mean is NOT an empty-partition whole-frame
    window — that plans as Exchange SinglePartition over EVERY row (a
    corpus-linear single-partition sort, the pack_windows scale trap); a
    scalar agg + broadcast cross join keeps the frame fully parallel. The
    group-filled frame feeds two plan branches (agg + main), so it is
    materialized once.
    """
    cols = cols or feature_cols(df)
    w_unit_all = Window.partitionBy(UNIT)
    filled = materialize(
        df.select(
            *[c for c in df.columns if c not in cols],
            *[
                F.coalesce(F.col(c), F.avg(c).over(w_unit_all)).alias(c)
                for c in cols
            ],
        )
    )
    glob = filled.agg(*[F.avg(c).alias(f"__gmean_{c}") for c in cols])
    out = filled.crossJoin(F.broadcast(glob))
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__gmean_{c}")))
    return out.drop(*[f"__gmean_{c}" for c in cols])


def _ffill(c: str):
    return F.last(c, ignorenulls=True).over(_w_cum())


def _bfill(c: str):
    return F.first(c, ignorenulls=True).over(_w_fut())


def _validate_limits(limit_direction: str, limit_area: str | None) -> None:
    if limit_direction not in ("forward", "backward", "both"):
        raise ValueError(
            f"limit_direction must be forward|backward|both, got {limit_direction!r}"
        )
    if limit_area not in (None, "inside", "outside"):
        raise ValueError(f"limit_area must be None|inside|outside, got {limit_area!r}")


def fill(
    df: DataFrame,
    limit_direction: str = "both",
    limit_area: str | None = None,
    cols: list[str] | None = None,
) -> DataFrame:
    """Per-unit step fill (ffill/bfill) with direction + area limits
    (reference `missing.py:100-161`).

    Area masks come from the first/last valid time per unit
    (min/max of time over non-null rows, window over the unit partition):
      inside  = first_valid <= t <= last_valid
      outside = t < first_valid or t > last_valid
    Reference quirk preserved: limit_area='inside' uses ffill unless
    direction == 'backward' (`missing.py:110-115`); 'outside' bfills the
    leading edge and ffills the trailing edge regardless of direction
    (`missing.py:116-121`).
    """
    _validate_limits(limit_direction, limit_area)
    cols = cols or feature_cols(df)
    out = df
    w_unit_all = Window.partitionBy(UNIT)
    for c in cols:
        valid_t = F.when(F.col(c).isNotNull(), F.col(TIME))
        first_valid = F.min(valid_t).over(w_unit_all)
        last_valid = F.max(valid_t).over(w_unit_all)
        t = F.col(TIME)
        if limit_area == "inside":
            filled = _bfill(c) if limit_direction == "backward" else _ffill(c)
            expr = F.when(
                F.col(c).isNull() & (t >= first_valid) & (t <= last_valid), filled
            ).otherwise(F.col(c))
        elif limit_area == "outside":
            expr = (
                F.when(F.col(c).isNull() & (t < first_valid), _bfill(c))
                .when(F.col(c).isNull() & (t > last_valid), _ffill(c))
                .otherwise(F.col(c))
            )
        elif limit_direction == "forward":
            expr = F.coalesce(F.col(c), _ffill(c))
        elif limit_direction == "backward":
            expr = F.coalesce(F.col(c), _bfill(c))
        else:  # both: ffill then bfill
            expr = F.coalesce(F.col(c), _ffill(c), _bfill(c))
        out = out.withColumn(c, expr)
    return out


def extrapolate(
    df: DataFrame,
    limit_direction: str = "both",
    limit_area: str | None = None,
    cols: list[str] | None = None,
) -> DataFrame:
    """Per-unit linear interpolation/extrapolation over NULL runs
    (reference `missing.py:72-98`, pandas ``DataFrame.interpolate``).

    Pure window arithmetic (no applyInPandas): previous/next valid value and
    time via ignorenulls window first/last, then a linear blend by time
    distance. pandas `method='linear'` endpoint behavior: out-of-range NaNs
    take the nearest valid value (no slope extrapolation); direction/area
    limits restrict which NaNs may be filled.
    """
    _validate_limits(limit_direction, limit_area)
    cols = cols or feature_cols(df)
    out = df
    w_unit_all = Window.partitionBy(UNIT)
    for c in cols:
        valid_t = F.when(F.col(c).isNotNull(), F.col(TIME))
        first_valid = F.min(valid_t).over(w_unit_all)
        last_valid = F.max(valid_t).over(w_unit_all)
        t = F.col(TIME)
        prev_v = F.last(c, ignorenulls=True).over(_w_cum())
        next_v = F.first(c, ignorenulls=True).over(_w_fut())
        prev_t = F.max(valid_t).over(_w_cum())
        next_t = F.min(valid_t).over(_w_fut())
        interp = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
        inside = (t > first_valid) & (t < last_valid)
        leading = t < first_valid
        trailing = t > last_valid
        # which null regions are fillable under direction/area
        if limit_area == "inside":
            fillable_lead, fillable_trail, fillable_in = F.lit(False), F.lit(False), F.lit(True)
        elif limit_area == "outside":
            fillable_lead, fillable_trail, fillable_in = F.lit(True), F.lit(True), F.lit(False)
        else:
            fillable_lead, fillable_trail, fillable_in = F.lit(True), F.lit(True), F.lit(True)
        if limit_direction == "forward":
            fillable_lead = F.lit(False)
        elif limit_direction == "backward":
            fillable_trail = F.lit(False)
        expr = (
            F.when(F.col(c).isNotNull(), F.col(c))
            .when(inside & fillable_in, interp)
            .when(leading & fillable_lead, next_v)
            .when(trailing & fillable_trail, prev_v)
            .otherwise(F.col(c))
        )
        out = out.withColumn(c, expr)
    return out


def _iterative_ridge_impute(
    X: np.ndarray,
    seed: int,
    max_iter: int = 10,
    alpha: float = 1e-6,
    sample_posterior: bool = True,
    tol: float = 1e-6,
) -> np.ndarray:
    """Pure-numpy stand-in for sklearn's IterativeImputer(BayesianRidge()):
    round-robin per-column ridge regressions solved by normal equations.

    Matches the reference algorithm's shape (`missing.py:165-207`): mean
    initial fill, columns visited fewest-missing-first, each missing column
    regressed on all others over its observed rows, missing entries
    replaced by predictions — plus N(0, residual σ) posterior-style noise
    when ``sample_posterior`` (the multiple-imputation draws must differ).
    The estimator diverges from BayesianRidge only in how the ridge penalty
    is chosen (fixed tiny α vs evidence-maximized) — documented divergence;
    observed values are never modified.
    """
    X = X.astype(np.float64, copy=True)
    miss = np.isnan(X)
    n, p = X.shape
    col_mean = np.zeros(p)
    for j in range(p):
        obs = ~miss[:, j]
        col_mean[j] = X[obs, j].mean() if obs.any() else 0.0
    filled = X.copy()
    filled[miss] = col_mean[np.nonzero(miss)[1]]
    # fewest-missing-first, sklearn's default imputation_order='ascending'
    order = sorted(
        (j for j in range(p) if miss[:, j].any() and (~miss[:, j]).any()),
        key=lambda j: (int(miss[:, j].sum()), j),
    )
    rng = np.random.RandomState(seed)
    for _ in range(max_iter):
        max_delta = 0.0
        for j in order:
            obs = ~miss[:, j]
            others = [c for c in range(p) if c != j]
            A = np.column_stack([np.ones(n), filled[:, others]])
            Ao, yo = A[obs], X[obs, j]
            reg = alpha * np.eye(A.shape[1])
            reg[0, 0] = 0.0  # don't penalize the intercept
            try:
                beta = np.linalg.solve(Ao.T @ Ao + reg, Ao.T @ yo)
            except np.linalg.LinAlgError:
                beta = np.linalg.lstsq(Ao, yo, rcond=None)[0]
            pred = A[miss[:, j]] @ beta
            if sample_posterior:
                resid = yo - Ao @ beta
                dof = max(1, int(obs.sum()) - A.shape[1])
                sigma = float(np.sqrt((resid @ resid) / dof))
                pred = pred + rng.normal(0.0, sigma, size=len(pred))
            old = filled[miss[:, j], j]
            if len(pred):
                max_delta = max(max_delta, float(np.max(np.abs(old - pred))))
            filled[miss[:, j], j] = pred
        if not sample_posterior and max_delta < tol:
            break
    return filled


def impute_mice(
    df: DataFrame,
    n_imputations: int = 5,
    seed: int = 1,
    max_iter: int = 10,
    shard_col: str = UNIT,
    n_shards: int = 32,
    sample_posterior: bool = True,
) -> list[DataFrame]:
    """MICE multiple imputation (reference `missing.py:165-230`):
    N iterative-imputer draws, imputed values clipped to the observed
    column min/max (`missing.py:192-207`).

    Spark mapping: the reference fans out draws over multiprocessing.Pool;
    here each draw is one job and *within* a draw the imputer runs per shard
    inside `applyInPandas` (shards = hash buckets of unit_id so each pandas
    chunk is bounded regardless of total scale). The imputer itself is the
    pure-numpy `_iterative_ridge_impute` — no sklearn dependency. Each
    (draw, shard) gets a distinct deterministic seed, so results are
    reproducible run to run.

    Returns a list of N imputed DataFrames (the reference yields a
    generator of N frames, `missing.py:212-230`).
    """
    feats = feature_cols(df)
    # observed per-column bounds for clipping (one small agg, broadcast into tasks)
    bounds = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in feats],
        *[F.max(c).alias(f"__max_{c}") for c in feats],
    ).collect()[0]
    lo = {c: bounds[f"__min_{c}"] for c in feats}
    hi = {c: bounds[f"__max_{c}"] for c in feats}
    schema = df.schema

    key_cols = [c for c in df.columns if c not in feats]

    def make_fn(draw_seed: int):
        def impute_shard(key, pdf):
            # sort on the key columns before imputing: BLAS reductions in the
            # normal-equations solve are row-order sensitive in the last ulp,
            # and intra-group row order after a shuffle is not guaranteed —
            # sorting makes every draw bit-reproducible run to run (and lets
            # the local golden oracle replicate the result byte-exactly)
            pdf = pdf.sort_values(key_cols, ignore_index=True)
            shard_seed = (draw_seed * 100_003 + int(key[0])) % (2**31 - 1)
            vals = _iterative_ridge_impute(
                pdf[feats].to_numpy(dtype=np.float64, na_value=np.nan),
                seed=shard_seed,
                max_iter=max_iter,
                sample_posterior=sample_posterior,
            )
            res = pdf.drop(columns="__shard").copy()
            res[feats] = vals
            for c in feats:
                if lo[c] is not None:
                    res[c] = res[c].clip(lower=lo[c], upper=hi[c])
            return res

        return impute_shard

    sharded = df.withColumn("__shard", F.pmod(F.hash(shard_col), F.lit(n_shards)))
    out = []
    for i in range(n_imputations):
        fn = make_fn(seed + i)
        imputed = sharded.groupBy("__shard").applyInPandas(fn, schema=schema)
        out.append(imputed)
    return out


def impute_mice_draws(df: DataFrame, n_imputations: int = 5, seed: int = 1, **kwargs):
    """Reference-shaped surface: YIELD the imputation draws lazily (the
    reference returns a generator of N frames, `missing.py:212-230`) —
    each draw's plan is built on demand, so a consumer that stops early
    never constructs the remaining jobs. Draw i uses seed + i, matching
    `impute_mice`'s own per-draw seeding, so materializing the generator
    equals the list API exactly."""
    for i in range(int(n_imputations)):
        yield impute_mice(df, n_imputations=1, seed=seed + i, **kwargs)[0]
