"""Deterministic sampling for training-data pipelines (beyond-reference
surface): stratified quota sampling (data mixing) and train/holdout
splitting.

Both are *hash-threshold* samplers, not `df.sample()`: a row's fate is a
pure function of (id, seed), so results are reproducible across runs,
engines, partitionings, and cluster sizes — the property a 100 TB corpus
pipeline actually needs (rerunning a failed stage must not resample), and
what makes the operators hash-oracle-checkable against DuckDB.

The hash is the engine-portable md5→integer pipeline used by the minhash
family: the first 8 hex chars of md5(id || ':' || seed) as a 32-bit
integer, uniform on [0, 2^32). Keep a row iff its bucket < fraction·2^32.
Pure column expressions — no UDFs, no shuffle; the filter runs inside the
scan, and at 100 TB a 1 % sample never materializes the other 99 %.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_BUCKETS = 1 << 32


def hash_bucket(id_col: Column, seed: int = 42) -> Column:
    """Uniform [0, 2^32) bucket from md5 — identical in any engine with md5
    (DuckDB: CAST('0x' || substr(md5(...), 1, 8) AS BIGINT))."""
    key = F.concat(id_col.cast("string"), F.lit(f":{int(seed)}"))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum quota sampling — the data-mixing step that up/down-weights
    domains, languages, or quality tiers when composing a training corpus.

    ``fractions``: {stratum_value: keep_fraction}; strata absent from the
    map keep ``default_fraction``. The per-stratum threshold is folded into
    ONE CASE expression (no join, no shuffle): keep iff
    hash_bucket(id, seed) < fraction · 2^32. Expected kept rows per stratum
    = fraction · |stratum|, exact in distribution and deterministic in
    membership."""
    bucket = hash_bucket(F.col(id_col), seed)
    thresh = F.lit(int(float(default_fraction) * _BUCKETS))
    for val, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(val), F.lit(int(float(frac) * _BUCKETS))
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    prefilter_above: int = 100_000,
) -> DataFrame:
    """Deterministic weighted sampling without replacement — Efraimidis &
    Spirakis (2006) A-res: each row draws u = hash-uniform(0,1] from
    (id, seed) and scores key = -ln(u)/w; the n SMALLEST keys win, which
    samples row i with probability ∝ w_i. The training-data use is
    quality- or importance-weighted corpus selection (weight = quality
    score, token count, domain boost) with the same reproducibility
    contract as the other samplers: a row's fate depends only on
    (id, seed, weight), never on partitioning or cluster size.

    Scale shape: the key is a pure column expression in the scan and the
    selection is `orderBy(key).limit(n)` — a distributed
    TakeOrderedAndProject (per-partition top-n + driver merge, pinned in
    tests), never a global sort. TakeOrdered's driver merge holds up to
    n rows per partition, so for corpus-scale samples
    (n >= ``prefilter_above``) a pre-filter pass bounds it first: an
    approximate quantile of the key at ~3n/N keeps ≈3n survivor rows and
    only THOSE enter the exact top-n (verified sufficient, with an
    automatic fallback to the direct path if the quantile undershot).
    Rows with NULL or non-positive weight are excluded (their inclusion
    probability is 0). Ranking and selection use the UNROUNDED key with id
    tie-breaks: ordering raw doubles is ulp-stable across engines (a flip
    needs two distinct rows' keys within ~1 ulp), whereas ranking on a
    6dp-rounded key manufactures exact ties at every rounding boundary and
    inherits ln's engine last-ulp there. The output ``sample_key`` is
    rounded (and -0.0-canonicalized) for display only; the prefilter never
    changes results — it only drops rows that cannot be in the top n.

    Output: the sampled rows with ``sample_key`` and ``sample_rank``
    (1..n by ascending key).
    """
    w = F.col(weight_col).cast("double")
    u = (hash_bucket(F.col(id_col), seed) + F.lit(1)).cast("double") / F.lit(
        float(_BUCKETS)
    )
    keyed = df.filter(w > 0).withColumn("sample_key", -F.log(u) / w)
    sel = _bounded_top(keyed, int(n), prefilter_above)
    from pyspark.sql import Window

    rank_w = Window.orderBy(F.col("sample_key").asc(), F.col(id_col))
    top = sel.orderBy(F.col("sample_key").asc(), F.col(id_col)).limit(int(n))
    return top.withColumn(
        "sample_rank", F.row_number().over(rank_w)
    ).withColumn("sample_key", F.round("sample_key", 6) + F.lit(0.0))


def _bounded_top(keyed: DataFrame, n: int, prefilter_above: int) -> DataFrame:
    """Bound the exact top-n input for large n: approx-quantile cut on
    ``sample_key`` keeps ~3n rows (exactness preserved — only rows above
    the cut, which cannot be in the top n once >= n rows sit at or below
    it, are dropped); falls back to the full frame when the sampled
    quantile undershot or the table is small."""
    if n < prefilter_above:
        return keyed
    total = keyed.count()
    if total <= 3 * n:
        return keyed
    frac = min(1.0, 3.0 * n / total)
    cut = keyed.stat.approxQuantile("sample_key", [frac], 0.01)
    if not cut:
        return keyed
    survivors = keyed.filter(F.col("sample_key") <= cut[0])
    # the cut is only a valid upper bound for the n-th key if at least n
    # rows survive; approxQuantile guarantees that within its relative
    # error, checked exactly here
    if survivors.count() < n:
        return keyed
    return survivors


def split_column(
    df: DataFrame,
    holdout_fraction: float = 0.01,
    id_col: str = "doc_id",
    seed: int = 42,
    out: str = "split",
) -> DataFrame:
    """Deterministic train/holdout labeling: 'holdout' iff
    hash_bucket(id, seed) < fraction · 2^32, else 'train'.

    A labeling (not a filter) so one pass feeds both sinks; the split is
    stable under re-partitioning and incremental reruns — a document's
    split never changes when the corpus grows, which is what keeps the
    holdout uncontaminated across pipeline versions."""
    bucket = hash_bucket(F.col(id_col), seed)
    cut = int(float(holdout_fraction) * _BUCKETS)
    return df.withColumn(
        out, F.when(bucket < cut, F.lit("holdout")).otherwise(F.lit("train"))
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-group cap: keep at most ``n`` rows per group,
    chosen by smallest salted hash (a uniform, corpus-growth-stable
    'random' n — the standard per-domain document cap in web-corpus
    curation, where one domain must not dominate the mix).

    One rank window per group ordered by (md5(id:seed), id) — md5 of the
    decimal-string id is engine-common (the stratified_sample rule; a
    native hash like xxhash64 has no DuckDB mirror), and the id tie-break
    makes the selection total and reproducible. Same shuffle shape as
    dedup_keep; hot groups cost a per-group sort bounded by the group's
    rows.
    """
    if n < 1:
        raise ValueError(f"cap_per_group needs n >= 1, got {n}")
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat_ws(":", F.col(id_col), F.lit(seed))), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def mixture_plan(
    counts: dict, targets: dict
) -> dict:
    """Per-stratum keep-fractions achieving target mixture SHARES by pure
    downsampling: the output size is maximized subject to every stratum
    hitting its share exactly — T = min_s count_s / share_s, then
    rate_s = share_s · T / count_s (the binding stratum keeps rate 1).
    Deterministic driver arithmetic over |strata| numbers.
    """
    if not targets:
        raise ValueError("mixture_plan needs at least one target share")
    tot_share = sum(targets[s] for s in sorted(targets, key=str))
    if tot_share <= 0:
        raise ValueError("target shares must sum to a positive value")
    shares = {s: w / tot_share for s, w in targets.items()}
    missing = [s for s in shares if counts.get(s, 0) <= 0 and shares[s] > 0]
    if missing:
        raise ValueError(f"strata with positive target but no rows: {missing}")
    t_max = min(counts[s] / shares[s] for s in shares if shares[s] > 0)
    return {
        s: (shares[s] * t_max / counts[s] if shares[s] > 0 else 0.0)
        for s in shares
    }


def mixture_sample(
    df: DataFrame,
    targets: dict,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Compose a training mix with target per-stratum SHARES (e.g.
    {"web": 0.6, "code": 0.3, "books": 0.1}) by deterministic
    downsampling: one count aggregate fixes the per-stratum rates
    (mixture_plan — largest corpus where every share is exact in
    expectation), then the stratified_sample hash-threshold CASE applies
    them in the scan. Strata not named in ``targets`` are dropped.
    Everything after the |strata|-row count collect is one scan
    expression: no join, no shuffle, reproducible membership."""
    counts = {
        r[strata_col]: r["__n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    rates = mixture_plan(counts, targets)
    return stratified_sample(
        df, rates, strata_col=strata_col, id_col=id_col, seed=seed,
        default_fraction=0.0,
    )


def temperature_targets(counts: dict, alpha: float = 0.7) -> dict:
    """Temperature-flattened target shares from observed stratum counts:
    q_s ∝ p_s^alpha (p_s the observed share) — the multilingual-LM
    sampling rule (mBERT/XLM-R exponential smoothing; alpha=1 keeps the
    natural mix, alpha=0 gives the uniform mix, in between up-weights
    small strata). Pure driver arithmetic over |strata| floats, exactly
    reproducible from the counts — which is what lets the DuckDB oracle
    regenerate the identical plan from its own counts."""
    if not 0.0 <= float(alpha) <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    total = sum(counts.values())
    if total <= 0:
        raise ValueError("temperature_targets needs non-empty counts")
    q = {s: (c / total) ** float(alpha) for s, c in counts.items() if c > 0}
    # sorted-key fold: collect()/fetchall() dict order is nondeterministic,
    # and the strict gate's bit-parity claim needs both engines to sum
    # these floats in the same order (order-dependent double-sum class)
    z = sum(q[s] for s in sorted(q))
    return {s: v / z for s, v in q.items()}


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.7,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Compose a temperature-flattened training mix: target shares are
    ``temperature_targets`` of the corpus's own stratum counts, applied
    by `mixture_sample`'s exact-share downsampling plan (one count
    aggregate, then a single hash-threshold scan expression — no join,
    no extra shuffle, deterministic membership). The standard
    multilingual / multi-source curation recipe: small sources are
    up-weighted relative to their natural share without ever
    up-SAMPLING (rates stay <= 1)."""
    counts = {
        r[strata_col]: r["__n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    rates = mixture_plan(counts, temperature_targets(counts, alpha))
    return stratified_sample(
        df, rates, strata_col=strata_col, id_col=id_col, seed=seed,
        default_fraction=0.0,
    )
