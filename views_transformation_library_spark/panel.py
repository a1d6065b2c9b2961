"""Panel contract: key columns, validation, densification, builders.

The reference's canonical layout is a pandas MultiIndex ``(timevar, groupvar)``
(`views_2.py:1-7`); tensor ops hard-require a *complete* grid
(`utilities.py:26-27`). Here the contract is two BIGINT key columns plus
DOUBLE features, and completeness is an explicit, cheap-to-apply
densification (cross join of distinct keys) instead of an assertion.

Scale note: ``densify`` produces |T| x |U| rows via a broadcast cross join of
two *small* key dimensions (each is a distinct-projection of one column — KBs
even when the fact table is 100 TB), then one shuffle-join back to the data.
Positional window ops (lag/shift) are only correct on a dense panel, same as
the reference (SURVEY.md §7 "positional vs value-based lags").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TIME = "time_id"
UNIT = "unit_id"
KEYS = [TIME, UNIT]


def feature_cols(df: DataFrame) -> list[str]:
    """Feature columns = all non-key columns (schema discovery mirrors
    `utilities.py:107-118` which reads features off df.columns)."""
    return [c for c in df.columns if c not in KEYS]


def one_feature(df: DataFrame) -> str:
    feats = feature_cols(df)
    if len(feats) != 1:
        raise ValueError(f"expected exactly one feature column, got {feats}")
    return feats[0]


def validate(df: DataFrame) -> DataFrame:
    missing = [k for k in KEYS if k not in df.columns]
    if missing:
        raise ValueError(f"panel missing key columns {missing}; has {df.columns}")
    return df


def is_complete(df: DataFrame) -> bool:
    """Completeness check mirroring the reference's tensorisability assertion
    (`utilities.py:26-27`): row count == n_times * n_units. Triggers a job —
    use in tests/debug, not in hot paths."""
    n, nt, nu = (
        df.count(),
        df.select(TIME).distinct().count(),
        df.select(UNIT).distinct().count(),
    )
    return n == nt * nu


def materialize(df: DataFrame) -> DataFrame:
    """Materialize a panel once so operators that reference it from several
    plan branches (self-joins, driver-side key collects + the main plan) do
    not re-run the upstream build per branch.

    ``localCheckpoint`` stores the frame's blocks on the executors and
    truncates lineage — Catalyst does not reuse a duplicated upstream subplan
    across self-join branches, so without this a panel built from an
    aggregation pipeline is recomputed for every branch (measured 2-4 full
    rebuilds per operator at sf0.1). ``eager=False``: the blocks materialize
    inside the FIRST job that touches the frame (usually a broadcast-distinct
    subquery) instead of a dedicated blocking job — same once-per-branch
    compute, one less job launch per panel build (r3 A/B: lazy ≥ eager on
    every multi-branch query, tools/exp_panel_pin.py). Lineage is truncated
    at plan-build time either way, so iterative consumers (grid_lag) still
    cannot OOM the analyzer. Panels are bounded by |T| x |U| rows per
    feature, so the stored footprint is small relative to the fact data even
    at 100 TB input; on a cluster, a bucketed persisted panel
    (``write_bucketed``) serves the same role across *jobs*, this serves it
    across *branches within one job*. Streaming frames pass through unchanged
    (checkpointing is a batch concept)."""
    if df.isStreaming:
        return df
    # eager=True (default since r10). eager=False shared the
    # materialization with the first consumer job, but when that first
    # consumer was a broadcast-subquery job racing the main job, the
    # finisher's doCheckpoint truncated lineage and dropped the only
    # strong refs to upstream SQLMetric accumulators while the other
    # job's tasks were in flight — their completion logged a non-fatal
    # "ERROR DAGScheduler: Failed to update accumulator" on every panel
    # query (UI metrics only; data, results, timings unaffected —
    # root-caused r10, repro: tools/repro_accum_gc.py, 50 ERRORs lazy /
    # 0 eager on the entry flagship). The r3 lazy-wins A/B no longer
    # holds: the r10 counterbalanced ABBA over the 9 panel-heavy bench
    # queries at sf0.1 is a wash (lazy 12.551 s vs eager 12.612 s,
    # 1.00x, per-query ±4% both directions — BENCH_NOTES_r10.md), so
    # eager buys a clean scheduler log for free. SPARK_GRAFT_EAGER_MAT=0
    # forces the old lazy behavior (kept reachable for A/Bs).
    eager = os.environ.get("SPARK_GRAFT_EAGER_MAT", "1") != "0"
    return df.localCheckpoint(eager=eager)


def materialize_counted(df: DataFrame):
    """``materialize`` plus a row count riding the SAME checkpoint job.

    Size-gated operators (connected_components' driver cap, pagerank's,
    grid_lag's mesh bound, decontaminate's broadcast gate) all follow
    materialize-then-count; the dedicated ``.count()`` job is pure driver
    job latency — the r11 ngram_jaccard observation-counter pattern makes
    the eager checkpoint job itself produce the count via an unnamed
    ``Observation`` (a CollectMetrics node; it lives only in the
    checkpointed plan, so downstream consumers read the plain RDD scan
    with no pushdown barrier). Returns ``(materialized_df, count_fn)``;
    ``count_fn()`` reads the observation non-blockingly and falls back to
    a plain ``.count()`` when no action has populated it (lazy
    materialize mode, SPARK_GRAFT_EAGER_MAT=0)."""
    from pyspark.sql import Observation

    obs = Observation()
    out = materialize(df.observe(obs, F.count(F.lit(1)).alias("__n")))

    def count_fn() -> int:
        jo = getattr(obs, "_jo", None)
        # probe with getRowOrEmpty — the JVM getOrEmpty map NPEs via py4j
        # before the metrics row exists (r8)
        if jo is None or jo.getRowOrEmpty().isEmpty():
            return out.count()
        return int(jo.getOrEmpty().apply("__n"))

    return out, count_fn


# The PRIO-GRID unit axis is structurally bounded at 720 x 360 = 259,200
# cells (reference splag4d.py / spatial_tree.py build full-grid arrays at
# exactly this size); the monthly time axis is a few thousand at most.
UNIT_AXIS_CAP = 259_200
TIME_AXIS_CAP = 100_000


def collect_axis(
    df: DataFrame, col: str, cap: int, what: str = "axis"
) -> tuple:
    """Driver-side pull of a bounded KEY AXIS (distinct grid ids / time
    steps) as a sorted tuple — the shape the lru_cached tree/fourier
    geometry builders key on.

    The driver-side geometry/walk construction in trees/fourier/spacetime
    is safe ONLY because these axes are structurally bounded (grid cells
    <= 259,200, months in the low thousands) no matter how many fact rows
    exist. The LIMIT-bounded collect turns a mis-keyed call — a fact-table
    id column, an un-aggregated event stream — into a clear error instead
    of a driver OOM: at most cap+1 rows ever reach the driver."""
    rows = df.select(col).distinct().limit(int(cap) + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"{what} ({col!r}) has more than {cap:,} distinct values — "
            "this is not a bounded key axis. Driver-side geometry "
            "construction requires a panel keyed by a bounded axis "
            "(grid unit ids <= 259,200; time steps in the thousands); "
            "check that the column is the panel key, not a fact id."
        )
    return tuple(sorted(r[0] for r in rows))


def densify(
    df: DataFrame, fill: float | None = 0.0, time_range: bool = False
) -> DataFrame:
    """Complete the (time, unit) grid; absent cells get ``fill`` (None -> NULL).

    Distinct-key dimensions are tiny -> broadcast cross join, then a single
    left join back to the data (one shuffle on the join keys, which Catalyst
    reuses for any subsequent window partitioned the same way).

    ``time_range=True`` completes the integer time axis over the observed
    ``[min, max]`` range instead of only the observed values — the repair for
    the "gapless integer time axis" contract the tree/fourier operators
    assert (a timestep with zero rows anywhere is invisible to a distinct).
    Registry spec: ``{"type": "densify", "kwargs": {"time_range": true}}``.
    """
    validate(df)
    if time_range:
        times = (
            df.agg(F.min(TIME).alias("__tmin"), F.max(TIME).alias("__tmax"))
            .select(F.explode(F.sequence("__tmin", "__tmax")).alias(TIME))
        )
    else:
        times = df.select(TIME).distinct()
    units = df.select(UNIT).distinct()
    grid = F.broadcast(times).crossJoin(F.broadcast(units))
    out = grid.join(df, KEYS, "left")
    if fill is not None:
        out = out.na.fill(fill, subset=feature_cols(df))
    return out


def panel_from_events(
    spark: SparkSession,
    sf_dir: str,
    value_col: str = "value",
    event_type: str | None = None,
) -> DataFrame:
    """Build the canonical panel from the driver's ``events`` table.

    time_id = epoch day of ts, unit_id = user_id, value = sum(value).
    The sum goes through DECIMAL(18,2) so it is exact and independent of
    partition/accumulation order (event values are 2-decimal; float summation
    order would otherwise make the DuckDB-oracle hash flaky).
    """
    ev = read_events(spark, sf_dir)
    if event_type is not None:
        ev = ev.filter(F.col("event_type") == event_type)
    agg = ev.groupBy(
        epoch_day(ev).alias(TIME),
        F.col("user_id").alias(UNIT),
    ).agg(
        F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("value")
    )
    # densify references the aggregate from THREE branches (times distinct,
    # units distinct, the grid join) and Catalyst does not share the
    # subplan: without pinning, every panel build re-runs the full events
    # scan + aggregate 3x. The aggregate is panel-sized (times x active
    # units), so one localCheckpoint is cheap and every downstream branch
    # reads it instead of the 100 TB source.
    return densify(materialize(agg), fill=0.0)


NANOS_PER_DAY = 86_400_000_000_000


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table, self-applying the confs a vanilla (driver)
    session needs: the legacy nanosAsLong conf in case events.parquet
    stores TIMESTAMP(NANOS) (Spark's reader rejects it otherwise; the
    conf is inert when the data is µs), and UTC session time zone so
    NTZ-timestamp → epoch conversions are host-TZ-independent. Callers
    must treat ts as EITHER BIGINT nanos or TIMESTAMP — derive keys via
    `epoch_day` / `epoch_micros`, which dispatch on the actual type.

    DELIBERATE GLOBAL SIDE EFFECT: both confs persist on the session after
    this call (save/restore would not work — the TZ must still be in force
    when the returned frame's plan *executes*, long after this function
    returns). Sessions built via `session.get_spark` already pin both at
    build time, making this a no-op; only an externally-built session (the
    driver's vanilla one) is mutated, which is exactly the contract this
    library needs for engine-parity keys."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def epoch_day(ev: DataFrame, ts_col: str = "ts"):
    """Epoch-day key from ts, exact for both physical types.

    Integer `DIV` (not float division: nanos exceed double's 53-bit mantissa)
    when ts is nanos-long; datediff when it is a real timestamp."""
    dtype = dict(ev.dtypes).get(ts_col)
    if dtype in ("bigint", "long"):
        # FLOOR division (DIV truncates toward zero, which would shift
        # pre-1970 timestamps by a day): subtract the non-negative pmod
        # remainder first, then the division is exact
        return F.expr(
            f"({ts_col} - pmod({ts_col}, {NANOS_PER_DAY})) DIV {NANOS_PER_DAY}"
        ).cast("long")
    return F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).cast("long")


def epoch_micros(ev: DataFrame, ts_col: str = "ts"):
    """Epoch-microsecond key from ts, exact for both physical types
    (BIGINT nanos → integer DIV; TIMESTAMP/TIMESTAMP_NTZ → unix_micros
    under the UTC session TZ read_events pins). Matches DuckDB's
    ``epoch_us(ts)`` on the same parquet either way."""
    dtype = dict(ev.dtypes).get(ts_col)
    if dtype in ("bigint", "long"):
        return F.expr(f"{ts_col} DIV 1000").cast("long")
    return F.unix_micros(F.col(ts_col).cast("timestamp")).cast("long")


def write_bucketed(df: DataFrame, table: str, n_buckets: int = 32, mode: str = "overwrite") -> None:
    """Persist a panel bucketed+sorted by the window keys.

    A panel read back from this table carries HashPartitioning(unit_id)
    from the scan, so every window chain over it runs with ZERO exchanges
    (pinned in tests/test_plans.py) — the cheap way to amortize the one
    shuffle across many transform jobs at scale."""
    df.write.mode(mode).bucketBy(n_buckets, UNIT).sortBy(UNIT, TIME).saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


# DuckDB-side mirror of panel_from_events, used as a CTE prefix by oracle_sql().
PANEL_SQL = """
panel_agg AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))::BIGINT AS time_id,
         user_id AS unit_id,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
  FROM events {where}
  GROUP BY 1, 2
),
panel AS (
  SELECT g.time_id, g.unit_id, coalesce(a.value, 0.0) AS value
  FROM (SELECT t.time_id, u.unit_id
        FROM (SELECT DISTINCT time_id FROM panel_agg) t
        CROSS JOIN (SELECT DISTINCT unit_id FROM panel_agg) u) g
  LEFT JOIN panel_agg a USING (time_id, unit_id)
)
"""


def panel_sql(event_type: str | None = None) -> str:
    where = f"WHERE event_type = '{event_type}'" if event_type else ""
    return PANEL_SQL.format(where=where)
