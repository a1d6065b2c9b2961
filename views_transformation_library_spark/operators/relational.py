"""Relational surface (SURVEY.md §2.5).

The reference has no general relational operators, but its shapes (group-by
aggregates, top-k, rollups, gaps-and-islands) all appear inside its
transforms — here they are exposed as first-class operators over the star
schema, each Catalyst-native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

NANOS_PER_SEC = 1_000_000_000


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "user_id",
    ts_unit: str = "ns",
) -> DataFrame:
    """Classic sessionization: a new session starts when the gap to the
    previous event exceeds `gap_minutes`. Gaps-and-islands — the same
    two-window single-shuffle shape as cweq.

    Returns one row per (user, session): session_id (1-based per user),
    n_events, duration in ticks + seconds. Works on integer-epoch
    timestamps; ts_unit ('ns' | 'us') names the tick size (the driver's
    events table reads as nanos-long via panel.read_events)."""
    per_sec = NANOS_PER_SEC if ts_unit == "ns" else 1_000_000
    gap_nanos = gap_minutes * 60 * per_sec
    w = Window.partitionBy(key_col).orderBy(ts_col)
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    with_breaks = events.withColumn(
        "__new_session",
        F.when(
            (F.col(ts_col) - F.lag(ts_col).over(w)) > gap_nanos, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    with_ids = with_breaks.withColumn(
        "session_id", F.sum("__new_session").over(w_cum) + 1
    )
    return (
        with_ids.groupBy(F.col(key_col).alias("unit_id"), "session_id")
        .agg(
            F.count("*").alias("n_events"),
            # session bounds in ticks — also what the streaming
            # batch-equivalence check compares against sessionize_stream
            F.min(ts_col).alias("start_tick"),
            F.max(ts_col).alias("end_tick"),
            # integer ticks is the exact value; the seconds column is derived
            # (float division can land on round-half boundaries)
            (F.max(ts_col) - F.min(ts_col)).alias("duration_ticks"),
            ((F.max(ts_col) - F.min(ts_col)) / per_sec).alias("duration_secs"),
        )
    )


def pivot_counts(
    df: DataFrame, key_col: str, pivot_col: str, values: list[str]
) -> DataFrame:
    """Pivot with an explicit value list (never let Spark scan for distinct
    pivot values on big data — that is an extra job)."""
    return df.groupBy(key_col).pivot(pivot_col, values).count().na.fill(0)


def rollup_sum(df: DataFrame, group_cols: list[str], agg_col: str, out: str) -> DataFrame:
    """ROLLUP aggregate — subtotals per prefix of group_cols plus a grand
    total (NULL group keys mark the subtotal rows, SQL-standard)."""
    return df.rollup(*group_cols).agg(F.sum(agg_col).alias(out))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (a native operator Spark lacks; DuckDB/kdb call it ASOF
    JOIN), pandas `merge_asof` semantics across all three directions:

    - ``backward`` (default): latest right row with right_ts <= left_ts;
    - ``forward``: earliest right row with right_ts >= left_ts;
    - ``nearest``: whichever of the two is closer in time (ties prefer
      backward, matching pandas).

    ``tolerance`` (same ts units) bounds the match gap per direction; an
    out-of-tolerance match becomes NULLs, the left row survives.

    Union-trick implementation — exact and single-shuffle: tag both sides,
    sort (key, ts, side) with right rows first at equal ts (inclusive on
    both bounds), then carry the right payload atomically (one struct, so
    NULL fields in a matched right row never mix with other rows) and keep
    the left rows. Backward carries last-over-preceding; forward carries
    over the REVERSED in-partition sort (same hash partitioning — Spark
    adds a second in-partition sort, never a second exchange); nearest
    computes both in the one pass and picks per row. The matched right
    timestamp rides inside the struct, so tolerance/nearest checks are
    cheap post-projections. Scales as a window over |left| + |right| rows —
    no range-join blowup, no per-key loops. Duplicate right rows per
    (key, ts) are resolved DETERMINISTICALLY: the window ordering carries a
    payload-hash tie-break column, so the winner (greatest xxhash64 of the
    right payload) is stable across partitionings and runs.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    rtypes = dict(right.dtypes)
    ts_type = rtypes[right_ts]
    # the matched right row's ts rides inside the carried struct so the
    # (payload, ts) pair stays atomic under last/first(ignorenulls)
    rrow_type = (
        "struct<__rts:" + ts_type + ","
        + ",".join(f"{c}:{rtypes[c]}" for c in right_cols) + ">"
    )
    lk = left.select(
        F.col(key_col).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast(rrow_type).alias("__rrow"),
    )
    rk = right.select(
        F.col(key_col).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        # deterministic duplicate-(key, ts) resolution: rank equal-ts right
        # rows by a hash of their payload, not by partition arrival order
        F.xxhash64(F.struct(*right_cols)).alias("__tie"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("__lrow"),
        # the whole right payload travels as ONE struct so NULL fields inside
        # a matched row never mix with fields from earlier rows
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
        ).alias("__rrow"),
    )
    unioned = lk.unionByName(rk)
    # backward sweep: ascending ts, right rows first at equal ts so the
    # inclusive <= sees them in the preceding frame
    w_back = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward sweep: DESCENDING ts with right rows still first at equal ts
    # (side asc) — last-over-preceding in this order is the earliest right
    # row with rts >= ts, inclusive. Same partitioning, so Catalyst plans
    # one exchange + two in-partition sorts, never a second shuffle.
    w_fwd = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").desc(), "__side", F.col("__tie"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = {"__side": F.col("__side"), "__ts": F.col("__ts"), "__lrow": F.col("__lrow")}
    if direction in ("backward", "nearest"):
        carry["__b"] = F.last("__rrow", ignorenulls=True).over(w_back)
    if direction in ("forward", "nearest"):
        carry["__f"] = F.last("__rrow", ignorenulls=True).over(w_fwd)
    carried = unioned.select(*[expr.alias(name) for name, expr in carry.items()])
    out = carried.filter(F.col("__side") == 1)

    def _within(struct_col, gap):
        cond = struct_col.isNotNull()
        if tolerance is not None:
            cond = cond & (gap <= F.lit(tolerance))
        return F.when(cond, struct_col)

    if direction == "backward":
        rrow = _within(F.col("__b"), F.col("__ts") - F.col("__b.__rts"))
    elif direction == "forward":
        rrow = _within(F.col("__f"), F.col("__f.__rts") - F.col("__ts"))
    else:
        b = _within(F.col("__b"), F.col("__ts") - F.col("__b.__rts"))
        f = _within(F.col("__f"), F.col("__f.__rts") - F.col("__ts"))
        # nearest: closer wins; ties prefer backward (pandas semantics)
        rrow = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(
                F.col("__f.__rts") - F.col("__ts")
                < F.col("__ts") - F.col("__b.__rts"),
                f,
            )
            .otherwise(b)
        )
    out = out.withColumn("__rrow", rrow)
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rrow.{c}").alias(c) for c in right_cols],
    )


def topk_per_group(
    df: DataFrame, group_col: str, order_col: str, k: int, ascending: bool = False
) -> DataFrame:
    """Top-k rows per group via ROW_NUMBER (deterministic: ties broken by
    the ordering column then arbitrary stable columns supplied by caller)."""
    ob = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(group_col).orderBy(ob)
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def with_expr(df: DataFrame, out: str, expr: str) -> DataFrame:
    """Spec-surface escape hatch: derive a column from a SQL expression
    (`{"type": "with_expr", "args": ["stratum", "doc_id % 3"]}`). Pure
    Catalyst expression — folds into the surrounding scan/projection."""
    return df.withColumn(out, F.expr(expr))


def where_expr(df: DataFrame, condition: str) -> DataFrame:
    """Spec-surface row filter from a SQL boolean expression
    (`{"type": "where_expr", "args": ["keep"]}`). Declarative, so Catalyst
    pushes it down as far as the referenced columns allow — note that
    pushing a predicate through a Project SUBSTITUTES aliases: filtering
    on an expensively-derived column right above its projection re-derives
    the whole expression tree inside the scan predicate (measured 66
    regexp_replace copies in the llm_pipeline scan filter). Place such
    filters above a pushdown barrier (Window/Aggregate) when the deriving
    expressions are heavy — see LLM_PIPELINE_SPEC's ordering."""
    return df.filter(F.expr(condition))


def select_cols(df: DataFrame, *cols: str) -> DataFrame:
    """Spec-surface projection (`{"type": "select_cols", "args":
    ["doc_id", "text_norm"]}`): prune carried columns before a shuffle so
    the exchange moves only what downstream steps read."""
    return df.select(*cols)


def parse_json_fields(
    df: DataFrame,
    col: str,
    fields: dict[str, str],
) -> DataFrame:
    """Extract typed fields from a JSON-string column (semi-structured
    event properties — the `props` column every event pipeline carries).

    ``fields``: {json_key: spark_type}. `get_json_object` is a pure JVM
    expression (one shared parse per row under codegen), so extraction
    runs at scan speed and the projected fields push through column
    pruning; rows where the key is absent, the document is malformed, OR
    the value does not cast to the requested type yield NULL (never an
    error) — the tolerant semantics ingest needs. The cast must be
    try_cast: plain cast() throws CAST_INVALID_INPUT under the ANSI mode
    this Spark 4 build enables by default. For deeply nested / repeated
    access patterns prefer `from_json` with a full schema; for k scalar
    fields this form avoids declaring one.
    """
    return df.withColumns(
        {
            name: F.get_json_object(F.col(col), f"$.{name}").try_cast(dtype)
            for name, dtype in fields.items()
        }
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    key_col: str | None = None,
) -> DataFrame:
    """Points-in-intervals join: every (point, interval) pair with
    start <= ts <= end (inclusive), as an EQUI-join — never the
    BroadcastNestedLoopJoin Spark plans for a bare range predicate.

    Bucket pruning: each interval explodes into the coarse time buckets it
    overlaps (`sequence(start div B, end div B)`); each point maps to its
    single bucket. The equi-join on bucket (plus ``key_col`` when the
    schema has a shared key) touches only co-bucketed pairs, then the exact
    range filter runs on that candidate set. A point lives in exactly one
    bucket and an interval appears once per bucket, so pairs are emitted
    exactly once — no distinct needed. Candidates scale as
    Σ_intervals (length/B + 1) × (points per bucket): pick ``bucket_width``
    near the median interval length so each interval explodes into O(1)
    buckets and each bucket holds a bounded point set (the standard
    interval-indexing trade-off). All timestamp math is integer (epoch
    units) — no doubles anywhere near the join keys.
    """
    b = int(bucket_width)
    if b <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width!r}")
    pt = points.withColumn("__bk", F.expr(f"{ts_col} DIV {b}"))
    iv = intervals.withColumn(
        "__bk",
        F.explode(F.sequence(F.expr(f"{start_col} DIV {b}"), F.expr(f"{end_col} DIV {b}"))),
    )
    on = ["__bk"] if key_col is None else ["__bk", key_col]
    return (
        pt.join(iv, on)
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("__bk")
    )


# canonical bucket widths in MICROSECONDS (finest -> coarsest)
TIME_BUCKET_WIDTHS = {
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}


def time_bucket_rollup(
    events: DataFrame,
    epoch_us_col: str = "__us",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    granularities: tuple[str, ...] = ("hour", "day"),
    value_decimal: str = "decimal(18,2)",
) -> DataFrame:
    """Multi-granularity time-bucket rollup — the continuous-aggregate /
    OLAP-cube-over-time shape (TimescaleDB continuous aggregates, Druid
    rollup): ONE pass over the raw events aggregates to the FINEST bucket;
    every coarser level is then rolled up FROM the previous level's
    aggregate, never from raw events again. At 100 TB that's the whole
    point: the raw scan happens once, and each further level aggregates
    |buckets_finer| rows.

    ``epoch_us_col`` must hold integer epoch microseconds (use
    panel.epoch_micros — type-adaptive across the testdata's nanos/micros
    parquet generations). Buckets are integer indices us // width, so the
    whole pipeline is integer-exact; each coarser width must be an exact
    multiple of the previous one. The measure sums through DECIMAL
    (``value_decimal``), which makes sums-of-sums exactly associative —
    level k computed from level k-1 equals level k computed from raw, and
    both engines agree byte-for-byte (the panel-aggregation parity rule).

    Output: (granularity, bucket, *key_cols, n_events, sum_value) for
    every requested granularity, unioned. Each intermediate level is
    localCheckpointed — it feeds both its coarser level and the union
    (the quadtree-levels lesson: un-checkpointed chained aggregates
    re-run the whole chain per union branch).
    """
    from ..panel import materialize

    widths = []
    for g in granularities:
        w = TIME_BUCKET_WIDTHS.get(g) if isinstance(g, str) else int(g)
        if w is None:
            raise ValueError(f"unknown granularity {g!r}; use one of "
                             f"{sorted(TIME_BUCKET_WIDTHS)} or an int width in µs")
        widths.append((str(g), w))
    for (_, a), (_, b) in zip(widths, widths[1:]):
        if b % a != 0:
            raise ValueError(
                f"granularities must be fine->coarse with exact multiples; "
                f"{b} µs is not a multiple of {a} µs"
            )
    keys = list(key_cols)
    g0, w0 = widths[0]
    level = events.groupBy(
        F.expr(f"{epoch_us_col} DIV {w0}").alias("bucket"), *keys
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast(value_decimal))
        .cast(value_decimal)
        .alias("sum_value"),
    )
    out_levels = []
    for i, (g, w) in enumerate(widths):
        if i > 0:
            ratio = w // widths[i - 1][1]
            level = level.groupBy(
                F.expr(f"bucket DIV {ratio}").alias("bucket"), *keys
            ).agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").cast(value_decimal).alias("sum_value"),
            )
        level = materialize(level)
        out_levels.append(level.select(F.lit(g).alias("granularity"), "*"))
    out = out_levels[0]
    for lv in out_levels[1:]:
        out = out.unionByName(lv)
    return out


def funnel(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: for each user, the earliest time each step
    can be completed IN ORDER (step k's event must be strictly after the
    chosen step k-1 event — the classic product-analytics funnel, greedy
    earliest-completion semantics, which is optimal: taking the earliest
    valid event for each step never excludes a later completion).

    Output: (user_id, step_1_ts..step_K_ts, steps_reached). ONE shuffle:
    all K step times are stacked conditional window-mins over the same
    user partition — min(ts WHERE type=s_k AND ts > t_{k-1}) — so the
    whole funnel is a single pass whatever K is. Times are integer epoch
    ticks (caller supplies, e.g. panel.epoch_micros) — engine-exact.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    out = events
    prev: F.Column | None = None
    ts_cols = []
    for k, s in enumerate(steps, start=1):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        t_k = F.min(F.when(cond, F.col(ts_col))).over(w)
        name = f"step_{k}_ts"
        out = out.withColumn(name, t_k)
        ts_cols.append(name)
        prev = F.col(name)
    # single row per user
    agg = out.groupBy(F.col(user_col).alias("unit_id")).agg(
        *[F.min(c).alias(c) for c in ts_cols]
    )
    reached = F.lit(0)
    for k in range(1, len(steps) + 1):
        reached = F.when(F.col(f"step_{k}_ts").isNotNull(), F.lit(k)).otherwise(
            reached
        )
    return agg.withColumn("steps_reached", reached.cast("int"))


def cohort_retention(
    events: DataFrame,
    epoch_day_col: str = "__day",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention triangle: users are cohorted by their FIRST active
    day; for every (cohort_day, day_offset) the number of cohort users
    active exactly day_offset days after their first day. The classic
    growth-analytics rollup, all integer counting.

    Two hash aggregates: distinct (user, day) activity (map-side
    combined), a cohort window-min per user, then the (cohort, offset)
    count — shuffle volume is active-days, then one row per user-day.
    ``epoch_day_col`` holds integer epoch days (panel.epoch_day).
    """
    act = events.select(
        F.col(user_col).alias("u"), F.col(epoch_day_col).alias("d")
    ).distinct()
    with_cohort = act.withColumn(
        "cohort_day", F.min("d").over(Window.partitionBy("u"))
    )
    return (
        with_cohort.groupBy(
            "cohort_day", (F.col("d") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def transition_counts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    tie_col: str | None = "event_id",
) -> DataFrame:
    """First-order event-transition counts (the Markov-chain view of user
    behaviour): for each consecutive pair of events per user (time order,
    ``tie_col`` breaking equal timestamps deterministically), count
    (from_type, to_type) occurrences corpus-wide.

    One window shuffle on the user + one map-side-combined hash aggregate
    over |type|² keys — trivially scalable. Integer output.
    """
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    nxt = events.withColumn("__next", F.lead(type_col).over(w))
    return (
        nxt.filter(F.col("__next").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"), F.col("__next").alias("to_type")
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
