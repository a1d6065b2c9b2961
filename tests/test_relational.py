"""Relational surface operators (§2.5): sessionization, pivot, rollup, top-k."""

from pyspark.sql import functions as F

from views_transformation_library_spark.operators import relational


def test_sessionize_gap_split(spark):
    m = 60 * 1_000_000_000  # one minute of nanos
    rows = [
        (1, 0 * m), (1, 10 * m), (1, 50 * m),   # session 1 (gaps <= 30m... 10m, 40m? )
        (1, 100 * m),
        (2, 0 * m),
    ]
    # gaps for user 1: 10m (same session), 40m (new), 50m (new)
    ev = spark.createDataFrame(rows, schema="user_id long, ts long")
    out = relational.sessionize(ev, gap_minutes=30)
    got = {(r["unit_id"], r["session_id"]): (r["n_events"], r["duration_ticks"]) for r in out.collect()}
    assert got[(1, 1)] == (2, 10 * m)
    assert got[(1, 2)] == (1, 0)
    assert got[(1, 3)] == (1, 0)
    assert got[(2, 1)] == (1, 0)


def test_pivot_counts(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "b")]
    df = spark.createDataFrame(rows, schema="k long, t string")
    out = {r["k"]: (r["a"], r["b"]) for r in relational.pivot_counts(df, "k", "t", ["a", "b"]).collect()}
    assert out[1] == (2, 1)
    assert out[2] == (0, 1)


def test_rollup_sum(spark):
    rows = [("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 4.0)]
    df = spark.createDataFrame(rows, schema="a string, b string, v double")
    out = relational.rollup_sum(df, ["a", "b"], "v", "s").collect()
    by_key = {(r["a"], r["b"]): r["s"] for r in out}
    assert by_key[("x", "p")] == 1.0
    assert by_key[("x", None)] == 3.0  # subtotal
    assert by_key[(None, None)] == 7.0  # grand total


def test_asof_join(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 300), (4, 20, 50)],
        schema="id long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(10, 100, "a"), (10, 200, "b"), (10, 250, "c"), (20, 60, "d")],
        schema="k long, ts long, tag string",
    )
    out = relational.asof_join(
        left, right.withColumnRenamed("ts", "rts"), "k", "ts", "rts", ["tag"]
    )
    got = {r["id"]: r["tag"] for r in out.collect()}
    # ts=100 matches the rts=100 row (inclusive); 205 -> b; 300 -> c; 50 -> none
    assert got == {1: "a", 2: "b", 3: "c", 4: None}


def test_asof_join_null_payload_not_mixed(spark):
    # matched right row has a NULL field: must NOT inherit the field from an
    # earlier right row (atomic struct carry)
    left = spark.createDataFrame([(1, 10, 300)], schema="id long, k long, ts long")
    right = spark.createDataFrame(
        [(10, 100, 5.0, None), (10, 200, None, 7.0)],
        schema="k long, rts long, x double, y double",
    )
    out = relational.asof_join(left, right, "k", "ts", "rts", ["x", "y"]).collect()[0]
    assert out["x"] is None and out["y"] == 7.0  # the ts=200 row, verbatim


def test_asof_join_duplicate_right_rows_deterministic(spark):
    """Duplicate right (key, ts) rows must resolve to the SAME winner
    regardless of partitioning/arrival order (payload-hash tie-break)."""
    import random

    left = spark.createDataFrame(
        [(i, 10, 500) for i in range(5)], schema="id long, k long, ts long"
    )
    dup_rows = [(10, 500, t) for t in ["a", "b", "c", "d", "e"]]
    winners = set()
    for trial in range(4):
        rows = dup_rows[:]
        random.Random(trial).shuffle(rows)
        right = spark.createDataFrame(
            rows, schema="k long, rts long, tag string"
        ).repartition(trial + 1)
        out = relational.asof_join(left, right, "k", "ts", "rts", ["tag"])
        winners.update(r["tag"] for r in out.collect())
    # every trial and every left row saw the one hash-maximal duplicate
    assert len(winners) == 1


def test_asof_join_pandas_merge_asof_differential(spark):
    """Randomized differential vs pandas.merge_asof (backward, inclusive)
    on duplicate-free right keys — the reference semantics of every ASOF
    implementation (kdb/DuckDB/pandas agree)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    left_rows = [
        (i, int(k), int(t))
        for i, (k, t) in enumerate(zip(rng.randint(0, 5, 200), rng.randint(0, 1000, 200)))
    ]
    # unique (k, rts) on the right
    right_keys = {(int(k), int(t)) for k, t in zip(rng.randint(0, 5, 100), rng.randint(0, 1000, 100))}
    right_rows = [(k, t, float(k * 10000 + t)) for k, t in sorted(right_keys)]
    left = spark.createDataFrame(left_rows, "id long, k long, ts long")
    right = spark.createDataFrame(right_rows, "k long, rts long, val double")
    got = {
        r["id"]: r["val"]
        for r in relational.asof_join(left, right, "k", "ts", "rts", ["val"]).collect()
    }
    lp = pd.DataFrame(left_rows, columns=["id", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["k", "rts", "val"]).sort_values("rts")
    exp = pd.merge_asof(lp, rp, left_on="ts", right_on="rts", by="k",
                        direction="backward", allow_exact_matches=True)
    for _, row in exp.iterrows():
        want = None if pd.isna(row["val"]) else float(row["val"])
        assert got[row["id"]] == want, f"id {row['id']}"


def test_asof_join_tolerance_and_directions_pandas_differential(spark):
    """Randomized differential across ALL merge_asof configurations the
    operator supports: direction in {backward, forward, nearest} x
    tolerance in {None, 0, 7, 50} — pandas defines the semantics (nearest
    ties prefer backward)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(11)
    left_rows = [
        (i, int(k), int(t))
        for i, (k, t) in enumerate(zip(rng.randint(0, 5, 200), rng.randint(0, 1000, 200)))
    ]
    right_keys = {(int(k), int(t)) for k, t in zip(rng.randint(0, 5, 100), rng.randint(0, 1000, 100))}
    right_rows = [(k, t, float(k * 10000 + t)) for k, t in sorted(right_keys)]
    left = spark.createDataFrame(left_rows, "id long, k long, ts long")
    right = spark.createDataFrame(right_rows, "k long, rts long, val double")
    lp = pd.DataFrame(left_rows, columns=["id", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["k", "rts", "val"]).sort_values("rts")
    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 0, 7, 50):
            got = {
                r["id"]: r["val"]
                for r in relational.asof_join(
                    left, right, "k", "ts", "rts", ["val"],
                    tolerance=tol, direction=direction,
                ).collect()
            }
            exp = pd.merge_asof(lp, rp, left_on="ts", right_on="rts", by="k",
                                direction=direction, allow_exact_matches=True,
                                tolerance=tol)
            for _, row in exp.iterrows():
                want = None if pd.isna(row["val"]) else float(row["val"])
                assert got[row["id"]] == want, f"{direction} tol {tol} id {row['id']}"


def test_asof_join_nearest_tie_prefers_backward(spark):
    """Crafted equidistant case: left ts=10, rights at 5 and 15 — pandas
    nearest takes the backward (earlier) match on distance ties."""
    import pandas as pd

    left = spark.createDataFrame([(1, 1, 10)], "id long, k long, ts long")
    right = spark.createDataFrame(
        [(1, 5, 55.0), (1, 15, 155.0)], "k long, rts long, val double"
    )
    got = relational.asof_join(
        left, right, "k", "ts", "rts", ["val"], direction="nearest"
    ).collect()[0]["val"]
    exp = pd.merge_asof(
        pd.DataFrame({"id": [1], "k": [1], "ts": [10]}),
        pd.DataFrame({"k": [1, 1], "rts": [5, 15], "val": [55.0, 155.0]}),
        left_on="ts", right_on="rts", by="k", direction="nearest",
    )["val"][0]
    assert got == float(exp)


def test_topk_per_group(spark):
    rows = [(1, 10.0), (1, 30.0), (1, 20.0), (2, 5.0)]
    df = spark.createDataFrame(rows, schema="g long, v double")
    out = relational.topk_per_group(df, "g", "v", k=2)
    got = sorted((r["g"], r["rank"], r["v"]) for r in out.collect())
    assert got == [(1, 1, 30.0), (1, 2, 20.0), (2, 1, 5.0)]


def test_interval_join_exact_and_bucketed(spark):
    from views_transformation_library_spark import plans
    from views_transformation_library_spark.operators import relational

    pts = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 25), (4, 100), (5, 0)],
        schema="pid long, ts_s long",
    )
    iv = spark.createDataFrame(
        # second interval spans many buckets; boundaries inclusive both ends
        [(10, 5, 10), (20, 8, 95)],
        schema="iv_id long, start_s long, end_s long",
    )
    out = relational.interval_join(pts, iv, "ts_s", "start_s", "end_s", bucket_width=7)
    pairs = sorted((r["pid"], r["iv_id"]) for r in out.collect())
    assert pairs == [(1, 10), (2, 10), (2, 20), (3, 20)]
    # pairs emitted exactly once even when an interval spans many buckets
    assert len(pairs) == out.count()
    # the whole point: an equi-join plan, not a nested loop over ranges
    plan = plans.physical_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_interval_join_keyed(spark):
    from views_transformation_library_spark.operators import relational

    pts = spark.createDataFrame(
        [(1, 5, "a"), (2, 5, "b")], schema="pid long, ts_s long, k string"
    )
    iv = spark.createDataFrame(
        [(10, 0, 9, "a")], schema="iv_id long, start_s long, end_s long, k string"
    )
    out = relational.interval_join(
        pts, iv, "ts_s", "start_s", "end_s", bucket_width=4, key_col="k"
    )
    assert [(r["pid"], r["iv_id"]) for r in out.collect()] == [(1, 10)]


# ---------------------------------------------------------------------------
# time_bucket_rollup


def _rollup_events(spark):
    # 2 users-worth of events across 3 hours / 2 days, values with 2dp
    rows = [
        (0, "click", 1.25), (1800_000_000, "click", 2.50),
        (3600_000_000, "view", 0.10), (5400_000_000, "click", 7.07),
        (86400_000_000, "click", 3.33), (90000_000_000, "view", 9.99),
    ]
    return spark.createDataFrame(rows, "__us long, event_type string, value double")


def test_time_bucket_rollup_levels_and_associativity(spark):
    out = relational.time_bucket_rollup(_rollup_events(spark)).collect()
    hours = {(r["bucket"], r["event_type"]): r for r in out if r["granularity"] == "hour"}
    days = {(r["bucket"], r["event_type"]): r for r in out if r["granularity"] == "day"}
    assert hours[(0, "click")]["n_events"] == 2
    assert str(hours[(0, "click")]["sum_value"]) == "3.75"
    # day level is rolled up FROM hours; must equal a direct day aggregate
    assert days[(0, "click")]["n_events"] == 3
    assert str(days[(0, "click")]["sum_value"]) == "10.82"
    assert str(days[(1, "view")]["sum_value"]) == "9.99"


def test_time_bucket_rollup_custom_widths_and_validation(spark):
    import pytest as _pytest

    ev = _rollup_events(spark)
    # custom integer widths (30 min -> 2 h)
    out = relational.time_bucket_rollup(
        ev, granularities=(1800_000_000, 7200_000_000)
    ).collect()
    assert {r["granularity"] for r in out} == {"1800000000", "7200000000"}
    with _pytest.raises(ValueError, match="exact multiple"):
        relational.time_bucket_rollup(ev, granularities=("hour", 5000_000_000))
    with _pytest.raises(ValueError, match="unknown granularity"):
        relational.time_bucket_rollup(ev, granularities=("fortnight",))


# ---------------------------------------------------------------------------
# funnel + cohort retention


def test_funnel_ordered_semantics(spark):
    # user 1 completes a->b->c in order; user 2 has c BEFORE b (no step 3);
    # user 3 only a; user 4 nothing relevant
    rows = [
        (1, "a", 10), (1, "b", 20), (1, "c", 30),
        (2, "a", 10), (2, "c", 15), (2, "b", 20),
        (3, "a", 5),
        (4, "x", 1),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, __t long")
    out = {r["unit_id"]: r for r in
           relational.funnel(ev, ["a", "b", "c"], ts_col="__t").collect()}
    assert (out[1]["step_1_ts"], out[1]["step_2_ts"], out[1]["step_3_ts"]) == (10, 20, 30)
    assert out[1]["steps_reached"] == 3
    assert out[2]["steps_reached"] == 2 and out[2]["step_3_ts"] is None
    assert out[3]["steps_reached"] == 1
    assert out[4]["steps_reached"] == 0


def test_funnel_greedy_earliest_is_optimal(spark):
    # b appears between two a's: greedy picks a@1 then b@5; a second chance
    # (a@10, b@?) must not be needed
    rows = [(1, "a", 1), (1, "a", 10), (1, "b", 5)]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, __t long")
    out = relational.funnel(ev, ["a", "b"], ts_col="__t").collect()[0]
    assert (out["step_1_ts"], out["step_2_ts"], out["steps_reached"]) == (1, 5, 2)


def test_cohort_retention_triangle(spark):
    # user 1 first day 0, active days 0,1,3; user 2 first day 1, active 1;
    # user 3 first day 0, active 0,1
    rows = [(1, 0), (1, 1), (1, 3), (1, 1), (2, 1), (3, 0), (3, 1)]
    ev = spark.createDataFrame(rows, "user_id long, __day long")
    out = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in relational.cohort_retention(ev).collect()}
    assert out[(0, 0)] == 2 and out[(0, 1)] == 2 and out[(0, 3)] == 1
    assert out[(1, 0)] == 1
    assert (1, 1) not in out


def test_transition_counts(spark):
    rows = [
        (1, 1, "a", 10), (2, 1, "b", 20), (3, 1, "a", 30),
        (4, 2, "a", 5), (5, 2, "a", 6),
        (6, 3, "c", 1),  # single event: no transition
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long"
    )
    out = {(r["from_type"], r["to_type"]): r["n_transitions"]
           for r in relational.transition_counts(ev).collect()}
    assert out == {("a", "b"): 1, ("b", "a"): 1, ("a", "a"): 1}


def test_tpch_shared_sql_passthrough(spark):
    # the SAME SQL string runs on spark.sql and (in the oracle gate) DuckDB;
    # here: sanity that the Spark side produces non-trivial, deterministic rows
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    out = e._shared_sql_query(
        spark, "/root/testdata/sf0.001", e._TPCH_SHARED_SQL["tpch_q6"]
    ).collect()
    assert len(out) == 1 and out[0]["n_rows"] > 0
    q5 = e._shared_sql_query(
        spark, "/root/testdata/sf0.001", e._TPCH_SHARED_SQL["tpch_q5"]
    ).collect()
    assert 0 < len(q5) <= 25  # one row per nation in ASIA
