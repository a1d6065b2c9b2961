"""Property-based tests (hypothesis) for algebraic operator laws
(SURVEY.md §5 point 4 — absent in the reference, added here)."""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from conftest import collect_panel, make_panel
from views_transformation_library_spark.operators import missing, scalar, temporal

panel_values = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False).map(lambda x: round(x, 3)),
    min_size=4,
    max_size=10,
)


@settings(max_examples=6, deadline=None)
@given(vals=panel_values, k=st.integers(min_value=1, max_value=3))
def test_tlag_tlead_roundtrip(spark, vals, k):
    rows = [(t, 1, v) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    out = collect_panel(temporal.tlead(temporal.tlag(df, k), k))
    # interior rows recover the original; edges are null
    for (u, t, v) in out:
        if k <= t < len(vals) - k:
            assert v == pytest.approx(vals[t])


@settings(max_examples=6, deadline=None)
@given(vals=panel_values)
def test_delta_is_s_minus_tlag(spark, vals):
    rows = [(t, 1, v) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    d = [v for (_, _, v) in collect_panel(temporal.delta(df, 1))]
    lag = [v for (_, _, v) in collect_panel(temporal.tlag(df, 1))]
    for i in range(len(vals)):
        if lag[i] is None:
            assert d[i] is None
        else:
            assert d[i] == pytest.approx(vals[i] - lag[i])


@settings(max_examples=6, deadline=None)
@given(vals=st.lists(st.sampled_from([0.0, 0.0, 1.0, 2.0]), min_size=4, max_size=12))
def test_cweq_resets_on_break(spark, vals):
    rows = [(t, 1, v) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    out = [v for (_, _, v) in collect_panel(temporal.cweq(df, 0))]
    run = 0
    for i, v in enumerate(vals):
        run = run + 1 if v == 0.0 else 0
        assert out[i] == run


@settings(max_examples=6, deadline=None)
@given(vals=panel_values)
def test_moving_sum_window_one_is_identity(spark, vals):
    rows = [(t, 1, v) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    out = [v for (_, _, v) in collect_panel(temporal.moving_sum(df, 1))]
    assert out == pytest.approx(vals)


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(min_value=-10, max_value=10, allow_nan=False)),
        min_size=4,
        max_size=10,
    )
)
def test_fill_both_leaves_no_nulls_unless_all_null(spark, vals):
    rows = [(t, 1, v) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    out = [v for (_, _, v) in collect_panel(missing.fill(df, "both", None))]
    if all(v is None for v in vals):
        assert all(v is None for v in out)
    else:
        assert all(v is not None for v in out)


@settings(max_examples=6, deadline=None)
@given(vals=st.lists(st.floats(min_value=0, max_value=50, allow_nan=False), min_size=3, max_size=8))
def test_entropy_bounds(spark, vals):
    rows = [(t, 1, v) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    w = 3
    out = [v for (_, _, v) in collect_panel(temporal.temporal_entropy(df, w, offset=1.0))]
    for v in out:
        assert -1e-9 <= v <= math.log2(w) + 1e-9


@settings(max_examples=6, deadline=None)
@given(vals=panel_values, hl=st.floats(min_value=0.5, max_value=50))
def test_decay_monotone_and_unit_at_zero(spark, vals, hl):
    rows = [(t, 1, abs(v)) for t, v in enumerate(vals)]
    df = make_panel(spark, rows)
    out = collect_panel(scalar.decay(df, hl))
    for (_, t, v) in out:
        x = abs(vals[t])
        assert v == pytest.approx(2 ** (-x / hl))


@settings(max_examples=5, deadline=None)
@given(
    pts=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=12),
    ivs=st.lists(
        st.tuples(st.integers(min_value=-50, max_value=50),
                  st.integers(min_value=0, max_value=30)),
        min_size=1, max_size=6,
    ),
    b=st.integers(min_value=1, max_value=17),
)
def test_interval_join_matches_bruteforce(spark, pts, ivs, b):
    """Bucket pruning is an optimization, never a semantics change: for any
    bucket width the result equals the brute-force range predicate —
    including negative timestamps (truncating DIV is monotone)."""
    from views_transformation_library_spark.operators import relational

    p = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pts)], schema="pid long, ts_s long"
    )
    iv = spark.createDataFrame(
        [(j, s, s + w) for j, (s, w) in enumerate(ivs)],
        schema="iv_id long, start_s long, end_s long",
    )
    got = sorted(
        (r["pid"], r["iv_id"])
        for r in relational.interval_join(p, iv, "ts_s", "start_s", "end_s", b).collect()
    )
    want = sorted(
        (i, j)
        for i, t in enumerate(pts)
        for j, (s, w) in enumerate(ivs)
        if s <= t <= s + w
    )
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab \n", min_size=0, max_size=30), min_size=1, max_size=5
    )
)
def test_repetition_stats_matches_python(spark, texts):
    """dup-line/word fractions agree with a direct python computation."""
    from views_transformation_library_spark.operators import text as T

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], schema="doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in T.repetition_stats(df).collect()}
    import re

    for i, t in enumerate(texts):
        lines = [s.strip() for s in t.split("\n")]
        lines = [s for s in lines if s]
        words = re.findall("[a-z0-9]+", t.lower())
        assert out[i]["n_lines"] == len(lines)
        exp_dlf = round(1 - len(set(lines)) / len(lines), 6) if lines else 0.0
        assert out[i]["dup_line_frac"] == pytest.approx(exp_dlf)
        exp_dwf = round(1 - len(set(words)) / len(words), 6) if words else 0.0
        assert out[i]["dup_word_frac"] == pytest.approx(exp_dwf)


# ---------------------------------------------------------------------------
# r4 operators

word_lists = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12),
    min_size=1,
    max_size=6,
)


@settings(max_examples=6, deadline=None)
@given(docs=word_lists)
def test_passage_dedup_conservation(spark, docs):
    """Kept passages across the corpus == distinct passages in the corpus;
    the lowest-id document always keeps everything; every output word
    multiset is a sub-multiset of its input."""
    from views_transformation_library_spark.operators import dedup

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.passage_dedup(df, n_words=3).collect()}
    n_kept = sum(r["n_kept"] for r in out.values())
    distinct_passages = set()
    for ws in docs:
        for i in range(0, len(ws), 3):
            distinct_passages.add(" ".join(ws[i : i + 3]))
    distinct_passages.discard("")
    assert n_kept == len(distinct_passages)
    first_nonempty = next((i for i, ws in enumerate(docs) if ws), None)
    if first_nonempty is not None:
        r0 = out[first_nonempty]
        assert r0["n_kept"] >= 1 or r0["n_passages"] == r0["n_kept"]
    for i, ws in enumerate(docs):
        kept_words = out[i]["text_deduped"].split() if out[i]["text_deduped"] else []
        import collections as _c

        assert not _c.Counter(kept_words) - _c.Counter(ws)


@settings(max_examples=6, deadline=None)
@given(
    n_events=st.integers(min_value=1, max_value=30),
    widths=st.sampled_from([("hour", "day"), (1800_000_000, 3600_000_000, 7200_000_000)]),
)
def test_time_bucket_rollup_mass_conservation(spark, n_events, widths):
    """Every granularity level carries the same total count and the same
    exact decimal sum (sums-of-sums associativity)."""
    from views_transformation_library_spark.operators import relational

    rng = np.random.RandomState(n_events)
    rows = [
        (int(rng.randint(0, 3 * 86400)) * 1_000_000,
         ["a", "b"][int(rng.randint(2))],
         round(float(rng.uniform(0, 100)), 2))
        for _ in range(n_events)
    ]
    ev = spark.createDataFrame(rows, "__us long, event_type string, value double")
    out = relational.time_bucket_rollup(ev, granularities=widths).collect()
    by_g = {}
    for r in out:
        g = by_g.setdefault(r["granularity"], [0, 0])
        g[0] += r["n_events"]
        g[1] += r["sum_value"]
    totals = list(by_g.values())
    assert all(t[0] == n_events for t in totals)
    assert all(t[1] == totals[0][1] for t in totals)


@settings(max_examples=6, deadline=None)
@given(words=st.lists(st.sampled_from("abcdef"), min_size=1, max_size=40))
def test_chunk_text_covers_every_word(spark, words):
    from views_transformation_library_spark.operators import retrieval

    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    chunks = sorted(
        (r["chunk_idx"], r["chunk_text"].split())
        for r in retrieval.chunk_text(df, size=8, overlap=3).collect()
    )
    stride = 5
    covered = []
    for idx, ws in chunks:
        assert ws == words[idx * stride : idx * stride + 8]
        covered.extend(range(idx * stride, idx * stride + len(ws)))
    assert set(covered) == set(range(len(words)))  # full coverage, no gaps


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-50, max_value=150, allow_nan=False).map(
            lambda x: round(x, 3)
        ),
        min_size=3,
        max_size=12,
    ),
    n_buckets=st.integers(min_value=1, max_value=32),
    p=st.integers(min_value=1, max_value=100),
)
def test_hist_quantile_bucket_contains_exact(spark, vals, n_buckets, p):
    """approx_quantiles_hist's containment law: the returned bucket's
    [lo_edge, hi_edge) interval holds the exact type-1 quantile whenever
    the value lies inside [lo, hi); clamped values land in edge buckets
    whose edges still bound the clamped position."""
    from views_transformation_library_spark.operators import profiling

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    lo, hi = 0.0, 100.0
    row = profiling.approx_quantiles_hist(
        df, "v", lo=lo, hi=hi, n_buckets=n_buckets, percents=(p,)
    ).collect()[0]
    exact = profiling.exact_quantiles(df, "v", percents=(p,)).collect()[0]["value"]
    clamped = min(max(exact, lo), hi)
    if lo <= exact < hi:
        assert row["lo_edge"] <= exact < row["hi_edge"]
    else:
        # clamped to an edge bucket: 0 or n_buckets - 1
        assert row["bucket"] in (0, n_buckets - 1)
        assert row["lo_edge"] <= clamped <= row["hi_edge"]
    assert row["rank"] == (p * len(vals) + 99) // 100
