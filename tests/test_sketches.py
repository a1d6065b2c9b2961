"""Sketch operators: estimator guarantees (error bounds, upper bounds,
no-false-negatives), set semantics / mergeability invariants, and the
bloom broadcast-gate fallback path."""

import math

import pytest
from pyspark.sql import functions as F

from views_transformation_library_spark.operators import sketches


@pytest.fixture(scope="module")
def keys(spark):
    # 5000 distinct string-able keys with heavy duplication (each key
    # appears 1-3 times) — sketches must see SET cardinality, not rows
    rows = [(i % 5000,) for i in range(11000)]
    return spark.createDataFrame(rows, "k long")


def test_hll_within_error_bound(spark, keys):
    p = 10  # m=1024, std err 1.04/sqrt(m) ~ 3.25%
    row = sketches.hll_distinct(keys, "k", p=p).collect()[0]
    err = abs(row["estimate"] / 5000.0 - 1.0)
    assert err < 4 * 1.04 / math.sqrt(1 << p), f"HLL err {err:.3%}"


def test_hll_set_semantics(spark, keys):
    # duplicating every row must not move a single register: identical
    # (n_zero, s_scaled, estimate)
    a = sketches.hll_distinct(keys, "k", p=8).collect()[0]
    b = sketches.hll_distinct(keys.union(keys), "k", p=8).collect()[0]
    assert tuple(a) == tuple(b)


def test_hll_registers_merge_by_max(spark, keys):
    # sketch(A union B) == combine(sketch(A), sketch(B)) at the register
    # level — the property that makes partial aggregation correct. Verify
    # via the scaled sum: build registers for each half, merge driver-side.
    half1, half2 = keys.filter("k < 2500"), keys.filter("k >= 2500")
    merged = sketches.hll_distinct(half1.union(half2), "k", p=8).collect()[0]
    whole = sketches.hll_distinct(keys, "k", p=8).collect()[0]
    assert tuple(merged) == tuple(whole)


def test_kmv_exact_below_k(spark):
    small = spark.createDataFrame([(i % 7,) for i in range(50)], "k long")
    row = sketches.kmv_distinct(small, "k", k=64).collect()[0]
    assert row["n_min"] == 7
    assert row["estimate"] == 7.0


def test_kmv_within_error_bound(spark, keys):
    k = 256  # std err ~ 1/sqrt(k) ~ 6.25%
    row = sketches.kmv_distinct(keys, "k", k=k).collect()[0]
    err = abs(row["estimate"] / 5000.0 - 1.0)
    assert err < 4 / math.sqrt(k), f"KMV err {err:.3%}"


def test_cm_upper_bound_and_absent(spark):
    rows = [("apple",)] * 100 + [("pear",)] * 10 + [("plum",)] * 1
    df = spark.createDataFrame(rows, "t string")
    est = {
        r["item"]: r["est_count"]
        for r in sketches.cm_estimate(
            df, "t", ["apple", "pear", "plum", "absent"], depth=4, width=64
        ).collect()
    }
    true = {"apple": 100, "pear": 10, "plum": 1, "absent": 0}
    for it, t in true.items():
        assert est[it] >= t, f"CM under-estimated {it}"
    # with 3 distinct keys in 64 buckets x 4 rows, collisions are
    # overwhelmingly unlikely to hit ALL rows: estimates should be exact
    assert est["apple"] == 100
    # absent item: min over its buckets — may collide but stays bounded
    assert est["absent"] <= 100


def test_cm_sketch_size_bounded(spark, keys):
    sk = sketches.cm_sketch(keys, "k", depth=4, width=32)
    assert sk.count() <= 4 * 32
    total = sk.agg(F.sum("c")).collect()[0][0]
    assert total == 11000 * 4  # every row lands in every depth row


def test_bloom_no_false_negatives(spark):
    build = spark.createDataFrame([(i,) for i in range(0, 900, 3)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(900)], "k long")
    hits = {
        r["k"]: r["bloom_hit"]
        for r in sketches.bloom_prefilter(build, "k", probe, "k",
                                          n_bits=1 << 14, n_hashes=5).collect()
    }
    for i in range(0, 900, 3):
        assert hits[i] == 1, f"false negative at {i}"
    # with 300 keys * 5 hashes in 16384 bits, FP rate ~ (1500/16384)^5
    # ~ 6e-6 — expect essentially zero false positives among 600 negatives
    fps = sum(1 for i in range(900) if i % 3 != 0 and hits[i] == 1)
    assert fps <= 2


def test_bloom_shuffle_fallback_matches_broadcast(spark):
    build = spark.createDataFrame([(i,) for i in range(0, 400, 2)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(400)], "k long")

    def run():
        return sorted(
            tuple(r)
            for r in sketches.bloom_prefilter(
                build, "k", probe, "k", n_bits=1 << 13, n_hashes=4
            ).collect()
        )

    fast = run()
    orig = sketches.BLOOM_BROADCAST_MAX_BITS
    sketches.BLOOM_BROADCAST_MAX_BITS = 0  # force the shuffle-join path
    try:
        slow = run()
    finally:
        sketches.BLOOM_BROADCAST_MAX_BITS = orig
    assert fast == slow


def test_hll_rejects_bad_p(spark, keys):
    with pytest.raises(ValueError):
        sketches.hll_distinct(keys, "k", p=2)


# ---------------------------------------------------------------------------
# BPE tokenizer training (text.bpe_train / bpe_learn)


from views_transformation_library_spark.operators import text


def _naive_bpe(word_counts, num_merges, min_pair_count=2):
    """Reference learner: full pair recount every step (the textbook
    O(V*L) loop) — differential oracle for the incremental index."""
    seqs = {w: list(w) + [text.BPE_EOW] for w, c in word_counts.items() if w and c > 0}
    merges = []
    for rank in range(num_merges):
        pairs = {}
        for w, syms in seqs.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + word_counts[w]
        if not pairs:
            break
        best_count = max(pairs.values())
        if best_count < min_pair_count:
            break
        best = min(p for p, c in pairs.items() if c == best_count)
        merges.append((rank, best[0], best[1], best_count))
        sym = best[0] + best[1]
        for w, old in seqs.items():
            new, i = [], 0
            while i < len(old):
                if i + 1 < len(old) and (old[i], old[i + 1]) == best:
                    new.append(sym)
                    i += 2
                else:
                    new.append(old[i])
                    i += 1
            seqs[w] = new
    return merges


def test_bpe_learn_sennrich_example():
    # the worked example from Sennrich et al. 2016 §3.2
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = text.bpe_learn(counts, 4)
    assert merges[0][1:] == ("e", "s", 9)
    assert merges[1][1:] == ("es", "t", 9)
    assert merges[2][1:] == ("est", text.BPE_EOW, 9)
    assert merges[3][1:] == ("l", "o", 7)


def test_bpe_learn_matches_naive_recount():
    import random

    rng = random.Random(42)
    alphabet = "abcde"
    counts = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))): rng.randint(1, 50)
        for _ in range(120)
    }
    fast = text.bpe_learn(dict(counts), 60)
    slow = _naive_bpe(dict(counts), 60)
    assert fast == slow


def test_bpe_learn_stops_below_min_pair_count():
    merges = text.bpe_learn({"ab": 1, "cd": 1}, 10, min_pair_count=2)
    assert merges == []


def test_bpe_train_end_to_end(spark):
    docs = spark.createDataFrame(
        [(1, "low low low low low lower lower"),
         (2, "newest newest newest newest newest newest"),
         (3, "widest widest widest")],
        "doc_id long, text string",
    )
    got = [tuple(r) for r in text.bpe_train(docs, num_merges=4, min_count=1).collect()]
    expected = text.bpe_learn({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 4)
    assert got == expected
    # determinism: a second run produces the identical table
    again = [tuple(r) for r in text.bpe_train(docs, num_merges=4, min_count=1).collect()]
    assert again == got


def test_bpe_train_word_type_cap_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa bb bb cc cc dd dd")], "doc_id long, text string"
    )
    # cap to 2 word types: (count desc, word) keeps aa, bb
    got = [tuple(r) for r in
           text.bpe_train(docs, num_merges=5, min_count=1, max_word_types=2).collect()]
    expected = text.bpe_learn({"aa": 2, "bb": 2}, 5)
    assert got == expected


def test_bpe_segment_word_greedy_rank_order():
    # merges learned from the Sennrich counts; 'lowest' should reuse
    # 'low' (via l+o, lo+w) and 'est</w>'
    merges = text.bpe_learn({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 10)
    ranks = {(l, r): k for k, l, r, _ in merges}
    assert text.bpe_segment_word("low", ranks) == ["low</w>"]
    assert text.bpe_segment_word("lowest", ranks) == ["low", "est</w>"]
    # fully unseen word falls back to chars + EOW
    assert text.bpe_segment_word("xyz", ranks) == ["x", "y", "z", text.BPE_EOW]
    # no merges at all
    assert text.bpe_segment_word("ab", {}) == ["a", "b", text.BPE_EOW]


def test_bpe_encode_counts(spark):
    docs = spark.createDataFrame(
        [(1, "low low lowest"), (2, "newest widest"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    merges = text.bpe_learn({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 10)
    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in text.bpe_encode(docs, merges).collect()
    }
    ranks = {(l, r): k for k, l, r, _ in merges}
    low = len(text.bpe_segment_word("low", ranks))
    lowest = len(text.bpe_segment_word("lowest", ranks))
    newest = len(text.bpe_segment_word("newest", ranks))
    widest = len(text.bpe_segment_word("widest", ranks))
    assert got[1] == (3, 2 * low + lowest)
    assert got[2] == (2, newest + widest)
    assert got[3] == (0, 0)  # empty text
    assert got[4] == (0, 0)  # NULL text


def test_bpe_encode_matches_per_word_segmentation(spark):
    # end-to-end composition: train on a corpus, encode it, and check
    # every doc against a driver-side segmentation of the same text
    import random

    rng = random.Random(3)
    vocab = ["alpha", "beta", "gamma", "delta", "ep7", "zz"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [
        tuple(r) for r in text.bpe_train(docs, num_merges=30, min_count=1).collect()
    ]
    ranks = {(l, r): k for k, l, r, _ in merges}
    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in text.bpe_encode(docs, merges).collect()
    }
    import re

    for i, txt in rows:
        words = re.findall(r"[a-z0-9]+", txt.lower())
        exp = sum(len(text.bpe_segment_word(w, ranks)) for w in words)
        assert got[i] == (len(words), exp)


def test_hll_overlap_estimates(spark):
    # the RAW estimator needs n >= 2.5m (no linear-counting branch — libm
    # ln is banned from the gate surface): p=8 -> m=256, 2.5m=640, so use
    # thousands. A=0..2999, B=2000..5999: |A∪B|=6000, |A∩B|=1000.
    a = spark.createDataFrame([(i,) for i in range(3000)], "v long")
    b = spark.createDataFrame([(i,) for i in range(2000, 6000)], "v long")
    row = sketches.hll_overlap(a, b, "v", p=8).collect()[0]
    se = 4 * 1.04 / math.sqrt(1 << 8)  # ~26% at 4 sigma
    assert abs(row["est_a"] / 3000 - 1) < se
    assert abs(row["est_b"] / 4000 - 1) < se
    assert abs(row["est_union"] / 6000 - 1) < se
    # intersection inherits all three sketches' ABSOLUTE errors
    assert abs(row["est_intersection"] - 1000) < (3000 + 4000 + 6000) * se
    # disjoint sets: intersection floors at >= 0
    c = spark.createDataFrame([(i,) for i in range(10000, 13000)], "v long")
    row2 = sketches.hll_overlap(a, c, "v", p=8).collect()[0]
    assert row2["est_intersection"] >= 0.0
    assert row2["est_intersection"] < (3000 + 3000 + 6000) * se


def test_hll_overlap_multiplicity_insensitive(spark):
    """The distinct=False shingle feed (r13 opt) rests on this property:
    duplicated values must leave every register — and therefore the whole
    hll_overlap row — byte-identical (max-merge of identical hashes)."""
    a = spark.createDataFrame([(i,) for i in range(700)], "v long")
    b = spark.createDataFrame([(i,) for i in range(350, 1100)], "v long")
    a_dup = a.union(a).union(a.limit(100))
    b_dup = b.union(b.limit(317))
    base = sketches.hll_overlap(a, b, "v", p=8).collect()[0]
    dup = sketches.hll_overlap(a_dup, b_dup, "v", p=8).collect()[0]
    assert tuple(base) == tuple(dup)


def test_hll_overlap_union_is_register_max(spark):
    # union sketch of (A, B) must equal the sketch of A ∪ B exactly
    a = spark.createDataFrame([(i,) for i in range(500)], "v long")
    b = spark.createDataFrame([(i,) for i in range(250, 800)], "v long")
    row = sketches.hll_overlap(a, b, "v", p=8).collect()[0]
    u = sketches.hll_distinct(a.union(b), "v", p=8).collect()[0]
    assert row["s_union"] == u["s_scaled"]
    assert row["est_union"] == u["estimate"]


# ---------------------------------------------------------------------------
# PMI collocations


def test_collocations_pmi_and_ranking(spark):
    # "san francisco" always co-occurs (high PMI); "the cat"/"the dog"
    # share the very common "the" (low PMI); ranking is by raw count
    rows = [
        (1, "san francisco is foggy and the cat sat"),
        (2, "san francisco is sunny and the dog sat"),
        (3, "san francisco hosts the cat and the dog"),
        (4, "the cat and the dog met in san francisco"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["w1"], r["w2"]): r
        for r in text.collocations(df, min_count=2, k=50).collect()
    }
    sf = out[("san", "francisco")]
    assert sf["c_ab"] == 4 and sf["c_a"] == 4 and sf["c_b"] == 4
    # perfect collocation: PMI = ln(N_u^2 / (N_b * 4)) > PMI of the-cat
    assert sf["pmi"] > out[("the", "cat")]["pmi"]
    # min_count filters singletons
    assert ("is", "foggy") not in out


def test_collocations_topk_cut_is_total_order(spark):
    rows = [(i, "a b a b c d") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["w1"], r["w2"], r["c_ab"])
           for r in text.collocations(df, min_count=1, k=3).collect()]
    # counts: (a,b)=10? no: per doc "a b a b c d" -> ab, ba, ab? pairs:
    # (a,b),(b,a),(a,b),(b,c),(c,d) => ab=2/doc, ba=1, bc=1, cd=1
    assert got[0] == ("a", "b", 10)
    # ties at count 5 cut lexicographically: (b,a) then (b,c)
    assert got[1] == ("b", "a", 5) and got[2] == ("b", "c", 5)


def test_hll_time_rollup_day_equals_direct_sketch(spark):
    # the rollup property: merging the hourly REGISTER tables of a day
    # must equal sketching that day's values directly (max is associative)
    import random

    rng = random.Random(5)
    hour_us = 3_600_000_000
    rows = [
        (rng.randrange(72) * hour_us + rng.randrange(hour_us), "c",
         rng.randrange(800))
        for _ in range(4000)
    ]
    ev = spark.createDataFrame(rows, "us long, event_type string, user_id long")
    out = sketches.hll_time_rollup(
        ev, "us", "user_id", key_cols=("event_type",),
        granularities=("hour", "day"), p=6,
    )
    days = {
        r["bucket"]: (r["n_zero"], r["s_scaled"], r["estimate"])
        for r in out.filter("granularity = 'day'").collect()
    }
    for day in sorted({us // (24 * hour_us) for us, _, _ in rows}):
        direct = sketches.hll_distinct(
            ev.filter(f"us DIV {24 * hour_us} = {day}"), "user_id", p=6
        ).collect()[0]
        assert days[day] == (
            direct["n_zero"], direct["s_scaled"], direct["estimate"]
        ), day


def test_hll_time_rollup_validates_granularities(spark):
    ev = spark.createDataFrame([(0, "a", 1)], "us long, event_type string, user_id long")
    with pytest.raises(ValueError):
        sketches.hll_time_rollup(ev, "us", "user_id",
                                 granularities=("day", "hour"))  # coarse->fine


def test_bpe_encode_preserves_non_long_id_type(spark):
    # the registry exposes bpe_encode generically — a string id column
    # must survive the Arrow pass with its own type, not a long cast
    docs = spark.createDataFrame(
        [("d-1", "low low"), ("d-2", "newest")], "doc_id string, text string"
    )
    merges = text.bpe_learn({"low": 5, "newest": 6}, 8)
    out = text.bpe_encode(docs, merges)
    assert dict(out.dtypes)["doc_id"] == "string"
    got = {r["doc_id"]: r["n_words"] for r in out.collect()}
    assert got == {"d-1": 2, "d-2": 1}
