"""ngram_jaccard guard-plumbing A/B (r10): where does the capped tier's
wall go at sf1, given the cap drops NOTHING there (NGRAM_GUARD_SF1_r10:
max df 198 vs cap 1000, all counters 0)?

Arms (counterbalanced ABCD-DCBA, min over the 2 passes):
  capped    the shipped ngram_jaccard_pairs(max_doc_freq=1000)
  uncapped  ngram_jaccard_pairs() — exact, no guard plumbing
  lite      window guard + observe, but NO postings materialize and
            sizes counted from sh_kept directly (explode(postings) ==
            sh_kept row-for-row, so this is semantics-identical)
  aggguard  df-filter ABOVE the postings aggregate (size(__docs) <= cap)
            — the r5-REJECTED shape (unbounded reduce-side list buffers
            under a truly hot shingle); timed as the lower bound on
            guard cost, not as a shipping candidate

All arms must emit the same (a, b, count) pairs; a checksum asserts it.

Usage: python tools/exp_ngram_tiers.py [sf_dir] [--json=out]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F
from views_transformation_library_spark.operators import dedup
from views_transformation_library_spark.panel import materialize
from views_transformation_library_spark.session import get_spark

CAP = 1000
N, TAU = 3, 0.5


def _pairs_from_postings(postings, sizes, threshold):
    pair_structs = F.expr(
        "flatten(transform(__docs, (x, i) -> "
        "transform(slice(__docs, i + 2, size(__docs) - i - 1), "
        "y -> struct(x as a, y as b))))"
    )
    inter = (
        postings.filter(F.size("__docs") >= 2)
        .select(F.explode(pair_structs).alias("__p"))
        .select(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
    )
    sz_a = sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sza"))
    sz_b = sizes.select(F.col("doc").alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sz_a, "a")
        .join(sz_b, "b")
        .select(
            "a", "b",
            (F.col("c") / (F.col("sza") + F.col("szb") - F.col("c"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def lite(docs):
    """window guard, no postings materialize, sizes from sh_kept."""
    sh = materialize(dedup._shingles(docs, "doc_id", "text", N))
    w_sh = Window.partitionBy("shingle")
    sh_kept = materialize(
        sh.withColumn("__df", F.count(F.lit(1)).over(w_sh))
        .filter(F.col("__df") <= CAP)
        .drop("__df")
    )
    postings = sh_kept.groupBy("shingle").agg(
        F.array_sort(F.collect_list("doc")).alias("__docs")
    )
    sizes = sh_kept.groupBy("doc").agg(F.count("*").alias("sz"))
    return _pairs_from_postings(postings, sizes, TAU)


def aggguard(docs):
    """df filter above the postings aggregate (unbounded agg buffers —
    lower-bound arm only)."""
    sh = materialize(dedup._shingles(docs, "doc_id", "text", N))
    postings = materialize(
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc")).alias("__docs"))
        .filter(F.size("__docs") <= CAP)
    )
    sizes = postings.select(F.explode("__docs").alias("doc")).groupBy("doc").agg(
        F.count("*").alias("sz")
    )
    return _pairs_from_postings(postings, sizes, TAU)


def checksum(df):
    r = df.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("a")).alias("ha"),
        F.bit_xor(F.xxhash64("b")).alias("hb"),
        F.bit_xor(F.xxhash64(F.round("jaccard", 6))).alias("hj"),
    ).collect()[0]
    return tuple(r)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/repo/.sfdata/sf1"
    out_json = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")), None
    )
    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()

    arms = {
        "capped": lambda: dedup.ngram_jaccard_pairs(
            docs, n=N, threshold=TAU, max_doc_freq=CAP
        ),
        "uncapped": lambda: dedup.ngram_jaccard_pairs(docs, n=N, threshold=TAU),
        "lite": lambda: lite(docs),
        "aggguard": lambda: aggguard(docs),
    }
    order = list(arms) + list(reversed(arms))
    walls: dict[str, list] = {k: [] for k in arms}
    sums = {}
    for name in order:
        t0 = time.time()
        cs = checksum(arms[name]())
        walls[name].append(round(time.time() - t0, 2))
        sums.setdefault(name, cs)
        assert sums[name] == cs
    base = sums["capped"]
    res = {
        "sf_dir": sf_dir,
        "identical_outputs": all(v == base for v in sums.values()),
        "checksum": list(base),
        "arms": {k: {"walls": v, "min": min(v)} for k, v in walls.items()},
    }
    print(json.dumps(res, indent=2))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
