"""ngram_jaccard max_doc_freq guard engagement evidence (r10, VERDICT r9
What's-wrong #3): the entry caps shingle doc-frequency at 1000, and the
sf0.1→sf1 wall ratio (13.1×) was attributed to C(df,2) postings
expansion — but no committed artifact showed what the cap actually drops
at sf1. This tool runs the ENTRY parameterization (n=3, τ=0.5,
max_doc_freq=1000) at a given sf dir and records:

  - the guard counters (lsh_guard_stats over the r10 observe node):
    over-cap posting rows, candidate pairs lost at over-cap shingles
    (upper bound — pairs may survive via other shared shingles),
    over-cap shingle count
  - the shingle doc-frequency distribution head (top df values), so the
    expansion cost model C(df,2) is inspectable
  - emitted pair count and wall for the capped run
  - (--uncapped) the exact tier for comparison where affordable

Usage: python tools/exp_ngram_guard.py [sf_dir] [--uncapped] [--json=out]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from views_transformation_library_spark.operators import dedup
from views_transformation_library_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/repo/.sfdata/sf1"
    uncapped = "--uncapped" in sys.argv[1:]
    out_json = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")), None
    )
    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    # shingle doc-frequency distribution (the expansion cost driver)
    sh = dedup._shingles(docs, "doc_id", "text", 3)
    dist = (
        sh.groupBy("shingle").agg(F.count("*").alias("df"))
        .groupBy("df").agg(F.count("*").alias("n_shingles"))
        .orderBy(F.col("df").desc())
        .limit(20)
        .collect()
    )
    top_df = [(r["df"], r["n_shingles"]) for r in dist]

    res = {"sf_dir": sf_dir, "n_docs": n_docs, "max_doc_freq": 1000,
           "top_doc_freqs": top_df}

    t0 = time.time()
    capped = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, max_doc_freq=1000
    )
    n_pairs = capped.count()
    res["capped"] = {
        "pairs": n_pairs,
        "wall": round(time.time() - t0, 2),
        "guard": dedup.lsh_guard_stats(capped, block=True),
    }
    print(json.dumps(res["capped"]), flush=True)

    if uncapped:
        t0 = time.time()
        exact = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
        res["uncapped"] = {
            "pairs": exact.count(),
            "wall": round(time.time() - t0, 2),
        }
        print(json.dumps(res["uncapped"]), flush=True)

    if out_json:
        with open(out_json, "w") as f:
            json.dump(res, f, indent=2)
    print(json.dumps({"top_doc_freqs": top_df[:8]}))


if __name__ == "__main__":
    main()
