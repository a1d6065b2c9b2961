"""ngram_jaccard df-cap engagement on NATURAL data (r11, VERDICT r10 #3).

The exact n-gram Jaccard tier is intrinsically quadratic in per-shingle
doc frequency; max_doc_freq=1000 is the mechanism that bounds it at
corpus scale, but through sf5 the natural max df (~990) sits just under
the cap — the guard had only ever been observed engaging with a forced
cap=5. This tool times the exact tier on a corpus where the cap engages
NATURALLY (sf10 tiling doubles sf5's doc frequencies: max df ~1980):

  for each (sf_dir, cap) arm: wall (checksummed full evaluation,
  min over runs), guard counters (skipped shingles / rows / pairs),
  output pair count.

The scale claim being tested: with the cap engaged, the sf5->sf10 wall
ratio should fall well below the uncapped pair-volume growth (local
e=2.28 through sf5, SCALING_r10.md), because every over-cap shingle's
C(df,2) expansion is dropped while sub-cap shingles grow ~linearly in
count but quadratically in df only until they cross the cap.

Usage: python tools/exp_ngram_cap.py [--json=out.json]
       ARMS env var: "sfdir:cap,sfdir:cap,..." (cap 'none' = uncapped)
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


def checksum_and_count(df) -> tuple[int, int]:
    row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.bit_xor(F.xxhash64(c)).alias(c) for c in df.columns],
    ).collect()[0]
    return sum(x or 0 for x in row[1:]), int(row["__n"])


def run_arm(spark, sf_dir: str, cap: int | None, runs: int = 2) -> dict:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    walls = []
    stats = None
    npairs = None
    for _ in range(runs):
        t0 = time.time()
        out = dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.5, max_doc_freq=cap
        )
        _, npairs = checksum_and_count(out)
        walls.append(round(time.time() - t0, 2))
        if stats is None:
            stats = dedup.lsh_guard_stats(out)
    return {
        "sf_dir": sf_dir,
        "cap": cap,
        "walls": walls,
        "wall": min(walls),
        "pairs": npairs,
        "guard": stats,
    }


def main() -> None:
    out_json = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")),
        None,
    )
    arms_env = os.environ.get(
        "ARMS",
        "/root/repo/.sfdata/sf5:1000,/root/repo/.sfdata/sf10:1000,"
        "/root/repo/.sfdata/sf10:none",
    )
    spark = get_spark("exp_ngram_cap")
    results = []
    for spec in arms_env.split(","):
        sf_dir, cap_s = spec.rsplit(":", 1)
        cap = None if cap_s == "none" else int(cap_s)
        # the uncapped counterfactual is the expensive arm — one run is
        # enough (we need its magnitude, not a tight minimum)
        r = run_arm(spark, sf_dir, cap, runs=1 if cap is None else 2)
        print(json.dumps(r), flush=True)
        results.append(r)
    doc = {"arms": results}
    if out_json:
        with open(out_json, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
