"""lsh_topk tier-boundary measurement (VERDICT r11 #3).

The √n candidate budget (auto_ann_params, r11) slows the LSH recall
decay to ∝ 1/√n but cannot stop it — the judge asked for one measured
point at n ≈ 2×10⁵ (the sf10 embeddings corpus) to either show the 0.20
floor holding or pin where the LSH tier officially hands off to
ivf/knn (the ngram→minhash adjudication pattern).

Query set is every 200th vec_id (~1000 queries at n=2e5) so the exact
brute-force reference stays at the same ~200M-pair cost as the sf5
floors run (one heavy-spill job at a time — CLAUDE.md r11 disk lesson).
Recall over 1000 queries has ±~0.01 sampling noise, plenty for a
0.20-floor adjudication.

Usage: python tools/exp_lsh_boundary.py [sf_dir] [--json=out.json]
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from views_transformation_library_spark.operators import similarity
from views_transformation_library_spark.session import get_spark

K = 10
FLOOR = 0.20  # gen_recall.FLOORS["lsh_topk"]
QUERY_MOD = 200


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/repo/.sfdata/sf10"
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            out_path = a.split("=", 1)[1]
    spark = get_spark("exp_lsh_boundary")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") % QUERY_MOD == 0)
    n = embs.count()
    params = similarity.auto_ann_params(n)

    def _sets(rows):
        d = defaultdict(set)
        for r in rows:
            d[r["query_id"]].add(r["neighbor_id"])
        return d

    exact = _sets(similarity.cosine_topk(embs, queries, k=K).collect())
    approx = _sets(
        similarity.lsh_topk(embs, queries, k=K, n_planes=None).collect()
    )
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q])
        for q in exact
        if exact[q]
    ]
    recall = round(sum(recalls) / len(recalls), 4) if recalls else None
    doc = {
        "n": n,
        "n_queries": len(exact),
        "k": K,
        "query_mod": QUERY_MOD,
        "auto_params": {k: v for k, v in params.items()},
        "scored_fraction": round((1 + params["n_planes"]) / (1 << params["n_planes"]), 6),
        "mean_recall_at_k": recall,
        "floor": FLOOR,
        "ok": recall is not None and recall >= FLOOR,
        "sf_dir": sf_dir,
    }
    text = json.dumps(doc, indent=2)
    print(text)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    if not doc["ok"]:
        print("LSH BOUNDARY: recall below floor", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
