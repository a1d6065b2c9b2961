"""Recall of the LSH handoff's RECEIVING tier at the handoff point
(VERDICT r12 #1).

LSH_BOUNDARY_r12.json adjudicated sign-LSH as the n ≲ 2.15×10⁵ tier and
documented "route to ivf_topk / knn_graph / ann_join past the boundary"
— but the largest committed recall points for those families were at
n = 1×10⁵ (sf5). This tool measures the receiving families AT the
boundary corpus (the same .sfdata/sf10 embeddings, n = 2×10⁵, same
every-200th query set as the LSH point) so the handoff rests on a
measurement instead of extrapolation.

Exact reference: cosine_topk over the ~1000 sampled queries (~2×10⁸
pairs, the one-heavy-job-at-a-time budget from the sf5 floors runs).
knn_graph (exclude_self=True) is directly comparable — cosine_topk also
excludes self. Wall seconds per family are recorded too (they double as
sf10 wall points for the ANN flagships).

Floors: gen_recall.FLOORS for ivf_topk / knn_graph; ann_join shares
ivf_topk's 0.45 floor (it is the same scored-bucket construction with a
corpus/queries split).

Usage: python tools/exp_handoff_recall.py [sf_dir] [--json=out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from views_transformation_library_spark.operators import similarity
from views_transformation_library_spark.session import get_spark

K = 10
QUERY_MOD = 200  # same sampled query set as exp_lsh_boundary
FLOORS = {"ivf_topk": 0.45, "knn_graph": 0.45, "ann_join": 0.45}


def _sets(rows):
    d = defaultdict(set)
    for r in rows:
        d[r["query_id"]].add(r["neighbor_id"])
    return d


def _recall(exact, approx):
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q])
        for q in exact
        if exact[q]
    ]
    return round(sum(recalls) / len(recalls), 4) if recalls else None


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/repo/.sfdata/sf10"
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            out_path = a.split("=", 1)[1]
    spark = get_spark("exp_handoff_recall")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") % QUERY_MOD == 0)
    n = embs.count()
    ann = similarity.auto_ann_params(n)

    import __spark_entry__ as entry

    gp = similarity.auto_graph_params(n, entry.KNN_GRAPH_BUCKET_TARGET)

    t0 = time.time()
    exact = _sets(similarity.cosine_topk(embs, queries, k=K).collect())
    exact_sec = round(time.time() - t0, 2)

    fams: dict[str, dict] = {}

    def run(name, build, params):
        t0 = time.time()
        approx = _sets(build().collect())
        wall = round(time.time() - t0, 2)
        r = _recall(exact, approx)
        fams[name] = {
            "metric": f"mean_recall@{K} vs cosine_topk (exact)",
            "value": r,
            "floor": FLOORS[name],
            "ok": r is not None and r >= FLOORS[name],
            "wall_sec": wall,
            "params": params,
        }

    run(
        "ivf_topk",
        lambda: similarity.ivf_topk(embs, queries, k=K, n_centroids=None, nprobe=None),
        {k: v for k, v in ann.items()},
    )
    run(
        "ann_join",
        lambda: similarity.ann_join(
            embs, queries, k=K, n_centroids=None, nprobe=None, exclude_self=True
        ),
        {k: v for k, v in ann.items()},
    )
    # knn_graph computes top-k for EVERY vector; recall is read off the
    # sampled query ids (the graph rows for other ids are just unused)
    run(
        "knn_graph",
        lambda: similarity.knn_graph(
            embs,
            k=K,
            n_centroids=gp["n_centroids"],
            nprobe=gp["nprobe"],
        ).filter(F.col("query_id") % QUERY_MOD == 0),
        {k: v for k, v in gp.items()},
    )

    doc = {
        "n": n,
        "n_queries": len(exact),
        "k": K,
        "query_mod": QUERY_MOD,
        "exact_reference_sec": exact_sec,
        "families": fams,
        "lsh_boundary_recall": 0.2535,  # LSH_BOUNDARY_r12.json at this corpus
        "ok": all(f["ok"] for f in fams.values()),
        "sf_dir": sf_dir,
    }
    text = json.dumps(doc, indent=2)
    print(text)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    if not doc["ok"]:
        print("HANDOFF RECALL: a receiving family is below its floor", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
