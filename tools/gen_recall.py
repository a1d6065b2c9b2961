"""Per-round recall/accuracy evidence for the APPROXIMATE families
(VERDICT r4 #4). Since r11 most of these are byte-strict against their
oracles (deterministic ≠ exact: a strict gate proves the pipeline
reproduces its own deterministic approximation, not that the
approximation is any good) — so the recall-vs-exact floors remain the
quality evidence regardless of oracle tier. Only profile_approx is still
rows-only (engine-private KLL sketch).

For each family the approximate result is compared against the EXACT
competitor at the same parameterization as `__spark_entry__.queries()`:

  lsh_topk / ivf_topk / ivf_topk_dist / pq_topk -> mean recall@k vs
      cosine_topk (exact brute force) over the shared query set
  knn_graph (partial nprobe) -> mean recall@k vs knn_graph at
      nprobe=n_centroids (exact: probes every bucket)
  profile_approx -> max relative error of HLL distinct counts and KLL
      quantiles vs the exact profile tier
  pagerank -> max |delta| between the two exact-by-design paths (driver
      numpy vs distributed join-agg loop) — the rows-only reason is float
      reduction order, so the bound on path divergence IS the evidence

Usage: python tools/gen_recall.py [sf_dir] [--json out.json]
Exits non-zero if any family lands below its floor (committed thresholds).
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from pyspark.sql import functions as F
from views_transformation_library_spark.operators import (
    dedup,
    profiling,
    similarity,
)
from views_transformation_library_spark.session import get_spark

K = 10
# r6: lsh/ivf/pq run with AUTO-SCALED index parameters (auto_ann_params —
# log-scaled from the corpus count), which is what holds recall as the
# corpus grows (fixed params sagged toward the floors: lsh 0.28 -> 0.235,
# pq 0.80 -> 0.535 from sf0.01 to sf0.1). The floors assert the family
# never silently collapses (the single-probe-LSH failure mode: 0.06
# before multi-probe); headroom >= 0.1 over the floor is the per-round
# health target at the largest SF tested. ivf_topk_dist / knn_graph keep
# small explicit indexes (distributed-trainer exercise / documented
# partial-probe cost knob).
FLOORS = {
    "lsh_topk": 0.20,
    "ivf_topk": 0.45,
    "ivf_topk_dist": 0.40,  # smaller index (8 centroids, nprobe 3)
    "pq_topk": 0.50,
    "knn_graph": 0.45,      # nprobe 2 of 8 buckets
}
PROFILE_REL_ERR_CEIL = 0.05   # HLL/KLL documented error bands
PAGERANK_DELTA_CEIL = 1e-6    # both paths converge to tol=1e-9


def _sets(rows):
    d = defaultdict(set)
    for r in rows:
        d[r["query_id"]].add(r["neighbor_id"])
    return d


def mean_recall(exact, approx):
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q])
        for q in exact
        if exact[q]
    ]
    return round(sum(recalls) / len(recalls), 4) if recalls else None


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            out_path = a.split("=", 1)[1]
    # tolerate non-numeric dir suffixes like .sfdata/sf1skew (r9: the
    # natural-skew recall sweep runs this tool on the skew corpus)
    tail = sf_dir.rstrip("/").rsplit("sf", 1)[-1] if "sf" in sf_dir else ""
    try:
        sf = float(tail)
    except ValueError:
        num = ""
        for ch in tail:
            if ch.isdigit() or ch == ".":
                num += ch
            else:
                break
        sf = float(num) if num else -1.0
    if tail and not tail.replace(".", "").isdigit():
        sf_label = tail
    else:
        sf_label = None
    spark = get_spark("gen_recall")
    embs = entry._embs(spark, sf_dir)
    queries = entry._queries(spark, sf_dir)

    fams: dict[str, dict] = {}
    exact = _sets(similarity.cosine_topk(embs, queries, k=K).collect())

    approx_builders = {
        "lsh_topk": lambda: similarity.lsh_topk(embs, queries, k=K, n_planes=None),
        "ivf_topk": lambda: similarity.ivf_topk(
            embs, queries, k=K, n_centroids=None, nprobe=None
        ),
        "ivf_topk_dist": lambda: similarity.ivf_topk(
            embs, queries, k=K, n_centroids=8, nprobe=3, train_distributed=True
        ),
        "pq_topk": lambda: similarity.pq_topk(
            embs, queries, k=K, m=8, k_codes=16, rerank="auto"
        ),
    }
    for name, build in approx_builders.items():
        r = mean_recall(exact, _sets(build().collect()))
        fams[name] = {
            "metric": f"mean_recall@{K} vs cosine_topk",
            "value": r,
            "floor": FLOORS[name],
            "ok": r is not None and r >= FLOORS[name],
        }

    # knn_graph: exact competitor = probe every bucket (same index);
    # approx = the entry's auto_graph_params policy realized on this
    # corpus (r8: nc = ceil(n/64), nprobe = max(4, ceil(nc^(2/3))))
    gp = similarity.auto_graph_params(
        embs.count(), entry.KNN_GRAPH_BUCKET_TARGET
    )
    kg_exact = _sets(
        similarity.knn_graph(
            embs, k=entry.KNN_GRAPH_K,
            n_centroids=gp["n_centroids"],
            nprobe=gp["n_centroids"],
        ).collect()
    )
    kg_approx = _sets(
        similarity.knn_graph(
            embs, k=entry.KNN_GRAPH_K,
            n_centroids=gp["n_centroids"],
            nprobe=gp["nprobe"],
        ).collect()
    )
    r = mean_recall(kg_exact, kg_approx)
    fams["knn_graph"] = {
        "metric": f"mean_recall@{entry.KNN_GRAPH_K} vs full-probe knn_graph",
        "value": r,
        "floor": FLOORS["knn_graph"],
        "ok": r is not None and r >= FLOORS["knn_graph"],
    }

    # profile_approx vs exact: relative error per overlapping statistic
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice"]
    ex = {r["column"]: r.asDict() for r in profiling.profile(li, cols).collect()}
    ap = {r["column"]: r.asDict() for r in profiling.profile_approx(li, cols).collect()}
    # exact quantiles (the exact tier has no quantile column — percentile()
    # is the exact competitor for the KLL sketch)
    qex_row = li.agg(
        *[
            F.expr(f"percentile({c}, {q})").alias(f"{c}__{int(q * 100)}")
            for c in cols
            for q in (0.25, 0.5, 0.75)
        ]
    ).collect()[0]
    per_stat = {}
    for c in cols:
        rel = abs(float(ap[c]["approx_distinct"]) - float(ex[c]["n_distinct"])) / float(
            ex[c]["n_distinct"]
        )
        per_stat[f"{c}.approx_distinct"] = round(rel, 5)
        for q in (25, 50, 75):
            exact_q = float(qex_row[f"{c}__{q}"])
            if exact_q:
                rel = abs(float(ap[c][f"q_{q}"]) - exact_q) / abs(exact_q)
                per_stat[f"{c}.q_{q}"] = round(rel, 5)
    worst = max(per_stat.values()) if per_stat else None
    fams["profile_approx"] = {
        "metric": "max relative error vs exact profile",
        "value": worst,
        "ceiling": PROFILE_REL_ERR_CEIL,
        "per_stat": per_stat,
        "ok": worst is not None and worst <= PROFILE_REL_ERR_CEIL,
    }

    # pagerank: max |delta| between the two paths on the gate's graph
    edges = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", F.col("l_suppkey").alias("src"))
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet").select(
                F.col("o_orderkey").alias("l_orderkey"),
                (F.col("o_custkey") + F.lit(1_000_000)).alias("dst"),
            ),
            "l_orderkey",
        )
        .select("src", "dst")
    )
    fast = dedup.pagerank(edges, max_iters=20, driver_cap=2_000_000).alias("a")
    slow = dedup.pagerank(edges, max_iters=20, driver_cap=0).alias("b")
    d = (
        fast.join(slow, F.col("a.node") == F.col("b.node"), "full")
        .agg(
            F.max(F.abs(F.col("a.pagerank") - F.col("b.pagerank"))).alias("d"),
            F.sum(
                (F.col("a.node").isNull() | F.col("b.node").isNull()).cast("long")
            ).alias("miss"),
        )
        .collect()[0]
    )
    fams["pagerank"] = {
        "metric": "max |delta| driver vs distributed path",
        "value": float(d["d"]) if d["d"] is not None else None,
        "ceiling": PAGERANK_DELTA_CEIL,
        "unmatched_nodes": int(d["miss"]),
        "ok": d["miss"] == 0
        and d["d"] is not None
        and float(d["d"]) <= PAGERANK_DELTA_CEIL,
    }

    doc = {"sf": sf, "k": K, "families": fams}
    if sf_label:
        doc["corpus"] = sf_label
    text = json.dumps(doc, indent=2)
    print(text)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    if not all(f["ok"] for f in fams.values()):
        bad = [n for n, f in fams.items() if not f["ok"]]
        print(f"RECALL FLOOR VIOLATION: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
