"""Parameter sweep for the ANN auto-scaling rule (VERDICT r5 #6): recall
vs cosine_topk at a given SF for candidate (n_planes, probe_bits), ivf
nprobe, pq rerank settings."""

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from views_transformation_library_spark.operators import similarity
from views_transformation_library_spark.session import get_spark

K = 10


def _sets(rows):
    d = defaultdict(set)
    for r in rows:
        d[r["query_id"]].add(r["neighbor_id"])
    return d


def mean_recall(exact, approx):
    rs = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact if exact[q]]
    return round(sum(rs) / len(rs), 4)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp_ann")
    embs = entry._embs(spark, sf_dir)
    queries = entry._queries(spark, sf_dir)
    n = embs.count()
    print(f"corpus n={n}")
    exact = _sets(similarity.cosine_topk(embs, queries, k=K).collect())
    for p, pb in [(4, 1), (5, 1), (6, 1), (6, 2), (7, 2), (8, 2)]:
        try:
            r = mean_recall(exact, _sets(
                similarity.lsh_topk(embs, queries, k=K, n_planes=p, probe_bits=pb).collect()))
        except Exception as ex:
            r = f"ERR {ex}"
        print(f"lsh p={p} probe={pb}: {r}")
    for nc, np_ in [(16, 4), (16, 6), (22, 6), (32, 8)]:
        r = mean_recall(exact, _sets(
            similarity.ivf_topk(embs, queries, k=K, n_centroids=nc, nprobe=np_).collect()))
        print(f"ivf nc={nc} nprobe={np_}: {r}")
    for rr in [8, 16, 24]:
        r = mean_recall(exact, _sets(
            similarity.pq_topk(embs, queries, k=K, m=8, k_codes=16, rerank=rr).collect()))
        print(f"pq rerank={rr}: {r}")


if __name__ == "__main__":
    main()
