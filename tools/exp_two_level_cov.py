"""Two-level coarse quantizer: SUPER_COVERAGE recall/cost frontier (r10).

The nsp rule probes enough supers that any nsp of them contain
>= coverage * nprobe child centroids. Higher coverage -> more supers
probed -> probe sets closer to the flat ranking -> higher recall, more
assignment flops. This tool measures the frontier at a given SF:

  for coverage in {2, 3, 4, 6} and the flat path:
    - full knn_graph wall (entry parameterization, checksummed eval)
    - recall@K vs the exact graph (nprobe = nc, restriction vacuous)

Usage: python tools/exp_two_level_cov.py [sf_dir] [--json=out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from pyspark.sql import functions as F
from views_transformation_library_spark.operators import similarity
from views_transformation_library_spark.session import get_spark

K = entry.KNN_GRAPH_K


def checksum(df) -> int:
    row = df.agg(
        *[F.bit_xor(F.xxhash64(c)).alias(c) for c in df.columns]
    ).collect()[0]
    return sum(x or 0 for x in row)


def pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/repo/.sfdata/sf1"
    out_json = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")), None
    )
    spark = get_spark()
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = embs.count()
    params = similarity.auto_graph_params(n, entry.KNN_GRAPH_BUCKET_TARGET)
    nc, nprobe = params["n_centroids"], params["nprobe"]
    print(f"n={n} nc={nc} nprobe={nprobe}", flush=True)

    # exact reference: probe everything (nprobe=nc -> coverage target = nc
    # -> nsp = ns -> vacuous restriction, exact under either path)
    exact = pairs(
        similarity.knn_graph(embs, k=K, n_centroids=nc, nprobe=nc)
    )
    results = {"sf_dir": sf_dir, "n": n, "nc": nc, "nprobe": nprobe, "arms": {}}

    arms = [("flat", None), ("cov2", 2), ("cov3", 3), ("cov4", 4), ("cov6", 6)]
    for name, cov in arms:
        if cov is None:
            similarity.TWO_LEVEL_MIN_NC = 1 << 30
        else:
            similarity.TWO_LEVEL_MIN_NC = 64
            similarity.SUPER_COVERAGE = cov
        walls = []
        got = None
        for _ in range(2):
            t0 = time.time()
            df = similarity.knn_graph(
                embs, k=K, n_centroids=None, nprobe=None,
                bucket_target=entry.KNN_GRAPH_BUCKET_TARGET,
            )
            checksum(df)
            walls.append(round(time.time() - t0, 3))
            if got is None:
                got = pairs(
                    similarity.knn_graph(
                        embs, k=K, n_centroids=None, nprobe=None,
                        bucket_target=entry.KNN_GRAPH_BUCKET_TARGET,
                    )
                )
        rec = round(len(exact & got) / len(exact), 4)
        nsp = None
        if cov is not None:
            cents = similarity.train_ivf_centroids(embs, nc)
            nsp = similarity.two_level_index(cents, nprobe)["nsp"]
        results["arms"][name] = {
            "wall_min": min(walls), "walls": walls, "recall": rec, "nsp": nsp,
        }
        print(f"{name}: wall={min(walls)}s recall@{K}={rec} nsp={nsp}", flush=True)

    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
