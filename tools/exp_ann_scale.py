"""Offline (pure numpy) map of knn_graph's recall/pair-work frontier
(VERDICT r6 #1 — break the n^5/3 pair-work law).

For each (n_centroids, nprobe) candidate: train the SAME k-means the
operator trains (similarity.lloyd_kmeans on the full vector matrix in
vec_id order — identical to the driver sample at these sizes), assign
members to their nearest bucket, probe each query's nprobe nearest
buckets, and report mean recall@5 vs the full-probe (exact) top-5 plus
total candidate-pair work. Runs at sf0.1 (n=2000) and sf1 (n=20000) so
the parameter policy can be chosen against measured recall, not theory.

Usage: python tools/exp_ann_scale.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from views_transformation_library_spark.operators import similarity  # noqa: E402

K = 5


def load(sf_dir: str) -> np.ndarray:
    rows = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    return np.array([list(r[0]) for r in rows], dtype=np.float64)


def exact_topk(X: np.ndarray, k: int) -> np.ndarray:
    nrm = np.sqrt((X * X).sum(1))
    cos = (X @ X.T) / np.outer(nrm, nrm)
    np.fill_diagonal(cos, -np.inf)
    # rounded-cosine + id tie-break ranking, like the operator
    cs = np.round(cos, 6)
    n = len(X)
    ids = np.arange(n)
    out = np.empty((n, k), dtype=np.int64)
    for q in range(n):
        order = np.lexsort((ids, -cs[q]))
        out[q] = order[:k]
    return out


def frontier(X: np.ndarray, grid):
    n = len(X)
    exact = exact_topk(X, K)
    nrm = np.sqrt((X * X).sum(1))
    for nc, nprobe in grid:
        C = np.asarray(similarity.lloyd_kmeans(X, nc), dtype=np.float64)
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2) if n * nc * X.shape[1] < 5e8 else None
        if d2 is None:
            d2 = np.empty((n, len(C)))
            for i, c in enumerate(C):
                d2[:, i] = ((X - c) ** 2).sum(1)
        order = np.argsort(d2, axis=1, kind="stable")
        member = order[:, 0]
        probes = order[:, :nprobe]
        buckets = [np.flatnonzero(member == b) for b in range(len(C))]
        pair_work = 0
        hits = 0
        for q in range(n):
            cand = np.concatenate([buckets[b] for b in probes[q]])
            cand = cand[cand != q]
            pair_work += len(cand)
            if not len(cand):
                continue
            cos = np.round((X[cand] @ X[q]) / (nrm[cand] * nrm[q]), 6)
            o = np.lexsort((cand, -cos))
            top = set(cand[o[:K]].tolist())
            hits += len(top & set(exact[q].tolist()))
        print(
            f"  nc={nc:4d} nprobe={nprobe:3d}  recall@5={hits / (K * n):.3f}"
            f"  pairs={pair_work:>12,}  pairs/n^1.5={pair_work / n ** 1.5:.1f}"
        )


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sfdata", "sf1")]
    for d in dirs:
        X = load(d)
        n = len(X)
        rn = int(round(np.sqrt(n)))
        print(f"{d}  n={n}")
        grid = [
            (8, 2),                      # current entry params
            (max(8, round(n ** (1 / 3))), 2),
            (rn // 2, 2), (rn // 2, 4),
            (rn, 2), (rn, 4), (rn, 8),
            (2 * rn, 8),
            (max(1, n // 256), 2),       # bucket_target=256 linear rule
            (max(1, n // 256), 4),
        ]
        seen = set()
        grid = [g for g in grid if not (g in seen or seen.add(g))]
        frontier(X, grid)


if __name__ == "__main__":
    main()
