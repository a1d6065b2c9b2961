"""Offline (pure numpy) map of knn_graph's recall/pair-work frontier
(VERDICT r6 #1 — break the n^5/3 pair-work law).

For each (n_centroids, nprobe) candidate: train the SAME k-means the
operator trains (similarity.lloyd_kmeans on the full vector matrix in
vec_id order — identical to the driver sample at these sizes), assign
members to their nearest bucket, probe each query's nprobe nearest
buckets, and report mean recall@5 vs the full-probe (exact) top-5 plus
total candidate-pair work. Runs at sf0.1 (n=2000) and sf1 (n=20000) so
the parameter policy can be chosen against measured recall, not theory.

Ranking note (ADVICE r7): both the exact and the probed side rank on the
UNROUNDED cosine with vec_id tie-breaks — this sidesteps the np.round
(half-even) vs Spark round (HALF_UP) divergence entirely; since both
sides of the recall comparison use the same ranking, the frontier map is
self-consistent. The operator's 6dp-rounded ranking can only reshuffle
within <1e-6 cosine ties, which does not move recall at map precision.

Exact top-k is computed in query chunks (ADVICE r7): peak memory is
O(chunk·n) floats, not O(n²) — at n=20000 the old dense path needed two
~3.2 GB matrices.

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
CHUNK = 2048


def load(sf_dir: str) -> np.ndarray:
    rows = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    return np.array([list(r[0]) for r in rows], dtype=np.float64)


def _rank_topk(cos_rows: np.ndarray, cand_ids: np.ndarray, k: int) -> np.ndarray:
    """Per-row top-k candidate ids, unrounded-cosine desc + id asc ties."""
    out = np.empty((len(cos_rows), k), dtype=np.int64)
    for r in range(len(cos_rows)):
        order = np.lexsort((cand_ids, -cos_rows[r]))
        out[r] = cand_ids[order[:k]]
    return out


def exact_topk(X: np.ndarray, k: int) -> np.ndarray:
    """Chunked exact top-k: O(CHUNK·n) peak memory (ADVICE r7)."""
    n = len(X)
    nrm = np.sqrt((X * X).sum(1))
    ids = np.arange(n)
    out = np.empty((n, k), dtype=np.int64)
    for qs in range(0, n, CHUNK):
        qe = min(qs + CHUNK, n)
        cos = (X[qs:qe] @ X.T) / np.outer(nrm[qs:qe], nrm)
        cos[np.arange(qe - qs), np.arange(qs, qe)] = -np.inf
        out[qs:qe] = _rank_topk(cos, ids, k)
    return out


def frontier(X: np.ndarray, grid):
    n = len(X)
    exact = exact_topk(X, K)
    nrm = np.sqrt((X * X).sum(1))
    rows = []
    for nc, nprobe in grid:
        C = np.asarray(similarity.lloyd_kmeans(X, nc), dtype=np.float64)
        d2 = np.empty((n, len(C)))
        for i, c in enumerate(C):
            d2[:, i] = ((X - c) ** 2).sum(1)
        order = np.argsort(d2, axis=1, kind="stable")
        member = order[:, 0]
        probes = order[:, :nprobe]
        buckets = [np.flatnonzero(member == b) for b in range(len(C))]
        sizes = np.array([len(b) for b in buckets])
        pair_work = 0
        hits = 0
        for q in range(n):
            cand = np.concatenate([buckets[b] for b in probes[q]])
            cand = cand[cand != q]
            pair_work += len(cand)
            if not len(cand):
                continue
            cos = (X[cand] @ X[q]) / (nrm[cand] * nrm[q])
            o = np.lexsort((cand, -cos))
            top = set(cand[o[:K]].tolist())
            hits += len(top & set(exact[q].tolist()))
        rec = hits / (K * n)
        print(
            f"  nc={nc:4d} nprobe={nprobe:3d}  recall@5={rec:.3f}"
            f"  pairs={pair_work:>12,}  pairs/n={pair_work / n:>9.1f}"
            f"  pairs/n^1.5={pair_work / n ** 1.5:6.1f}"
            f"  max_bucket={sizes.max()}"
        )
        rows.append(dict(nc=nc, nprobe=nprobe, recall=rec, pairs=pair_work,
                         max_bucket=int(sizes.max())))
    return rows


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sfdata", "sf1")]
    for d in dirs:
        X = load(d)
        n = len(X)
        rn = int(round(np.sqrt(n)))
        print(f"{d}  n={n}")
        grid = [
            (8, 2),                      # r7 entry params (fixed nc)
            (max(8, round(n ** (1 / 3))), 2),
            (rn // 2, 2), (rn // 2, 4),
            (rn, 2), (rn, 4), (rn, 8),
            (2 * rn, 8),
            (max(1, -(-n // 256)), 2),   # bucket_target=256 linear rule
            (max(1, -(-n // 256)), 4),
            (max(1, -(-n // 128)), 4),   # bucket_target=128 linear rule
            (max(1, -(-n // 64)), 4),    # bucket_target=64 linear rule
            (max(1, -(-n // 64)), 8),
        ]
        seen = set()
        grid = [g for g in grid if not (g in seen or seen.add(g))]
        frontier(X, grid)


if __name__ == "__main__":
    main()
