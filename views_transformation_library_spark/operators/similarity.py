"""Similarity search over embedding columns (beyond-reference surface).

Brute-force cosine top-k is the exact baseline: a broadcast join of the
(small) query set against the full vector table — one pass, no index. The
scale path is LSH bucketing by random-hyperplane signatures: vectors and
queries land in sign-pattern buckets; only same-bucket (or near-bucket)
pairs are scored, trading recall for a ~2^planes reduction in pairs.

All arithmetic is promoted to double before the fold so results are stable
and engine-comparable; similarities are rounded to 6dp *before* ranking so
rank ties (broken by vec_id) are deterministic.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours of each query vector (excluding the
    query itself when ids collide). queries: (id_col, vec_col) — typically
    small -> broadcast; the big side streams through one pass.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k by
    (cosine desc, neighbor_id) on 6dp-rounded cosine."""
    # norms precomputed per vector (once), not per pair
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__vv"),
        _norm(F.col(vec_col)).alias("__vn"),
    )
    pairs = v.crossJoin(F.broadcast(q)).filter(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("__qv"), F.col("__vv")) / (F.col("__qn") * F.col("__vn"))
    scored = pairs.select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — exact brute force
    (postings-free; quadratic: use `lsh_topk` at scale)."""
    a = vectors.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("__va"), _norm(F.col(vec_col)).alias("__na")
    )
    b = vectors.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("__vb"), _norm(F.col(vec_col)).alias("__nb")
    )
    pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    cos = _dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return pairs.select("a", "b", F.round(cos, 6).alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_bucket_expr(vec_col: str, planes: list[list[float]]):
    """Sign-pattern bucket id: bit p set iff dot(vec, plane_p) > 0."""
    acc = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(F.col(vec_col), lit_plane)
        acc = acc + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors sharing the query's hyperplane
    sign bucket. Recall < 1 by construction; bucket count 2^n_planes cuts
    the candidate set proportionally. Same output shape as cosine_topk."""
    dim = len(vectors.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__vv"),
        _norm(F.col(vec_col)).alias("__vn"),
        lsh_bucket_expr(vec_col, planes).alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"),
        lsh_bucket_expr(vec_col, planes).alias("__bucket"),
    )
    pairs = v.join(F.broadcast(q), "__bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("__qv"), F.col("__vv")) / (F.col("__qn") * F.col("__vn"))
    scored = pairs.select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
