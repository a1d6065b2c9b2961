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


def _empty_topk(vectors: DataFrame, id_col: str) -> DataFrame:
    """Empty result with the top-k output schema (empty/all-null input)."""
    id_type = dict(vectors.dtypes).get(id_col, "bigint")
    return vectors.sparkSession.createDataFrame(
        [], schema=f"query_id {id_type}, neighbor_id {id_type}, cosine double, rank int"
    )


def _score_and_rank(pairs: DataFrame, k: int) -> DataFrame:
    """Shared scoring/ranking tail for the top-k variants: 6dp-rounded
    cosine (so rank ties are deterministic, broken by neighbor_id), with the
    norm product nullif-guarded — a zero-norm vector yields NULL cosine and
    is dropped rather than raising DIVIDE_BY_ZERO under ANSI mode (the
    default in Spark 4)."""
    cos = _dot(F.col("__qv"), F.col("__vv")) / F.nullif(
        F.col("__qn") * F.col("__vn"), F.lit(0.0)
    )
    scored = pairs.select(
        "query_id", "neighbor_id", F.round(cos, 6).alias("cosine")
    ).filter(F.col("cosine").isNotNull())
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


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
    (cosine desc, neighbor_id) on 6dp-rounded cosine; zero-norm vectors are
    excluded (undefined cosine)."""
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
    return _score_and_rank(pairs, k)


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
    # nullif: zero-norm vectors have undefined cosine -> NULL -> filtered
    cos = _dot(F.col("__va"), F.col("__vb")) / F.nullif(
        F.col("__na") * F.col("__nb"), F.lit(0.0)
    )
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


def train_ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means on a driver-side sample.

    The sample is id-hash based (`vec_id % sample_mod == 0`) so it is
    reproducible and bounded — at 100 TB you train on ~10^5 sampled vectors,
    never the full table. Pure numpy (no sklearn dependency); empty clusters
    keep their previous centroid."""
    pdf = (
        vectors.filter(F.col(id_col) % sample_mod == 0)
        .select(id_col, vec_col)
        .toPandas()
        .sort_values(id_col)
    )
    X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
    rng = np.random.RandomState(seed)
    centroids = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(n_iters):
        d2 = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(centroids)):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids.tolist()


def _bucket_structs(vec_col: str, centroids: list[list[float]]):
    """Array of (squared-distance-to-centroid, centroid-id) structs."""
    entries = []
    for i, c in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(F.col(vec_col), lit_c, lambda x, y: (x.cast("double") - y) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        entries.append(F.struct(d2.alias("d2"), F.lit(i).alias("c")))
    return F.array_sort(F.array(*entries))


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    sample_mod: int = 1,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: vectors are bucketed by their
    nearest k-means centroid; each query probes only its `nprobe` nearest
    buckets. Candidate count drops by ~n_centroids/nprobe at recall < 1.

    Centroids are tiny literals baked into the plan (broadcast by value);
    bucket assignment is a pure column expression that runs inside the scan
    — the only join is queries x same-bucket vectors.

    At scale, EITHER pass pretrained `centroids` OR set `sample_mod` so the
    k-means training sample (vec_id % sample_mod == 0) stays bounded — the
    default of 1 trains on every vector, which is only sane for small
    tables."""
    if centroids is None and vectors.first() is None:
        return _empty_topk(vectors, id_col)
    if centroids is None:
        centroids = train_ivf_centroids(
            vectors, n_centroids, id_col=id_col, vec_col=vec_col, seed=seed,
            sample_mod=sample_mod,
        )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__vv"),
        _norm(F.col(vec_col)).alias("__vn"),
        _bucket_structs(vec_col, centroids)[0]["c"].alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"),
        F.explode(
            F.transform(
                F.slice(_bucket_structs(vec_col, centroids), 1, nprobe),
                lambda s: s["c"],
            )
        ).alias("__bucket"),
    )
    pairs = v.join(F.broadcast(q), "__bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    return _score_and_rank(pairs, k)


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
    first = vectors.select(vec_col).first()
    if first is None or first[0] is None:
        return _empty_topk(vectors, id_col)
    dim = len(first[0])
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
    return _score_and_rank(pairs, k)
