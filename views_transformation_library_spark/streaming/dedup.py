"""Streaming exact deduplication (beyond-reference surface).

A streaming ingest pipeline drops exact duplicates as documents arrive:
fingerprint each document (same normalized-md5 as batch
``dedup.exact_dedup``) and keep the first occurrence per fingerprint.
``dropDuplicates`` with a watermark bounds the dedup state: fingerprints
older than the watermark horizon are evicted, so state is (active
fingerprints within horizon), not the full history — the standard
bounded-state streaming dedup. Exactly mirrors batch semantics for any
duplicate arriving within the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 day",
) -> DataFrame:
    """Drop exact-duplicate documents from a stream, keeping firsts.

    Output: the input rows minus later duplicates, plus the fingerprint
    column (useful downstream for cross-batch joins)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    with_fp = stream.withColumn("fingerprint", F.md5(norm))
    return with_fp.withWatermark(ts_col, watermark).dropDuplicates(["fingerprint"])


def minhash_candidates_stream(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    n: int = 3,
    n_hashes: int = 24,
    bands: int = 6,
    seed: int = 42,
    watermark: str = "1 day",
    state_ttl: str | None = None,
) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate CANDIDATE detection: as
    documents arrive, each is checked against every previously seen
    document sharing an LSH band bucket, emitting (band, a, b,
    est_jaccard) with est_jaccard the fraction of matching signature
    components — the batch `dedup.minhash_lsh_pairs` candidate stage,
    incremental. (Exact-Jaccard verification stays a batch follow-up on
    the flagged pairs; pairs colliding in several bands are emitted once
    per band, like the batch bucket stage before its distinct.)

    The signature is computed entirely with row-level array expressions
    (min over the shingle-int array per hash — duplicates can't change a
    min, so no distinct and no aggregation state), which is what makes it
    streamable without a shuffle-side groupBy: the ONLY stateful op is
    the per-bucket applyInPandasWithState, whose state is the bucket's
    (doc_id, signature) list. Buckets are (band, r-component signature)
    keys — high cardinality, tiny state each. Without a TTL, state grows
    with distinct docs per bucket over the stream's life; ``state_ttl``
    (e.g. "7 days") bounds it with an event-time timeout — a bucket idle
    for TTL past the watermark is evicted, so new documents only pair
    against the TTL-active horizon (the standard streaming dedup trade,
    same as dropDuplicates' watermark eviction). The batch operator
    remains the full-history tool.
    """
    from ..operators.dedup import MINHASH_P, minhash_params, shingle_int_expr  # noqa: F401

    if bands < 1 or n_hashes % bands != 0:
        raise ValueError(f"n_hashes ({n_hashes}) must be a multiple of bands ({bands})")
    r = n_hashes // bands
    params = minhash_params(n_hashes, seed)
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\S+"), 0)
    shingle_strs = F.expr(
        f"transform(sequence(1, size(__toks) - {n - 1}), "
        f"i -> concat_ws(' ', slice(__toks, i, {n})))"
    )
    ints = F.transform(
        F.col("__sh"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long"),
    )
    base = (
        stream.select(
            F.col(id_col).alias("__id"), F.col(ts_col).alias("__ts"), toks.alias("__toks")
        )
        .filter(F.size("__toks") >= n)
        .select("__id", "__ts", shingle_strs.alias("__sh"))
        .select("__id", "__ts", ints.alias("__x"))
    )
    def _affine(a: int, b: int):
        # 1-arg lambda from a factory: pyspark's transform treats extra
        # (defaulted) parameters as the (element, index) form
        return lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_P

    sig_cols = [
        F.array_min(F.transform("__x", _affine(a, b))).alias(f"mh_{j}")
        for j, (a, b) in enumerate(params)
    ]
    sigs = base.select("__id", "__ts", *sig_cols)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bidx).alias("band"),
                F.concat_ws(
                    ",", *[F.col(f"mh_{bidx * r + i}") for i in range(r)]
                ).alias("sig"),
            )
            for bidx in range(bands)
        ]
    )
    banded = sigs.select(
        "__id",
        "__ts",
        F.array(*[F.col(f"mh_{j}") for j in range(n_hashes)]).alias("__sig"),
        F.explode(band_structs).alias("__b"),
    ).select(
        "__id", "__ts", "__sig", F.col("__b.band").alias("band"), F.col("__b.sig").alias("sig")
    )

    n_h = n_hashes

    import pandas as _pd

    ttl_ms = (
        None
        if state_ttl is None
        else int(_pd.Timedelta(state_ttl).total_seconds() * 1000)
    )

    def _bucket(key, pdfs, state):
        import pandas as pd

        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=["band", "a", "b", "est_jaccard"])
            return
        if state.exists:
            (ids, flat) = state.get
            ids = list(ids)
            flat = list(flat)
        else:
            ids, flat = [], []
        out = []
        band_val, sig_val = key
        for pdf in pdfs:
            pdf = pdf.sort_values("__id")
            for did, sig in zip(pdf["__id"].values, pdf["__sig"].values):
                sig = list(sig)
                for j, prior in enumerate(ids):
                    if prior == did:
                        continue
                    psig = flat[j * n_h : (j + 1) * n_h]
                    eq = sum(1 for u, v in zip(psig, sig) if u == v)
                    a, b = (prior, did) if prior < did else (did, prior)
                    out.append((int(band_val), int(a), int(b), eq / n_h))
                ids.append(int(did))
                flat.extend(int(v) for v in sig)
        state.update((ids, flat))
        if ttl_ms is not None:
            # evict buckets idle for TTL past the event-time watermark
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttl_ms)
        yield pd.DataFrame(out, columns=["band", "a", "b", "est_jaccard"])

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_type = StructType(
        [
            StructField("band", IntegerType()),
            StructField("a", LongType()),
            StructField("b", LongType()),
            StructField("est_jaccard", DoubleType()),
        ]
    )
    state_type = StructType(
        [
            StructField("ids", ArrayType(LongType())),
            StructField("sigs", ArrayType(LongType())),
        ]
    )
    return (
        banded.withWatermark("__ts", watermark)
        .groupBy("band", "sig")
        .applyInPandasWithState(
            _bucket,
            out_type,
            state_type,
            "append",
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.EventTimeTimeout,
        )
    )
