"""Keyword retrieval over the documents table (beyond-reference surface):
TF-IDF / BM25 scoring and top-k search.

Why it belongs in a training-data engine: targeted corpus slicing ("all
docs about X"), contamination auditing, and retrieval-based quality checks
all reduce to scoring a 100 TB corpus against a small term set — a scan +
one bounded aggregation, never an index build.

Scale design: the only shuffled object is the matched postings set
(docs containing >= 1 query term), aggregated per doc with map-side
combine; document frequencies and corpus stats are LONG-exact side
aggregates broadcast into the scoring expression. The per-doc score is a
FIXED-ORDER (left-associated) sum over the query terms — never a
hash-aggregate double sum — so results are bit-reproducible run to run
and match the DuckDB oracle exactly (CLAUDE.md float-parity rules); the
final ranking orders on the 6dp-rounded score with doc_id tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOKEN_PATTERN = "[a-z0-9]+"


def _validate_terms(query_terms: list[str]) -> list[str]:
    import re

    terms = list(dict.fromkeys(query_terms))  # dedup, keep order
    if not terms:
        raise ValueError("query_terms must be non-empty")
    for t in terms:
        if not re.fullmatch("[a-z0-9]+", t):
            raise ValueError(f"query term {t!r} is not a lowercase [a-z0-9]+ token")
    return terms


def term_frequencies(
    df: DataFrame,
    query_terms: list[str],
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc term-frequency columns ``tf_<term>`` (LONG) for each query
    term, plus ``doc_len`` (total [a-z0-9]+ tokens). Docs with zero hits
    across all terms are dropped (they can never score).

    One explode + one hash aggregate over the *matched* tokens only —
    the filter on term membership happens before the shuffle, so shuffle
    volume is O(matching tokens), not O(corpus tokens).
    """
    terms = _validate_terms(query_terms)
    toks = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.lower(F.col(col)), F.lit(TOKEN_PATTERN), 0)).alias(
            "__term"
        ),
    ).filter(F.col("__term").isin(terms))
    tf = toks.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("__term") == t, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"tf_{t}")
            for t in terms
        ]
    )
    doc_len = df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.lower(F.col(col)), F.lit(TOKEN_PATTERN), 0))
        .cast("long")
        .alias("doc_len"),
    )
    return tf.join(doc_len, id_col)


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k documents for a bag-of-terms query (Robertson/Sparck
    Jones weighting, the Okapi formula used by Lucene/Elasticsearch):

        score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        idf(t)   = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )

    Determinism: tf/df/N/dl are LONG-exact; avgdl is one long/long
    division; the per-doc sum is left-associated over the fixed term
    order. Ranking is on round(score, 6) DESC with doc_id tie-breaks.
    Output: (doc_id, bm25, rank), rank <= k.

    Plan: matched-postings aggregate (term_frequencies) + two tiny side
    aggregates (corpus N/avgdl: 1 row; per-term df: <= |terms| rows)
    crossed in as broadcast literals via a 1-row cross join — no
    driver collect, no action before the final top-k. Top-k is a
    distributed TakeOrderedAndProject (per-partition top-k, driver
    merge — the vocab_top_terms pattern): `orderBy(...).limit(k)` over
    the scored docs, then `row_number` over only the k survivors. No
    task ever holds more than k rows for the ranking, even when a query
    term is frequent and matches billions of docs (an unpartitioned
    rank window over the full match set — the r2 shape — would pull
    them all into one task).
    """
    terms = _validate_terms(query_terms)
    tf = term_frequencies(df, terms, col=col, id_col=id_col)

    # corpus stats: one row (N, avgdl); per-term df: |terms| rows pivoted
    # to one row — both broadcast into the scoring projection
    stats = df.agg(
        F.count("*").cast("long").alias("__n_docs"),
        F.sum(
            F.size(F.regexp_extract_all(F.lower(F.col(col)), F.lit(TOKEN_PATTERN), 0)).cast(
                "long"
            )
        ).alias("__tot_len"),
    ).withColumn(
        "__avgdl",
        F.col("__tot_len").cast("double") / F.nullif(F.col("__n_docs").cast("double"), F.lit(0.0)),
    )
    dfreq = tf.agg(
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"df_{t}")
            for t in terms
        ]
    )
    scored = tf.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(dfreq))

    score = None
    for t in terms:
        tf_t = F.col(f"tf_{t}").cast("double")
        df_t = F.col(f"df_{t}").cast("double")
        n = F.col("__n_docs").cast("double")
        idf = F.log((n - df_t + F.lit(0.5)) / (df_t + F.lit(0.5)) + F.lit(1.0))
        denom = tf_t + F.lit(float(k1)) * (
            F.lit(1.0 - float(b))
            + F.lit(float(b)) * F.col("doc_len").cast("double") / F.col("__avgdl")
        )
        part = idf * tf_t * F.lit(float(k1) + 1.0) / denom
        score = part if score is None else score + part  # left-associated

    topk = (
        scored.select(F.col(id_col), (F.round(score, 6) + F.lit(0.0)).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(int(k))
    )
    # rank the <= k survivors: the window input is bounded by the constant
    # k, so the single-partition sort is O(k), independent of data size
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w))


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB SQL mirroring bm25_topk op-for-op (same fixed-order
    arithmetic, same rounding, same tie-breaks) for the oracle gate."""
    terms = _validate_terms(query_terms)
    tf_cols = ",\n         ".join(
        f"sum(CASE WHEN t = '{t}' THEN 1 ELSE 0 END)::BIGINT AS tf_{t}" for t in terms
    )
    df_cols = ",\n         ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)::BIGINT AS df_{t}" for t in terms
    )
    parts = []
    for t in terms:
        idf = f"ln((s.n_docs::DOUBLE - df_{t}::DOUBLE + 0.5) / (df_{t}::DOUBLE + 0.5) + 1.0)"
        denom = f"(tf_{t}::DOUBLE + {float(k1)!r} * ((1.0 - {float(b)!r}) + {float(b)!r} * doc_len::DOUBLE / s.avgdl))"
        parts.append(f"{idf} * tf_{t}::DOUBLE * {float(k1) + 1.0!r} / {denom}")
    score = " + ".join(parts)  # SQL '+' is left-associative, matching Spark
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(regexp_extract_all(lower({col}), '{TOKEN_PATTERN}')) AS t
  FROM {table}
),
tf0 AS (
  SELECT {id_col},
         {tf_cols}
  FROM toks WHERE t IN ({", ".join(f"'{t}'" for t in terms)})
  GROUP BY {id_col}
),
dl AS (
  SELECT {id_col}, len(regexp_extract_all(lower({col}), '{TOKEN_PATTERN}'))::BIGINT AS doc_len
  FROM {table}
),
tf AS (SELECT tf0.*, dl.doc_len FROM tf0 JOIN dl USING ({id_col})),
s AS (
  SELECT count(*)::BIGINT AS n_docs,
         sum(len(regexp_extract_all(lower({col}), '{TOKEN_PATTERN}')))::BIGINT AS tot_len,
         sum(len(regexp_extract_all(lower({col}), '{TOKEN_PATTERN}')))::DOUBLE
           / nullif(count(*)::DOUBLE, 0.0) AS avgdl
  FROM {table}
),
d AS (
  SELECT {df_cols}
  FROM tf
),
scored AS (
  SELECT tf.{id_col}, round({score}, 6) + 0.0 AS bm25
  FROM tf CROSS JOIN s CROSS JOIN d
)
SELECT {id_col}, bm25,
       CAST(row_number() OVER (ORDER BY bm25 DESC, {id_col}) AS INT) AS rank
FROM scored
QUALIFY rank <= {int(k)}
"""


def chunk_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking (the RAG-ingestion shape): word
    windows of ``size`` tokens starting every ``size - overlap`` tokens,
    one output row per chunk — (id, chunk_idx, chunk_text, n_words).
    Chunks start while any words remain, so the trailing chunk may be
    short; empty documents produce no chunks (explode semantics,
    documented). Pure scan-side array expressions + one posexplode — no
    shuffle, no UDF; at 100 TB this is a map-only pass whose output is
    ~1/(1-overlap/size)x the corpus."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap ({overlap}) < size ({size})")
    stride = size - overlap
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\S+"), 0)
    base = df.select(F.col(id_col), toks.alias("__toks"))
    chunks = F.when(
        F.size("__toks") > 0,
        F.expr(
            f"transform(sequence(0, int(ceil(size(__toks) / {stride}.0)) - 1), "
            f"i -> slice(__toks, i * {stride} + 1, {size}))"
        ),
    ).otherwise(F.expr("array()").cast("array<array<string>>"))
    ex = base.select(
        id_col, F.size("__toks").alias("__nw"),
        F.posexplode(chunks).alias("chunk_idx", "__chunk"),
    )
    # a chunk starting at i*stride only adds content if the PREVIOUS chunk
    # (which covers through i*stride + overlap) stopped short of the end:
    # trailing subsumed/empty slices are dropped, genuine short tails kept
    return ex.filter(
        (F.col("chunk_idx") == 0)
        | (F.col("chunk_idx") * stride + overlap < F.col("__nw"))
    ).select(
        id_col,
        "chunk_idx",
        F.concat_ws(" ", "__chunk").alias("chunk_text"),
        F.size("__chunk").alias("n_words"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N per-query
    rankings — the standard hybrid-retrieval combiner (dense + sparse +
    rerankers): score(q, d) = Σ_i 1/(k + rank_i(q, d)), summed over the
    rankings that retrieved (q, d).

    Float parity: the contributions are combined in a FIXED left-to-right
    expression over the full-outer-joined per-ranking columns (never a
    hash-aggregate double sum), rounded to 6dp, and re-ranked on the
    ROUNDED score with doc-id tie-breaks — the established rules. N-1
    equi-joins on (query, doc): rankings are top-k lists, tiny next to
    their corpora."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    out = None
    for i, r in enumerate(rankings):
        c = r.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
            (
                F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))
            ).alias(f"__c{i}"),
        )
        out = c if out is None else out.join(c, ["query_id", "doc_id"], "full_outer")
    score = None
    for i in range(len(rankings)):
        t = F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
        score = t if score is None else score + t
    fused = out.select(
        "query_id", "doc_id", (F.round(score, 6) + F.lit(0.0)).alias("rrf")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return fused.withColumn("rrf_rank", F.row_number().over(w))


def tfidf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Sparse TF-IDF document-term weights (the classic IR vectorization,
    sklearn's smooth-idf convention): idf(t) = ln((N+1)/(df_t+1)) + 1,
    weight = tf · idf. Output exploded as (id, term, tf, weight) — the
    sparse representation IS the scalable one (a dense vocab-width array
    per doc is exactly what breaks at web scale). ``min_df`` drops
    hapax-style noise terms.

    Float parity: idf is rounded to 6dp straight off the ln, weight is
    round(tf · idf_r6, 6) — products of identical doubles, engine-exact.
    Plan: one (doc, term) hash aggregate (map-side combined), one term
    aggregate for document frequencies, one join back on the term (AQE
    broadcasts small vocabularies); N is a driver scalar.
    """
    terms = df.select(
        F.col(id_col).alias("__d"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
        ).alias("term"),
    )
    tf = terms.groupBy("__d", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("__df") >= min_df)
    n_docs = df.select(id_col).distinct().count()
    idf = F.round(
        F.log((F.lit(float(n_docs)) + 1.0) / (F.col("__df") + F.lit(1.0))) + 1.0, 6
    )
    return (
        tf.join(dfreq.select("term", idf.alias("__idf")), "term")
        .select(
            F.col("__d").alias(id_col),
            "term",
            "tf",
            (F.round(F.col("tf") * F.col("__idf"), 6) + F.lit(0.0)).alias("weight"),
        )
    )
