"""Text-analysis operators for large-scale training-data pipelines
(beyond-reference surface, BASELINE.json north star).

All pure Column expressions (JVM-side, codegen'd, zero UDFs) so they run at
full scan speed over a 100 TB documents table: language-ID by stopword-hit
counting, quality scoring from length/punctuation/stopword ratios, token
counting, and md5 document fingerprinting for exact dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic;
# deterministic and cheap — not a real language model by design
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "ich", "mit", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "que", "dans"],
}


def token_count(df: DataFrame, col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace token count. `regexp_count` of non-space runs — empty and
    all-space strings yield 0."""
    return df.withColumn(out, F.regexp_count(F.col(col), F.lit(r"\S+")))


# GPT-2-style pretokenizer pattern (public regex family): contractions,
# letter runs, digit runs, punctuation runs, trailing whitespace
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+$|\s+"


def token_count_bpe(df: DataFrame, col: str = "text", out: str = "n_bpe_tokens") -> DataFrame:
    """Subword-ish token count with a BPE-style pretokenizer regex — the
    cheap stand-in for an exact tokenizer when budgeting LLM training data.
    Pure regexp_count, runs at scan speed."""
    return df.withColumn(out, F.regexp_count(F.col(col), F.lit(BPE_PATTERN)))


def _stopword_hits(col: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pat))


def lang_id(df: DataFrame, col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID over LANG_STOPWORDS; deterministic argmax
    with ties broken by language-list order; no hits at all -> 'und'."""
    hits = [_stopword_hits(F.col(col), ws).alias(f"__h_{lang}") for lang, ws in LANG_STOPWORDS.items()]
    tmp = df.select("*", *hits)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"__h_{lang}") for lang in langs])
    expr = F.lit("und")
    for lang in reversed(langs):  # earlier languages win ties
        expr = F.when((F.col(f"__h_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return tmp.withColumn(out, expr).drop(*[f"__h_{lang}" for lang in langs])


def text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Per-document stats: chars, tokens, punctuation count, digit count,
    stopword(en) hits — the raw material for quality scoring."""
    c = F.col(col)
    return df.withColumns(
        {
            "n_chars_calc": F.length(c),
            "n_tokens": F.regexp_count(c, F.lit(r"\S+")),
            "n_punct": F.regexp_count(c, F.lit(r"[^\w\s]")),
            "n_digits": F.regexp_count(c, F.lit(r"[0-9]")),
            "n_stopwords": _stopword_hits(c, LANG_STOPWORDS["en"]),
        }
    )


def quality_score(df: DataFrame, col: str = "text", out: str = "quality") -> DataFrame:
    """Deterministic [0,1] quality heuristic (documented formula, mirrors
    common pretraining-data filters):

      0.4 * min(tokens/50, 1)              -- enough content
    + 0.4 * min(5 * stopword_ratio, 1)     -- natural-language-ness
    + 0.2 * (1 - min(10 * punct_ratio, 1)) -- not symbol soup

    ratios are per token / per char; empty docs score 0.
    """
    c = F.col(col)
    n_tok = F.regexp_count(c, F.lit(r"\S+")).cast("double")
    n_char = F.length(c).cast("double")
    n_stop = _stopword_hits(c, LANG_STOPWORDS["en"]).cast("double")
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]")).cast("double")
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_char > 0, n_punct / n_char).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(n_tok / 50.0, F.lit(1.0))
        + F.lit(0.4) * F.least(5.0 * stop_ratio, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(10.0 * punct_ratio, F.lit(1.0)))
    )
    return df.withColumn(out, F.when(n_tok > 0, score).otherwise(F.lit(0.0)))


def fingerprint(df: DataFrame, col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Normalized md5 fingerprint: lower-case, whitespace collapsed,
    trimmed. Identical normalization is expressible in any engine, so the
    fingerprint doubles as a cross-system exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")
    return df.withColumn(out, F.md5(norm))


def normalize_text(
    df: DataFrame,
    col: str = "text",
    out: str = "text_norm",
    lowercase: bool = False,
    mask_urls: bool = False,
    mask_emails: bool = False,
) -> DataFrame:
    """Deterministic text normalization for training-data pipelines:
    strip ASCII control characters, collapse whitespace runs to one space,
    trim; optionally lowercase and mask URLs/emails with fixed sentinels.

    Pure regexp_replace column expressions (JVM-side, whole-stage codegen;
    the regex classes are chosen to behave identically in Java regex and
    DuckDB's RE2 so the op is oracle-checkable). Masking before whitespace
    collapse so masked runs cannot re-join neighboring tokens."""
    c = F.col(col)
    if mask_emails:
        c = F.regexp_replace(c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>")
    if mask_urls:
        c = F.regexp_replace(c, r"https?://[^\s]+", "<URL>")
    c = F.regexp_replace(c, r"[\x00-\x1F\x7F]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    if lowercase:
        c = F.lower(c)
    return df.withColumn(out, c)
