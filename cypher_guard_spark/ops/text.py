"""Text analysis operators over a document corpus.

All hot paths are built-in pyspark.sql.functions (JVM, whole-stage
codegen) — no Python in any of these operators. Each has a matching
ANSI-SQL oracle in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language function-word lists for the n-gram/stopword language-ID
# heuristic. The heuristic IS the operator contract (the corpus's `lang`
# column is a synthetic label, not a property of the text).
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un"],
}


def _norm(col):
    return F.lower(F.trim(col))


def tokens(col):
    """Whitespace tokenization of normalized text."""
    return F.split(_norm(col), r"\s+")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars_norm)."""
    return df.select(
        "doc_id",
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
        F.length(_norm(F.col(text_col))).alias("n_chars_norm"),
    )


def bpe_ish_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_subword) — BPE-ish proxy: alnum runs + punctuation marks
    each count as a token (regexp-only, JVM-side)."""
    pieces = F.regexp_extract_all(_norm(F.col(text_col)), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0)
    return df.select("doc_id", F.size(pieces).alias("n_subword"))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, punct_ratio, stopword_ratio, quality) — simple
    length/punctuation/stopword quality heuristic, ratios rounded to 6dp
    for cross-engine comparability."""
    t = _norm(F.col(text_col))
    toks = F.split(t, r"\s+")
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(LANG_STOPWORDS["en"])))
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6)
    quality = F.round(
        F.least(n_tokens / F.lit(32.0), F.lit(1.0)) * (F.lit(1.0) - punct_ratio), 6
    )
    return df.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred) — argmax of per-language stopword hits; ties and
    zero-hit docs resolve to 'und' (deterministic).

    The whole classifier is ONE bound-lambda expression: the distinct-token
    array would otherwise be inlined by CollapseProject into every
    per-language hit count (~2 x n_langs re-tokenizations per row)."""

    def hit(lang):
        arr = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        return f"size(array_intersect(ts, array({arr})))"

    best = f"greatest({', '.join(hit(lang) for lang in LANG_STOPWORDS)})"
    case = f"CASE WHEN {best} <= 0 THEN 'und' " + " ".join(
        f"WHEN {hit(lang)} = {best} THEN '{lang}'" for lang in sorted(LANG_STOPWORDS)
    ) + " END"
    pred = F.expr(
        f"transform(array(array_distinct(split(lower(trim({text_col})), '\\\\s+'))), "
        f"ts -> {case})[0]"
    )
    return df.select("doc_id", pred.alias("lang_pred"))


def fingerprints(df: DataFrame, text_col: str = "text", prefix_tokens: int = 8) -> DataFrame:
    """(doc_id, fingerprint) — md5 of the first N normalized tokens; a
    cheap, engine-portable document fingerprint."""
    toks = tokens(F.col(text_col))
    head = F.array_join(F.slice(toks, 1, prefix_tokens), " ")
    return df.select("doc_id", F.md5(head).alias("fingerprint"))
