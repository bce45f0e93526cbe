"""Text-analysis expressions for the documents table.

Capability-extension scope (north star): token counting, quality scoring,
language-ID heuristic, document fingerprinting — the text half of an
LLM-training-data pipeline. All built-in functions (split / transform /
filter / hash), zero Python UDFs, so the whole pipeline stays inside
whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible so the DuckDB oracle can state
# the identical rule.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "les"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "an", "of", "to", "and", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization. Single-space split (the synthetic corpus is
    single-space separated); matches DuckDB ``string_split(text, ' ')``."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def count_in_list(toks: Column, words: tuple[str, ...]) -> Column:
    """How many tokens fall in a fixed word list (higher-order filter —
    JVM-side lambda, no Python)."""
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stopword_count(text: Column) -> Column:
    return count_in_list(tokens(text), STOPWORDS)


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features: length, token count, mean word length,
    stopword ratio. NULL-safe via guarded division."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_word_len": F.when(n_tokens == 0, F.lit(None).cast("double")).otherwise(
            (n_chars - (n_tokens - F.lit(1))).cast("double") / n_tokens.cast("double")
        ),
        "stopword_ratio": F.when(n_tokens == 0, F.lit(None).cast("double")).otherwise(
            stopword_count(text).cast("double") / n_tokens.cast("double")
        ),
    }


def lang_score(text: Column, lang: str) -> Column:
    """Marker-word hit count for one language."""
    return count_in_list(tokens(text), LANG_MARKERS[lang])


def md5_long(c: Column) -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5 parsed as an
    int64. Identical in any engine with md5 + hex parsing (DuckDB:
    ``CAST('0x' || substr(md5(s),1,15) AS BIGINT)``), so hash-derived
    operators (MinHash, SimHash) stay oracle-checkable instead of
    engine-private. Always in [0, 2^60) — shifts/sign are never an issue."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the lower-cased, trimmed
    text. md5 exists identically in Spark and DuckDB, so exact-dedup oracles
    line up byte-for-byte."""
    return F.md5(F.encode(F.lower(F.trim(text)), "UTF-8"))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of word n-gram shingles (space-joined), for Jaccard/MinHash
    near-dup. Built from sequence+transform — stays in codegen."""
    toks = tokens(text)
    # sequence(0, -1) yields a DESCENDING [0, -1] in Spark, not an empty
    # array, and element_at(toks, 0) then errors under ANSI mode — so docs
    # shorter than n must short-circuit to an explicit empty array.
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    shingled = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, shingled).otherwise(
        F.array().cast("array<string>")
    )
