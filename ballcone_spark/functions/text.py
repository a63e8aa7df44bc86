"""Text-analysis column expressions — all JVM-side ``pyspark.sql.functions``
compositions (no Python UDFs in the hot path; these run inside whole-stage
codegen).

Beyond-reference operators for LLM training-data pipelines (BASELINE.json
north star): tokenization, quality stats, fingerprinting, language-ID,
32-bit hashing for SimHash/MinHash. Every expression here has an exact
DuckDB-SQL equivalent so the driver's oracle can check it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "distinct_tokens",
    "token_count",
    "uniq_token_ratio",
    "avg_token_len",
    "fingerprint",
    "hash32",
    "shingles",
    "LANG_LEXICONS",
]

#: Tiny per-language stopword lexicons for the n-gram language-ID
#: heuristic. Deterministic, shared verbatim with the DuckDB oracle.
LANG_LEXICONS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization: ``split(trim(text), '\\s+')``."""
    return F.split(F.trim(text), r"\s+")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def uniq_token_ratio(text: Column) -> Column:
    """Distinct/total token ratio — a repetition-quality signal."""
    return F.size(distinct_tokens(text)) / F.size(tokens(text))


def avg_token_len(text: Column) -> Column:
    """Mean token length = non-whitespace chars / token count."""
    return F.length(F.regexp_replace(F.trim(text), r"\s+", "")) / token_count(text)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lower-cased text. md5 (not xxhash64) because
    both Spark and DuckDB implement it identically — the fingerprint is
    portable across engines."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def hash32(token: Column) -> Column:
    """Portable 32-bit token hash: first 8 hex digits of md5, as a long.
    Spark: conv(substr(md5(t),1,8),16,10); DuckDB: ('0x'||substr(md5(t),1,8))::BIGINT.
    Used as the base hash for SimHash bits and MinHash permutations."""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings (space-joined), distinct.

    Built with ``transform`` over token indexes — stays in codegen, no
    explode until the caller chooses to."""
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(k > 0, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
