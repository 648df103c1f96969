"""Text-analysis functions for large-scale training-data pipelines.

All four ops are pure Catalyst expressions (whole-stage codegen, no
Python), chosen so each has an exact ANSI-SQL twin for the DuckDB
oracle: token counting, n-gram-heuristic language ID, quality scoring,
and document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker-word sets for the n-gram heuristic.  Counts of
# these as standalone words decide the language; ties -> 'und' (unknown).
EN_MARKERS = ["the", "and", "of", "is", "with"]
DE_MARKERS = ["der", "die", "das", "und", "mit"]


def token_count(col: Column) -> Column:
    """Whitespace tokens = count of maximal \\S+ runs."""
    return F.regexp_count(col, F.lit(r"\S+")).alias("token_count")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish sub-word count: runs of letters, runs of digits, or a
    single non-space symbol each count as one token (the common
    GPT-2-style pre-tokenizer shape, regex-only)."""
    return F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def _marker_hits(col: Column, words: list[str]) -> Column:
    expr = None
    for w in words:
        c = F.regexp_count(F.lower(col), F.lit(rf"\b{w}\b"))
        expr = c if expr is None else expr + c
    return expr


def lang_id(col: Column) -> Column:
    """N-gram-heuristic language id: en vs de marker-word counts."""
    en = _marker_hits(col, EN_MARKERS)
    de = _marker_hits(col, DE_MARKERS)
    return (
        F.when(en > de, F.lit("en"))
        .when(de > en, F.lit("de"))
        .otherwise(F.lit("und"))
    )


def quality_features(col: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features + a composite
    score in [0,1].  Ratios are guarded against empty text."""
    n_chars = F.length(col)
    n_tokens = F.regexp_count(col, F.lit(r"\S+"))
    n_punct = F.regexp_count(col, F.lit(r"[.,!?;:]"))
    n_stop = _marker_hits(col, EN_MARKERS)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.when(n_tokens >= 5, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((punct_ratio > 0.001) & (punct_ratio < 0.2), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.02, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "mean_tok_len": mean_tok_len,
        "quality_score": score,
    }


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized,
    lowercased text — the exact-dedup key."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))
