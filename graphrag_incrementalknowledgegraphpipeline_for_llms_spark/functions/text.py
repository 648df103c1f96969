"""Text-analysis functions for large-scale training-data pipelines.

All four ops are pure Catalyst expressions (whole-stage codegen, no
Python), chosen so each has an exact ANSI-SQL twin for the DuckDB
oracle: token counting, n-gram-heuristic language ID, quality scoring,
and document fingerprinting.
"""

from __future__ import annotations

import math

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


# -- PII scrubbing ------------------------------------------------------------
# Patterns restricted to syntax that means the same thing in Java
# regex (Spark) and RE2 (DuckDB): char classes, bounded repetition,
# \b word boundaries.  Replacement order is fixed (email -> phone ->
# ipv4); replacement tokens contain no digits so a later pattern can
# never match inside an earlier redaction.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+[0-9][0-9 ()-]{6,14}[0-9]", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
]


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-document PII hit counts by type (pre-redaction audit)."""
    return {
        f"n_{name}": F.regexp_count(col, F.lit(pat))
        for name, pat, _ in PII_PATTERNS
    }


def scrub_pii(col: Column) -> Column:
    """Redact emails, international phone numbers, and IPv4 addresses
    with typed placeholder tokens — the standard pre-training privacy
    pass, as a pure Catalyst regexp_replace chain (whole-stage
    codegen; no Python in the hot path)."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# -- repetition filters (Gopher, Rae et al. 2021 §A1.1) -----------------------

def dup_line_frac(col: Column) -> Column:
    """Fraction of non-blank lines that are duplicates of an earlier
    line — the cheap per-row repetition signal (pure HOF expression,
    no shuffle)."""
    lines = F.filter(
        F.split(col, r"\n"), lambda x: F.length(F.trim(x)) > 0
    )
    n = F.size(lines)
    return F.when(
        n > 0, (n - F.size(F.array_distinct(lines))) / n
    ).otherwise(F.lit(0.0))


def repetition_report(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-document repetition features for Gopher-style quality
    gating: (id, n_lines, dup_line_frac, top_bigram, bigram_count,
    bigram_char_frac).

    * ``dup_line_frac`` — duplicate non-blank lines / lines (per-row
      HOF, computed before any shuffle).
    * ``top_bigram`` / ``bigram_count`` — the most frequent
      whitespace-token 2-gram (count desc, lexicographic tie-break).
    * ``bigram_char_frac`` — ``bigram_count * len(top_bigram) /
      n_chars``: the character mass the dominant 2-gram would cover —
      the "top n-gram character fraction" repetition gate.

    Scale shape: the only shuffle keys are (id, bigram) counts and a
    per-id top-1; document text itself never shuffles (tokens explode
    from the scanned row, aggregate map-side first)."""
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.size(
            F.filter(
                F.split(F.col(text_col), r"\n"),
                lambda x: F.length(F.trim(x)) > 0,
            )
        ).alias("n_lines"),
        F.round(dup_line_frac(F.col(text_col)), 6).alias("dup_line_frac"),
        toks.alias("toks"),
    )
    # consecutive-position self-join builds the 2-grams from narrow
    # (id, pos, tok) rows — the exploded rows never carry the array
    grams = base.select("id", F.posexplode("toks").alias("pos", "tok"))
    nxt = grams.select(
        "id", (F.col("pos") - 1).alias("pos"), F.col("tok").alias("tok2")
    )
    pair_counts = (
        grams.join(nxt, ["id", "pos"])
        .select("id", F.concat_ws(" ", "tok", "tok2").alias("bigram"))
        .groupBy("id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("cnt"), "bigram")
    top = (
        pair_counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", F.col("bigram").alias("top_bigram"), F.col("cnt").alias("bigram_count"))
    )
    return (
        base.drop("toks")
        .join(top, "id", "left")
        .select(
            "id",
            "n_lines",
            "dup_line_frac",
            F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
            F.coalesce("bigram_count", F.lit(0)).cast("long").alias("bigram_count"),
            F.round(
                F.when(
                    (F.col("n_chars") > 0) & F.col("bigram_count").isNotNull(),
                    F.col("bigram_count") * F.length("top_bigram") / F.col("n_chars"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("bigram_char_frac"),
        )
        .orderBy("id")
    )


def char_entropy_report(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-document Shannon entropy of the character distribution in
    bits — the cheap gibberish/boilerplate detector that complements
    the repetition filters (natural prose sits ~4-4.5 bits/char;
    base64 blobs and key-mash near log2(alphabet); repeated padding
    near 0).  Output: (id, n_chars, char_entropy), empty documents
    omitted.

    Scale shape: chars explode from the scanned row into narrow
    (id, char) pairs that partial-aggregate map-side to at most
    |alphabet| rows per document before the shuffle — the exchange
    carries counts, never text."""
    chars = F.filter(
        F.split(F.col(text_col), ""), lambda c: F.length(c) > 0
    )
    counts = (
        df.select(F.col(id_col).alias("id"), F.explode(chars).alias("ch"))
        .groupBy("id", "ch")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = counts.groupBy("id").agg(F.sum("cnt").alias("n"))
    p = F.col("cnt") / F.col("n")
    return (
        counts.join(tot, "id")
        .groupBy("id", "n")
        .agg(
            F.round(-F.sum(p * F.log(p) / F.lit(math.log(2.0))), 6).alias(
                "char_entropy"
            )
        )
        .select("id", F.col("n").cast("long").alias("n_chars"), "char_entropy")
        .orderBy("id")
    )


def readability_features(col: Column) -> dict[str, Column]:
    """Flesch reading ease + Flesch-Kincaid grade from three regex
    counts (words = \\S+ runs, sentences = [.!?]+ runs floored at 1,
    syllables = [aeiouy]+ vowel groups — the standard regex proxy;
    vowel-less tokens contribute 0, a documented deviation from the
    per-word-min-1 variant, chosen because it keeps the whole op a
    pure per-row Catalyst expression with an exact ANSI-SQL twin).

    Returns column dict: n_words, n_sentences, n_syllables, flesch,
    fk_grade.  All three counts are single-pass regexp_count calls —
    whole-stage codegen, zero shuffle, scan-stage evaluable at any
    corpus size; the scores are per-row IEEE double expressions, so
    Spark and DuckDB produce bit-identical values and round(x, 6)
    agrees cross-engine.
    """
    n_words = F.regexp_count(col, F.lit(r"\S+")).cast("long")
    n_sent = F.greatest(
        F.regexp_count(col, F.lit(r"[.!?]+")).cast("long"), F.lit(1).cast("long")
    )
    n_syll = F.regexp_count(F.lower(col), F.lit(r"[aeiouy]+")).cast("long")
    wps = n_words.cast("double") / n_sent.cast("double")
    spw = n_syll.cast("double") / n_words.cast("double")
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    fk = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    return {
        "n_words": n_words,
        "n_sentences": n_sent,
        "n_syllables": n_syll,
        "flesch": flesch,
        "fk_grade": fk,
    }


# Unicode script blocks for script_counts — each class counted as
# len(text) - len(regexp_replace(text, '[block]+', '')), a formulation
# both Java regex (Spark) and RE2 (DuckDB) evaluate identically on
# literal codepoint ranges (no \p{Script=...} — RE2 spells those
# differently, literal ranges are the dialect intersection).
SCRIPT_BLOCKS: dict[str, str] = {
    # Basic Latin letters + Latin-1/Extended-A/B letters
    "latin": "A-Za-zÀ-ɏ",
    "cyrillic": "Ѐ-ӿ",
    "arabic": "؀-ۿ",
    # CJK unified ideographs + hiragana/katakana
    "cjk": "一-鿿぀-ヿ",
    "hangul": "가-힯",
    "digit": "0-9",
}

_SCRIPT_ORDER = ("latin", "cyrillic", "arabic", "cjk", "hangul")


def script_counts(col: Column) -> dict[str, Column]:
    """Per-class character counts for each Unicode script block in
    :data:`SCRIPT_BLOCKS`, plus ``n_chars`` (total length) and
    ``n_letters`` (sum over letter scripts).  Counting by strip-and-
    subtract keeps the expression in the Java∩RE2 regex dialect — the
    same portability constraint pii_counts documents.

    All outputs are exact BIGINTs computed map-side per row; nothing
    shuffles and the text column never leaves the scan stage."""
    out: dict[str, Column] = {"n_chars": F.length(col).cast("long")}
    for name, block in SCRIPT_BLOCKS.items():
        stripped = F.regexp_replace(col, f"[{block}]+", "")
        out[f"n_{name}"] = (F.length(col) - F.length(stripped)).cast("long")
    letters = None
    for name in _SCRIPT_ORDER:
        c = out[f"n_{name}"]
        letters = c if letters is None else letters + c
    out["n_letters"] = letters
    return out


def script_profile(col: Column, mixed_threshold: float = 0.05) -> dict[str, Column]:
    """Script-composition features for mixed-script spam / homoglyph
    detection (the curation axis lang_id's marker-word heuristic is
    blind to): per-script ratios over the letter mass, the dominant
    script (first-in-fixed-order tie-break, so the verdict is
    deterministic), and ``mixed_script`` — true when more than
    ``mixed_threshold`` of the letters fall OUTSIDE the dominant
    script (a Latin page with a Cyrillic 'а' sprinkled in is exactly
    the phishing/SEO-cloak shape).

    Ratios are single IEEE divisions rounded at the consumer; the
    dominant/mixed verdicts compare exact integers, so the flags are
    engine-exact, not epsilon-sensitive."""
    c = script_counts(col)
    letters = c["n_letters"]
    top = F.greatest(*[c[f"n_{n}"] for n in _SCRIPT_ORDER])
    dominant = F.lit("none")
    for name in reversed(_SCRIPT_ORDER):
        dominant = F.when(
            (letters > 0) & (c[f"n_{name}"] == top), F.lit(name)
        ).otherwise(dominant)
    # integer-exact mixed test: (letters - top) > threshold * letters
    # evaluated as 100*(letters-top) > int(100*threshold)*letters so no
    # float enters the comparison (threshold quantized to percents)
    pct = int(round(mixed_threshold * 100))
    mixed = (letters > 0) & (
        (letters - top) * 100 > F.lit(pct) * letters
    )
    out = dict(c)
    out["dominant_script"] = dominant
    out["mixed_script"] = mixed
    return out


def code_features(col: Column) -> dict[str, Column]:
    """Code-vs-prose detection features — the curation axis that
    separates source code from natural text in a web corpus BEFORE
    language-ID or quality scoring is trusted (both misbehave on
    code).  Pure scan-stage counts in the Java∩RE2 regex dialect:

    * ``n_braces``      — {}()[] occurrences
    * ``n_semicolons``  — ';' occurrences
    * ``n_operators``   — ==  =>  ->  ::  :=  != occurrences
    * ``n_camel``       — lower→Upper transitions (identifier style)
    * ``symbol_per_kchar`` — (braces+semicolons+operators)·1000/chars
    * ``is_codey``      — decided in pure INTEGER arithmetic
      (1000·symbols > 15·chars, i.e. >1.5% symbol density), the
      script_profile no-float-in-any-branch contract.
    """
    n = F.length(col)
    braces = F.length(col) - F.length(F.regexp_replace(col, r"[{}()\[\]]", ""))
    semis = F.length(col) - F.length(F.regexp_replace(col, ";", ""))
    ops2 = (
        F.length(col) - F.length(F.regexp_replace(col, r"==|=>|->|::|:=|!=", ""))
    ) / 2
    camel = F.size(F.split(col, r"[a-z][A-Z]")) - 1
    symbols = braces + semis + ops2.cast("long")
    return {
        "n_chars": n.cast("long"),
        "n_braces": braces.cast("long"),
        "n_semicolons": semis.cast("long"),
        "n_operators": ops2.cast("long"),
        "n_camel": camel.cast("long"),
        "symbol_per_kchar": F.round(
            symbols * F.lit(1000.0) / F.greatest(n, F.lit(1)), 6
        ),
        "is_codey": (
            symbols * 1000 > F.lit(15) * n
        ).cast("long"),
    }
