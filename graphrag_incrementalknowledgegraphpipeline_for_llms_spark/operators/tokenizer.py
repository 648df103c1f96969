"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The missing piece of the training-data surface: before a 100-TB corpus
can be token-counted, packed, or mixture-sampled, someone has to TRAIN
the tokenizer on it — and byte-pair-encoding training is a textbook
Spark job if (and only if) it is phrased over the *distinct-word*
table:

1. ``word_counts`` reduces the corpus once to ``(word, cnt)`` — the
   classic wordcount shuffle.  This is the only stage that ever touches
   the corpus; at 10^12 documents it is embarrassingly parallel and the
   output is vocabulary-bound (10^7-10^8 rows regardless of corpus
   size).
2. Every merge round after that runs on the vocab table alone: one hash
   aggregation over adjacent symbol pairs (weighted by word count), a
   ONE-ROW driver collect of the argmax pair (the same bounded-literal
   pattern as the BM25 corpus scalars and the HITS norm), and a narrow
   ``aggregate`` fold that rewrites each word's symbol array in place.
   No round rescans the corpus, no round shuffles anything wider than
   ``(lhs, rhs, cnt)``.

Merge semantics are the published ones: greedy left-to-right
non-overlapping replacement of the highest-frequency adjacent symbol
pair, ties broken lexicographically (count DESC, lhs ASC, rhs ASC) so
the learned merge list is deterministic and engine-independent.  Words
carry the standard ``</w>`` end-of-word marker so merges never cross
word boundaries.

Cross-engine parity: tokenization reuses the portable
``[^a-z0-9]+``-split recipe shared with curation.dsir_weights, counts
are integers, and the fold is replayed in the DuckDB oracle via
``list_reduce`` with an identical greedy rule — the driver key
``txt_bpe_merges`` is hash-exact, not approximate.

The reference has no tokenizer trainer (its pipeline emits triples,
ConceptExtractor.scala:46-57 tokenizes only for mention detection);
this module is part of the beyond-reference training-data surface the
engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["word_counts", "bpe_learn", "bpe_segment"]


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Reduce a corpus to its ``(word, cnt)`` distinct-word table.

    Lowercased ``[a-z0-9]+`` runs (the portable tokenizer shared with
    the DSIR features).  ``min_count`` prunes the long hapax tail —
    at web scale the standard move to keep the vocab table small
    without measurably changing the top merges.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
        lambda t: F.length(t) > 0,
    )
    out = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    if min_count > 1:
        out = out.where(F.col("cnt") >= min_count)
    return out


def _initial_symbols(word_col) -> "F.Column":
    """``'low'`` -> ``['l', 'o', 'w', '</w>']`` — one symbol per
    character plus the end-of-word marker, built with a global
    single-char regex so Spark and DuckDB produce identical strings."""
    spaced = F.regexp_replace(word_col, "(.)", "$1 ")
    return F.split(F.concat(spaced, F.lit("</w>")), " ")


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol-pair frequencies weighted by word count.

    ``(lhs, rhs, freq)`` — the only thing that shuffles in a merge
    round, and it is vocabulary-bound.  ``sequence(1, size-1)`` is safe
    here because every word has >= 2 symbols (char + marker); Spark's
    ``sequence(1, 0) == [1, 0]`` trap (negative-step inference) cannot
    fire, but the ``size >= 2`` guard keeps it impossible by
    construction.
    """
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i.cast("int")).alias("lhs"),
                F.element_at(F.col("syms"), (i + 1).cast("int")).alias("rhs"),
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<lhs:string,rhs:string>>)"))
    return (
        words.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("cnt").cast("long").alias("freq"))
    )


def _merge_fold(tokens_col, lhs: str, rhs: str) -> "F.Column":
    """Greedy left-to-right non-overlapping merge of (lhs, rhs).

    A fold is exactly the published scan: after merging, the new token
    ``lhs+rhs`` becomes the accumulator tail and cannot immediately
    re-merge (so ``a a a`` under merge ``(a, a)`` yields ``aa a``, as
    in the reference implementation).  Narrow expression — no shuffle.
    """
    merged = lhs + rhs
    return F.aggregate(
        tokens_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (x == F.lit(rhs)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges of a corpus.

    Returns one row per merge round:
    ``(round, lhs, rhs, merged, freq)`` — the merge table a downstream
    ``bpe_segment`` (or any external tokenizer) consumes.  The corpus
    is scanned exactly once (``word_counts``); the per-round argmax is
    a 1-row ordered collect (bounded literal).  The vocab table is
    cached across rounds — JVM-row cache, not the pandas-UDF-row
    pathology.
    """
    spark = df.sparkSession
    base = word_counts(df, text_col, min_count=min_count).select(
        _initial_symbols(F.col("word")).alias("syms"), "cnt"
    )
    words = base.cache()
    try:
        out = []
        for r in range(1, n_merges + 1):
            top = (
                _pair_counts(words)
                .orderBy(F.desc("freq"), F.asc("lhs"), F.asc("rhs"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            lhs, rhs, freq = top[0]["lhs"], top[0]["rhs"], top[0]["freq"]
            out.append((r, lhs, rhs, lhs + rhs, int(freq)))
            words = words.select(
                _merge_fold(F.col("syms"), lhs, rhs).alias("syms"), "cnt"
            )
            # each round's fold is narrow; localCheckpoint keeps the
            # lineage from nesting n_merges folds inside one another
            # (vocab-bound table, cheap to pin)
            words = words.localCheckpoint(eager=False)
        return spark.createDataFrame(
            out, "round int, lhs string, rhs string, merged string, freq bigint"
        )
    finally:
        base.unpersist()


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per-word symbol arrays
    rewritten by each merge in order (the published encode loop), then
    re-flattened to one token sequence per document.  Pure narrow
    expressions — tokenizing 100 TB is a map-only job once the merge
    table (kilobytes) ships as literals."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
        lambda t: F.length(t) > 0,
    )

    def encode_word(w):
        syms = _initial_symbols(w)
        for lhs, rhs in merges:
            syms = _merge_fold(syms, lhs, rhs)
        return syms

    return df.withColumn(
        out_col,
        F.flatten(F.transform(toks, encode_word)),
    )


def bpe_encode_stats(
    df: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: "list[tuple[str, str]] | None" = None,
) -> DataFrame:
    """Tokenization-cost profile of a corpus under its own learned BPE:
    learn ``n_merges`` merges (:func:`bpe_learn`), encode, and report
    per document how many BPE tokens it costs and the compression the
    merges bought over raw character symbols — the fertility/cost
    statistic a training-data pipeline budgets context windows and
    preprocessing throughput with (and the drift alarm: a corpus slice
    whose compression suddenly degrades doesn't match the tokenizer's
    training distribution).

    -> (id, n_words, n_init_symbols, n_bpe_tokens, compression =
    bpe/init rounded 6), ordered by id; documents with no tokens are
    omitted (no symbols to encode).

    Scale shape: the encode loop runs over the VOCAB table, not the
    corpus — encoded(word) is position-independent, so each distinct
    word folds through the merge list once (vocab-bound, kilobyte
    merge table as literals) and documents get their costs back via
    ONE equi-join on word; the corpus is scanned once for the vocab
    and once for the join.  The per-doc sums are exact BIGINTs with
    one final division.

    ``merges`` injects a pre-learned (lhs, rhs) list — the same
    injection seam as ``kmeans_assign(cents=...)`` — so a session that
    already trained the identical model (same corpus, same n_merges)
    skips the learn rounds; ``None`` learns in place."""
    if merges is None:
        merges_df = bpe_learn(df, text_col=text_col, n_merges=n_merges)
        merges = [
            (r["lhs"], r["rhs"]) for r in merges_df.orderBy("round").collect()
        ]
    enc = word_counts(df, text_col).select(
        "word", _initial_symbols(F.col("word")).alias("syms")
    )
    for lhs, rhs in merges:
        enc = enc.select(
            "word", _merge_fold(F.col("syms"), lhs, rhs).alias("syms")
        ).localCheckpoint(eager=False)
    enc = enc.select(
        "word",
        F.size("syms").cast("long").alias("_n_tok"),
        (F.length("word") + 1).cast("long").alias("_n_init"),
    )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
        lambda t: F.length(t) > 0,
    )
    words = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("word"))
    return (
        words.join(enc, "word")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_n_init").alias("n_init_symbols"),
            F.sum("_n_tok").alias("n_bpe_tokens"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_words",
            "n_init_symbols",
            "n_bpe_tokens",
            F.round(
                F.col("n_bpe_tokens").cast("double") / F.col("n_init_symbols"), 6
            ).alias("compression"),
        )
        .orderBy(id_col)
    )
