"""OpenIE-style (subj, pred, obj) triple extraction — pattern-frame
open information extraction over raw page text.

The reference derives triples from concept co-occurrence + rule
scoring (RelationScorer.scala:129-152); this module adds the
complementary *pattern* path named in the project north star
("OpenIE-style (subj, pred, obj) triple extraction"): lexico-syntactic
frames in the style of Hearst patterns / ReVerb's V | V-P frames,
restricted to the reference's edge vocabulary (IS_A, PART_OF, CAUSES,
SYNONYM_OF — GraphUpserter edge types, RelationScorer.scala:129-152)
so both extraction paths feed the same graph schema.

Spark-first design
------------------
Everything is Catalyst expressions (``regexp_extract_all`` +
``arrays_zip`` + one generator), zero Python in the hot path: at
10^12 documents the extraction is a single narrow map stage inside
the parquet scan, and the only shuffle is the final triple
aggregation on (predicate, subj, obj).  Each frame pattern is
evaluated exactly twice per row (group 1 = subject, group 2 = object
— the two calls share the regex so their match lists align
positionally), then zipped; all frames concatenate into ONE array
exploded by ONE generator, so a row never re-evaluates a frame.

Cross-engine determinism: the patterns use only Java∩RE2 syntax
(no lookaround, no backreferences).  RE2 implements the same
leftmost-first match semantics as Java's backtracking engine for
this syntax subset, and ``regexp_extract_all`` scans
non-overlapping matches left to right in both engines, so the DuckDB
oracle reproduces match sets exactly — including greedy-NP edge
cases like ``"x is a y is a z"`` (object = ``"y is a"``), pinned by
tests/test_openie.py parity fixtures.

Entity linking (``link_heads``) resolves each argument against the
concept vocabulary with a two-step backoff — full-phrase lemma
first, then syntactic-head (last token) lemma — the standard OpenIE
canonicalization backoff.  The vocabulary probe is gated by the
same broadcast Bloom filter used for alias linking
(operators/canonicalize.bloom_keys_filter): at corpus scale the
argument relation is pruned to (vocab hits + FP rate) before the
distinct + join, and the exact join discards false positives, so
the gated plan is provably identical to the ungated one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Noun phrase: 1-3 lowercase word tokens.  Greedy — the leftmost-first
# semantics are identical in Java and RE2 (module docstring).
_NP = r"(?:[a-z]+ ){0,2}[a-z]+"
_DET = r"(?:the |a |an )?"

# (predicate, pattern) frames; group 1 = subject NP, group 2 = object NP.
# Relation inventory == the reference's edge types minus MENTIONS
# (which is not an SVO relation).
FRAMES: list[tuple[str, str]] = [
    ("IS_A", rf"{_DET}({_NP}) (?:is|are) (?:a|an) ({_NP})"),
    ("PART_OF", rf"{_DET}({_NP}) (?:is|are) part of {_DET}({_NP})"),
    (
        "CAUSES",
        rf"{_DET}({_NP}) (?:causes|cause|leads to|lead to) {_DET}({_NP})",
    ),
    (
        "SYNONYM_OF",
        rf"{_DET}({_NP}) (?:is|are) (?:also )?known as {_DET}({_NP})",
    ),
]


# Case-preserving variants: same frames, case-insensitive verbs and
# determiners, NPs keep their original casing so camelCase / NER
# surfaces survive into lemma normalization (queryPlan -> query_plan).
FRAMES_CI: list[tuple[str, str]] = [
    (p, "(?i)" + pat.replace("[a-z]", "[A-Za-z]")) for p, pat in FRAMES
]


def lemma_expr(col: Column) -> Column:
    """The reference's lemma normalization as a pure Catalyst
    expression (ConceptExtractor.scala:128-138 == purecore.
    normalize_lemma, parity pytest-pinned): camel-split, lower,
    non-lemma chars -> '_', collapse runs, strip edges.  For all-
    lowercase single-space phrases this reduces exactly to
    space->underscore (the oracle SQL's replace())."""
    x = F.regexp_replace(col, r"([a-z])([A-Z])", r"$1_$2")
    x = F.regexp_replace(F.lower(x), r"[^a-z0-9_]", "_")
    x = F.regexp_replace(x, r"_+", "_")
    return F.regexp_replace(x, r"^_+|_+$", "")


def _frame_structs(low: Column, predicate: str, pattern: str) -> Column:
    zipped = F.arrays_zip(
        F.regexp_extract_all(low, F.lit(pattern), 1).alias("s"),
        F.regexp_extract_all(low, F.lit(pattern), 2).alias("o"),
    )
    return F.transform(
        zipped,
        lambda x: F.struct(
            F.lit(predicate).alias("predicate"),
            x["s"].alias("subj"),
            x["o"].alias("obj"),
        ),
    )


def svo_extract(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    preserve_case: bool = False,
) -> DataFrame:
    """One row per extracted (subj, predicate, obj) match.

    Pure map stage: lowercases the text once (or, with
    ``preserve_case``, matches case-insensitively and keeps argument
    casing for downstream lemma normalization), evaluates every
    frame, and explodes the concatenated match array.  Output
    columns: (id, predicate, subj, obj).
    """
    if preserve_case:
        low, frames = F.col(text_col), FRAMES_CI
    else:
        low, frames = F.lower(F.col(text_col)), FRAMES
    all_matches = F.concat(*[_frame_structs(low, p, pat) for p, pat in frames])
    return df.select(
        F.col(id_col).alias("id"), F.explode(all_matches).alias("t")
    ).select("id", "t.predicate", "t.subj", "t.obj")


def svo_aggregate(svo: DataFrame) -> DataFrame:
    """Corpus-level triple table: (predicate, subj, obj, n_docs,
    n_matches).  The only shuffle of the whole extraction — partial
    (map-side) aggregation applies since both aggs are algebraic."""
    return svo.groupBy("predicate", "subj", "obj").agg(
        F.countDistinct("id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_matches"),
    )


def _lemma(col: Column) -> Column:
    # Full reference normalization; for the lowercase [a-z ]+ arguments
    # of the default frames this is EXACTLY space->underscore (what the
    # DuckDB oracles compute); for preserve_case arguments it
    # additionally camel-splits and lowers (queryPlan -> query_plan).
    return lemma_expr(col)


def _head(col: Column) -> Column:
    # Syntactic head of a 1-3 token NP = its last token, normalized.
    return lemma_expr(F.element_at(F.split(col, " "), -1))


def link_heads(svo: DataFrame, vocab: DataFrame) -> DataFrame:
    """Backoff entity linking of both SVO arguments against a concept
    vocabulary (lemma, concept_id): full-phrase lemma first, head-token
    lemma second; a triple survives only when BOTH ends resolve.

    Scale shape: ``vocab`` is a dimension (the distinct concept
    vocabulary); it is broadcast, and the argument stream is pruned by
    a Bloom filter built from it BEFORE the joins (no shuffle of the
    match relation at all).  concept_id == sha256(lemma)[:16] by
    construction (ConceptExtractor.scala:144-148), so an id never
    disagrees between the two backoff levels.
    """
    from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators.canonicalize import (
        bloom_keys_filter,
    )

    voc = vocab.select("lemma", "concept_id").distinct()
    args = svo.select(
        "id",
        "predicate",
        "subj",
        "obj",
        _lemma(F.col("subj")).alias("subj_full"),
        _head(F.col("subj")).alias("subj_head"),
        _lemma(F.col("obj")).alias("obj_full"),
        _head(F.col("obj")).alias("obj_head"),
    )
    gate = bloom_keys_filter(voc, "lemma")
    if gate is not None:
        # Either backoff key of either end may hit; rows where NO key
        # can resolve are dropped before any join work.
        args = args.where(
            (gate(F.col("subj_full")) | gate(F.col("subj_head")))
            & (gate(F.col("obj_full")) | gate(F.col("obj_head")))
        )
    bvoc = F.broadcast(voc)

    def _resolve(df: DataFrame, full: str, head: str, out: str) -> DataFrame:
        f = bvoc.withColumnRenamed("lemma", f"{out}_f").withColumnRenamed(
            "concept_id", f"{out}_fid"
        )
        h = bvoc.withColumnRenamed("lemma", f"{out}_h").withColumnRenamed(
            "concept_id", f"{out}_hid"
        )
        return (
            df.join(f, F.col(full) == F.col(f"{out}_f"), "left")
            .join(h, F.col(head) == F.col(f"{out}_h"), "left")
            .withColumn(out + "_id", F.coalesce(f"{out}_fid", f"{out}_hid"))
            .withColumn(out + "_lemma", F.coalesce(f"{out}_f", f"{out}_h"))
            .drop(f"{out}_f", f"{out}_fid", f"{out}_h", f"{out}_hid")
        )

    linked = _resolve(args, "subj_full", "subj_head", "subj")
    linked = _resolve(linked, "obj_full", "obj_head", "obj")
    return linked.where(
        F.col("subj_id").isNotNull() & F.col("obj_id").isNotNull()
    ).select(
        "id", "predicate", "subj_id", "subj_lemma", "obj_id", "obj_lemma"
    )


def linked_triples(svo: DataFrame, vocab: DataFrame) -> DataFrame:
    """Canonical linked-triple table: (predicate, subj_id, subj_lemma,
    obj_id, obj_lemma, n_docs, n_matches)."""
    return link_heads(svo, vocab).groupBy(
        "predicate", "subj_id", "subj_lemma", "obj_id", "obj_lemma"
    ).agg(
        F.countDistinct("id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_matches"),
    )
