"""Relation scoring (R6/R7/P11 of SURVEY.md §2.4).

Default path: the deterministic scorer — the reference's regex-fallback
verdict semantics (RelationScorer.scala:129-152) extended with
evidence-pattern rules (see functions.purecore.score_candidate), here
as a pure Catalyst CASE expression: whole-stage codegen, zero Python,
zero shuffle.  The LLM path stays pluggable exactly like the
reference's Ollama gate (GraphRagJob.scala:55-60,90-99: scoring stage
skipped entirely when the endpoint is unavailable); it is an
HTTP-batched iterator pandas UDF, OFF by default and excluded from the
correctness gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import purecore


def _verdict(a_lemma: Column, b_lemma: Column, ev: Column) -> tuple[Column, Column]:
    """Rule order mirrors purecore.score_candidate verbatim."""
    low = F.lower(ev)
    predicate = (
        F.when(a_lemma == b_lemma, F.lit("synonym_of"))
        .when(low.contains(" is a ") | low.contains(" is an "), F.lit("is_a"))
        .when(low.contains(" part of "), F.lit("part_of"))
        .when(low.contains(" causes ") | low.contains(" caused by "), F.lit("causes"))
        .otherwise(F.lit("related_to"))
    )
    confidence = (
        F.when(a_lemma == b_lemma, F.lit(0.9))
        .when(low.contains(" is a ") | low.contains(" is an "), F.lit(0.9))
        .when(low.contains(" part of "), F.lit(0.85))
        .when(low.contains(" causes ") | low.contains(" caused by "), F.lit(0.8))
        .otherwise(F.lit(0.5))
    )
    return predicate, confidence


def score_candidates(
    candidates: DataFrame,
    min_confidence: float = purecore.MIN_CONFIDENCE,
    evidence100_col: str = "evidence100",
) -> DataFrame:
    """Candidates (a, b, window_id, evidence [, evidence100]) ->
    scored relations above the confidence threshold (P11,
    application.conf:56).  Output evidence is the fallback-path
    100-unit truncation (RelationScorer.scala:142), precomputed
    per-chunk upstream so this stage stays JVM-only."""
    if evidence100_col in candidates.columns:
        ev100 = F.col(evidence100_col)
    else:
        # fallback must count UTF-16 code units like JVM String.take
        # (RelationScorer.scala:142) — F.substring counts code points
        # and diverges on astral-plane chars, so reuse the pinned UDF
        from ..functions import concepts as _cf

        ev100 = _cf.utf16_take_udf(purecore.FALLBACK_EVIDENCE_LIMIT)(F.col("evidence"))
    predicate, confidence = _verdict(F.col("a.lemma"), F.col("b.lemma"), F.col("evidence"))
    return (
        candidates.select(
            "a",
            "b",
            F.col("window_id").alias("chunk_id"),
            predicate.alias("predicate"),
            confidence.alias("confidence"),
            ev100.alias("evidence"),
        )
        .where(F.col("confidence") >= F.lit(min_confidence))
    )


def triples_from(scored: DataFrame) -> DataFrame:
    """Flatten to the ``triples`` table (subj_id, predicate, obj_id,
    confidence, evidence, chunk_id)."""
    return scored.select(
        F.col("a.concept_id").alias("subj_id"),
        "predicate",
        F.col("b.concept_id").alias("obj_id"),
        "confidence",
        "evidence",
        "chunk_id",
    )


# ---------------------------------------------------------------------------
# Optional LLM scorer (pluggable, OFF by default — like the reference's
# Ollama gate).  Batches one Arrow batch per HTTP round; response parse
# falls back to the deterministic verdict, mirroring
# RelationScorer.parseVerdict -> extractVerdictRegex.
# ---------------------------------------------------------------------------

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("predicate", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("evidence", T.StringType()),
    ]
)


def llm_available(endpoint: str | None) -> bool:
    """R7 availability probe (OllamaClient.scala:130-141) — GET
    /api/tags with a short timeout; any failure gates the stage off."""
    if not endpoint:
        return False
    try:
        import urllib.request

        with urllib.request.urlopen(f"{endpoint}/api/tags", timeout=5) as r:
            return r.status == 200
    except Exception:
        return False


def make_llm_scorer_udf(endpoint: str, model: str = "tinyllama:latest"):
    import json
    import re as _re
    import urllib.request

    @F.pandas_udf(VERDICT_SCHEMA)
    def _score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            preds, confs, evs = [], [], []
            for a_lemma, b_lemma, evidence in zip(
                pdf["a_lemma"], pdf["b_lemma"], pdf["evidence"]
            ):
                pred, conf, ev = "related_to", 0.5, purecore.utf16_take(evidence, 100)
                try:
                    prompt = (
                        "You are a knowledge graph relation extractor. "
                        f"Concept A: {a_lemma}\nConcept B: {b_lemma}\n"
                        f'Context: "{evidence}"\n'
                        "Respond as JSON {\"predicate\": ..., \"confidence\": ..., \"evidence\": ...}"
                    )
                    req = urllib.request.Request(
                        f"{endpoint}/api/generate",
                        data=json.dumps(
                            {"model": model, "prompt": prompt, "stream": False,
                             "options": {"temperature": 0.0}}
                        ).encode(),
                        headers={"Content-Type": "application/json"},
                    )
                    with urllib.request.urlopen(req, timeout=60) as r:
                        response = json.loads(r.read())["response"]
                    blob = _re.search(r"\{[^}]+\}", response)
                    v = json.loads(blob.group(0) if blob else response)
                    p = v.get("predicate", "related_to")
                    pred = p if p in purecore.PREDICATE_SET else "related_to"
                    conf = max(0.0, min(1.0, float(v.get("confidence", 0.5))))
                    ev = str(v.get("evidence", ev))
                except Exception:
                    pass  # deterministic fallback already set
                preds.append(pred)
                confs.append(conf)
                evs.append(ev)
            yield pd.DataFrame({"predicate": preds, "confidence": confs, "evidence": evs})

    return _score
