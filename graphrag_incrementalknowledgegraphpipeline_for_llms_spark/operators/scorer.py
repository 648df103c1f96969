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


def parse_verdict(response: str, fallback_evidence: str) -> tuple[str, float, str]:
    """Parse an LLM response into (predicate, confidence, evidence)
    with the reference's two-stage semantics:

    1. JSON path (RelationScorer.scala:92-109): first ``\\{[^}]+\\}``
       blob (else the whole response) as JSON; predicate validated
       against the predicate set else ``related_to``; confidence
       clamped to [0, 1].
    2. Regex fallback on parse failure (RelationScorer.scala:129-152):
       ``predicate[:\\s]+([a-z_]+)`` else ``related_to``;
       ``confidence[:\\s]+([0-9.]+)`` else 0.5;
       ``evidence[:\\s]+"([^"]+)"`` else the candidate evidence
       truncated to 100 UTF-16 code units."""
    import json
    import re

    fallback_ev = purecore.utf16_take(fallback_evidence or "", 100)
    try:
        blob = re.search(r"\{[^}]+\}", response)
        v = json.loads(blob.group(0) if blob else response)
        p = v.get("predicate", "related_to")
        pred = p if p in purecore.PREDICATE_SET else "related_to"
        conf = max(0.0, min(1.0, float(v.get("confidence", 0.5))))
        ev = str(v.get("evidence", fallback_ev))
        return pred, conf, ev
    except Exception:
        m = re.search(r"predicate[:\s]+([a-z_]+)", response)
        pred = m.group(1) if m else "related_to"
        m = re.search(r"confidence[:\s]+([0-9.]+)", response)
        try:
            conf = float(m.group(1)) if m else 0.5
        except ValueError:
            conf = 0.5
        m = re.search(r'evidence[:\s]+"([^"]+)"', response)
        ev = m.group(1) if m else fallback_ev
        return pred, conf, ev


def ollama_generate(
    endpoint: str,
    model: str,
    prompt: str,
    retries: int = 3,
    backoff_s: float = 1.0,
    timeout_s: float = 60.0,
) -> str:
    """POST /api/generate with the reference's retry loop
    (OllamaClient.scala:78-112): <= ``retries`` attempts with a
    linear-increasing ``sleep(backoff_s * attempt)`` between failures;
    the last error propagates."""
    import json
    import time
    import urllib.request

    last: Exception | None = None
    for attempt in range(1, retries + 1):
        try:
            req = urllib.request.Request(
                f"{endpoint}/api/generate",
                data=json.dumps(
                    {"model": model, "prompt": prompt, "stream": False,
                     "options": {"temperature": 0.0}}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=timeout_s) as r:
                return json.loads(r.read())["response"]
        except Exception as e:  # noqa: PERF203 — retry loop
            last = e
            if attempt < retries and backoff_s > 0:
                time.sleep(backoff_s * attempt)
    raise last  # type: ignore[misc]


def build_prompt(a_lemma: str, b_lemma: str, evidence: str) -> str:
    """Prompt template (RelationScorer.scala:34-62 shape)."""
    return (
        "You are a knowledge graph relation extractor. "
        f"Concept A: {a_lemma}\nConcept B: {b_lemma}\n"
        f'Context: "{evidence}"\n'
        'Respond as JSON {"predicate": ..., "confidence": ..., "evidence": ...}'
    )


def make_llm_scorer_udf(
    endpoint: str,
    model: str = "tinyllama:latest",
    retries: int = 3,
    backoff_s: float = 1.0,
    timeout_s: float = 60.0,
):
    """Iterator pandas UDF scoring (a_lemma, b_lemma, evidence) rows
    via an Ollama-protocol endpoint: one HTTP round per row, batched
    per Arrow batch, retry + parse semantics per the reference.  A
    request that exhausts its retries degrades to the deterministic
    fallback verdict (related_to / 0.5 / evidence[:100]) instead of
    dropping the record (the reference drops silently,
    GraphRagJob.scala:353-356 — we keep the row so the pipeline stays
    lossless; the confidence threshold filters it like any other)."""

    @F.pandas_udf(VERDICT_SCHEMA)
    def _score(it: Iterator[tuple[pd.Series, pd.Series, pd.Series]]) -> Iterator[pd.DataFrame]:
        # multi-arg iterator pandas UDF: each element is a TUPLE of
        # Series (one per argument), not a named DataFrame
        for a_ser, b_ser, ev_ser in it:
            preds, confs, evs = [], [], []
            for a_lemma, b_lemma, evidence in zip(a_ser, b_ser, ev_ser):
                try:
                    response = ollama_generate(
                        endpoint,
                        model,
                        build_prompt(a_lemma, b_lemma, evidence),
                        retries=retries,
                        backoff_s=backoff_s,
                        timeout_s=timeout_s,
                    )
                    pred, conf, ev = parse_verdict(response, evidence)
                except Exception:
                    pred, conf, ev = (
                        "related_to",
                        0.5,
                        purecore.utf16_take(evidence, 100),
                    )
                preds.append(pred)
                confs.append(conf)
                evs.append(ev)
            yield pd.DataFrame({"predicate": preds, "confidence": confs, "evidence": evs})

    return _score
