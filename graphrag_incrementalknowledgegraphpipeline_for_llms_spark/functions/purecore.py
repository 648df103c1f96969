"""Pure-Python reference semantics for the text/KG stages.

This module pins the EXACT per-record behavior of the reference engine
(`/root/reference`, surveyed in SURVEY.md §2.3/2.4) with zero Spark
imports.  It is the single source of truth consumed by

* the vectorized pandas UDFs in :mod:`..functions.concepts` and
  :mod:`..functions.html` (batch loops call these functions), and
* the golden-fixture generators in ``tests/`` (the P/R harness compares
  the distributed pipeline's triples against this implementation).

Reference citations (file:line under /root/reference):

* concept extraction regexes + stopwords:
  src/main/scala/graphrag/ingestion/ConceptExtractor.scala:46-57
* heuristic extraction order + filters: ConceptExtractor.scala:66-101
* lemma normalization: ConceptExtractor.scala:128-138
* concept-id = hex(sha256(lemma))[:16]: ConceptExtractor.scala:144-148
* co-occurrence pair generation: relation/CoOccurExtractor.scala:28-57
* PMI: CoOccurExtractor.scala:69-89
* deterministic scorer = the reference's regex-fallback verdict path
  (predicate default ``related_to``, confidence default 0.5, evidence
  truncated to 100 UTF-16 units): llm/RelationScorer.scala:129-152,
  threshold 0.65: application.conf:56
* evidence truncation to 500 UTF-16 units: GraphRagJob.scala:318
* relation-name sanitization: storage/Neo4jSink.scala:197
"""

from __future__ import annotations

import hashlib
import html as _htmlmod
import re
from typing import NamedTuple

# ---------------------------------------------------------------------------
# T1 — heuristic concept extraction
# ---------------------------------------------------------------------------

# Java and Python `re` agree on these patterns (no lookbehind/possessive);
# re.ASCII pins \b, \s, and character classes to the reference's
# ASCII-latin behavior on the fixture corpus.
CAPITALIZED_WORD = re.compile(r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*\b", re.ASCII)
CAMEL_CASE = re.compile(r"\b[A-Z][a-z]+(?:[A-Z][a-z]+)+\b", re.ASCII)
ACRONYM = re.compile(r"\b[A-Z]{2,}\b", re.ASCII)
TECHNICAL_TERM = re.compile(r"\b[a-z]+(?:[A-Z][a-z]+)+\b", re.ASCII)

STOP_WORDS = frozenset(
    {
        "The", "This", "That", "These", "Those", "They", "There", "Then",
        "When", "Where", "What", "Which", "Who", "Why", "How",
        "Figure", "Table", "Section", "Chapter", "Page",
        "For", "From", "With", "Without", "About",
    }
)

PREDICATE_SET = frozenset({"is_a", "part_of", "causes", "synonym_of", "related_to"})
MIN_CONFIDENCE = 0.65  # application.conf:56
MIN_PMI = 0.2  # application.conf:50
EVIDENCE_LIMIT = 500  # GraphRagJob.scala:318
FALLBACK_EVIDENCE_LIMIT = 100  # RelationScorer.scala:142

_CAMEL_SPLIT = re.compile(r"([a-z])([A-Z])")
_NON_LEMMA = re.compile(r"[^a-z0-9_]")
_UNDERSCORES = re.compile(r"_+")


class Concept(NamedTuple):
    concept_id: str
    lemma: str
    surface: str
    origin: str


def normalize_lemma(surface: str) -> str:
    """ConceptExtractor.scala:128-138 — camel-split, lower, clean."""
    words = _CAMEL_SPLIT.sub(r"\1_\2", surface)
    out = _UNDERSCORES.sub("_", _NON_LEMMA.sub("_", words.lower()))
    # stripPrefix/stripSuffix remove one '_' each; after the _+ collapse
    # there is at most one on each side, so strip() is equivalent.
    return out.strip("_")


def concept_id(lemma: str) -> str:
    """ConceptExtractor.scala:144-148 — hex(sha256(lemma utf-8))[:16]."""
    return hashlib.sha256(lemma.encode("utf-8")).hexdigest()[:16]


import functools


@functools.lru_cache(maxsize=1 << 16)
def _make_concept(surface: str, origin: str) -> Concept:
    # memoized: surface distributions are Zipfian, so the normalize +
    # sha256 work is dominated by a small hot set
    lemma = normalize_lemma(surface)
    return Concept(concept_id(lemma), lemma, surface, origin)


def extract_concepts(text: str) -> list[Concept]:
    """T1 heuristic extraction (ConceptExtractor.scala:66-101).

    Four regex strategies in order; first-seen dedup over the FULL
    concept identity (id, lemma, surface, origin) — LinkedHashSet
    semantics.  Surface length gates count UTF-16 code units exactly
    like ``String.length``; :func:`utf16_len` reproduces that.
    """
    seen: dict[Concept, None] = {}
    for surface in CAPITALIZED_WORD.findall(text):
        if surface not in STOP_WORDS and utf16_len(surface) > 2:
            seen.setdefault(_make_concept(surface, "NER"))
    for surface in CAMEL_CASE.findall(text):
        seen.setdefault(_make_concept(surface, "camelCase"))
    for surface in ACRONYM.findall(text):
        if 2 <= utf16_len(surface) <= 6:
            seen.setdefault(_make_concept(surface, "acronym"))
    for surface in TECHNICAL_TERM.findall(text):
        seen.setdefault(_make_concept(surface, "technicalTerm"))
    return list(seen)


# ---------------------------------------------------------------------------
# UTF-16 helpers (JVM String semantics)
# ---------------------------------------------------------------------------

def utf16_len(s: str) -> int:
    """JVM ``String.length`` — UTF-16 code units."""
    return len(s.encode("utf-16-le")) // 2


def utf16_take(s: str, n: int) -> str:
    """JVM ``String.take(n)`` — first n UTF-16 code units.

    Deviation (documented): when the boundary would split a surrogate
    pair the JVM keeps a lone high surrogate; lone surrogates are not
    representable in Arrow/UTF-8, so we round DOWN to the pair
    boundary.  Fixtures pin this choice (tests/test_purecore.py).
    """
    b = s.encode("utf-16-le")
    if len(b) <= 2 * n:
        return s
    cut = b[: 2 * n]
    last = int.from_bytes(cut[-2:], "little")
    if 0xD800 <= last <= 0xDBFF:  # high surrogate — don't split the pair
        cut = cut[:-2]
    return cut.decode("utf-16-le")


# ---------------------------------------------------------------------------
# R1 — co-occurrence pairs
# ---------------------------------------------------------------------------

def cooccur_pairs(concepts: list[Concept], chunk_id: str) -> list[tuple]:
    """CoOccurExtractor.scala:28-57 — all unordered pairs over the
    distinct concepts of one chunk, canonical order by concept_id,
    windowId = chunk_id, freq = 1.  Returns (a, b, window_id, freq).
    Empty when fewer than 2 mentions (GraphRagJob.scala:309)."""
    if len(concepts) < 2:
        return []
    distinct: dict[Concept, None] = {}
    for c in concepts:
        distinct.setdefault(c)
    cs = list(distinct)
    out = []
    for i in range(len(cs)):
        for j in range(i + 1, len(cs)):
            a, b = cs[i], cs[j]
            if a.concept_id >= b.concept_id:
                a, b = b, a
            out.append((a, b, chunk_id, 1))
    return out


def pmi(co_freq: int, a_freq: int, b_freq: int, total_chunks: int) -> float:
    """CoOccurExtractor.scala:69-89 — log2((f_ab/N)/((f_a/N)(f_b/N))),
    0.0 on any zero input."""
    import math

    if total_chunks == 0 or a_freq == 0 or b_freq == 0 or co_freq == 0:
        return 0.0
    p_ab = co_freq / total_chunks
    p_a = a_freq / total_chunks
    p_b = b_freq / total_chunks
    return math.log2(p_ab / (p_a * p_b))


# ---------------------------------------------------------------------------
# R6 — deterministic relation scorer
# ---------------------------------------------------------------------------

def score_candidate(a_lemma: str, b_lemma: str, evidence: str) -> tuple[str, float]:
    """Deterministic verdict rules.

    The reference's only deterministic path is the regex fallback
    (RelationScorer.scala:129-152): predicate ``related_to`` unless a
    rule matches, confidence 0.5.  We extend it with evidence-pattern
    rules (same shape as the fallback's regex probes, applied to the
    evidence text instead of an LLM response) so that a deterministic
    run still yields typed edges above the 0.65 threshold — mirroring
    the reference corpus' IS_A/SYNONYM_OF/RELATED_TO distribution
    (API_DOCUMENTATION.md:47-49).  Rule order is significant and is
    mirrored verbatim in the DuckDB oracle SQL.
    """
    if a_lemma == b_lemma:
        return ("synonym_of", 0.9)
    ev = evidence.lower()
    if " is a " in ev or " is an " in ev:
        return ("is_a", 0.9)
    if " part of " in ev:
        return ("part_of", 0.85)
    if " causes " in ev or " caused by " in ev:
        return ("causes", 0.8)
    return ("related_to", 0.5)


def score_triples_for_text(text: str, chunk_id: str) -> list[dict]:
    """Full per-chunk golden path: extract -> pairs -> score -> threshold.

    Returns the triples the distributed pipeline must emit for this
    chunk (the P/R harness gates at >=0.95 vs this)."""
    concepts = extract_concepts(text)
    evidence = utf16_take(text, EVIDENCE_LIMIT)
    out = []
    for a, b, window_id, _freq in cooccur_pairs(concepts, chunk_id):
        predicate, confidence = score_candidate(a.lemma, b.lemma, evidence)
        if confidence >= MIN_CONFIDENCE:
            out.append(
                {
                    "subj_id": a.concept_id,
                    "predicate": predicate,
                    "obj_id": b.concept_id,
                    "confidence": confidence,
                    "evidence": utf16_take(evidence, FALLBACK_EVIDENCE_LIMIT),
                    "chunk_id": chunk_id,
                }
            )
    return out


def sanitize_rel(predicate: str) -> str:
    """Neo4jSink.scala:197 — uppercase, [^A-Z0-9_] -> _."""
    return re.sub(r"[^A-Z0-9_]", "_", predicate.upper())


# ---------------------------------------------------------------------------
# T5 — HTML <-> text (our added stage; byte-identical contract)
# ---------------------------------------------------------------------------

_P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.DOTALL)


def render_html(text: str) -> bytes:
    """Fixed template renderer (datagen): text -> html, the exact
    inverse of :func:`extract_text`.  Paragraphs are text split on
    blank lines; entities &, <, > are escaped."""
    paragraphs = text.split("\n\n") if text else []
    title = _htmlmod.escape(paragraphs[0][:80], quote=False) if paragraphs else ""
    body = "".join(f"<p>{_htmlmod.escape(p, quote=False)}</p>" for p in paragraphs)
    return (
        f"<html><head><title>{title}</title></head><body>{body}</body></html>"
    ).encode("utf-8")


def extract_text(html_bytes: bytes) -> str:
    """Deterministic HTML->text: decode UTF-8, pull <p> paragraph
    contents, unescape entities, join with blank lines.  Byte-identical
    per url to the text the page was rendered from (north_rule gate:
    sha256(text) fixture check)."""
    doc = html_bytes.decode("utf-8", errors="replace")
    paras = [_htmlmod.unescape(m) for m in _P_RE.findall(doc)]
    return "\n\n".join(paras)


def chunk_id_for(url: str, text: str) -> str:
    """Stable chunk id: hex(sha256(url \\x1f text))[:16] — mirrors the
    reference's content-hash chunk ids (DeltaToJsonl.scala:201-203
    upstream `chunkContentHash`) and is exactly expressible in Spark
    SQL as substring(sha2(concat(url, X'1F', text), 256), 1, 16)."""
    return hashlib.sha256(f"{url}\x1f{text}".encode("utf-8")).hexdigest()[:16]
