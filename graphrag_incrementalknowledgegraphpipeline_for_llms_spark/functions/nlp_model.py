"""Optional MODEL-backed T4 tagger (spaCy) behind the same semantics
as the deterministic stand-in.

The engine's oracle path for T4 (ConceptExtractor.scala:30-43,157-256)
is ``purecore.extract_concepts_nlp`` — a deterministic lexicon tagger
whose outputs the DuckDB oracle replays exactly.  This module proves
the SAME UDF boundary fits a real statistical model: spaCy's NER/POS
output is mapped through the reference's entity-merge / length+stopword
gates / camelCase-acronym union / heuristic fallback, and shipped as
the same fused Arrow pandas-UDF shape (one model load per Python
worker process, batches flow through Arrow).

Everything here is gated behind an import-try: the sandbox has no
spaCy, so the pytest suite skips (tests/test_nlp_model.py) and the
strategy raises a clear error if requested without the dependency.
Nothing oracle-graded routes through this module — the deterministic
tagger stays the correctness path.

Model-in-UDF pattern (the part that matters at 100 TB): the model is a
PER-PROCESS lazy singleton, loaded on first batch inside the executor
(never on the driver, never pickled into the closure — spaCy pipelines
don't serialize cheaply and a broadcast would pin the driver's copy).
With spark.python.worker.reuse=true each executor core pays one load
for the whole job.
"""

from __future__ import annotations

from . import purecore

try:  # pragma: no cover - absent in the sandbox
    import spacy  # type: ignore

    SPACY_AVAILABLE = True
except Exception:  # pragma: no cover
    spacy = None
    SPACY_AVAILABLE = False

# spaCy entity labels -> the reference's three consumed NER classes
# (ConceptExtractor.scala:181: LOCATION/PERSON/ORGANIZATION only)
_LABEL_MAP = {
    "GPE": "LOCATION",
    "LOC": "LOCATION",
    "FAC": "LOCATION",
    "PERSON": "PERSON",
    "ORG": "ORGANIZATION",
}

_NLP = None  # per-process model singleton


def spacy_available(model: str = "en_core_web_sm") -> bool:
    if not SPACY_AVAILABLE:
        return False
    try:
        _load_model(model)
        return True
    except Exception:
        return False


def _load_model(model: str = "en_core_web_sm"):
    """Lazy per-process singleton (see module docstring)."""
    global _NLP
    if _NLP is None:
        if spacy is None:
            raise ImportError(
                "strategy='nlp_spacy' requires spaCy and a model "
                "(pip install spacy && python -m spacy download en_core_web_sm); "
                "use strategy='nlp' for the deterministic tagger"
            )
        _NLP = spacy.load(model, exclude=["lemmatizer", "parser"])
    return _NLP


def extract_concepts_spacy(text: str, nlp=None) -> list[purecore.Concept]:
    """T4 with a real model: spaCy NER entities (already merged spans)
    + POS noun harvest on non-entity tokens + camelCase/acronym union,
    all under the reference's gates — mirrors
    purecore.extract_concepts_nlp with the lexicon tagger swapped for
    the model.  Heuristic fallback on any model error
    (ConceptExtractor.scala:251-255)."""
    try:
        nlp = nlp or _load_model()
        doc = nlp(text)
        seen: dict[purecore.Concept, None] = {}
        entity_token_ids = set()
        for ent in doc.ents:
            mapped = _LABEL_MAP.get(ent.label_)
            if mapped is None:
                continue
            entity_token_ids.update(t.i for t in ent)
            surface = " ".join(ent.text.split())
            if purecore.utf16_len(surface) > 2 and surface not in purecore.STOP_WORDS:
                seen.setdefault(purecore._make_concept(surface, f"NER_{mapped}"))
        for tok in doc:
            if tok.i in entity_token_ids:
                continue
            if (
                tok.tag_ in purecore.NOUN_TAGS
                and purecore.utf16_len(tok.text) > 2
                and tok.text not in purecore.STOP_WORDS
                and not purecore._ALL_DIGITS.match(tok.text.lower())
            ):
                seen.setdefault(purecore._make_concept(tok.text, f"POS_{tok.tag_}"))
        # camelCase/acronym union, lemma-novel (scala:240-248)
        lemmas = {c.lemma for c in seen}
        for c in purecore.extract_concepts(text):
            if c.origin in ("camelCase", "acronym") and c.lemma not in lemmas:
                seen.setdefault(c)
        return list(seen)
    except Exception:
        return purecore.extract_concepts(text)


def spacy_extractor(model: str = "en_core_web_sm"):
    """Extractor callable for concepts._make_enrich_udf /
    _make_html_enrich_udf — defers the model load to first use inside
    the executor process."""

    def _extract(text: str):
        return extract_concepts_spacy(text, _load_model(model))

    return _extract
