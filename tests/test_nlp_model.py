"""Optional spaCy-backed T4 (functions/nlp_model.py).

The sandbox has no spaCy, so the model tests SKIP here — they exist to
prove the UDF boundary (fused Arrow enrich pass, per-process model
singleton) fits a real statistical model on a machine that has one.
The always-run tests pin the graceful-degradation contract: requesting
the strategy without the dependency fails loudly and early, with the
deterministic tagger named as the fallback; oracled outputs never
route through this module."""

import pytest

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.functions import (
    concepts as cf,
)
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.functions import nlp_model


class TestWithoutSpacy:
    def test_strategy_raises_clear_error_when_absent(self, spark):
        if nlp_model.SPACY_AVAILABLE:
            pytest.skip("spaCy installed; absence contract not testable")
        df = spark.createDataFrame([("c0", "Apache Spark rocks")], "chunk_id string, text string")
        with pytest.raises(ImportError, match="nlp_spacy"):
            cf.with_concepts(df, strategy="nlp_spacy")

    def test_unknown_strategy_still_keyerror(self, spark):
        df = spark.createDataFrame([("c0", "x")], "chunk_id string, text string")
        with pytest.raises(KeyError):
            cf.with_concepts(df, strategy="bogus")

    def test_extract_falls_back_to_heuristic(self):
        """Model errors degrade to the heuristic extraction
        (ConceptExtractor.scala:251-255) — with no spaCy at all, the
        pure function must still return the heuristic concepts."""
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.functions import (
            purecore,
        )

        text = "Machine Learning is a Query Engine with parseHTML and API."
        got = nlp_model.extract_concepts_spacy(text)
        assert got == purecore.extract_concepts(text)


@pytest.mark.skipif(not nlp_model.spacy_available(), reason="spaCy model not installed")
class TestWithSpacy:
    def test_spacy_extraction_schema_and_gates(self):
        got = nlp_model.extract_concepts_spacy(
            "Barack Obama visited Paris. The database and scheduler run on Apache Spark."
        )
        assert got, "model path returned nothing"
        for c in got:
            assert set(c._asdict()) == {"concept_id", "lemma", "surface", "origin"}
            assert c.origin.startswith(("NER_", "POS_", "camelCase", "acronym"))
            assert len(c.surface) > 2 and c.lemma == c.lemma.lower()

    def test_spacy_udf_end_to_end(self, spark):
        df = spark.createDataFrame(
            [("c0", "Barack Obama founded a database startup in Paris.")],
            "chunk_id string, text string",
        )
        out = cf.with_concepts(df, strategy="nlp_spacy").collect()[0]
        assert out["evidence"].startswith("Barack")
        assert isinstance(out["concepts"], list)
