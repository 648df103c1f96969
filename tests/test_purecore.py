"""Golden unit tests for the pure-Python reference semantics
(SURVEY.md §5.1) — hand-computed expectations per extraction branch,
cross-checked against the reference code paths cited in purecore."""

import hashlib
import math

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.functions import purecore as p


def ids(concepts):
    return [(c.surface, c.origin) for c in concepts]


class TestExtraction:
    def test_capitalized_multiword(self):
        cs = p.extract_concepts("Machine Learning rocks")
        assert ("Machine Learning", "NER") in ids(cs)
        assert all(c.surface != "Machine" for c in cs)

    def test_stopwords_excluded(self):
        for w in ["The", "Figure", "Table", "About", "Which"]:
            cs = p.extract_concepts(f"{w} thing here")
            assert all(c.surface != w for c in cs)

    def test_length_gate_capitalized(self):
        # len <= 2 excluded for NER strategy ("Ab" has length 2)
        cs = p.extract_concepts("Ab Cd")
        # "Ab Cd" matches as one multiword surface of length 5 -> kept
        assert ("Ab Cd", "NER") in ids(cs)
        cs2 = p.extract_concepts("Ab. Cd.")
        assert cs2 == []  # each alone is len 2

    def test_camelcase(self):
        cs = p.extract_concepts("use DataStream here")
        assert ("DataStream", "camelCase") in ids(cs)
        assert any(c.lemma == "data_stream" for c in cs)

    def test_acronym_gates(self):
        cs = p.extract_concepts("API and ABCDEFG")
        assert ("API", "acronym") in ids(cs)
        assert all(c.surface != "ABCDEFG" for c in cs)

    def test_technical_term(self):
        cs = p.extract_concepts("the dataStream flows")
        assert ("dataStream", "technicalTerm") in ids(cs)

    def test_dedup_first_seen_full_identity(self):
        # DataStream (camelCase) and dataStream (technicalTerm) share a
        # lemma/id but differ in surface+origin -> both kept, in order
        cs = p.extract_concepts("DataStream and dataStream")
        assert ids(cs) == [("DataStream", "camelCase"), ("dataStream", "technicalTerm")]
        assert cs[0].concept_id == cs[1].concept_id
        # true duplicate collapses
        cs2 = p.extract_concepts("API then API again")
        assert ids(cs2) == [("API", "acronym")]

    def test_capitalized_not_matching_inside_camel(self):
        cs = p.extract_concepts("DataStream")
        assert ids(cs) == [("DataStream", "camelCase")]


class TestLemma:
    def test_camel_split(self):
        assert p.normalize_lemma("aB") == "a_b"
        assert p.normalize_lemma("DataStream") == "data_stream"

    def test_specials_and_collapse(self):
        assert p.normalize_lemma("GraphQL-API") == "graph_ql_api"
        assert p.normalize_lemma("foo__bar") == "foo_bar"
        assert p.normalize_lemma("_x_") == "x"

    def test_concept_id_is_sha256_prefix(self):
        lemma = "machine_learning"
        assert p.concept_id(lemma) == hashlib.sha256(lemma.encode()).hexdigest()[:16]
        assert len(p.concept_id("x")) == 16


class TestUtf16:
    def test_len_counts_utf16_units(self):
        assert p.utf16_len("abc") == 3
        assert p.utf16_len("a\U0001f600b") == 4  # astral char = 2 units

    def test_take_basic(self):
        assert p.utf16_take("hello", 3) == "hel"
        assert p.utf16_take("hi", 10) == "hi"

    def test_take_rounds_down_at_surrogate_boundary(self):
        s = "a\U0001f600b"
        assert p.utf16_take(s, 2) == "a"  # would split the pair -> round down
        assert p.utf16_take(s, 3) == "a\U0001f600"
        assert p.utf16_take(s, 4) == s


class TestPairs:
    def test_no_pairs_below_two(self):
        one = p.extract_concepts("just the API here.")
        assert len(one) == 1
        assert p.cooccur_pairs(one, "c") == []

    def test_all_canonical_pairs(self):
        cs = p.extract_concepts("API and REST and LLM.")
        pairs = p.cooccur_pairs(cs, "c9")
        assert len(pairs) == 3  # C(3,2)
        for a, b, win, freq in pairs:
            assert a.concept_id <= b.concept_id
            assert win == "c9" and freq == 1

    def test_distinct_before_pairing(self):
        cs = p.extract_concepts("API and API and REST.")
        assert len(p.cooccur_pairs(cs, "c")) == 1


class TestPMI:
    def test_zero_guards(self):
        assert p.pmi(0, 1, 1, 10) == 0.0
        assert p.pmi(1, 0, 1, 10) == 0.0
        assert p.pmi(1, 1, 1, 0) == 0.0

    def test_hand_computed(self):
        # f_ab=2, f_a=4, f_b=5, N=10 -> log2((0.2)/(0.4*0.5)) = 0
        assert p.pmi(2, 4, 5, 10) == 0.0
        # f_ab=3, f_a=3, f_b=3, N=9 -> log2((1/3)/(1/9)) = log2(3)
        assert math.isclose(p.pmi(3, 3, 3, 9), math.log2(3))


class TestScorer:
    def test_rules(self):
        assert p.score_candidate("a", "b", "X is a Y.") == ("is_a", 0.9)
        assert p.score_candidate("a", "b", "X is part of Y.") == ("part_of", 0.85)
        assert p.score_candidate("a", "b", "X causes Y.") == ("causes", 0.8)
        assert p.score_candidate("same", "same", "anything") == ("synonym_of", 0.9)
        assert p.score_candidate("a", "b", "X near Y.") == ("related_to", 0.5)

    def test_rule_order_synonym_first(self):
        assert p.score_candidate("s", "s", "X is a Y.")[0] == "synonym_of"

    def test_threshold_drops_related_to(self):
        triples = p.score_triples_for_text("API meets REST.", "c")
        assert triples == []  # related_to 0.5 < 0.65
        triples2 = p.score_triples_for_text("API is a REST.", "c")
        assert len(triples2) == 1 and triples2[0]["predicate"] == "is_a"

    def test_evidence_truncations(self):
        long_text = "API is a REST. " + "x" * 1000
        t = p.score_triples_for_text(long_text, "c")[0]
        assert t["evidence"] == long_text[:100]

    def test_sanitize_rel(self):
        assert p.sanitize_rel("is_a") == "IS_A"
        assert p.sanitize_rel("re-lated to!") == "RE_LATED_TO_"


class TestHtml:
    def test_roundtrip(self):
        for text in [
            "Para one with API.\n\nPara <two> & more.",
            "",
            "single para",
            "a\U0001f600b\n\nsecond",
        ]:
            assert p.extract_text(p.render_html(text)) == text

    def test_sha_identity(self):
        text = "Machine Learning is a Query Engine."
        h = p.render_html(text)
        assert (
            hashlib.sha256(p.extract_text(h).encode()).hexdigest()
            == hashlib.sha256(text.encode()).hexdigest()
        )


class TestNlpExtraction:
    """T4 golden fixtures — one per branch of ConceptExtractor.scala:157-256."""

    def _by_origin(self, text):
        out = {}
        for c in p.extract_concepts_nlp(text):
            out.setdefault(c.origin, []).append(c.surface)
        return out

    def test_multiword_entity_merge(self):
        # consecutive same-NER tokens merge into ONE surface
        got = self._by_origin("visited New York yesterday")
        assert got["NER_LOCATION"] == ["New York"]

    def test_entity_type_change_splits(self):
        # LOCATION then PERSON: chain flushes at the type boundary
        got = self._by_origin("from London Paris Alice Smith came home")
        assert got["NER_LOCATION"] == ["London Paris"]
        assert got["NER_PERSON"] == ["Alice Smith"]

    def test_punctuation_breaks_chain(self):
        # "New, York" — CoreNLP would tokenize the comma as O; the
        # trailing punctuation on the raw token breaks the entity
        got = self._by_origin("in New, York today")
        assert got["NER_LOCATION"] == ["New", "York"]

    def test_trailing_entity_flushed(self):
        got = self._by_origin("they moved to Tokyo")
        assert got["NER_LOCATION"] == ["Tokyo"]

    def test_pos_noun_branches(self):
        got = self._by_origin("the Compiler wrote documents about regression")
        assert "Compiler" in got["POS_NNP"]
        assert "documents" in got["POS_NNS"]
        assert "regression" in got["POS_NN"]

    def test_pos_gates(self):
        # stopword (The), len<=2 (ab... no: 'ab' stripped len 2), digits
        got = self._by_origin("The ab 123 Figure")
        assert "POS_NNP" not in got or "Figure" not in got.get("POS_NNP", [])
        assert all("The" not in v and "ab" not in v and "123" not in v for v in got.values())

    def test_heuristic_union_camel_acronym_only(self):
        got = self._by_origin("the DataStream uses an API for Tokyo")
        assert got["NER_LOCATION"] == ["Tokyo"]
        assert "DataStream" in got["camelCase"]
        assert "API" in got["acronym"]
        # plain-capitalized heuristic concepts (origin NER) are NOT unioned
        assert "NER" not in got

    def test_union_is_lemma_novel(self):
        # NNP 'Datastream'? no — craft: POS_NNP 'Api' lemma 'api' blocks acronym 'API' lemma 'api'
        got = self._by_origin("the Api spec and the API")
        assert "Api" in got.get("POS_NNP", [])
        assert "acronym" not in got  # lemma 'api' already present

    def test_fallback_on_error(self, monkeypatch):
        calls = {"n": 0}

        def boom(raw):
            raise RuntimeError("tagger died")

        monkeypatch.setattr(p, "_token_tags", boom)
        got = p.extract_concepts_nlp("GraphRAG uses an API")
        origins = {c.origin for c in got}
        assert origins and origins <= {"NER", "camelCase", "acronym", "technicalTerm"}

    def test_dedup_full_identity_first_seen(self):
        got = p.extract_concepts_nlp("Tokyo then Tokyo again")
        assert [c.surface for c in got if c.origin == "NER_LOCATION"] == ["Tokyo"]
