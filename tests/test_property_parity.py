"""Property-based cross-engine parity (hypothesis).

The correctness gate rests on two parity assumptions that golden
fixtures only spot-check:

1. the DuckDB oracle's RE2 regexes (``regexp_extract_all`` with ASCII
   word boundaries) agree with purecore's ``re.ASCII``-pinned
   extraction on arbitrary text, including the casing chain;
2. the pure-Catalyst lemma/concept-id expressions (JVM regexp_replace
   / lower / sha2) agree with the python reference implementation.

These fuzz both over generated text mixing every extraction branch,
separators, unicode and astral-plane characters.  (Java regex and RE2
use ASCII \\b; python's is unicode-aware — purecore pins re.ASCII
precisely so all three engines agree, and this test would catch any
drift.)"""

import re

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import __spark_entry__ as E
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.functions import purecore as p

word_st = st.one_of(
    st.from_regex(r"[A-Z][a-z]{1,8}", fullmatch=True),
    st.from_regex(r"[A-Z][a-z]{1,4}[A-Z][a-z]{1,4}", fullmatch=True),  # CamelCase
    st.from_regex(r"[A-Z]{2,7}", fullmatch=True),  # acronym incl. len>6 reject
    st.from_regex(r"[a-z]{1,5}[A-Z][a-z]{1,4}", fullmatch=True),  # technicalTerm
    st.sampled_from(
        ["The", "And", "For", "This", "spark", "data", "window", "small", "big", "Ab"]
    ),
    st.from_regex(r"[a-z]{1,8}", fullmatch=True),
    st.from_regex(r"[0-9]{1,4}", fullmatch=True),
    st.sampled_from(["é", "Éclair", "中文", "\U0001f600", "Abcé", "naïve", "ÜberAlles"]),
)
sep_st = st.sampled_from([" ", "  ", ". ", ", ", "-", "_", "\n", "'", "__", ".\n\n"])
text_st = st.lists(st.tuples(word_st, sep_st), min_size=0, max_size=30).map(
    lambda ps: "".join(w + s for w, s in ps)
)


def _cased(t: str) -> str:
    # python mirror of _cased_col/_cased_sql — ASCII \b like RE2/JVM
    for pat, rep in E.CASE_RULES:
        t = re.sub(pat, rep, t, flags=re.ASCII)
    return t


class TestDuckdbOracleParity:
    @given(st.lists(text_st, min_size=1, max_size=12))
    @settings(max_examples=60, deadline=None)
    def test_mentions_cte_matches_purecore(self, texts):
        con = duckdb.connect()
        try:
            con.register(
                "documents",
                pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
            )
            got = {
                tuple(r)
                for r in con.sql(
                    f"WITH {E.MENTIONS_CTE} "
                    "SELECT chunk_id, concept_id, lemma, surface, origin FROM mentions"
                ).fetchall()
            }
        finally:
            con.close()
        expected = set()
        for i, t in enumerate(texts):
            for c in p.extract_concepts(_cased(t)):
                expected.add((str(i), c.concept_id, c.lemma, c.surface, c.origin))
        assert got == expected


class TestCatalystParity:
    @given(st.lists(word_st, min_size=1, max_size=40, unique=True))
    @settings(max_examples=5, deadline=None)
    def test_lemma_and_concept_id(self, spark, surfaces):
        from pyspark.sql import functions as F

        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.functions import (
            concepts as cf,
        )

        df = spark.createDataFrame([(s,) for s in surfaces], "surface string")
        rows = df.select(
            "surface", cf.normalize_lemma_col(F.col("surface")).alias("lemma")
        ).withColumn("cid", cf.concept_id_col(F.col("lemma"))).collect()
        assert len(rows) == len(surfaces)
        for r in rows:
            assert r["lemma"] == p.normalize_lemma(r["surface"]), r["surface"]
            assert r["cid"] == p.concept_id(r["lemma"]), r["surface"]


class TestPairsCteParity:
    """R1 pair canonicalization: the oracle's full-identity-tuple
    self-join (least/greatest ids, composite-key tie-break) vs
    purecore.cooccur_pairs on arbitrary extraction output — the
    hand-mirrored SQL block an edge case (equal concept_ids from
    distinct surfaces, synonym self-pairs, duplicate mentions) could
    desync."""

    @given(st.lists(text_st, min_size=1, max_size=10))
    @settings(max_examples=40, deadline=None)
    def test_pairs_cte_matches_purecore(self, texts):
        con = duckdb.connect()
        try:
            con.register(
                "documents",
                pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
            )
            got = {
                tuple(r)
                for r in con.sql(
                    f"WITH {E.PAIRS_CTE} "
                    "SELECT window_id, a_id, b_id, freq FROM pairs"
                ).fetchall()
            }
        finally:
            con.close()
        expected = set()
        for i, t in enumerate(texts):
            cid = str(i)
            for a, b, window_id, freq in p.cooccur_pairs(
                p.extract_concepts(_cased(t)), cid
            ):
                expected.add((window_id, a.concept_id, b.concept_id, freq))
        assert got == expected


class TestTriplesCteParity:
    """R6 scorer-rule parity: the oracle's CASE predicate/confidence
    rules vs purecore.score_candidate over arbitrary evidence strings
    (synonym, is_a/is_an, part_of, causes/caused_by, fallback, and
    the 0.65 threshold).  Evidence bytes are excluded from the tuple:
    DuckDB substr counts codepoints while the engine truncates UTF-16
    units — a representational difference pinned separately by the
    TestUtf16 unit oracle and moot on the (ASCII) driver corpus."""

    marker_st = st.sampled_from(
        [" is a ", " is an ", " part of ", " causes ", " caused by ", " and ", " "]
    )
    rich_text_st = st.lists(
        st.tuples(word_st, marker_st), min_size=0, max_size=15
    ).map(lambda ps: "".join(w + s for w, s in ps))

    @given(st.lists(rich_text_st, min_size=1, max_size=10))
    @settings(max_examples=40, deadline=None)
    def test_triples_cte_matches_purecore(self, texts):
        con = duckdb.connect()
        try:
            con.register(
                "documents",
                pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
            )
            got = {
                tuple(r)
                for r in con.sql(
                    f"WITH {E.TRIPLES_CTE} "
                    "SELECT chunk_id, subj_id, predicate, obj_id, confidence FROM triples"
                ).fetchall()
            }
        finally:
            con.close()
        expected = set()
        for i, t in enumerate(texts):
            cid = str(i)
            for tr in p.score_triples_for_text(_cased(t), cid):
                expected.add(
                    (cid, tr["subj_id"], tr["predicate"], tr["obj_id"], tr["confidence"])
                )
        assert got == expected


class TestPortableHashParity:
    """The walk/negative-sampling family draws deterministic choices
    from a 32-bit value built from md5 hex.  Three engines must agree:
    python int(md5[:8], 16), Spark conv(substr(md5, 1, 8), 16, 10),
    and the DuckDB nibble-sum (_nib32_expr).  Fuzz arbitrary key
    strings through all three."""

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    codec="utf-8", exclude_characters="'\\"
                ),
                min_size=0,
                max_size=40,
            ),
            min_size=1,
            max_size=20,
        )
    )
    def test_three_engine_hash32(self, spark, keys):
        import hashlib

        from pyspark.sql import functions as F

        py = {
            k: int(hashlib.md5(k.encode("utf-8")).hexdigest()[:8], 16)
            for k in set(keys)
        }
        df = spark.createDataFrame([(k,) for k in set(keys)], "k string")
        sp = {
            r["k"]: r["h"]
            for r in df.select(
                "k",
                F.conv(F.substring(F.md5("k"), 1, 8), 16, 10)
                .cast("long")
                .alias("h"),
            ).collect()
        }
        assert sp == py
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
            for i in range(8)
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"k": list(set(keys))}))
        dd = dict(
            con.execute(
                f"SELECT k, {nib} AS v FROM (SELECT k, md5(k) AS h FROM t)"
            ).fetchall()
        )
        assert dd == py
