"""Spark-side extraction parity: the distributed pandas-UDF path must
match purecore exactly, and the pure-Catalyst lemma/id expressions must
match the Python ones (SURVEY.md §5.1)."""

import pytest
from pyspark.sql import functions as F

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.functions import (
    concepts as cf,
)
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.functions import purecore as p

TEXTS = [
    "Machine Learning is a Query Engine.",
    "The DataStream uses API and dataStream.",
    "See GraphQL-API for Foo__bar details.",
    "API and ABCDEFG with REST.",
    "",
    "Only API here.",
    "a\U0001f600b Emoji Test with LLM.",
    "Ab Cd but Ab. Cd. alone.",
]


@pytest.fixture(scope="module")
def chunks(spark):
    rows = [(f"c{i}", t) for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(rows, "chunk_id string, text string")


def test_udf_matches_purecore(spark, chunks):
    got = {
        r["chunk_id"]: [tuple(c) for c in r["concepts"]]
        for r in cf.with_concepts(chunks).select("chunk_id", "concepts").collect()
    }
    for i, t in enumerate(TEXTS):
        expected = [tuple(c) for c in p.extract_concepts(t)]
        assert got[f"c{i}"] == expected, f"text {i}: {t!r}"


def test_evidence_truncation_utf16(spark):
    long_text = "Emoji a\U0001f600b " + "y" * 600
    df = spark.createDataFrame([("c", long_text)], "chunk_id string, text string")
    row = cf.with_concepts(df).select("evidence", "evidence100").collect()[0]
    assert row["evidence"] == p.utf16_take(long_text, 500)
    assert row["evidence100"] == p.utf16_take(long_text, 100)
    # astral char counts 2 units: total kept codepoints = 499
    assert len(row["evidence"]) == 499


def test_catalyst_lemma_matches_python(spark):
    surfaces = ["DataStream", "GraphQL-API", "Foo__bar", "_x_", "aB", "API", "Machine Learning"]
    df = spark.createDataFrame([(s,) for s in surfaces], "surface string")
    rows = df.select(
        "surface",
        cf.normalize_lemma_col(F.col("surface")).alias("lemma"),
    ).withColumn("cid", cf.concept_id_col(F.col("lemma"))).collect()
    for r in rows:
        assert r["lemma"] == p.normalize_lemma(r["surface"])
        assert r["cid"] == p.concept_id(r["lemma"])


def test_mentions_explode(spark, chunks):
    m = cf.mentions_from(cf.with_concepts(chunks))
    rows = m.where(F.col("chunk_id") == "c0").collect()
    lemmas = {r["lemma"] for r in rows}
    assert lemmas == {"machine_learning", "query_engine"}
    assert all(len(r["concept_id"]) == 16 for r in rows)
