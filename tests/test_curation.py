"""Corpus-curation operator: gates, dedup canonicalization, funnel."""

from pyspark.sql import functions as F

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import curation

GOOD = "the quick system is a part of the data engine, with the index and the cache."
SHORT = "the end."  # fails length gate (2 tokens)
GERMAN = "der hund und die katze spielen mit der maus und der ente im garten, oder?"
NOPUNCT_NOSTOP = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # quality 0.4


def _docs(spark):
    rows = [
        (1, GOOD),
        (2, SHORT),
        (3, GERMAN),
        (4, NOPUNCT_NOSTOP),
        (5, GOOD),  # exact dup of 1 -> deduped, canonical stays 1
        (6, "  " + GOOD + " "),  # whitespace-variant dup -> same fingerprint
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_corpus_gates_and_dedup(spark):
    kept = curation.curate_corpus(_docs(spark)).collect()
    assert [r["id"] for r in kept] == [1]
    r = kept[0]
    assert r["lang"] == "en" and r["quality_score"] >= 0.5


def test_canonical_is_min_id(spark):
    # drop doc 1: the surviving dup pair (5, 6) canonicalizes to 5
    kept = curation.curate_corpus(_docs(spark).where(F.col("doc_id") != 1)).collect()
    assert [r["id"] for r in kept] == [5]


def test_funnel_counts(spark):
    row = curation.curation_funnel(_docs(spark)).collect()[0]
    assert row["total"] == 6
    assert row["pass_length"] == 5  # SHORT fails
    # NOPUNCT_NOSTOP scores 0.4 < 0.5
    assert row["pass_quality"] == 4
    assert row["pass_lang"] == 3  # GERMAN drops
    assert row["after_dedup"] == 1  # 1/5/6 share a fingerprint


def test_funnel_matches_curate_count(spark):
    df = _docs(spark)
    assert (
        curation.curation_funnel(df).collect()[0]["after_dedup"]
        == curation.curate_corpus(df).count()
    )
