"""Deterministic synthetic ``pages`` table generator (FIXTURES.md §1).

Shape mandated by BASELINE.json input_hint:
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)``.  html is rendered FROM text by the fixed template in
purecore.render_html, so the HTML->text stage has an exact inverse and
the byte-identity gate is meaningful.  Seeded, no wall clock.

The vocabulary is engineered to hit every extraction branch
(ConceptExtractor.scala:46-57): capitalized multi-words, stopwords that
must be dropped, CamelCase, acronyms in and out of the 2..6 length
gate, lowerCamel technical terms, lemma-normalization edge cases; and
sentence templates trigger each deterministic-scorer rule (is_a,
part_of, causes) plus plain co-occurrence.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

ENTITIES = [
    "Machine Learning", "Neural Network", "Knowledge Graph", "Apache Spark",
    "Data Pipeline", "Query Engine", "Graph Database", "Language Model",
    "Feature Store", "Vector Index", "Stream Processor", "Batch Job",
]
CAMEL = ["DataStream", "GraphFrame", "SparkContext", "DataFrame", "MapReduce", "PageRank"]
ACRONYMS = ["API", "REST", "LLM", "HTTP", "SQL", "JSON", "RAG", "ETL"]
BAD_ACRONYMS = ["ABCDEFG", "HIJKLMNOP"]  # >6 chars: excluded by the gate
TECH = ["dataStream", "graphRag", "queryPlan", "shuffleWrite", "broadcastJoin"]
STOP_HITS = ["The", "Figure", "Table", "About", "Which"]  # must never become concepts
EDGE_SURFACES = ["GraphQL-API", "Foo__bar"]
FILLER = [
    "the system processes records with low latency",
    "results are written to the warehouse for downstream use",
    "operators exchange partitions over the network",
    "metadata tracks every snapshot and commit",
]

TEMPLATES = [
    "{a} is a {b}.",           # -> is_a, 0.9
    "{a} is part of {b}.",     # -> part_of, 0.85
    "{a} causes {b}.",         # -> causes, 0.8
    "{a} works with {b}.",     # -> related_to, 0.5 (below threshold)
    "{a} and {b} appear in {c}.",
]

BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _page_text(rng: random.Random, idx: int) -> str:
    n_paras = rng.randint(1, 4)
    paras = []
    for _ in range(n_paras):
        n_sents = rng.randint(1, 4)
        sents = []
        for _ in range(n_sents):
            t = rng.choice(TEMPLATES)
            pool = ENTITIES + CAMEL + ACRONYMS + TECH
            a, b, c = rng.sample(pool, 3)
            sents.append(t.format(a=a, b=b, c=c))
            if rng.random() < 0.3:
                sents.append(rng.choice(FILLER) + ".")
            if rng.random() < 0.15:
                sents.append(f"{rng.choice(STOP_HITS)} shows {rng.choice(BAD_ACRONYMS)}.")
            if rng.random() < 0.1:
                sents.append(f"See {rng.choice(EDGE_SURFACES)} for details.")
        paras.append(" ".join(sents))
    return "\n\n".join(paras)


def generate_pages(n_pages: int, seed: int = 42) -> list[dict]:
    """Rows for the pages table.  Includes deliberate edge cases:
    ~2% empty text, ~3% single-concept pages (no-pair gate), ~2% German
    rows, one astral-plane page (UTF-16 truncation pin)."""
    from .functions import purecore

    rows = []
    for i in range(n_pages):
        rng = random.Random((seed << 20) + i)
        r = rng.random()
        if r < 0.02:
            text = ""
            lang = "en"
        elif r < 0.05:
            text = f"Only {rng.choice(ENTITIES)} here."
            lang = "en"
        elif r < 0.07:
            text = "Der Graph und die Daten sind mit dem System verbunden."
            lang = "de"
        else:
            text = _page_text(rng, i)
            lang = "en"
        if i == 7 % max(n_pages, 1) and n_pages > 7:
            # astral char before the 500-unit boundary + long tail
            text = ("Emoji 😀 marker. " + text + " " + " ".join(FILLER) * 8)[:2000]
        rows.append(
            {
                "url": f"https://example.org/{i % 97}/{i}",
                "warc_ts": BASE_TS + timedelta(seconds=i),
                "html": purecore.render_html(text),
                "text": text,
                "lang": lang,
            }
        )
    return rows


def pages_df(spark, n_pages: int, seed: int = 42, partitions: int | None = None):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    df = spark.createDataFrame(generate_pages(n_pages, seed), schema=schema)
    if partitions:
        df = df.repartition(partitions)
    return df


def write_pages_parquet(spark, path: str, n_pages: int, seed: int = 42, partitions: int = 32):
    pages_df(spark, n_pages, seed, partitions).write.mode("overwrite").parquet(path)
    return path
