"""Inverted-index full-text search over chunk text.

The reference's concept search (Q2) matches exact ids; real GraphRAG
retrieval needs term search over chunk text.  Grep-per-query doesn't
scale — a 100 TB corpus scan per query is absurd — so the standard
shape: build a posting table ONCE (term -> chunk), store it in the
catalog (bucketable by term), and answer queries with a term-key
equi-join.

* build_postings — explode tokenized text to (term, chunk_id, tf)
  with one shuffle on (term, chunk_id) for the tf count.  At corpus
  scale, bucket the stored table by term: a query then prunes to the
  buckets of its terms.
* search_all_terms — AND semantics: chunks containing EVERY query
  term, ranked by summed tf.  The query's terms are a literal IN
  filter (partition/bucket-prunable); candidate postings group by
  chunk and keep groups with all terms present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = r"[^a-z0-9]+"


def tokenize(col) -> "F.Column":
    """Lowercased alphanumeric tokens (empty strings filtered)."""
    return F.filter(
        F.split(F.lower(col), _TOKEN_RE), lambda t: F.length(t) > 0
    )


def build_postings(
    chunks: DataFrame, text_col: str = "text", id_col: str = "chunk_id"
) -> DataFrame:
    """(term, chunk_id, tf) posting table."""
    return (
        chunks.select(
            F.col(id_col).alias("chunk_id"),
            F.explode(tokenize(F.col(text_col))).alias("term"),
        )
        .groupBy("term", "chunk_id")
        .agg(F.count("*").alias("tf"))
    )


def search_all_terms(
    postings: DataFrame, terms: list[str], limit: int = 20
) -> DataFrame:
    """Chunks containing ALL ``terms``, ranked by total term frequency
    (desc, chunk_id asc for determinism).  The literal IN-filter on
    term is the prune: only the queried terms' postings move."""
    terms = sorted({t.lower() for t in terms})
    hits = postings.where(F.col("term").isin(terms))
    return (
        hits.groupBy("chunk_id")
        .agg(
            F.count_distinct("term").alias("_nt"),
            F.sum("tf").alias("score"),
        )
        .where(F.col("_nt") == len(terms))
        .select("chunk_id", F.col("score").cast("long").alias("score"))
        .orderBy(F.desc("score"), "chunk_id")
        .limit(limit)
    )
