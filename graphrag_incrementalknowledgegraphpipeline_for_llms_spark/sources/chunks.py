"""Chunk sources & sinks (S1-S8 of SURVEY.md §2.1).

* JSONL chunk source with the reference's drop-don't-fail decode
  (ingestion/JsonDeser.scala:25-33: a line that fails strict decode is
  dropped with a warning, not an error) — reproduced via a schema'd
  PERMISSIVE read + corrupt-record filter.
* JSONL sink (DeltaToJsonl.scala:276-284: coalesce(n) + overwrite).
* The Phase-1 reshape (DeltaToJsonl.scala:204-271): span struct
  assembly, coalesce projection, renames, null audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_SCHEMA = T.StructType(
    [T.StructField("start", T.IntegerType()), T.StructField("end", T.IntegerType())]
)

# canonical Chunk schema (core/DataModels.scala:16-25)
CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("chunkId", T.StringType()),
        T.StructField("docId", T.StringType()),
        T.StructField("span", SPAN_SCHEMA),
        T.StructField("text", T.StringType()),
        T.StructField("sourceUri", T.StringType()),
        T.StructField("hash", T.StringType()),
    ]
)


def read_chunks_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S3+S4: schema'd JSONL read; malformed lines and lines missing
    required fields are dropped, not failed (JsonDeser semantics)."""
    schema = T.StructType(CHUNK_SCHEMA.fields + [T.StructField("_corrupt", T.StringType())])
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    ok = df.where(
        F.col("_corrupt").isNull()
        & F.col("chunkId").isNotNull()
        & F.col("docId").isNotNull()
        & F.col("text").isNotNull()
    ).drop("_corrupt")
    return ok.select(
        F.col("chunkId").alias("chunk_id"),
        F.col("docId").alias("doc_id"),
        "span",
        "text",
        F.col("sourceUri").alias("source_uri"),
        "hash",
    )


def write_jsonl(df: DataFrame, path: str, num_files: int = 1) -> None:
    """S5 (DeltaToJsonl.scala:276-284)."""
    df.coalesce(num_files).write.mode("overwrite").json(path)


def phase1_reshape(df: DataFrame) -> DataFrame:
    """The Phase-1 export reshape (P1-P3): upstream columns
    (chunkId, docId, start, end, chunkText, sectionPath,
    chunkContentHash) -> canonical chunk shape."""
    return df.select(
        F.col("chunkId").alias("chunk_id"),
        F.col("docId").alias("doc_id"),
        F.struct(F.col("start"), F.col("end")).alias("span"),
        F.col("chunkText").alias("text"),
        F.coalesce(F.col("sectionPath"), F.col("docId")).alias("source_uri"),
        F.col("chunkContentHash").alias("hash"),
    )


def null_audit(df: DataFrame, cols: list[str]) -> DataFrame:
    """P4 (DeltaToJsonl.scala:257-268): conditional-sum null counts."""
    return df.agg(
        *[F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls") for c in cols]
    )
