"""Incremental / streaming execution of the KG pipeline.

The reference's Flink job is logically batch (bounded source, no
watermarks/state — GraphRagJob.scala:196-199); its "incremental" story
is re-running over new JSONL drops.  Ours is snapshot-driven
microbatches (north_rule): each call to
:func:`plans.pipeline.run_pipeline` consumes only pages with
``warc_ts`` past the checkpoint table's high-water mark and commits new
catalog snapshots atomically — resumable by construction.

This module adds the Structured-Streaming wrapper for true streaming
ingest: a file/parquet stream of pages driven through ``foreachBatch``
into the same batch pipeline (exactly-once per microbatch via the
checkpoint high-water mark — a replayed batch filters down to 0 new
pages).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..plans.pipeline import run_pipeline
from ..sources.catalog import ParquetCatalog

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def stream_pages_dir(
    spark: SparkSession,
    pages_dir: str,
    catalog: ParquetCatalog,
    checkpoint_dir: str,
    extract_from_html: bool = True,
):
    """readStream over a parquet directory of pages; each microbatch
    runs the full KG pipeline.  Returns the StreamingQuery (caller
    stops it / processAllAvailable)."""
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)

    def sink(batch_df, epoch_id: int):
        run_pipeline(
            spark,
            batch_df,
            catalog,
            incremental=True,
            extract_from_html=extract_from_html,
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
