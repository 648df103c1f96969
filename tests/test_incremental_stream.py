"""Structured-Streaming microbatch ingest == batch pipeline result."""

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark import datagen
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.plans import pipeline
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.streaming import incremental


def test_stream_matches_batch(spark, catalog, tmp_path):
    from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import (
        ParquetCatalog,
    )

    pages = datagen.pages_df(spark, 30)
    pages_dir = str(tmp_path / "pages")
    pages.write.mode("overwrite").parquet(pages_dir)

    qy = incremental.stream_pages_dir(
        spark, pages_dir, catalog, str(tmp_path / "ckpt"), extract_from_html=True
    )
    qy.awaitTermination(300)

    batch_cat = ParquetCatalog(str(tmp_path / "batch"))
    pipeline.run_pipeline(spark, pages, batch_cat, extract_from_html=True)

    for t in ["nodes", "edges", "triples"]:
        # streaming defaults to graph_mode="mor", whose nodes carry the
        # internal _complete tiebreak column — content must still match
        # the cow batch run exactly
        da = catalog.read(spark, t)
        if "_complete" in da.columns:
            da = da.drop("_complete")
        a = sorted(tuple(r) for r in da.collect())
        b = sorted(tuple(r) for r in batch_cat.read(spark, t).collect())
        assert a == b, t
