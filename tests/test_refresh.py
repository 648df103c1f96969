"""refresh_after_batch e2e: +batch refresh == cold rebuild.

Two-batch regime over the deterministic datagen corpus: batch 1 cold
(populates the stored analytics), batch 2 warm (MOR graph merge +
warm-start PageRank + touched-component LPA).  The gates:

* community labels after the warm refresh EQUAL a cold full-graph LPA
  over the final graph, row-for-row (the incremental exactness
  theorem, now exercised through the STORED label/component tables);
* warm-start PageRank at `pagerank_iters_warm` is CLOSER to the
  converged fixed point than a cold uniform start given the same
  iteration budget (the reason the warm path exists);
* the stored analytics tables round-trip (next batch reads them),
  and the refresh log accumulates one row per batch.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark import datagen
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.plans import (
    pipeline,
    queries,
    refresh,
)
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import (
    ParquetCatalog,
)


@pytest.fixture(scope="module")
def two_batch_state(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("refresh")
    pages = datagen.pages_df(spark, 100)
    cutoff = (
        pages.select(F.col("warc_ts").cast("long").alias("t"))
        .orderBy("t")
        .collect()[79]["t"]
    )
    batch1 = pages.where(F.col("warc_ts").cast("long") <= cutoff)

    inc_cat = ParquetCatalog(str(root / "inc"))
    r1 = refresh.refresh_after_batch(
        spark, batch1, inc_cat, extract_from_html=True
    )
    # batch 2: the full table — the checkpoint high-water mark must
    # reduce it to the 20 unseen pages
    r2 = refresh.refresh_after_batch(
        spark, pages, inc_cat, extract_from_html=True
    )

    cold_cat = ParquetCatalog(str(root / "cold"))
    pipeline.run_pipeline(
        spark, pages, cold_cat, extract_from_html=True, incremental=False
    )
    yield spark, inc_cat, cold_cat, r1, r2
    shutil.rmtree(str(root), ignore_errors=True)


def _und(spark, cat):
    return (
        queries.undirected_concept_edges(cat.read(spark, "edges"))
        .select("cid", "nbr_id")
        .distinct()
    )


class TestRefreshAfterBatch:
    def test_batch_accounting(self, two_batch_state):
        _, _, _, r1, r2 = two_batch_state
        assert r1.pipeline.pages == 80 and not r1.warm_start
        assert r2.pipeline.pages == 20 and r2.warm_start

    def test_incremental_labels_equal_cold_rebuild(self, two_batch_state):
        spark, inc_cat, cold_cat, _, _ = two_batch_state
        stored = {
            (r["id"], r["label"])
            for r in inc_cat.read(spark, refresh.LABELS_TABLE).collect()
        }
        cold = {
            (r["id"], r["label"])
            for r in queries.label_propagation(
                _und(spark, cold_cat), iters=5
            ).collect()
        }
        assert stored == cold

    def test_warm_pagerank_beats_cold_at_same_budget(self, two_batch_state):
        spark, inc_cat, cold_cat, _, _ = two_batch_state
        und = _und(spark, cold_cat).localCheckpoint(eager=True)
        conv = {
            r["id"]: r["rank"]
            for r in queries.pagerank_und(
                und, iters=40, top_k=None, prepared=True
            ).collect()
        }
        warm = {
            r["id"]: r["rank"]
            for r in inc_cat.read(spark, refresh.PR_TABLE).collect()
        }
        cold3 = {
            r["id"]: r["rank"]
            for r in queries.pagerank_und(
                und, iters=3, top_k=None, prepared=True
            ).collect()
        }
        assert set(warm) == set(conv)
        warm_err = sum(abs(warm[i] - conv[i]) for i in conv)
        cold_err = sum(abs(cold3[i] - conv[i]) for i in conv)
        assert warm_err < cold_err, (warm_err, cold_err)

    def test_incremental_components_equal_cold_cc(self, two_batch_state):
        """The stored component index is maintained incrementally (CC
        over delta edges + touched-component mapping edges); it must
        equal a cold full-graph connected_components run."""
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import (
            canonicalize,
        )

        spark, inc_cat, cold_cat, _, _ = two_batch_state
        stored = {
            (r["id"], r["component"])
            for r in inc_cat.read(spark, refresh.COMP_TABLE).collect()
        }
        cold = {
            (r["id"], r["component"])
            for r in canonicalize.connected_components(
                _und(spark, cold_cat), src="cid", dst="nbr_id"
            ).collect()
        }
        assert stored == cold

    def test_graph_tables_match_cold_rebuild(self, two_batch_state):
        spark, inc_cat, cold_cat, _, _ = two_batch_state
        inc = {
            tuple(r)
            for r in _und(spark, inc_cat).collect()
        }
        cold = {
            tuple(r)
            for r in _und(spark, cold_cat).collect()
        }
        assert inc == cold

    def test_refresh_log_accumulates(self, two_batch_state):
        spark, inc_cat, _, _, _ = two_batch_state
        log = inc_cat.read(spark, refresh.REFRESH_LOG_TABLE).orderBy(
            "snapshot_id"
        ).collect()
        assert len(log) == 2
        assert [r["warm_start"] for r in log] == [False, True]
        assert [r["pages"] for r in log] == [80, 20]
