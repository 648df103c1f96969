"""Graph MERGE semantics (G2/G3), pipeline e2e, incrementality,
lineage, byte-identity (SURVEY.md §5.2-5.4)."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark import datagen
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.functions import html as hf
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import graph
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.plans import pipeline

TS = datetime(2025, 6, 1, tzinfo=timezone.utc)


def _table(spark, catalog, name):
    df = catalog.read(spark, name)
    return sorted(tuple(r) for r in df.collect()) if df is not None else None


class TestMerge:
    def test_upsert_idempotent(self, spark, catalog):
        nodes = spark.createDataFrame(
            [("Concept", "id1", "lemma1", "s", "o", None, None, None, None, None, None)],
            graph.NODES_SCHEMA,
        )
        edges = spark.createDataFrame(
            [("Concept", "id1", "IS_A", "Concept", "id2", 0.9, "ev", TS)], graph.EDGES_SCHEMA
        )
        graph.upsert_graph(spark, catalog, nodes, edges)
        snap1 = (_table(spark, catalog, "nodes"), _table(spark, catalog, "edges"))
        graph.upsert_graph(spark, catalog, nodes, edges)
        snap2 = (_table(spark, catalog, "nodes"), _table(spark, catalog, "edges"))
        assert snap1 == snap2

    def test_last_write_wins(self, spark, catalog):
        n1 = spark.createDataFrame(
            [("Concept", "id1", "old", "s", "o", None, None, None, None, None, None)],
            graph.NODES_SCHEMA,
        )
        catalog.merge_upsert(spark, "nodes", n1, keys=["label", "id"])
        n2 = n1.withColumn("lemma", F.lit("new"))
        catalog.merge_upsert(spark, "nodes", n2, keys=["label", "id"])
        rows = catalog.read(spark, "nodes").collect()
        assert len(rows) == 1 and rows[0]["lemma"] == "new"

    def test_edge_before_node_placeholder_then_backfill(self, spark, catalog):
        edges = spark.createDataFrame(
            [("Concept", "a", "RELATED_TO", "Concept", "b", 0.7, "ev", TS)], graph.EDGES_SCHEMA
        )
        graph.upsert_graph(spark, catalog, nodes=None, edges=edges)
        nodes = {r["id"]: r for r in catalog.read(spark, "nodes").collect()}
        assert set(nodes) == {"a", "b"}
        assert nodes["a"]["lemma"] is None  # placeholder
        real = spark.createDataFrame(
            [("Concept", "a", "lemma_a", "s", "o", None, None, None, None, None, None)],
            graph.NODES_SCHEMA,
        )
        graph.upsert_graph(spark, catalog, nodes=real, edges=None)
        nodes2 = {r["id"]: r for r in catalog.read(spark, "nodes").collect()}
        assert nodes2["a"]["lemma"] == "lemma_a"  # backfilled
        assert nodes2["b"]["lemma"] is None

    def test_rel_sanitization(self, spark):
        df = spark.createDataFrame(
            [("x", "re-lated to!", "y", 0.9, "e", "c")],
            "subj_id string, predicate string, obj_id string, confidence double, evidence string, chunk_id string",
        )
        rows = graph.relation_edges(df, TS).collect()
        assert rows[0]["rel"] == "RE_LATED_TO_"

    def test_duplicate_source_keys_deduped(self, spark, catalog):
        edges = spark.createDataFrame(
            [
                ("Concept", "a", "IS_A", "Concept", "b", 0.7, "low", TS),
                ("Concept", "a", "IS_A", "Concept", "b", 0.9, "high", TS),
            ],
            graph.EDGES_SCHEMA,
        )
        catalog.merge_upsert(
            spark, "edges", edges, keys=graph.EDGE_KEY, tiebreak=["confidence", "updated_at"]
        )
        rows = catalog.read(spark, "edges").collect()
        assert len(rows) == 1 and rows[0]["confidence"] == 0.9  # max-confidence wins


class TestPipeline:
    def test_e2e_and_incremental_equivalence(self, spark, catalog, tmp_path):
        """run(A) then run(B incrementally) == run(A ∪ B) (FIXTURES.md §6)."""
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import (
            ParquetCatalog,
        )

        pages = datagen.pages_df(spark, 60)
        a = pages.orderBy("warc_ts").limit(42)
        r1 = pipeline.run_pipeline(spark, a, catalog, extract_from_html=True)
        assert r1.pages == 42
        r2 = pipeline.run_pipeline(spark, pages, catalog, extract_from_html=True)
        assert r2.pages == 18  # only the new ones

        full_cat = ParquetCatalog(str(tmp_path / "full"))
        pipeline.run_pipeline(spark, pages, full_cat, extract_from_html=True)

        for t in ["nodes", "edges", "mentions", "triples"]:
            assert _table(spark, catalog, t) == _table(spark, full_cat, t), t

    def test_mor_graph_mode_matches_cow(self, spark, tmp_path):
        """graph_mode="mor" (O(batch) delta appends) resolves to the
        same graph as cow full-rebuild: same total order (tiebreaks +
        content_rid) on both paths, so incremental-mor == full-cow;
        compaction folds the deltas without changing content."""
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import (
            ParquetCatalog,
        )

        pages = datagen.pages_df(spark, 60)
        a = pages.orderBy("warc_ts").limit(42)
        mor_cat = ParquetCatalog(str(tmp_path / "mor"))
        pipeline.run_pipeline(spark, a, mor_cat, extract_from_html=True, graph_mode="mor")
        pipeline.run_pipeline(spark, pages, mor_cat, extract_from_html=True, graph_mode="mor")
        assert mor_cat._delta_entries("edges")  # batches landed as deltas

        cow_cat = ParquetCatalog(str(tmp_path / "cow"))
        pipeline.run_pipeline(spark, pages, cow_cat, extract_from_html=True)

        def rows(cat, t, drop=()):
            df = cat.read(spark, t)
            for c in drop:
                df = df.drop(c)
            return sorted(tuple(r) for r in df.collect())

        assert rows(mor_cat, "nodes", drop=("_complete",)) == rows(cow_cat, "nodes")
        assert rows(mor_cat, "edges") == rows(cow_cat, "edges")
        before = rows(mor_cat, "edges")
        mor_cat.compact(spark, "edges")
        assert mor_cat._delta_entries("edges") == []
        assert rows(mor_cat, "edges") == before

    def test_recrawl_identical_pages_no_duplicates(self, spark, catalog):
        """FIXTURES.md §6 re-crawl scenario: identical pages with a
        NEWER warc_ts pass the high-water-mark filter but must not
        duplicate flat-table rows (chunk anti-join)."""
        pages = datagen.pages_df(spark, 30)
        r1 = pipeline.run_pipeline(spark, pages, catalog, extract_from_html=True)
        snap = {t: _table(spark, catalog, t) for t in ["mentions", "triples", "nodes", "edges"]}
        recrawl = pages.withColumn(
            "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 30 DAYS")
        )
        r2 = pipeline.run_pipeline(spark, recrawl, catalog, extract_from_html=True)
        assert r2.pages == 0  # all chunks known -> nothing re-extracted
        for t, before in snap.items():
            assert _table(spark, catalog, t) == before, t

    def test_lineage_written(self, spark, catalog):
        pages = datagen.pages_df(spark, 20)
        pipeline.run_pipeline(spark, pages, catalog)
        lineage = catalog.read(spark, "lineage")
        rows = lineage.collect()
        assert len(rows) >= 1
        assert sum(r["chunk_cnt"] for r in rows) == 20
        cols = set(lineage.columns)
        assert {"snapshot_id", "partition_id", "url_min", "url_max", "chunk_cnt",
                "mention_cnt", "triple_cnt"} <= cols

    def test_byte_identity_all_urls(self, spark):
        """north_rule gate: html->text is byte-identical per url."""
        pages = datagen.pages_df(spark, 100)
        report = hf.text_identity_report(pages)
        assert report.where(~F.col("ok")).count() == 0

    def test_chunk_ids_stable_sql_vs_python(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.functions import (
            purecore as p,
        )

        pages = datagen.pages_df(spark, 10)
        rows = pipeline.chunks_from_pages(pages).select("doc_id", "chunk_id", "text").collect()
        for r in rows:
            assert r["chunk_id"] == p.chunk_id_for(r["doc_id"], r["text"])


class TestBucketedMerge:
    """Bucket-pruned copy-on-write MERGE (catalog._commit_bucketed)."""

    def test_untouched_buckets_keep_their_data_dir(self, spark, catalog):
        import json, os

        rows = [(f"k{i}", f"v{i}") for i in range(200)]
        df = spark.createDataFrame(rows, "id string, val string")
        catalog.merge_upsert(spark, "t", df, keys=["id"], buckets=8)
        m1 = catalog._manifest("t", catalog.current_version("t"))["buckets"]
        assert set(m1.values()) == {"d00001"} and len(m1) == 8

        upd = spark.createDataFrame([("k0", "NEW")], "id string, val string")
        catalog.merge_upsert(spark, "t", upd, keys=["id"])
        m2 = catalog._manifest("t", catalog.current_version("t"))["buckets"]
        # exactly one bucket rewritten; the other 7 still point at d00001
        assert sorted(set(m2.values())) == ["d00001", "d00002"]
        assert sum(1 for v in m2.values() if v == "d00002") == 1

        got = {r["id"]: r["val"] for r in catalog.read(spark, "t").collect()}
        assert len(got) == 200 and got["k0"] == "NEW" and got["k1"] == "v1"

    def test_bucketed_read_after_many_merges(self, spark, catalog):
        df = spark.createDataFrame([(f"k{i}", i) for i in range(50)], "id string, v long")
        catalog.merge_upsert(spark, "t2", df, keys=["id"], buckets=4)
        for step in range(3):
            upd = spark.createDataFrame([(f"k{step}", 100 + step)], "id string, v long")
            catalog.merge_upsert(spark, "t2", upd, keys=["id"])
        got = {r["id"]: r["v"] for r in catalog.read(spark, "t2").collect()}
        assert len(got) == 50
        assert got["k0"] == 100 and got["k1"] == 101 and got["k2"] == 102 and got["k5"] == 5

    def test_bucketed_rejects_late_spec(self, spark, catalog):
        df = spark.createDataFrame([("a", 1)], "id string, v long")
        catalog.merge_upsert(spark, "t3", df, keys=["id"])  # unbucketed
        with pytest.raises(ValueError):
            catalog.merge_upsert(spark, "t3", df, keys=["id"], buckets=4)


class TestCatalogMaintenance:
    def test_compact_append_table(self, spark, catalog):
        import glob as g
        import os

        for i in range(4):
            df = spark.createDataFrame([(i, f"v{i}")], "id long, val string")
            catalog.append(spark, df, "t_app")
        before = sorted(tuple(r) for r in catalog.read(spark, "t_app").collect())
        assert len(catalog.data_dirs("t_app")) == 4
        catalog.compact(spark, "t_app")
        assert len(catalog.data_dirs("t_app")) == 1
        after = sorted(tuple(r) for r in catalog.read(spark, "t_app").collect())
        assert after == before

    def test_compact_bucketed_table(self, spark, catalog):
        df = spark.createDataFrame([(f"k{i}", i) for i in range(40)], "id string, v long")
        catalog.merge_upsert(spark, "t_b", df, keys=["id"], buckets=4)
        for i in range(3):
            upd = spark.createDataFrame([(f"k{i}", 100 + i)], "id string, v long")
            catalog.merge_upsert(spark, "t_b", upd, keys=["id"])
        m = catalog._manifest("t_b", catalog.current_version("t_b"))["buckets"]
        assert len(set(m.values())) > 1  # fragmented across commit dirs
        catalog.compact(spark, "t_b")
        m2 = catalog._manifest("t_b", catalog.current_version("t_b"))["buckets"]
        assert len(set(m2.values())) == 1  # one consolidated dir
        got = {r["id"]: r["v"] for r in catalog.read(spark, "t_b").collect()}
        assert len(got) == 40 and got["k0"] == 100 and got["k5"] == 5
        # spec survives compaction: further merges stay bucket-pruned
        catalog.merge_upsert(
            spark, "t_b",
            spark.createDataFrame([("k9", 999)], "id string, v long"), keys=["id"],
        )
        assert catalog.read(spark, "t_b").where("id='k9'").collect()[0]["v"] == 999

    def test_expire_snapshots(self, spark, catalog):
        import glob as g
        import os

        for i in range(5):
            df = spark.createDataFrame([(i,)], "id long")
            catalog.append(spark, df, "t_exp")
        assert catalog.current_version("t_exp") == 5
        removed = catalog.expire_snapshots("t_exp", keep_last=2)
        assert removed == [1, 2, 3]
        manifests = g.glob(os.path.join(catalog._tdir("t_exp"), "m*.json"))
        assert len(manifests) == 2
        assert catalog.read(spark, "t_exp").count() == 5  # current snapshot intact


class TestDedupPages:
    def test_mirrored_payloads_extract_once(self, spark, tmp_path):
        """Identical payloads under different urls (mirror hosting)
        collapse to the min-url copy before extraction; the resulting
        graph is identical to running on the originals alone."""
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark import datagen
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.plans import pipeline
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import (
            ParquetCatalog,
        )
        from pyspark.sql import functions as F

        pages = datagen.pages_df(spark, 20)
        mirrored = pages.withColumn("url", F.concat(F.lit("zz-mirror/"), F.col("url")))

        cat_a = ParquetCatalog(str(tmp_path / "a"))
        ra = pipeline.run_pipeline(spark, pages, cat_a, extract_from_html=True)

        cat_b = ParquetCatalog(str(tmp_path / "b"))
        rb = pipeline.run_pipeline(
            spark,
            pages.unionByName(mirrored),
            cat_b,
            extract_from_html=True,
            dedup_pages=True,
        )
        assert rb.pages == ra.pages == 20
        for t in ["nodes", "edges", "triples"]:
            a = sorted(tuple(r) for r in cat_a.read(spark, t).collect())
            b = sorted(tuple(r) for r in cat_b.read(spark, t).collect())
            assert a == b, t


class TestUrlDedupInPipeline:
    def test_spelling_variants_extract_once_latest_wins(self, spark, tmp_path):
        """url_dedup=True collapses crawl-spelling variants of the same
        fetch before extraction, keeping the LATEST crawl — the graph
        equals running on just the winning spellings."""
        from datetime import datetime, timezone

        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.functions import purecore
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.plans import pipeline
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import (
            ParquetCatalog,
        )

        def row(url, day, text):
            return (
                url,
                datetime(2025, 1, day, tzinfo=timezone.utc),
                purecore.render_html(text),
                text,
                "en",
            )

        schema = "url string, warc_ts timestamp, html binary, text string, lang string"
        # same canonical page crawled 3 ways; the day-3 re-crawl wins
        variants = spark.createDataFrame(
            [
                row("https://example.com/p?utm_source=x", 1, "Apache Spark is a Query Engine."),
                row("https://WWW.example.com/p", 3, "Apache Spark is a Data Pipeline."),
                row("https://example.com/p/", 2, "Apache Spark is a Graph Database."),
                row("https://example.com/other", 1, "Neural Network causes Language Model."),
            ],
            schema,
        )
        winners = spark.createDataFrame(
            [
                row("https://WWW.example.com/p", 3, "Apache Spark is a Data Pipeline."),
                row("https://example.com/other", 1, "Neural Network causes Language Model."),
            ],
            schema,
        )
        cat_a = ParquetCatalog(str(tmp_path / "a"))
        ra = pipeline.run_pipeline(
            spark, variants, cat_a, extract_from_html=True, url_dedup=True
        )
        cat_b = ParquetCatalog(str(tmp_path / "b"))
        rb = pipeline.run_pipeline(spark, winners, cat_b, extract_from_html=True)
        assert ra.pages == rb.pages == 2
        for t in ["nodes", "edges", "triples"]:
            a = sorted(tuple(r) for r in cat_a.read(spark, t).collect())
            b = sorted(tuple(r) for r in cat_b.read(spark, t).collect())
            assert a == b, t


class TestIntEncode:
    def _graph(self, spark):
        nodes = spark.createDataFrame(
            [
                ("Concept", "c2", "beta", "s", "o", None, None, None, None, None, None),
                ("Concept", "c1", "alpha", "s", "o", None, None, None, None, None, None),
                ("Chunk", "k1", None, None, None, "d1", "txt", None, None, None, None),
            ],
            graph.NODES_SCHEMA,
        )
        edges = spark.createDataFrame(
            [
                ("Chunk", "k1", "MENTIONS", "Concept", "c1", None, None, TS),
                ("Concept", "c1", "IS_A", "Concept", "c2", 0.9, "ev", TS),
                ("Concept", "c1", "IS_A", "Concept", "missing", 0.9, "ev", TS),
            ],
            graph.EDGES_SCHEMA,
        )
        return nodes, edges

    def test_dense_ids_and_remap(self, spark):
        nodes, edges = self._graph(spark)
        node_map, int_edges = graph.encode_graph_ints(nodes, edges)
        m = {(r["label"], r["id"]): r["int_id"] for r in node_map.collect()}
        # contiguous 0..n-1, assigned by (label, id) sort order
        assert sorted(m.values()) == [0, 1, 2]
        assert m[("Chunk", "k1")] == 0  # 'Chunk' < 'Concept'
        assert m[("Concept", "c1")] == 1 and m[("Concept", "c2")] == 2
        got = {(r["src"], r["dst"], r["rel"]) for r in int_edges.collect()}
        # the dangling-endpoint edge is dropped (inner join)
        assert got == {(0, 1, "MENTIONS"), (1, 2, "IS_A")}

    def test_deterministic_across_runs(self, spark):
        nodes, edges = self._graph(spark)
        a = graph.encode_graph_ints(nodes.repartition(5), edges)[0].collect()
        b = graph.encode_graph_ints(nodes.coalesce(1), edges)[0].collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_export_graph_roundtrip(self, spark, catalog, tmp_path):
        nodes, edges = self._graph(spark)
        graph.upsert_graph(spark, catalog, nodes, edges)
        out = str(tmp_path / "export")
        summary = graph.export_graph(spark, catalog, out)
        nm = spark.read.parquet(out + "/node_map.parquet")
        ie = spark.read.parquet(out + "/edges_int.parquet")
        # placeholder backfill added the 'missing' endpoint node, so
        # all three edges survive the remap and ids are 0..3
        assert summary["nodes"] == nm.count() == 4
        assert summary["edges"] == ie.count() == 3
        assert set(nm.columns) == {"int_id", "label", "id", "lemma"}
        assert sorted(r["int_id"] for r in nm.collect()) == [0, 1, 2, 3]
        lem = {r["id"]: r["lemma"] for r in nm.collect()}
        assert lem["c1"] == "alpha" and lem["missing"] is None
