"""Snapshot time travel, schema evolution, incremental view
maintenance."""

import pytest
from pyspark.sql import functions as F

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.plans import ivm
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import (
    ParquetCatalog,
)


def _df(spark, rows, schema="k long, v double"):
    return spark.createDataFrame(rows, schema)


class TestTimeTravel:
    def test_read_as_of_each_version(self, spark, tmp_path):
        cat = ParquetCatalog(str(tmp_path))
        v1 = cat.append(spark, _df(spark, [(1, 1.0)]), "t")
        v2 = cat.append(spark, _df(spark, [(2, 2.0)]), "t")
        v3 = cat.append(spark, _df(spark, [(3, 3.0)]), "t")
        assert cat.read_as_of(spark, "t", v1).count() == 1
        assert cat.read_as_of(spark, "t", v2).count() == 2
        assert sorted(r["k"] for r in cat.read_as_of(spark, "t", v3).collect()) == [1, 2, 3]

    def test_as_of_mor_resolves_that_versions_deltas(self, spark, tmp_path):
        cat = ParquetCatalog(str(tmp_path))
        base = _df(spark, [(1, 1.0), (2, 2.0)], "k long, v double")
        v1 = cat.merge_upsert_mor(spark, "t", base, keys=["k"])
        v2 = cat.merge_upsert_mor(spark, "t", _df(spark, [(2, 9.0)]), keys=["k"])
        # as-of v1: the original value; as-of v2: the delta wins
        assert {(r["k"], r["v"]) for r in cat.read_as_of(spark, "t", v1).collect()} == {
            (1, 1.0),
            (2, 2.0),
        }
        assert {(r["k"], r["v"]) for r in cat.read_as_of(spark, "t", v2).collect()} == {
            (1, 1.0),
            (2, 9.0),
        }

    def test_unknown_version_raises(self, spark, tmp_path):
        cat = ParquetCatalog(str(tmp_path))
        cat.append(spark, _df(spark, [(1, 1.0)]), "t")
        with pytest.raises(KeyError):
            cat.read_as_of(spark, "t", 99)


class TestSchemaEvolution:
    def test_added_column_null_fills_old_rows(self, spark, tmp_path):
        cat = ParquetCatalog(str(tmp_path))
        cat.append(spark, _df(spark, [(1, 1.0)]), "t")
        cat.append(
            spark,
            spark.createDataFrame([(2, 2.0, "en")], "k long, v double, lang string"),
            "t",
        )
        out = cat.read(spark, "t", merge_schema=True)
        assert "lang" in out.columns
        got = {(r["k"], r["lang"]) for r in out.collect()}
        assert got == {(1, None), (2, "en")}


class TestIvm:
    def test_incremental_matches_full_recompute(self, spark, tmp_path):
        cat = ParquetCatalog(str(tmp_path))
        cat.append(spark, _df(spark, [(1, 1.0), (1, 2.0), (2, 3.0)]), "facts")
        assert ivm.refresh(spark, cat, "facts", "by_k", ["k"], "v") > 0
        cat.append(spark, _df(spark, [(2, 5.0), (3, 7.0)]), "facts")
        cat.append(spark, _df(spark, [(1, 10.0)]), "facts")
        assert ivm.refresh(spark, cat, "facts", "by_k", ["k"], "v") == 2

        got = {
            (r["k"], r["cnt"], r["sum_value"])
            for r in ivm.read_view(spark, cat, "by_k").collect()
        }
        full = {
            (r["k"], r["cnt"], r["sum_value"])
            for r in cat.read(spark, "facts")
            .groupBy("k")
            .agg(F.count("*").alias("cnt"), F.sum("v").alias("sum_value"))
            .collect()
        }
        assert got == full

    def test_refresh_is_idempotent(self, spark, tmp_path):
        cat = ParquetCatalog(str(tmp_path))
        cat.append(spark, _df(spark, [(1, 1.0)]), "facts")
        ivm.refresh(spark, cat, "facts", "by_k", ["k"], "v")
        assert ivm.refresh(spark, cat, "facts", "by_k", ["k"], "v") == 0

    def test_rewrite_triggers_rebuild(self, spark, tmp_path):
        cat = ParquetCatalog(str(tmp_path))
        cat.append(spark, _df(spark, [(1, 1.0), (2, 2.0)]), "facts")
        ivm.refresh(spark, cat, "facts", "by_k", ["k"], "v")
        cat.compact(spark, "facts")  # rewrite: no new-data delta
        cat.append(spark, _df(spark, [(3, 3.0)]), "facts")
        ivm.refresh(spark, cat, "facts", "by_k", ["k"], "v")
        got = {(r["k"], r["cnt"]) for r in ivm.read_view(spark, cat, "by_k").collect()}
        assert got == {(1, 1), (2, 1), (3, 1)}

    def test_mor_source_rebuilds_not_folds(self, spark, tmp_path):
        # regression: a merge_upsert_mor commit is a manifest-APPEND
        # whose rows REPLACE existing keys; folding it as an insert
        # delta double-counts the replaced rows.  MOR sources must
        # rebuild from the resolved table.
        cat = ParquetCatalog(str(tmp_path))
        rows = [(1, "a", 1.0), (2, "b", 2.0)]
        cat.merge_upsert_mor(
            spark,
            "m",
            spark.createDataFrame(rows, "k long, val string, v double"),
            keys=["k"],
        )
        ivm.refresh(spark, cat, "m", "by_k_mor", ["k"], "v")
        # replace k=2 and add k=3 via a MOR delta append
        cat.merge_upsert_mor(
            spark,
            "m",
            spark.createDataFrame(
                [(2, "B9", 9.0), (3, "c", 3.0)], "k long, val string, v double"
            ),
            keys=["k"],
        )
        ivm.refresh(spark, cat, "m", "by_k_mor", ["k"], "v")
        got = {
            (r["k"], r["cnt"], r["sum_value"])
            for r in ivm.read_view(spark, cat, "by_k_mor").collect()
        }
        # folding-as-insert would report (2, 2, 11.0); rebuild gives the truth
        assert got == {(1, 1, 1.0), (2, 1, 9.0), (3, 1, 3.0)}


class TestWriteSortOrder:
    def test_sorted_write_gives_disjoint_file_ranges(self, spark, tmp_path):
        """sort_cols range-partitions + sorts the write so file-level
        min/max stats are narrow and (mostly) disjoint — the parquet
        row-group skipping precondition.  Asserted from the footers."""
        import glob as _glob

        import pyarrow.parquet as pq

        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import (
            ParquetCatalog,
        )

        df = spark.range(100_000).select(
            (F.col("id") * 37 % 100_000).alias("k"), F.col("id").alias("v")
        )
        cat = ParquetCatalog(str(tmp_path))
        cat.overwrite(df, "plain")
        cat.overwrite(df, "sorted", sort_cols=["k"])

        def ranges(table):
            out = []
            for d in cat.data_dirs(table):
                for f in _glob.glob(f"{d}/*.parquet"):
                    md = pq.ParquetFile(f).metadata
                    for rg in range(md.num_row_groups):
                        col = md.row_group(rg).column(0)  # k
                        out.append((col.statistics.min, col.statistics.max))
            return out

        def overlap_frac(rs):
            rs = sorted(rs)
            ov = sum(1 for (a, b), (c, d) in zip(rs, rs[1:]) if c <= b)
            return ov / max(1, len(rs) - 1)

        assert overlap_frac(ranges("sorted")) == 0.0  # disjoint ranges
        assert overlap_frac(ranges("plain")) > 0.5  # hash layout overlaps
        # narrow range predicate touches exactly one sorted file range
        lo, hi = 500, 600
        touched = [r for r in ranges("sorted") if not (r[1] < lo or r[0] > hi)]
        assert len(touched) == 1
        # and the data is unchanged
        assert cat.read(spark, "sorted").where(
            (F.col("k") >= lo) & (F.col("k") <= hi)
        ).count() == df.where((F.col("k") >= lo) & (F.col("k") <= hi)).count()


class TestAnalyze:
    def test_stats_one_pass(self, spark, tmp_path):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import (
            ParquetCatalog,
        )

        cat = ParquetCatalog(str(tmp_path))
        rows = [(i % 10, None if i % 5 == 0 else float(i)) for i in range(1000)]
        cat.append(spark, spark.createDataFrame(rows, "k long, v double"), "t")
        stats = cat.analyze(spark, "t")
        assert stats["rows"] == 1000
        assert stats["columns"]["v"]["null_count"] == 200
        assert abs(stats["columns"]["k"]["ndv_est"] - 10) <= 1
        # persisted, stamped with the snapshot it describes
        again = cat.table_stats("t")
        assert again == stats and again["version"] == cat.current_version("t")
        # staleness is detectable after another append
        cat.append(spark, spark.createDataFrame([(99, 1.0)], "k long, v double"), "t")
        assert cat.table_stats("t")["version"] < cat.current_version("t")


class TestGraphDiff:
    def _node(self, id_, surface):
        return ("Concept", id_, id_, surface, "NER", None, None, None, None, None, None)

    def _edge(self, a, b, conf):
        import datetime

        ts = datetime.datetime(2024, 1, 1)
        return ("Concept", a, "RELATED_TO", "Concept", b, conf, "ev", ts)

    def test_added_removed_changed(self, spark, tmp_path):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import graph

        cat = ParquetCatalog(str(tmp_path))
        nodes1 = spark.createDataFrame([self._node("a", "A"), self._node("b", "B")], graph.NODES_SCHEMA)
        edges1 = spark.createDataFrame([self._edge("a", "b", 0.7)], graph.EDGES_SCHEMA)
        graph.upsert_graph(spark, cat, nodes=nodes1, edges=edges1)
        v1 = cat.current_version("nodes")
        # v2: node c added, node b's surface changed, edge confidence bumped
        nodes2 = spark.createDataFrame([self._node("b", "B2"), self._node("c", "C")], graph.NODES_SCHEMA)
        edges2 = spark.createDataFrame(
            [self._edge("a", "b", 0.9), self._edge("b", "c", 0.8)], graph.EDGES_SCHEMA
        )
        graph.upsert_graph(spark, cat, nodes=nodes2, edges=edges2)
        v2 = cat.current_version("nodes")
        got = {
            (r["kind"], r["change"], r["key"])
            for r in graph.graph_diff(spark, cat, v1, v2).collect()
        }
        assert ("node", "added", "Concept|c") in got
        assert ("node", "changed", "Concept|b") in got
        assert ("edge", "added", "Concept|b|RELATED_TO|Concept|c") in got
        assert ("edge", "changed", "Concept|a|RELATED_TO|Concept|b") in got
        assert not any(c == "removed" for _, c, _ in got)
        assert not any(k == "node" and key == "Concept|a" for k, _, key in got)
        # reverse direction flips added <-> removed
        rev = {
            (r["change"], r["key"])
            for r in graph.graph_diff(spark, cat, v2, v1).collect()
        }
        assert ("removed", "Concept|c") in rev

    def test_identical_versions_empty(self, spark, tmp_path):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import graph

        cat = ParquetCatalog(str(tmp_path))
        nodes1 = spark.createDataFrame([self._node("a", "A")], graph.NODES_SCHEMA)
        edges1 = spark.createDataFrame([self._edge("a", "a2", 0.7)], graph.EDGES_SCHEMA)
        graph.upsert_graph(spark, cat, nodes=nodes1, edges=edges1)
        v = cat.current_version("nodes")
        assert graph.graph_diff(spark, cat, v, v).count() == 0


class TestIncrementalDegreeView:
    """O(delta) maintenance of graph degree counts via the generic IVM
    machinery — the incremental-graph-analytics story: after each edge
    batch, per-node degree (and thus degree histograms / avg degree)
    refreshes from the delta alone instead of rescanning the edge
    table."""

    def test_degree_view_tracks_appends(self, spark, tmp_path):
        cat = ParquetCatalog(str(tmp_path))
        e1 = _df(spark, [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string")
        cat.append(spark, e1, "uedges")
        folded = ivm.refresh(spark, cat, "uedges", "deg_view", ["src"])
        assert folded == 1
        deg = {r["src"]: r["cnt"] for r in ivm.read_view(spark, cat, "deg_view").collect()}
        assert deg == {"a": 2, "b": 1}
        # append a delta batch: only the delta folds
        e2 = _df(spark, [("a", "d"), ("d", "e")], "src string, dst string")
        cat.append(spark, e2, "uedges")
        assert ivm.refresh(spark, cat, "uedges", "deg_view", ["src"]) == 1
        deg2 = {r["src"]: r["cnt"] for r in ivm.read_view(spark, cat, "deg_view").collect()}
        assert deg2 == {"a": 3, "b": 1, "d": 1}
        # matches full recompute
        full = {
            r["src"]: r["cnt"]
            for r in cat.read(spark, "uedges").groupBy("src").agg(F.count("*").alias("cnt")).collect()
        }
        assert deg2 == full
        # idempotent when current
        assert ivm.refresh(spark, cat, "uedges", "deg_view", ["src"]) == 0


class TestIvmChangelogFold:
    """The changelog-fold rung (refresh ladder #2): with source_keys,
    merge/delete/MOR commits fold the signed snapshot_diff changelog
    instead of rebuilding.  Return-value discriminates the rungs:
    changelog returns cur - wm, rebuild returns cur."""

    def test_merge_source_folds_changelog_not_rebuild(self, spark, tmp_path):
        cat = ParquetCatalog(str(tmp_path))
        cat.append(spark, _df(spark, [(1, 1.0), (2, 2.0)]), "facts")
        ivm.refresh(spark, cat, "facts", "by_k", ["k"], "v", source_keys=["k"])
        # MERGE: update k=2, insert k=3 — a dir-rewriting commit
        cat.merge_upsert(spark, "facts", _df(spark, [(2, 9.0), (3, 3.0)]), ["k"])
        folded = ivm.refresh(
            spark, cat, "facts", "by_k", ["k"], "v", source_keys=["k"]
        )
        assert folded == 1  # cur - wm: the changelog rung, not rebuild (=2)
        got = {
            (r["k"], r["cnt"], r["sum_value"])
            for r in ivm.read_view(spark, cat, "by_k").collect()
        }
        assert got == {(1, 1, 1.0), (2, 1, 9.0), (3, 1, 3.0)}

    def test_emptied_group_leaves_the_view(self, spark, tmp_path):
        cat = ParquetCatalog(str(tmp_path))
        cat.append(spark, _df(spark, [(1, 1.0), (2, 2.0)]), "facts")
        ivm.refresh(spark, cat, "facts", "by_k", ["k"], "v", source_keys=["k"])
        cat.delete_keys(spark, "facts", spark.createDataFrame([(2,)], "k long"))
        folded = ivm.refresh(
            spark, cat, "facts", "by_k", ["k"], "v", source_keys=["k"]
        )
        assert folded == 1
        got = {(r["k"], r["cnt"]) for r in ivm.read_view(spark, cat, "by_k").collect()}
        assert got == {(1, 1)}  # group 2 reached cnt 0 and was dropped

    def test_mor_source_folds_with_keys(self, spark, tmp_path):
        # the counterpart of TestIvm.test_mor_source_rebuilds_not_folds:
        # with source_keys the MOR replace/tombstone semantics fold
        # exactly through the signed changelog
        cat = ParquetCatalog(str(tmp_path))
        cat.merge_upsert_mor(
            spark,
            "m",
            spark.createDataFrame(
                [(1, "a", 1.0), (2, "b", 2.0)], "k long, val string, v double"
            ),
            keys=["k"],
        )
        ivm.refresh(spark, cat, "m", "by_k_mor", ["k"], "v", source_keys=["k"])
        cat.merge_upsert_mor(
            spark,
            "m",
            spark.createDataFrame(
                [(2, "B9", 9.0), (3, "c", 3.0)], "k long, val string, v double"
            ),
            keys=["k"],
        )
        folded = ivm.refresh(
            spark, cat, "m", "by_k_mor", ["k"], "v", source_keys=["k"]
        )
        assert folded == 1  # changelog rung (rebuild would return 2)
        got = {
            (r["k"], r["cnt"], r["sum_value"])
            for r in ivm.read_view(spark, cat, "by_k_mor").collect()
        }
        assert got == {(1, 1, 1.0), (2, 1, 9.0), (3, 1, 3.0)}

    def test_without_keys_behavior_unchanged(self, spark, tmp_path):
        cat = ParquetCatalog(str(tmp_path))
        cat.append(spark, _df(spark, [(1, 1.0)]), "facts")
        ivm.refresh(spark, cat, "facts", "by_k", ["k"], "v")
        cat.merge_upsert(spark, "facts", _df(spark, [(1, 5.0)]), ["k"])
        folded = ivm.refresh(spark, cat, "facts", "by_k", ["k"], "v")
        assert folded == 2  # rebuild rung: returns cur
        got = {
            (r["k"], r["cnt"], r["sum_value"])
            for r in ivm.read_view(spark, cat, "by_k").collect()
        }
        assert got == {(1, 1, 5.0)}
