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
