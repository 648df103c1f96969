"""Catalog-backed incremental community index == from-scratch rebuild.

Every batch shape the component-touch rule must survive: intra-
component edges, component merges, new nodes attached to old
components, brand-new components, duplicate edges, and full replay.
After each fold the stored labels/components tables must equal a
from-scratch LPA/CC over the union of all edges so far.
"""

import pytest
from pyspark.sql import functions as F

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import canonicalize
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.plans import (
    community_index as ci,
)
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.plans import queries as q
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import (
    ParquetCatalog,
)


def _und(spark, pairs):
    df = spark.createDataFrame(pairs, "cid string, nbr_id string")
    return df.unionByName(
        df.select(F.col("nbr_id").alias("cid"), F.col("cid").alias("nbr_id"))
    )


def _full_labels(spark, all_pairs):
    return {
        (r["id"], r["label"])
        for r in q.label_propagation(_und(spark, all_pairs), iters=5).collect()
    }


def _stored_labels(spark, cat):
    return {
        (r["id"], r["label"]) for r in ci.read_labels(spark, cat).collect()
    }


BATCH1 = [
    ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
    ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
    ("d1", "d2"), ("d2", "d3"), ("d1", "d3"),
]
BATCH2 = [
    ("a3", "b1"),          # merges A and B
    ("d1", "d2"),          # duplicate of a stored edge
    ("n1", "n2"),          # brand-new component
]
BATCH3 = [
    ("d3", "n1"),          # merges D with the new component
    ("c1", "c2"), ("c2", "c3"),  # another new component
]


def test_incremental_index_equals_full_rebuild(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path / "cat"))
    seen = []
    for batch in (BATCH1, BATCH2, BATCH3):
        ci.refresh_communities(spark, cat, _und(spark, batch), iters=5)
        seen += batch
        assert _stored_labels(spark, cat) == _full_labels(spark, seen)
    # component index equals full CC too
    full_cc = {
        (r["id"], r["component"])
        for r in canonicalize.connected_components(
            ci._canon_pairs(_und(spark, seen)), src="u", dst="v"
        ).collect()
    }
    stored_cc = {
        (r["id"], r["component"])
        for r in cat.read(spark, ci.COMP_TABLE).collect()
    }
    assert stored_cc == full_cc


def test_replay_is_idempotent(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path / "cat"))
    ci.refresh_communities(spark, cat, _und(spark, BATCH1), iters=5)
    ci.refresh_communities(spark, cat, _und(spark, BATCH2), iters=5)
    before = _stored_labels(spark, cat)
    ci.refresh_communities(spark, cat, _und(spark, BATCH2), iters=5)  # replay
    assert _stored_labels(spark, cat) == before
    assert cat.count(ci.EDGES_TABLE) == len(set(BATCH1 + BATCH2))


def test_untouched_component_not_rewritten(spark, tmp_path):
    """A batch touching only component A must return refreshed rows
    for A's component only — D's nodes are reused, not recomputed."""
    cat = ParquetCatalog(str(tmp_path / "cat"))
    ci.refresh_communities(spark, cat, _und(spark, BATCH1), iters=5)
    refreshed = ci.refresh_communities(
        spark, cat, _und(spark, [("a1", "a4")]), iters=5
    )
    ids = {r["id"] for r in refreshed.collect()}
    assert ids == {"a1", "a2", "a3", "a4"}
    assert _stored_labels(spark, cat) == _full_labels(
        spark, BATCH1 + [("a1", "a4")]
    )
