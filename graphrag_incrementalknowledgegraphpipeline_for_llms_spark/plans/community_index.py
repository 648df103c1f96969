"""Catalog-backed incremental community index.

The GraphRAG community structure (LPA labels + component index) is a
derived view of the edge table — and at 10^12 documents it cannot be
rebuilt per ingest batch.  This module maintains it the same way the
graph itself is maintained (MERGE deltas): per batch it

1. canonicalizes the batch's pairs and looks up which stored
   COMPONENTS any batch endpoint touches (broadcast semi-join against
   the component index — components only ever MERGE under edge
   inserts, so the touched-components union plus brand-new nodes is
   exactly the set whose labels can change);
2. carves the affected subgraph (stored edges of touched components —
   component-closed, so one semi-join — plus the batch edges);
3. re-runs synchronous LPA and connected components ON THAT SUBGRAPH
   ONLY — O(touched), not O(graph);
4. MERGEs refreshed labels/components and the new edges back into
   their catalog tables.

Exactness: synchronous LPA and CC are pure functions of each
component's edge set (see
:func:`queries.incremental_label_propagation`), so after any batch
sequence the stored tables equal a from-scratch rebuild row-for-row —
pinned by tests/test_community_index.py across merge / attach /
new-component / replay batch shapes, and by the driver's
``kg_incremental_communities`` key graded against the full-graph LPA
oracle.

State tables (all plain catalog tables — snapshot-isolated, time
travelable, MERGE semantics shared with nodes/edges):

* ``_comm_edges``      (u, v)            canonical undirected edges
* ``_comm_components`` (id, component)   min-id component index
* ``_comm_labels``     (id, label)       LPA labels
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import canonicalize
from ..sources.catalog import ParquetCatalog
from . import queries as q

EDGES_TABLE = "_comm_edges"
COMP_TABLE = "_comm_components"
LABELS_TABLE = "_comm_labels"


def _canon_pairs(und: DataFrame) -> DataFrame:
    """Symmetric/raw (cid, nbr_id) view -> canonical distinct (u, v)
    with u < v; self-loops dropped."""
    return (
        und.select(
            F.least("cid", "nbr_id").alias("u"),
            F.greatest("cid", "nbr_id").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _sym(pairs: DataFrame) -> DataFrame:
    return pairs.select(
        F.col("u").alias("cid"), F.col("v").alias("nbr_id")
    ).unionByName(pairs.select(F.col("v").alias("cid"), F.col("u").alias("nbr_id")))


def refresh_communities(
    spark: SparkSession,
    catalog: ParquetCatalog,
    batch_und: DataFrame,
    iters: int = 5,
) -> DataFrame:
    """Fold one batch of co-occurrence edges into the stored community
    index, recomputing only delta-touched components.  Returns the
    refreshed (id, label) rows (the changed subset; the full index is
    ``catalog.read(spark, LABELS_TABLE)``)."""
    new = _canon_pairs(batch_und).localCheckpoint(eager=True)
    if not catalog.exists(EDGES_TABLE):
        labels = q.label_propagation(_sym(new), iters=iters)
        comp = canonicalize.connected_components(new, src="u", dst="v")
        catalog.overwrite(new, EDGES_TABLE)
        catalog.overwrite(labels, LABELS_TABLE)
        catalog.overwrite(comp, COMP_TABLE)
        return labels
    comp = catalog.read(spark, COMP_TABLE)
    batch_nodes = (
        new.select(F.col("u").alias("id"))
        .unionByName(new.select(F.col("v").alias("id")))
        .distinct()
    )
    # components only MERGE under inserts: every node whose label can
    # change sits in a component containing a batch endpoint, or is new
    affected = comp.join(batch_nodes, "id").select("component").distinct()
    refresh_ids = (
        comp.join(F.broadcast(affected), "component")
        .select("id")
        .unionByName(batch_nodes)
        .distinct()
    )
    stored = catalog.read(spark, EDGES_TABLE)
    # affected components are edge-closed: u in the set iff v is
    sub = (
        stored.join(refresh_ids.withColumnRenamed("id", "u"), "u")
        .select("u", "v")
        .unionByName(new)
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels_new = q.label_propagation(_sym(sub), iters=iters)
    comp_new = canonicalize.connected_components(sub, src="u", dst="v")
    catalog.merge_upsert(spark, LABELS_TABLE, labels_new, keys=["id"])
    catalog.merge_upsert(spark, COMP_TABLE, comp_new, keys=["id"])
    catalog.merge_upsert(spark, EDGES_TABLE, new, keys=["u", "v"])
    return labels_new


def read_labels(spark: SparkSession, catalog: ParquetCatalog) -> DataFrame:
    """The full stored (id, label) community index."""
    return catalog.read(spark, LABELS_TABLE)
