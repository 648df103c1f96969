"""Refresh-after-batch: the daily-delta entry point that ties the
engine's incremental pieces into ONE call.

A 100-TB GraphRAG deployment does not rebuild its graph or its
analytics when a new crawl lands; it runs, per batch:

1. the extraction pipeline in incremental mode with MOR graph merges
   (``run_pipeline`` — O(batch) regardless of graph size; the
   checkpoint high-water mark skips already-seen pages and the
   merge-on-read delta path measured 11.1 s vs 36.8 s copy-on-write
   for a +10% batch, see sources/catalog.py),
2. a WARM-START PageRank over the post-batch concept graph
   (``pagerank_und(init=stored_scores)`` — power iteration's error
   decays geometrically from the starting distance, so yesterday's
   scores need ~1/3 of the cold iterations: measured cold-10 11.6 s
   vs warm-3 4.5 s on the 10x graph),
3. an INCREMENTAL community refresh
   (``incremental_label_propagation`` with the STORED label table and
   component index — recomputes only the components the delta
   touches, which equals full-graph LPA row-for-row by the
   component-locality theorem in its docstring).

The refreshed analytics land back in the catalog
(``analytics_pagerank``, ``analytics_communities``,
``analytics_components``) so the NEXT batch warm-starts from them —
the same incremental regime the graph tables already live in.  Each
refresh also appends a row to the ``analytics_refresh_log`` lineage
table (batch pages/mentions/triples counts + per-stage wall times),
mirroring the per-partition lineage rows the pipeline itself writes.

Freshness/eventual-exactness contract: PageRank is returned after a
FIXED warm iteration count, so scores are within power-iteration
tolerance of the fixed point (and converge to it as batches keep
landing — the fixed point is start-independent); community labels are
EXACT (equal to a cold full-graph LPA at the same ``lpa_iters``) as
long as every batch goes through this entry point, because the stored
labels are then always the full-graph labeling of the pre-batch graph
— pinned by tests/test_refresh.py against a cold rebuild.

Reference parity note: the reference pipeline re-runs its Neo4j
import and lets the database re-derive query-time analytics
(Pipeline.scala's full-batch flow); this module is the
beyond-reference incremental story the north rule asks for
(resumable microbatches + per-partition lineage + metrics).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import canonicalize
from ..sources.catalog import ParquetCatalog
from . import queries as q
from .pipeline import PipelineResult, run_pipeline

PR_TABLE = "analytics_pagerank"
LABELS_TABLE = "analytics_communities"
COMP_TABLE = "analytics_components"
REFRESH_LOG_TABLE = "analytics_refresh_log"


@dataclass
class RefreshResult:
    pipeline: PipelineResult
    pr_rows: int
    label_rows: int
    warm_start: bool
    stage_ms: dict[str, int] = field(default_factory=dict)


def _und(edges: DataFrame) -> DataFrame:
    return (
        q.undirected_concept_edges(edges).select("cid", "nbr_id").distinct()
    )


def refresh_after_batch(
    spark: SparkSession,
    pages: DataFrame,
    catalog: ParquetCatalog,
    *,
    pagerank_iters_cold: int = 10,
    pagerank_iters_warm: int = 3,
    lpa_iters: int = 5,
    graph_mode: str = "mor",
    **pipeline_kwargs,
) -> RefreshResult:
    """Ingest one page batch and refresh the stored graph analytics
    incrementally.  See the module docstring for the regime; all
    ``run_pipeline`` keywords (extract_from_html, url_dedup, ...)
    pass through.

    Scale shape: beyond the pipeline itself, the refresh adds one
    pre-batch edge snapshot read (column-pruned: 4 id/label columns),
    the warm PageRank (``pagerank_iters_warm`` join+agg rounds over
    the concept adjacency), and the touched-component LPA (bounded by
    the delta's community sizes).  Nothing here scans page content.
    """
    timings: dict[str, int] = {}

    def clock(name):
        t0 = time.monotonic()

        def done():
            timings[name] = int((time.monotonic() - t0) * 1000)

        return done

    # ---- pre-batch concept edge snapshot (for the LPA delta) ----
    d = clock("pre_snapshot")
    pre_edges = catalog.read(spark, "edges")
    base_und = None
    if pre_edges is not None:
        base_und = _und(pre_edges).localCheckpoint(eager=True)
    d()

    # ---- 1. O(batch) pipeline pass ----
    d = clock("pipeline")
    res = run_pipeline(
        spark, pages, catalog, graph_mode=graph_mode, **pipeline_kwargs
    )
    d()

    post_edges = catalog.read(spark, "edges")
    und = _und(post_edges).localCheckpoint(eager=True)

    # ---- 2. warm-start PageRank ----
    d = clock("pagerank")
    prev_pr = catalog.read(spark, PR_TABLE)
    warm = prev_pr is not None
    pr = q.pagerank_und(
        und,
        iters=pagerank_iters_warm if warm else pagerank_iters_cold,
        top_k=None,
        init=prev_pr.select("id", "rank") if warm else None,
        prepared=True,
    )
    pr = pr.localCheckpoint(eager=True)
    pr_rows = pr.count()
    d()

    # ---- 3. incremental communities ----
    d = clock("communities")
    prev_labels = catalog.read(spark, LABELS_TABLE)
    prev_comp = catalog.read(spark, COMP_TABLE)
    delta_und = None
    if base_und is not None:
        # delta = edges in the post view absent from the pre view;
        # only (cid, nbr_id) pairs shuffle here
        delta_und = und.join(base_und, ["cid", "nbr_id"], "left_anti")
    if base_und is None or prev_labels is None or prev_comp is None:
        labels = q.label_propagation(und, iters=lpa_iters, prepared=True)
    else:
        labels = q.incremental_label_propagation(
            base_und,
            delta_und,
            iters=lpa_iters,
            base_labels=prev_labels,
            base_comp=prev_comp,
        )
    labels = labels.localCheckpoint(eager=True)
    label_rows = labels.count()
    # component index: incrementally maintained like the labels.
    # Deltas only ever MERGE components, so CC over (delta edges +
    # the stored (id, component) mapping edges of the TOUCHED
    # components) reproduces the full-graph result for every touched
    # node — the mapping edges contract each old component to its
    # min-id representative in one round, and min-id over the merged
    # node set equals the full recompute's representative.  Untouched
    # rows are reused verbatim.  O(touched), not O(graph); pinned
    # against a cold full-graph CC in tests/test_refresh.py.
    if base_und is None or prev_comp is None:
        comp = canonicalize.connected_components(und, src="cid", dst="nbr_id")
    else:
        delta_nodes = delta_und.select(F.col("cid").alias("id")).distinct()
        affected = prev_comp.join(delta_nodes, "id").select("component").distinct()
        touched = prev_comp.join(F.broadcast(affected), "component")
        mapping_edges = touched.select(
            F.col("id").alias("cid"), F.col("component").alias("nbr_id")
        )
        new_part = canonicalize.connected_components(
            delta_und.select("cid", "nbr_id").unionByName(mapping_edges),
            src="cid",
            dst="nbr_id",
        )
        comp = prev_comp.join(
            new_part.select("id"), "id", "left_anti"
        ).unionByName(new_part)
    # materialize inside THIS clock so the lineage row attributes the
    # CC cost to the communities stage, not to the persist writes
    comp = comp.localCheckpoint(eager=True)
    comp.count()
    d()

    # ---- persist analytics for the next batch's warm start ----
    d = clock("persist")
    catalog.overwrite(pr, PR_TABLE, sort_cols=["id"])
    catalog.overwrite(labels, LABELS_TABLE, sort_cols=["id"])
    catalog.overwrite(comp, COMP_TABLE, sort_cols=["id"])
    d()

    log_row = spark.createDataFrame(
        [
            (
                res.snapshot_id,
                res.pages,
                res.mentions,
                res.triples,
                pr_rows,
                label_rows,
                bool(warm),
                json.dumps(dict(timings)),
            )
        ],
        "snapshot_id long, pages long, mentions long, triples long, "
        "pr_rows long, label_rows long, warm_start boolean, stage_ms string",
    )
    # O(1) fast-append (new data dir + manifest entry) — NOT
    # read+union+overwrite, which rewrites the whole log every batch
    catalog.append(spark, log_row, REFRESH_LOG_TABLE)

    return RefreshResult(
        pipeline=res,
        pr_rows=pr_rows,
        label_rows=label_rows,
        warm_start=warm,
        stage_ms=dict(timings),
    )
