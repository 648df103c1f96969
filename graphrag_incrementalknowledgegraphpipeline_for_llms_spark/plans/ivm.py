"""Incremental view maintenance for aggregate views over catalog
tables.

A 100 TB fact table's dashboards cannot re-aggregate the world per
refresh.  For distributive/algebraic aggregates (count, sum — and
avg = sum/count) the delta rule is: new_state = old_state ⊎ agg(delta
rows), merged per group key.  The catalog's snapshot manifests give
exact deltas for free (``read_version_delta``), so refresh cost is
O(delta) + O(|touched groups|) regardless of table size.

State lives in a catalog table ``_ivm_<view>`` holding (group...,
cnt, sum) plus a one-row watermark table recording the last folded
snapshot version — refresh is idempotent and resumable: replaying a
refresh after a crash folds zero new versions.

Limits (documented, not hidden): the O(delta) rule applies to
append-only sources ONLY — an overwrite/compact rewrite is detected
by manifest divergence and falls back to full recompute, and a
merge-on-read source always rebuilds (its delta appends REPLACE or
tombstone keys; folding them as inserts would overcount — proper
O(delta) there needs retraction deltas the catalog doesn't expose);
aggregates must be decomposable (no exact distinct-count — use the
KMV sketch for that, it merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import pyarrow as pa

from ..sources.catalog import ParquetCatalog

_WM_SCHEMA = pa.schema([("version", pa.int64())])


def _state_table(view: str) -> str:
    return f"_ivm_{view}"


def _wm_table(view: str) -> str:
    return f"_ivm_{view}_wm"


def _agg_delta(delta: DataFrame, group_cols: list[str], value_col: str | None) -> DataFrame:
    aggs = [F.count("*").alias("cnt")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast("double")).alias("sum_value"))
    return delta.groupBy(*group_cols).agg(*aggs)


def refresh(
    spark: SparkSession,
    catalog: ParquetCatalog,
    source: str,
    view: str,
    group_cols: list[str],
    value_col: str | None = None,
) -> int:
    """Fold all snapshot versions of ``source`` newer than the view's
    watermark into the aggregate state.  Returns the number of
    versions folded (0 = already current).  First call builds the
    state from the full table."""
    cur = catalog.current_version(source)
    wm_df = catalog.read(spark, _wm_table(view))
    last = wm_df.collect()[0]["version"] if wm_df is not None else 0
    if last == cur:
        return 0

    if catalog.mor_spec(source) is not None:
        # merge-on-read sources append DELTA dirs whose rows REPLACE or
        # tombstone existing keys — a manifest-append there is not a
        # row-level insert delta, and folding it as one overcounts
        # (tombstones would even add cnt with null sums).  The correct
        # O(delta) rule for MOR needs retraction deltas the catalog
        # doesn't expose; recompute from the resolved table instead.
        return _rebuild(spark, catalog, source, view, group_cols, value_col, cur)

    state = catalog.read(spark, _state_table(view)) if last > 0 else None
    folded = 0
    if state is None:
        src = catalog.read(spark, source)
        new_state = _agg_delta(src, group_cols, value_col) if src is not None else None
        folded = cur
    else:
        parts = [state]
        for v in range(last + 1, cur + 1):
            try:
                is_append = catalog.is_append_version(source, v)
            except OSError:
                # the manifest chain was expired past our watermark —
                # no reliable deltas; rebuild
                return _rebuild(spark, catalog, source, view, group_cols, value_col, cur)
            if not is_append:
                # snapshot v REWROTE dirs (overwrite/compact/merge):
                # its "delta" is a rewritten dir, not new rows — the
                # append-delta rule is invalid; rebuild from the full
                # current table
                return _rebuild(spark, catalog, source, view, group_cols, value_col, cur)
            delta = catalog.read_version_delta(spark, source, v)
            if delta is not None:
                parts.append(_agg_delta(delta, group_cols, value_col))
            folded += 1
        pool = parts[0]
        for p in parts[1:]:
            pool = pool.unionByName(p)
        merge_aggs = [F.sum("cnt").alias("cnt")]
        if value_col is not None:
            merge_aggs.append(F.sum("sum_value").alias("sum_value"))
        new_state = pool.groupBy(*group_cols).agg(*merge_aggs)
    if new_state is not None:
        catalog.overwrite(new_state, _state_table(view))
    catalog.commit_rows(
        _wm_table(view), [{"version": cur}], _WM_SCHEMA, mode="overwrite"
    )
    return folded


def _rebuild(spark, catalog, source, view, group_cols, value_col, cur) -> int:
    src = catalog.read(spark, source)
    if src is not None:
        catalog.overwrite(_agg_delta(src, group_cols, value_col), _state_table(view))
    catalog.commit_rows(
        _wm_table(view), [{"version": cur}], _WM_SCHEMA, mode="overwrite"
    )
    return cur


def read_view(spark: SparkSession, catalog: ParquetCatalog, view: str) -> DataFrame | None:
    """The maintained aggregate (group..., cnt[, sum_value, avg_value])."""
    st = catalog.read(spark, _state_table(view))
    if st is None:
        return None
    if "sum_value" in st.columns:
        st = st.withColumn("avg_value", F.col("sum_value") / F.col("cnt"))
    return st
