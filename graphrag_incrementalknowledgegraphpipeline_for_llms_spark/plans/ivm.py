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

Refresh strategy ladder (each rung exact; the next rung is only
entered when the previous one's precondition fails):

1. **append fold** — O(delta): versions since the watermark that only
   ADDED dirs fold their new rows straight into the state.
2. **changelog fold** (``source_keys=`` given) — for merge / delete /
   compaction / MOR commits the append rule is invalid; instead the
   NET row-level changelog ``catalog.snapshot_diff(wm, cur, keys)``
   is folded with signed weights (+1 insert/update_after, −1
   delete/update_before) and groups whose cnt reaches 0 are dropped.
   Exact for any commit mix, and touches only changed GROUPS in the
   state; the compare itself reads the two snapshots (co-partitioned
   on a bucketed source) — cheaper than re-aggregation when the
   group space is large, though not O(delta) in scan terms: true
   O(delta) would need write-time CDC capture of pre-images, a
   documented trade.  Signed double sums can drift vs a from-scratch
   sum by float-addition reordering (same caveat as any retraction
   IVM); counts are exact.
3. **rebuild** — no ``source_keys``, or the watermark snapshot fell
   out of retention: recompute from the full current table.

Aggregates must be decomposable (no exact distinct-count — use the
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
    source_keys: list[str] | None = None,
) -> int:
    """Fold all snapshot versions of ``source`` newer than the view's
    watermark into the aggregate state.  Returns the number of
    versions folded (0 = already current).  First call builds the
    state from the full table.  ``source_keys`` (the source's row
    identity, e.g. the MERGE keys) unlocks the changelog-fold rung of
    the strategy ladder (module docstring): without it, merge /
    delete / compaction / MOR commits trigger a full rebuild."""
    cur = catalog.current_version(source)
    wm_df = catalog.read(spark, _wm_table(view))
    last = wm_df.collect()[0]["version"] if wm_df is not None else 0
    if last == cur:
        return 0

    if catalog.mor_spec(source) is not None:
        # merge-on-read sources append DELTA dirs whose rows REPLACE or
        # tombstone existing keys — a manifest-append there is not a
        # row-level insert delta, and folding it as one overcounts
        # (tombstones would even add cnt with null sums).  With
        # source_keys the signed changelog carries the retractions;
        # without, recompute from the resolved table.
        if source_keys is not None and last > 0:
            return _refresh_changelog(
                spark, catalog, source, view, group_cols, value_col,
                source_keys, last, cur,
            )
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
                # append-delta rule is invalid.  With source_keys the
                # net changelog from the watermark is exact across the
                # whole mixed version range; otherwise rebuild.
                if source_keys is not None:
                    return _refresh_changelog(
                        spark, catalog, source, view, group_cols, value_col,
                        source_keys, last, cur,
                    )
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


def _refresh_changelog(
    spark, catalog, source, view, group_cols, value_col, keys, last, cur
) -> int:
    """Changelog-fold rung: fold the NET row-level changelog between
    the watermark snapshot and the current one with signed weights —
    exact for any mix of append/merge/delete/compact/MOR commits in
    the range, and ONE compare regardless of how many versions
    passed.  Falls back to rebuild if the watermark snapshot fell out
    of retention (snapshot_diff needs both endpoints readable)."""
    from pyspark.errors import AnalysisException

    try:
        # eager: executes the two snapshot reads NOW, so an expired dir
        # surfaces here (→ rebuild fallback) instead of mid-commit; the
        # materialized changelog is O(changed rows), tiny next to state
        diff = catalog.snapshot_diff(spark, source, last, cur, keys).localCheckpoint(
            eager=True
        )
        sign = F.when(
            F.col("_change_type").isin("insert", "update_after"), F.lit(1)
        ).otherwise(F.lit(-1))
        aggs = [F.sum(sign).alias("cnt")]
        if value_col is not None:
            aggs.append(
                F.sum(sign * F.col(value_col).cast("double")).alias("sum_value")
            )
        dstate = diff.groupBy(*group_cols).agg(*aggs)
        state = catalog.read(spark, _state_table(view))
        if state is None:
            # the watermark can be committed on an empty first build
            # (new_state None): a later refresh then has a compare base
            # but no state table — rebuild instead of dereferencing None
            return _rebuild(
                spark, catalog, source, view, group_cols, value_col, cur
            )
        pool = state.unionByName(dstate)
        merge_aggs = [F.sum("cnt").alias("cnt")]
        if value_col is not None:
            merge_aggs.append(F.sum("sum_value").alias("sum_value"))
        new_state = (
            pool.groupBy(*group_cols).agg(*merge_aggs).where(F.col("cnt") > 0)
        )
        # the overwrite below executes this plan (which reads the state
        # table being replaced) BEFORE the pointer swap — same
        # read-then-overwrite ordering the append rung relies on
    except (AnalysisException, KeyError, FileNotFoundError, OSError):
        # watermark snapshot expired past retention — no compare base
        return _rebuild(spark, catalog, source, view, group_cols, value_col, cur)
    catalog.overwrite(new_state, _state_table(view))
    catalog.commit_rows(
        _wm_table(view), [{"version": cur}], _WM_SCHEMA, mode="overwrite"
    )
    return cur - last


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
