"""Storage catalog — the Iceberg seam.

The north rule targets Iceberg tables with ``MERGE INTO`` upserts and
snapshot-driven incremental reads.  The sandbox image ships no Iceberg
jars, so this module provides a parquet-backed catalog with the SAME
API shape: manifest-listed snapshot versions per table, an atomic
current pointer, O(batch) appends (new data dir + manifest entry, like
an Iceberg fast-append), ``merge_upsert`` (= MERGE INTO emulation via
dedup + anti-join + union, copy-on-write like Iceberg's default MERGE),
and snapshot ids for checkpoint/lineage.  On a real cluster swap
:class:`ParquetCatalog` for an Iceberg catalog: ``merge_upsert``
becomes a single ``MERGE INTO`` statement and snapshots come from
Iceberg metadata — callers don't change.

MERGE semantics replicated from the reference's Neo4j sink
(storage/Neo4jSink.scala:138-225): insert-or-overwrite-all-props,
last-write-wins.  Iceberg MERGE errors on duplicate source keys, so
updates are deduped per batch with a deterministic tie-break
(SURVEY.md §7 risk list).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- snapshot bookkeeping -------------------------------------------------
    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _pointer(self, name: str) -> str:
        return os.path.join(self._tdir(name), "_current")

    def current_version(self, name: str) -> int:
        p = self._pointer(name)
        if not os.path.exists(p):
            return 0
        with open(p) as f:
            return int(f.read().strip())

    def _manifest_path(self, name: str, version: int) -> str:
        return os.path.join(self._tdir(name), f"m{version:05d}.json")

    def _manifest(self, name: str, version: int) -> list[str]:
        if version == 0:
            return []
        with open(self._manifest_path(name, version)) as f:
            return json.load(f)

    def data_dirs(self, name: str) -> list[str]:
        t = self._tdir(name)
        return [os.path.join(t, d) for d in self._manifest(name, self.current_version(name))]

    def exists(self, name: str) -> bool:
        return self.current_version(name) > 0

    def read(self, spark: SparkSession, name: str) -> DataFrame | None:
        dirs = self.data_dirs(name)
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def read_version_delta(self, spark: SparkSession, name: str, version: int) -> DataFrame | None:
        """Rows ADDED by snapshot ``version`` (its newest data dir) —
        the incremental-read primitive (Iceberg: incremental scan
        between snapshots).  For an append commit this is exactly the
        appended batch."""
        dirs = self._manifest(name, version)
        prev = self._manifest(name, version - 1) if version > 1 else []
        new = [d for d in dirs if d not in prev]
        if not new:
            return None
        return spark.read.parquet(*[os.path.join(self._tdir(name), d) for d in new])

    def count(self, name: str) -> int:
        """Row count from parquet footers — no Spark job."""
        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for d in self.data_dirs(name)
            for f in glob.glob(os.path.join(d, "*.parquet"))
        )

    def _commit(self, name: str, df: DataFrame, mode: str = "overwrite") -> int:
        """Write a new data dir, record a new manifest, atomically flip
        the pointer.  ``append`` keeps prior data dirs (O(batch));
        ``overwrite`` supersedes them."""
        cur = self.current_version(name)
        v = cur + 1
        ddir = f"d{v:05d}"
        out = os.path.join(self._tdir(name), ddir)
        df.write.mode("overwrite").parquet(out)
        prev = self._manifest(name, cur) if mode == "append" else []
        manifest = prev + [ddir]
        os.makedirs(self._tdir(name), exist_ok=True)
        with open(self._manifest_path(name, v), "w") as f:
            json.dump(manifest, f)
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer(name))
        # retain only dirs referenced by the current or previous
        # manifest (Iceberg: expire_snapshots)
        keep = set(manifest) | set(self._manifest(name, cur) if cur else [])
        for d in glob.glob(os.path.join(self._tdir(name), "d*")):
            if os.path.basename(d) not in keep:
                shutil.rmtree(d, ignore_errors=True)
        return v

    def overwrite(self, df: DataFrame, name: str) -> int:
        return self._commit(name, df, mode="overwrite")

    def commit_rows(self, name: str, rows: list[dict], schema, mode: str = "append") -> int:
        """Driver-side commit of a SMALL row set (lineage, checkpoints)
        via pyarrow — zero Spark jobs.  ``schema`` is a pyarrow schema.
        The files remain ordinary table data dirs, readable by
        ``read()`` like any snapshot."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        cur = self.current_version(name)
        if cur == 0:
            mode = "overwrite"
        v = cur + 1
        ddir = f"d{v:05d}"
        out = os.path.join(self._tdir(name), ddir)
        os.makedirs(out, exist_ok=True)
        table = pa.Table.from_pylist(rows, schema=schema)
        pq.write_table(table, os.path.join(out, "part-00000.parquet"))
        prev = self._manifest(name, cur) if mode == "append" else []
        with open(self._manifest_path(name, v), "w") as f:
            json.dump(prev + [ddir], f)
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer(name))
        return v

    def append(self, spark: SparkSession, df: DataFrame, name: str) -> int:
        if not self.exists(name):
            return self._commit(name, df, mode="overwrite")
        return self._commit(name, df, mode="append")

    # -- MERGE INTO emulation -------------------------------------------------
    def merge_upsert(
        self,
        spark: SparkSession,
        name: str,
        updates: DataFrame,
        keys: list[str],
        tiebreak: list[str] | None = None,
        resolution: str = "replace",
    ) -> int:
        """``MERGE INTO name t USING updates s ON <keys> WHEN MATCHED
        THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``.

        ``tiebreak``: columns that lead the winner ordering when a
        batch contains duplicate keys (deterministic last-write-wins
        stand-in; max wins, so e.g. highest confidence).  Remaining
        ties break by the max of the full row struct — any fixed total
        order works, and null fields lose to non-null, so placeholder
        rows always lose.

        ``resolution``:
        * ``"replace"`` — true MERGE: a matched source row replaces the
          target row (the reference's last-write-wins,
          Neo4jSink.scala:138-164).
        * ``"deterministic"`` — existing matched rows compete with the
          updates under the SAME total order, so the final table is
          independent of how rows were split across incremental
          batches (run(A);run(B) == run(A∪B) — FIXTURES.md §6).
        """
        existing = self.read(spark, name)
        pool = updates
        if resolution == "deterministic" and existing is not None:
            matched = existing.join(updates.select(*keys).distinct(), on=keys, how="left_semi")
            pool = updates.unionByName(matched.select(*updates.columns))
        # winner per key = max_by over (tiebreak..., all columns): a
        # total order, so batch-split independent; null struct fields
        # compare smallest, so placeholder (all-null-prop) rows always
        # lose to real rows.  max_by aggregates with MAP-SIDE COMBINE —
        # the shuffle carries ~|distinct keys| rows, not |input| rows
        # (a row_number window here shuffled the full input and was the
        # dominant pipeline cost on multi-million-row edge merges).
        cols = pool.columns
        okey = F.struct(
            *[F.col(c) for c in (tiebreak or [])], *[F.col(c) for c in cols]
        )
        deduped = (
            pool.groupBy(*keys)
            .agg(F.max_by(F.struct(*[F.col(c) for c in cols]), okey).alias("_w"))
            .select("_w.*")
        )
        if existing is None:
            return self._commit(name, deduped)
        kept = existing.join(deduped.select(*keys).distinct(), on=keys, how="left_anti")
        # the USING-join reorders key columns to the front — restore the
        # table's schema order so snapshots keep a stable column layout
        merged = kept.select(*existing.columns).unionByName(deduped.select(*existing.columns))
        return self._commit(name, merged)
