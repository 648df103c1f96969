"""Storage catalog — the Iceberg seam.

The north rule targets Iceberg tables with ``MERGE INTO`` upserts and
snapshot-driven incremental reads.  The sandbox image ships no Iceberg
jars, so this module provides a parquet-backed catalog with the SAME
API shape: versioned snapshot directories per table, an atomic current
pointer, ``merge_upsert`` (= MERGE INTO emulation via dedup + anti-join
+ union), and snapshot ids for checkpoint/lineage.  On a real cluster
swap :class:`ParquetCatalog` for an Iceberg catalog: ``merge_upsert``
becomes a single ``MERGE INTO`` statement and snapshots come from
Iceberg metadata — callers don't change.

MERGE semantics replicated from the reference's Neo4j sink
(storage/Neo4jSink.scala:138-225): insert-or-overwrite-all-props,
last-write-wins.  Iceberg MERGE errors on duplicate source keys, so
updates are deduped per batch with a deterministic tie-break
(SURVEY.md §7 risk list).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
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

    def _vdir(self, name: str, version: int) -> str:
        return os.path.join(self._tdir(name), f"v{version:05d}")

    def exists(self, name: str) -> bool:
        return self.current_version(name) > 0

    def read(self, spark: SparkSession, name: str) -> DataFrame | None:
        v = self.current_version(name)
        if v == 0:
            return None
        return spark.read.parquet(self._vdir(name, v))

    def _commit(self, name: str, df: DataFrame) -> int:
        """Write a new snapshot dir, then atomically flip the pointer."""
        v = self.current_version(name) + 1
        out = self._vdir(name, v)
        df.write.mode("overwrite").parquet(out)
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer(name))
        # retain the previous snapshot only (bounded disk; Iceberg would
        # handle retention via expire_snapshots)
        for old in range(1, v - 1):
            d = self._vdir(name, old)
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)
        return v

    def overwrite(self, df: DataFrame, name: str) -> int:
        return self._commit(name, df)

    def append(self, spark: SparkSession, df: DataFrame, name: str) -> int:
        cur = self.read(spark, name)
        return self._commit(name, cur.unionByName(df) if cur is not None else df)

    # -- MERGE INTO emulation -------------------------------------------------
    def merge_upsert(
        self,
        spark: SparkSession,
        name: str,
        updates: DataFrame,
        keys: list[str],
        tiebreak: list[str] | None = None,
    ) -> int:
        """``MERGE INTO name t USING updates s ON <keys> WHEN MATCHED
        THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``.

        ``tiebreak``: columns whose DESC order picks the winning source
        row when a batch contains duplicate keys (deterministic
        last-write-wins stand-in).  Keys default to natural column
        order for ties.
        """
        order = [F.col(c).desc_nulls_last() for c in (tiebreak or [])] + [
            F.col(c) for c in updates.columns
        ]
        w = Window.partitionBy(*keys).orderBy(*order)
        deduped = (
            updates.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        existing = self.read(spark, name)
        if existing is None:
            return self._commit(name, deduped)
        kept = existing.join(deduped.select(*keys).distinct(), on=keys, how="left_anti")
        merged = kept.unionByName(deduped.select(*existing.columns))
        return self._commit(name, merged)
