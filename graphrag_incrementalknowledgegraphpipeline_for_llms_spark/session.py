"""SparkSession factory tuned for this engine.

Local sandbox runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); on a
real cluster the same builder is used minus the ``master`` override —
every other setting below is scale-oriented, not local-only:

* AQE on (runtime coalescing, skew-join splitting) — at 100 TB the
  static shuffle-partition count is always wrong somewhere.
* Arrow on — every Python stage in this engine is a pandas UDF /
  mapInPandas; Arrow batching is the JVM<->Python contract.
* UTC session timezone — parquet/DuckDB oracle comparison and
  deterministic ``updated_at`` stamps require it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _scratch_dir() -> str:
    """Prefer tmpfs for shuffle scratch; fall back to /tmp."""
    for d in ("/dev/shm", "/tmp"):
        if os.path.isdir(d) and os.access(d, os.W_OK):
            return os.path.join(d, "spark-local")
    return "/tmp/spark-local"


def get_spark(
    app_name: str = "graphrag-kg-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # start HIGH and let AQE coalesce down (the cluster-correct
        # shape): a static ~cores count capped post-shuffle write
        # parallelism and measurably flattened the merge stages'
        # core-count scaling (graph_merge 2.2x from 4->16 cores with
        # partitions=max(cpus,8); the shuffle reduce side is also the
        # parquet write side here)
        shuffle_partitions = max(cpus * 4, 32)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # shuffle/spill scratch on tmpfs: measured 1.6x end-to-end on the
        # sandbox VM (virtio disk syscalls dominate high-thread shuffles);
        # the cluster equivalent is fast local SSD scratch
        .config("spark.local.dir", _scratch_dir())
        # bigger Arrow batches: fewer JVM<->Python socket round trips
        # per UDF stage (measured 1.4x on the extraction stage)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # measured pathology: a pool of idle REUSED python workers
        # degrades subsequent JVM-only stages ~10x at local[32]
        # (materialize 60s -> 5s with reuse off); fresh workers per
        # task cost ~0.3s spawn, amortized by the large Arrow batches
        .config("spark.python.worker.reuse", "false")
        # local-mode split sizing: compressed stage tables are ~5 MB/file
        # but explode to 50-100x rows downstream; default 128 MB packing
        # collapses those reads into 1-3 tasks and serializes the fan-out
        # stages (measured: materialize flat at 355 s across 4 and 16
        # cores).  8 MB/1 MB keeps task count = file count.  At real
        # 100 TB scale files are 128-512 MB and the default is correct.
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        # local mode: the driver heap is ALL executor memory; GC
        # pressure at 16+ threads measured 1.4x end-to-end (16g vs 48g)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
