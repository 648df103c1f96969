"""Watermarked streaming operators: window agg late-data contract,
dropDuplicatesWithinWatermark, stream-static broadcast enrich.

Batch boundaries (and therefore watermark advancement) are made
deterministic by running one availableNow query PER dropped file
against a shared checkpoint: the watermark is persisted in the
checkpoint commit log, so run N+1 starts with run N's watermark —
the same contract as a restarted production stream.  (A single query
with maxFilesPerTrigger=1 is not reliable for this: the file source
may still group files, and all batches of one run share the run-start
watermark for filtering.)
"""

import os
import time
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F


def _utc(s: str):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S").replace(tzinfo=timezone.utc)


def _write_batch(spark, path, rows, mtime):
    """Write one flat parquet FILE at ``path`` (the file stream source
    does not recurse into subdirectories) with a forced mtime so the
    maxFilesPerTrigger=1 source processes files in a known order."""
    import glob
    import shutil

    stage = path + ".stage"
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.copyfile(part, path)
    shutil.rmtree(stage)
    os.utime(path, (mtime, mtime))


def _run_stream_phases(spark, src_dir, ckpt_dir, phases, transform, name, out_mode):
    """``phases`` = list of (filename, rows).  Drop each file, run an
    availableNow query to completion against the shared checkpoint,
    collect what that run emitted.  Returns all emitted rows."""
    emitted = []

    def sink(batch_df, _epoch):
        emitted.extend(batch_df.collect())

    for i, (fname, rows) in enumerate(phases):
        _write_batch(spark, os.path.join(src_dir, fname), rows, time.time())
        stream = spark.readStream.schema(
            "ts timestamp, user_id long, value double"
        ).parquet(src_dir)
        q = (
            transform(stream)
            .writeStream.foreachBatch(sink)
            .queryName(f"{name}_{i}")
            .outputMode(out_mode)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert q.exception() is None
    return emitted


class TestStreamTumblingCounts:
    def test_append_emits_closed_windows_and_drops_late(self, spark, tmp_path):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.streaming import (
            windows as sw,
        )

        src = str(tmp_path / "events")
        os.makedirs(src)
        phases = [
            # run 1: windows W0=[:00,:01) W1=[:01,:02); end watermark
            # = 01:30 - 10s = 01:20 > W0 end, so W0 closes
            (
                "b1.parquet",
                [
                    (_utc("2024-01-01 10:00:10"), 1, 1.0),
                    (_utc("2024-01-01 10:00:20"), 1, 2.0),
                    (_utc("2024-01-01 10:01:30"), 2, 5.0),
                ],
            ),
            # run 2 starts at watermark 01:20: the 00:40 row is LATE and
            # must be dropped; 03:10 advances the watermark to 03:00,
            # closing W1; the 03:00 window never closes
            (
                "b2.parquet",
                [
                    (_utc("2024-01-01 10:00:40"), 1, 100.0),  # late -> dropped
                    (_utc("2024-01-01 10:03:10"), 2, 7.0),
                ],
            ),
        ]
        out = _run_stream_phases(
            spark,
            src,
            str(tmp_path / "ckpt"),
            phases,
            lambda s: sw.stream_tumbling_counts(
                s, window_seconds=60, watermark_seconds=10, value_col="value"
            ),
            "tumbling_counts_t",
            "append",
        )
        rows = {r["window_start"].strftime("%H:%M"): (r["cnt"], r["sum_value"]) for r in out}
        # only W0 and W1 closed; late row NOT counted in W0
        assert rows == {"10:00": (2, 3.0), "10:01": (1, 5.0)}

    def test_grouped_counts_match_batch_for_on_time_rows(self, spark, tmp_path):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import events
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.streaming import (
            windows as sw,
        )

        src = str(tmp_path / "events")
        os.makedirs(src)
        rows1 = [(_utc(f"2024-01-01 10:00:{10+i:02d}"), i % 2, float(i)) for i in range(6)]
        phases = [
            ("b1.parquet", rows1),
            # closer run: far-future row closes every earlier window
            ("b2.parquet", [(_utc("2024-01-01 12:00:00"), 9, 0.0)]),
        ]
        out = _run_stream_phases(
            spark,
            src,
            str(tmp_path / "ckpt"),
            phases,
            lambda s: sw.stream_tumbling_counts(
                s, window_seconds=60, watermark_seconds=10, group_cols=["user_id"]
            ),
            "tumbling_grouped_t",
            "append",
        )
        batch = events.tumbling_rollup(
            spark.createDataFrame(rows1, "ts timestamp, user_id long, value double"),
            window_seconds=60,
            group_cols=["user_id"],
        ).select("window_start", "user_id", "cnt", "sum_value")
        got = {
            (r["window_start"].strftime("%H:%M"), r["user_id"]): (r["cnt"], r["sum_value"])
            for r in out
        }
        want = {
            (r["window_start"].strftime("%H:%M"), r["user_id"]): (r["cnt"], r["sum_value"])
            for r in batch.collect()
        }
        assert got == want


class TestStreamDedup:
    def test_drops_in_watermark_duplicates(self, spark, tmp_path):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.streaming import (
            windows as sw,
        )

        src = str(tmp_path / "events")
        os.makedirs(src)
        phases = [
            (
                "b1.parquet",
                [
                    (_utc("2024-01-01 10:00:00"), 1, 1.0),
                    (_utc("2024-01-01 10:00:05"), 1, 2.0),  # dup key in-batch
                    (_utc("2024-01-01 10:00:10"), 2, 3.0),
                ],
            ),
            (
                "b2.parquet",
                [
                    (_utc("2024-01-01 10:00:20"), 1, 4.0),  # dup across runs, in watermark
                    (_utc("2024-01-01 10:00:30"), 3, 5.0),
                ],
            ),
        ]
        out = _run_stream_phases(
            spark,
            src,
            str(tmp_path / "ckpt"),
            phases,
            lambda s: sw.stream_dedup(s, ["user_id"], watermark_seconds=3600),
            "dedup_t",
            "append",
        )
        got = sorted((r["user_id"], r["value"]) for r in out)
        assert got == [(1, 1.0), (2, 3.0), (3, 5.0)]


class TestStreamStaticEnrich:
    def test_broadcast_join_matches_batch(self, spark, tmp_path):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.streaming import (
            windows as sw,
        )

        src = str(tmp_path / "events")
        os.makedirs(src)
        rows = [(_utc(f"2024-01-01 10:00:{i:02d}"), i % 3, float(i)) for i in range(9)]
        dim = spark.createDataFrame(
            [(0, "bronze"), (1, "silver"), (2, "gold")], "user_id long, tier string"
        )
        out = _run_stream_phases(
            spark,
            src,
            str(tmp_path / "ckpt"),
            [("b1.parquet", rows)],
            lambda s: sw.stream_static_enrich(s, dim, on="user_id").select(
                "user_id", "value", "tier"
            ),
            "enrich_t",
            "append",
        )
        got = sorted((r["user_id"], r["value"], r["tier"]) for r in out)
        want = sorted(
            (
                r["user_id"],
                r["value"],
                {0: "bronze", 1: "silver", 2: "gold"}[r["user_id"]],
            )
            for r in spark.createDataFrame(rows, "ts timestamp, user_id long, value double").collect()
        )
        assert got == want


class TestStreamIntervalJoin:
    def test_attribution_matches_in_range_only(self, spark, tmp_path):
        """Impressions joined to clicks within [0, 60s] after them on
        the same user; out-of-range and wrong-key clicks don't match."""
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.streaming import (
            joins as sj,
        )

        imp_dir = str(tmp_path / "imp")
        clk_dir = str(tmp_path / "clk")
        os.makedirs(imp_dir)
        os.makedirs(clk_dir)
        _write_batch(
            spark,
            os.path.join(imp_dir, "b1.parquet"),
            [
                (_utc("2024-01-01 10:00:00"), 1, 100.0),  # imp A
                (_utc("2024-01-01 10:05:00"), 2, 200.0),  # imp B
            ],
            time.time(),
        )
        _write_batch(
            spark,
            os.path.join(clk_dir, "b1.parquet"),
            [
                (_utc("2024-01-01 10:00:30"), 1, 1.0),  # in range of A
                (_utc("2024-01-01 10:02:00"), 1, 2.0),  # beyond 60s -> no match
                (_utc("2024-01-01 10:05:10"), 2, 3.0),  # in range of B
                (_utc("2024-01-01 10:05:20"), 9, 4.0),  # wrong key
            ],
            time.time(),
        )
        schema = "ts timestamp, user_id long, value double"
        imp = spark.readStream.schema(schema).parquet(imp_dir)
        clk = spark.readStream.schema(schema).parquet(clk_dir)
        out = sj.stream_interval_join(
            imp, clk, key="user_id", upper_seconds=60, watermark_seconds=600
        )
        got = []
        q = (
            out.writeStream.foreachBatch(lambda b, e: got.extend(b.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert q.exception() is None
        pairs = sorted((r["user_id"], r["l_value"], r["r_value"]) for r in got)
        assert pairs == [(1, 100.0, 1.0), (2, 200.0, 3.0)]


class TestStreamUrlDedup:
    def test_canonical_spellings_collapse_across_batches(self, spark, tmp_path):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.streaming import (
            windows as sw,
        )

        src = str(tmp_path / "pages")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(src)
        schema = "url string, warc_ts timestamp, text string"
        emitted = []

        def sink(batch_df, _epoch):
            emitted.extend(batch_df.collect())

        phases = [
            (
                "b1.parquet",
                [
                    ("https://example.com/a?utm_source=x", _utc("2024-01-01 10:00:00"), "first"),
                    ("https://WWW.example.com/a", _utc("2024-01-01 10:00:05"), "respelled dup"),
                    ("https://example.com/b", _utc("2024-01-01 10:00:10"), "other"),
                ],
            ),
            (
                "b2.parquet",
                [
                    ("https://example.com/a/", _utc("2024-01-01 10:00:20"), "recrawl dup"),
                    ("https://example.com/c", _utc("2024-01-01 10:00:30"), "new"),
                ],
            ),
        ]
        for i, (fname, rows) in enumerate(phases):
            # flat parquet FILE (the file source does not recurse)
            import glob
            import shutil

            stage = os.path.join(str(tmp_path), f"stage_{i}")
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(stage)
            part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            shutil.copyfile(part, os.path.join(src, fname))
            shutil.rmtree(stage)
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                sw.stream_url_dedup(stream, watermark_seconds=3600)
                .writeStream.foreachBatch(sink)
                .queryName(f"urldedup_t_{i}")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            assert q.exception() is None
        got = sorted((r["canonical_url"], r["text"]) for r in emitted)
        assert got == [
            ("https://example.com/a", "first"),
            ("https://example.com/b", "other"),
            ("https://example.com/c", "new"),
        ]
