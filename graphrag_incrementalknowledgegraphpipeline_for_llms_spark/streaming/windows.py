"""Watermarked Structured-Streaming operators: windowed aggregation,
streaming dedup, stream-static enrichment.

These are the unbounded-stream twins of the batch event operators
(``operators.events``) and of exact dedup (``operators.dedup``) — the
shapes a training-data ingest pipeline needs when pages/events arrive
continuously instead of in snapshot drops:

* tumbling window counts — ``F.window`` groupBy with a watermark;
  append mode emits a window exactly once, when the watermark passes
  its end.  State is O(open windows x groups); the watermark bounds
  it — without one, windowed streaming aggregation state grows forever.
* streaming dedup — ``dropDuplicatesWithinWatermark``: drops re-seen
  keys while their first sighting is inside the watermark.  This is
  dedup-at-ingest for re-crawled pages; state is O(keys per watermark
  window), not O(all keys ever) like plain ``dropDuplicates`` on a
  stream.
* stream-static enrich — join each microbatch against a small static
  dimension.  The static side is broadcast per microbatch, so the
  stream side never shuffles (the standard enrichment topology).

All three return transformed streaming DataFrames; the caller owns the
sink/trigger (tests use a memory sink with availableNow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_tumbling_counts(
    events: DataFrame,
    window_seconds: int = 3600,
    watermark_seconds: int = 600,
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    value_col: str = "value",
    slide_seconds: int | None = None,
) -> DataFrame:
    """Watermarked tumbling- (or, with ``slide_seconds``, sliding-)
    window aggregate over an event stream.

    Output rows (window_start, *group_cols, cnt, sum_value) appear in
    append mode only once the watermark (max event time seen minus
    ``watermark_seconds``) passes the window end; later-than-watermark
    events are dropped, exactly the late-data contract the batch
    ``events.tumbling_rollup`` doesn't need (bounded input) but an
    unbounded stream does.  A sliding window multiplies state by
    window/slide (each event lives in that many open windows)."""
    group_cols = group_cols or []
    ts = F.col(ts_col).cast("timestamp")
    win = F.window(
        F.col("_ts"),
        f"{window_seconds} seconds",
        f"{slide_seconds or window_seconds} seconds",
    )
    return (
        events.withColumn("_ts", ts)
        .withWatermark("_ts", f"{watermark_seconds} seconds")
        .groupBy(win.alias("w"), *group_cols)
        .agg(F.count("*").alias("cnt"), F.round(F.sum(value_col), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            *group_cols,
            "cnt",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    key_cols: list[str],
    watermark_seconds: int = 3600,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: keep the first row per key, dropping
    re-arrivals while the first sighting is within the watermark.

    State eviction is the point — a key re-seen AFTER its state
    expired is emitted again, which is the correct unbounded-stream
    trade (bounded state) and matches the batch pipeline's contract:
    the downstream graph MERGE is idempotent, so rare post-expiry
    re-emissions cost a redundant-but-safe upsert, never a wrong
    answer."""
    return (
        events.withColumn("_ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_ts", f"{watermark_seconds} seconds")
        .dropDuplicatesWithinWatermark(key_cols)
        .drop("_ts")
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension table.  The dim side is
    marked broadcast so each microbatch plans a broadcast hash join —
    the stream side stays narrow (no shuffle), which is what keeps
    enrichment viable at full ingest rate."""
    return stream.join(F.broadcast(dim), on=on, how=how)


def stream_url_dedup(
    pages: DataFrame,
    watermark_seconds: int = 3600,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Streaming canonical-URL dedup for a live crawl feed: each page
    is keyed by its CANONICAL url (functions/weburl.canonicalize_url —
    case/www/port/tracking-params/param-order/fragment/slash all
    collapse), and re-crawls of the same canonical page inside the
    watermark are dropped.  The batch path keeps the LATEST crawl
    (weburl.dedup_by_canonical_url); a stream cannot wait for "latest",
    so the streaming contract is FIRST-sighting-wins within the state
    window — the same bounded-state trade as :func:`stream_dedup`, and
    safe for the same reason (the downstream graph MERGE is
    idempotent; re-crawls with identical chunk ids collapse there).

    Scale shape: dropDuplicatesWithinWatermark state is one narrow
    (canonical_url, ts) entry per distinct page within the window —
    the html payload is NOT in the state store; Spark keeps the
    first-arriving ROW and stores only the key."""
    from ..functions.weburl import canonicalize_url

    return (
        pages.withColumn("canonical_url", canonicalize_url(F.col(url_col)))
        .withColumn("_ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_ts", f"{watermark_seconds} seconds")
        .dropDuplicatesWithinWatermark(["canonical_url"])
        .drop("_ts")
    )
