"""Watermarked stream-stream interval join.

The attribution shape: match each left event (impression) to right
events (clicks) on the same key arriving within a bounded event-time
window after it.  Unbounded streams can't hash-join — both sides'
state would grow forever — so Spark's stream-stream join REQUIRES
watermarks on both sides plus a time-range join condition; together
they bound the state store to (watermark + range) per side, and rows
older than that are evicted exactly like late rows in a windowed
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lower_seconds: int = 0,
    upper_seconds: int = 600,
    watermark_seconds: int = 600,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Inner join: right rows with ``l.ts + lower <= r.ts <= l.ts +
    upper`` on the same ``key``.  Output columns: key, l_ts, r_ts plus
    the non-key payload columns of both sides prefixed ``l_``/``r_``.

    Both inputs must be streaming DataFrames; the watermark bounds how
    long an unmatched row waits in the state store for its partner."""
    lcols = [c for c in left.columns if c not in (key, left_ts)]
    rcols = [c for c in right.columns if c not in (key, right_ts)]
    l = (
        left.select(
            F.col(key).alias("_k"),
            F.col(left_ts).cast("timestamp").alias("l_ts"),
            *[F.col(c).alias(f"l_{c}") for c in lcols],
        )
        .withWatermark("l_ts", f"{watermark_seconds} seconds")
    )
    r = (
        right.select(
            F.col(key).alias("_rk"),
            F.col(right_ts).cast("timestamp").alias("r_ts"),
            *[F.col(c).alias(f"r_{c}") for c in rcols],
        )
        .withWatermark("r_ts", f"{watermark_seconds} seconds")
    )
    cond = (
        (F.col("_k") == F.col("_rk"))
        & (F.col("r_ts") >= F.col("l_ts") + F.expr(f"interval {lower_seconds} seconds"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"interval {upper_seconds} seconds"))
    )
    return (
        l.join(r, cond, "inner")
        .select(F.col("_k").alias(key), "l_ts", "r_ts", *[f"l_{c}" for c in lcols], *[f"r_{c}" for c in rcols])
    )
