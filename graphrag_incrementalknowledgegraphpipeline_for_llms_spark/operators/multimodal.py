"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed in Arrow batches via mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic byte-level fake, or NotImplementedError in strict mode)
— but the Spark-side plumbing is real and tested: schema contract,
batch shape, partition sizing.  Swapping the stub for PIL/librosa
changes one function body, not the plan.

Feature extraction implemented without codecs (still useful at scale):
payload size, sha256, entropy-ish byte histogram moments, magic-byte
format sniffing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "url string, media_type string, byte_len long, sha256 string, "
    "fmt string, mean_byte double, std_byte double, top_byte int"
)

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"<htm", "html"),
    (b"<!do", "html"),
    (b"\x1f\x8b", "gzip"),
]


def sniff_format(b: bytes) -> str:
    low = b[:4].lower() if b[:1] in (b"<",) else b[:4]
    for magic, name in _MAGIC:
        if b.startswith(magic) or low.startswith(magic):
            return name
    return "bin"


def decode_image(b: bytes):
    """STUB: real decode needs PIL/opencv (not in this container).
    Raises so callers can't silently treat fake pixels as real."""
    raise NotImplementedError("image decode requires a codec library; use extract_features")


def _features_batch(pdf: pd.DataFrame, media_type: str) -> pd.DataFrame:
    out = {k: [] for k in ("url", "media_type", "byte_len", "sha256", "fmt", "mean_byte", "std_byte", "top_byte")}
    for url, payload in zip(pdf["url"], pdf["payload"]):
        b = bytes(payload) if payload is not None else b""
        arr = np.frombuffer(b, dtype=np.uint8)
        out["url"].append(url)
        out["media_type"].append(media_type)
        out["byte_len"].append(len(b))
        out["sha256"].append(hashlib.sha256(b).hexdigest())
        out["fmt"].append(sniff_format(b))
        out["mean_byte"].append(float(arr.mean()) if len(arr) else 0.0)
        out["std_byte"].append(float(arr.std()) if len(arr) else 0.0)
        out["top_byte"].append(int(np.bincount(arr, minlength=256).argmax()) if len(arr) else 0)
    return pd.DataFrame(out)


def extract_features(
    df: DataFrame, payload_col: str = "html", url_col: str = "url", media_type: str = "binary"
) -> DataFrame:
    """mapInPandas feature extraction over a binary column.  Narrow
    (no shuffle); Arrow batch size bounds executor memory, so oversize
    payloads are governed by spark.sql.execution.arrow.maxRecordsPerBatch."""
    src = df.select(F.col(url_col).alias("url"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _features_batch(pdf, media_type)

    return src.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_n: int = 10,
    payload_col: str = "payload",
    url_col: str = "url",
    frame_bytes: int = 4096,
) -> DataFrame:
    """Video frame-sampling PLUMBING: emits (url, frame_idx) rows for
    frames a real decoder would materialize — deterministic fake
    frame count = byte_len // frame_bytes (>= 1 per payload).  Shows
    the explode fan-out shape without a codec; swapping the fake count
    for a container-header parse changes one expression."""
    src = df.select(F.col(url_col).alias("url"), F.col(payload_col).alias("payload"))
    n_frames = F.greatest(
        (F.length(F.col("payload")) / F.lit(frame_bytes)).cast("int"), F.lit(1)
    )
    return src.select(
        "url",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


TILE_SCHEMA = (
    "url string, tile_idx int, tile_len long, tile_sha256 string, "
    "mean_byte double"
)


def tile_stats(
    df: DataFrame,
    tile_bytes: int = 64,
    payload_col: str = "payload",
    url_col: str = "url",
) -> DataFrame:
    """Fixed-size byte tiling of a binary column with per-tile
    checksums + byte statistics — the chunked-fingerprint plumbing a
    media pipeline runs before dedup/diff at the sub-asset level
    (identical tiles across two videos = shared segments, a changed
    thumbnail flips exactly one tile's sha).  Pure mapInPandas, same
    Arrow-bounded batch discipline as extract_features; the LAST tile
    may be short (no padding — padding would make two assets with
    different lengths collide).

    -> (url, tile_idx, tile_len, tile_sha256, mean_byte round 6),
    one row per tile, ordered (url, tile_idx).

    Scale shape: narrow flatMap — no shuffle; output volume is
    byte_len / tile_bytes rows per asset.  At 100 TB the follow-up
    (group identical tile_sha256 across assets) is one equi-join on
    the hash — the exact-dedup shape."""
    src = df.select(F.col(url_col).alias("url"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "url": [], "tile_idx": [], "tile_len": [],
                "tile_sha256": [], "mean_byte": [],
            }
            for url, payload in zip(pdf["url"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, max(len(b), 1), tile_bytes):
                    t = b[i : i + tile_bytes]
                    out["url"].append(url)
                    out["tile_idx"].append(i // tile_bytes)
                    out["tile_len"].append(len(t))
                    out["tile_sha256"].append(hashlib.sha256(t).hexdigest())
                    # raw mean; the 6dp round happens JVM-side below so
                    # the rounding rule is Spark's (same as the oracle's
                    # ROUND), not Python banker's rounding
                    out["mean_byte"].append(sum(t) / len(t) if t else 0.0)
            yield pd.DataFrame(out)

    return (
        src.mapInPandas(run, schema=TILE_SCHEMA)
        .withColumn("mean_byte", F.round("mean_byte", 6))
        .orderBy("url", "tile_idx")
    )
