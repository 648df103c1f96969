"""HTML -> text extraction stage (T5 — our addition per BASELINE.json).

The reference consumes pre-chunked plain text (DeltaToJsonl.scala:201-203
documents the upstream schema); our target input is a Common-Crawl-style
``pages`` table with ``html: binary``.  The extractor is a deterministic
pure-Python function (purecore.extract_text) run as an Arrow-batched
pandas UDF; the north-rule invariant is byte-identical text per url,
gated by sha256 fixtures (tests/test_html.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import purecore


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: purecore.extract_text(b) if b is not None else None)


def with_extracted_text(pages: DataFrame, out_col: str = "text") -> DataFrame:
    """Populate/overwrite ``text`` from ``html``."""
    return pages.withColumn(out_col, extract_text_udf(F.col("html")))


def text_identity_report(pages: DataFrame) -> DataFrame:
    """Per-url check that the html->text stage reproduces the stored
    ``text`` byte-for-byte: (url, expected_sha, actual_sha, ok)."""
    df = pages.withColumn("_extracted", extract_text_udf(F.col("html")))
    return df.select(
        "url",
        F.sha2(F.col("text"), 256).alias("expected_sha"),
        F.sha2(F.col("_extracted"), 256).alias("actual_sha"),
        (F.sha2(F.col("text"), 256) == F.sha2(F.col("_extracted"), 256)).alias("ok"),
    )
