"""Corpus curation: the canonical training-data prep composition —
quality gate + language gate + exact dedup — as one operator with a
lineage funnel.

Scale shape (the whole point at 100 TB):

* ONE narrow projection computes every feature (token count, lang id,
  quality score, fingerprint) from the text; the text column itself
  never crosses a shuffle.
* gates are plain Catalyst predicates evaluated in the scan stage —
  they prune before any exchange.
* dedup is groupBy(min(id)) over (fingerprint, id) ONLY — a 16-byte
  key + 8-byte id through the shuffle — followed by a semi-join on id
  to late-materialize the surviving rows (same shape as the catalog
  MERGE winner selection).
* the funnel audit is a single-pass conditional aggregate — one job,
  no per-stage re-scans.

Every output has an exact ANSI-SQL twin (DuckDB oracle entries
``dd_curation`` / ``dd_curation_funnel``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tf


def _features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    feats = tf.quality_features(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        tf.lang_id(F.col(text_col)).alias("lang"),
        feats["n_tokens"].alias("n_tokens"),
        F.round(feats["quality_score"], 6).alias("quality_score"),
        tf.fingerprint(F.col(text_col)).alias("fp"),
    )


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Kept documents after the three gates + exact dedup.

    Output: (id, lang, n_tokens, quality_score, fp), one row per
    surviving fingerprint (canonical survivor = min id — deterministic
    and batch-split independent)."""
    gated = _features(df, text_col, id_col).where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("quality_score") >= min_quality)
        & (F.col("lang").isin(*langs))
    )
    winners = gated.groupBy("fp").agg(F.min("id").alias("id"))
    return gated.join(winners, ["fp", "id"], "left_semi").select(
        "id", "lang", "n_tokens", "quality_score", "fp"
    )


def curation_funnel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Per-gate survivor counts in ONE aggregate pass (the lineage row
    a curation job logs): total -> length gate -> +quality -> +lang ->
    distinct fingerprints among full survivors (= post-dedup size).

    Gates are applied cumulatively in the stated order, matching
    :func:`curate_corpus` (whose conjunction is order-independent)."""
    f = _features(df, text_col, id_col)
    g_len = F.col("n_tokens") >= min_tokens
    g_q = g_len & (F.col("quality_score") >= min_quality)
    g_lang = g_q & F.col("lang").isin(*langs)
    return f.agg(
        F.count("*").alias("total"),
        F.count_if(g_len).alias("pass_length"),
        F.count_if(g_q).alias("pass_quality"),
        F.count_if(g_lang).alias("pass_lang"),
        F.count_distinct(F.when(g_lang, F.col("fp"))).alias("after_dedup"),
    )


def remove_duplicate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 1,
) -> DataFrame:
    """CCNet-style cross-document line dedup (Wenzek et al. 2020 §3.1:
    boilerplate — nav menus, cookie banners, footers — repeats line-
    for-line across pages): drop every non-blank line whose exact text
    appears in more than ``max_df`` documents, reassemble the rest in
    original order.  Blank lines are structural and never counted or
    dropped.  Returns (id, clean_text, n_kept, n_total) ordered by id.

    Scale shape: the document-frequency aggregate shuffles only
    (md5(line), doc_id) — never line text; the drop itself is an
    anti-join against the VIRAL-LINE SET (lines with df > max_df),
    which on real corpora is boilerplate-sized, not corpus-sized, so
    AQE broadcasts it and the corpus never reshuffles.  Reassembly is
    a per-document sort of (idx, line) structs inside one aggregate —
    order restored without a window function."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    ).select("id", "idx", "line", F.md5("line").alias("lh"))
    viral = (
        lines.where(F.trim("line") != "")
        .groupBy("lh")
        .agg(F.count_distinct("id").alias("docs"))
        .where(F.col("docs") > max_df)
        .select("lh")
    )
    kept = lines.join(viral, "lh", "left_anti")
    agg = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    tot = lines.groupBy("id").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        tot.join(agg, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "n_total",
        )
        .orderBy("id")
    )
