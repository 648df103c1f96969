"""Co-occurrence pair generation + PMI (R1-R5 of SURVEY.md §2.4).

R1 in the reference is per-chunk only (CoOccurExtractor.scala:28-57):
all unordered pairs over the distinct concepts of one chunk, canonical
order by concept_id, windowId = chunk_id, freq = 1.  Because the
concept list is already a per-row array column (the extraction UDF
dedupes first-seen), pair generation is pure Catalyst array
combinatorics — NO shuffle, no Python, per-row work that scales
linearly with input splits.  A join formulation is provided too
(candidate_pairs_join) — it is the shape the DuckDB oracle uses — but
the array form is the production path.

PMI (R3-R5) exists in the reference as dead code never wired into the
job (CoOccurExtractor.scala:69-136; `min-pmi` documented in
README.md:633-641).  Here it is a live distributed aggregation: two
groupBy counts + two joins + a log2 filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import purecore

# all i<j pairs from the deduped `concepts` array, canonicalized by
# concept_id (ties keep list order — id-symmetric, see purecore).
_PAIR_EXPR = """
flatten(transform(concepts, (x, xi) ->
  transform(slice(concepts, xi + 2, size(concepts)), y ->
    struct(
      if(x.concept_id <= y.concept_id, x, y) AS a,
      if(x.concept_id <= y.concept_id, y, x) AS b))))
"""


def candidate_pairs(chunks_with_concepts: DataFrame) -> DataFrame:
    """R1+R2: (a, b, window_id, freq, evidence) candidates.

    Input must carry ``chunk_id``, ``concepts`` (array), ``evidence``
    (text take 500) — from functions.concepts.with_concepts.  Chunks
    with <2 concepts are gated out (GraphRagJob.scala:309).
    """
    gated = chunks_with_concepts.where(F.size("concepts") >= 2)
    carry = ["evidence"] + (
        ["evidence100"] if "evidence100" in chunks_with_concepts.columns else []
    )
    return gated.select(
        "chunk_id", *carry, F.explode(F.expr(_PAIR_EXPR)).alias("p")
    ).select(
        F.col("p.a").alias("a"),
        F.col("p.b").alias("b"),
        F.col("chunk_id").alias("window_id"),
        F.lit(1).cast("long").alias("freq"),
        *carry,
    )


def candidate_pairs_join(mentions: DataFrame, chunks_with_evidence: DataFrame) -> DataFrame:
    """R1 as an explicit self-join (the distributed formulation when
    mentions arrive as a flat table rather than per-chunk arrays):
    equi-join on chunk_id + strict composite-key theta predicate.
    Shuffles once on chunk_id; AQE handles per-chunk skew."""
    key = lambda p: F.concat_ws("\x1f", f"{p}.concept_id", f"{p}.lemma", f"{p}.surface", f"{p}.origin")  # noqa: E731
    m1 = mentions.alias("m1")
    m2 = mentions.alias("m2")
    pairs = m1.join(m2, on="chunk_id").where(key("m1") < key("m2"))
    sel = lambda p, n: F.struct(  # noqa: E731
        F.col(f"{p}.concept_id").alias("concept_id"),
        F.col(f"{p}.lemma").alias("lemma"),
        F.col(f"{p}.surface").alias("surface"),
        F.col(f"{p}.origin").alias("origin"),
    ).alias(n)
    canon = pairs.select(
        F.col("chunk_id").alias("window_id"),
        F.when(F.col("m1.concept_id") <= F.col("m2.concept_id"), sel("m1", "x"))
        .otherwise(sel("m2", "x"))
        .alias("a"),
        F.when(F.col("m1.concept_id") <= F.col("m2.concept_id"), sel("m2", "x"))
        .otherwise(sel("m1", "x"))
        .alias("b"),
        F.lit(1).cast("long").alias("freq"),
    )
    return canon.join(
        chunks_with_evidence.select(F.col("chunk_id").alias("window_id"), "evidence"),
        on="window_id",
    )


def aggregate_pair_frequencies(pairs: DataFrame) -> DataFrame:
    """R5 (CoOccurExtractor.scala:125-136): group by id pair, sum freq,
    keep one exemplar pair of concept structs (min = deterministic
    stand-in for Scala's `group.head`)."""
    return pairs.groupBy(
        F.col("a.concept_id").alias("a_id"), F.col("b.concept_id").alias("b_id")
    ).agg(
        F.sum("freq").alias("freq"),
        F.min_by(F.struct("a", "b"), F.struct("window_id", F.col("a.surface"))).alias("exemplar"),
    )


def concept_chunk_frequencies(mentions: DataFrame) -> DataFrame:
    """f(concept) = number of distinct chunks mentioning it — the
    conceptFreqs input of CoOccurExtractor.filterByPMI."""
    return (
        mentions.select("chunk_id", "concept_id")
        .distinct()
        .groupBy("concept_id")
        .agg(F.count("*").alias("cfreq"))
    )


def pmi_scores(
    pair_freqs: DataFrame, concept_freqs: DataFrame, total_chunks: int
) -> DataFrame:
    """R3: PMI(a,b) = log2((f_ab/N) / ((f_a/N)(f_b/N))), 0.0 on any
    zero input (CoOccurExtractor.scala:75-84).  concept_freqs is tiny
    relative to pairs — broadcast both join sides' build side."""
    ca = F.broadcast(concept_freqs).alias("ca")
    cb = F.broadcast(concept_freqs).alias("cb")
    joined = (
        pair_freqs.alias("p")
        .join(ca, F.col("p.a_id") == F.col("ca.concept_id"), "left")
        .join(cb, F.col("p.b_id") == F.col("cb.concept_id"), "left")
    )
    n = F.lit(float(total_chunks))
    fa = F.coalesce(F.col("ca.cfreq"), F.lit(0)).cast("double")
    fb = F.coalesce(F.col("cb.cfreq"), F.lit(0)).cast("double")
    fab = F.col("p.freq").cast("double")
    pmi = F.when(
        (n == 0) | (fa == 0) | (fb == 0) | (fab == 0), F.lit(0.0)
    ).otherwise(F.log2((fab / n) / ((fa / n) * (fb / n))))
    return joined.select(
        F.col("p.a_id").alias("a_id"),
        F.col("p.b_id").alias("b_id"),
        F.col("p.freq").alias("freq"),
        pmi.alias("pmi"),
    )


def pmi_filtered_pairs(
    mentions: DataFrame, pairs: DataFrame, min_pmi: float = purecore.MIN_PMI
) -> DataFrame:
    """R4: the full live pipeline — aggregate pair freqs, concept
    freqs, total-chunk count, PMI join, threshold filter."""
    total = mentions.select("chunk_id").distinct().count()
    pf = aggregate_pair_frequencies(pairs)
    cf = concept_chunk_frequencies(mentions)
    return pmi_scores(pf, cf, total).where(F.col("pmi") >= F.lit(min_pmi))


def market_basket(
    items: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item_id",
    min_item_support: int = 5,
    min_pair_count: int = 2,
    max_basket_size: int | None = 64,
) -> DataFrame:
    """Association pair mining over (basket, item) rows: pair support,
    per-item support, and lift = N * cnt(a,b) / (cnt(a) * cnt(b)) —
    the PMI cousin on transaction baskets instead of chunks (PMI above
    is log-lift over concept co-occurrence; same algebra, different
    universe).  The workhorse behind "frequently bought together",
    co-cited-sources, and co-linked-entity panels.

    Determinism contract: baskets are deduplicated to DISTINCT
    (basket, item) before any counting (a line item repeated inside
    one basket is one co-occurrence, not two); pairs are canonically
    ordered ``item_a < item_b``; lift/support are computed with one
    fixed expression shape — ``(pair_count * N) / (cnt_a * cnt_b)`` —
    then rounded to 6 dp, so both engines fold identical doubles.

    Scale shape (the Apriori pushdown): per-item support is aggregated
    FIRST and items below ``min_item_support`` are semi-joined away
    BEFORE the pair self-join — an infrequent item can never be in a
    frequent pair, so the quadratic stage only ever sees frequent
    items.  ``max_basket_size`` (default 64) drops degenerate
    mega-baskets before the self-join — the same C(n,2) blowup guard
    class as dedup's exact-group collapse (a crawl "basket" like a
    link farm can hold 10^5 items; 64 keeps per-basket pair fan-out
    <= 2016 rows).  The basket total N is a bounded 1-row scalar
    folded as a literal.  Shuffles: distinct projection, item-support
    agg, the basket-keyed self-join, and the pair agg — all on keys
    the data is naturally sized for once the two guards fire.
    """
    from .dedup import stage_parquet

    # bi feeds FIVE consumers (the basket-total count, item support,
    # both sides of the pair self-join via freq, and the mega-basket
    # guard): stage the narrow 2-column distinct once instead of
    # re-running the scan+distinct per consumer
    bi = stage_parquet(
        items.select(
            F.col(basket_col).alias("b"), F.col(item_col).alias("i")
        ).distinct(),
        "mb_bi",
    )
    n_baskets = bi.select("b").distinct().count()
    sup = (
        bi.groupBy("i")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.lit(int(min_item_support)))
    )
    freq = bi.join(sup.select("i"), "i", "left_semi")
    if max_basket_size is not None:
        small = (
            freq.groupBy("b")
            .agg(F.count(F.lit(1)).alias("sz"))
            .where(F.col("sz") <= F.lit(int(max_basket_size)))
        )
        freq = freq.join(small.select("b"), "b", "left_semi")
    lhs = freq.select("b", F.col("i").alias("item_a"))
    rhs = freq.select("b", F.col("i").alias("item_b"))
    pairs = (
        lhs.join(rhs, "b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= F.lit(int(min_pair_count)))
    )
    return (
        pairs.join(
            sup.select(F.col("i").alias("item_a"), F.col("cnt").alias("count_a")),
            "item_a",
        )
        .join(
            sup.select(F.col("i").alias("item_b"), F.col("cnt").alias("count_b")),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            F.round(
                (F.col("pair_count").cast("double") * F.lit(float(n_baskets)))
                / (F.col("count_a") * F.col("count_b")).cast("double"),
                6,
            ).alias("lift"),
            F.round(
                F.col("pair_count").cast("double") / F.lit(float(n_baskets)), 6
            ).alias("support"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
    )
