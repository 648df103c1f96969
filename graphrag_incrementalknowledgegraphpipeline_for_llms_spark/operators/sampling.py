"""Deterministic sampling, split assignment, and sequence packing for
training-data pipelines.

All three are hash- or prefix-sum-driven — NO RNG, so membership is a
pure function of the row: reruns, backfills and incremental batches
assign identically (the property `df.sample()` cannot give you), and
every operator has an exact ANSI-SQL twin for the oracle.

* split_by_hash — train/val/test assignment from a hash of a stable
  key.  Narrow per-row work; the split survives reshuffling,
  repartitioning and incremental arrival.
* sample_by_hash — deterministic Bernoulli-style sampling at rate p
  by hash threshold; at 100 TB the predicate is pushed into the scan.
* pack_sequences — greedy contiguous packing of documents into
  token-budget bins (LLM pretraining batch shaping): bin id = floor
  of the EXCLUSIVE running token sum / budget in a stable order.
  One window pass per partition key; at corpus scale partition by a
  shard column so each shard packs independently (the window is a
  single-partition sort otherwise — fine per shard, wrong globally).

Packing note: contiguous-cumsum packing can split a bin boundary
mid-document (a doc whose span crosses the boundary lands in the bin
where it STARTED — bins can overflow by at most one document).  That
is the standard streaming-concat packing used in LLM pipelines, not
best-fit bin packing (NP-hard, and order-destroying).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_prefix(col):
    """First 8 lowercase-hex chars of md5(key) — md5 so the DuckDB
    oracle computes the identical value (xxhash64 is Spark-only).
    Thresholding compares HEX STRINGS: lexicographic order on
    fixed-width lowercase hex equals numeric order, which sidesteps
    engine-specific hex-to-int conversion entirely."""
    return F.substring(F.md5(col.cast("string")), 1, 8)


def _frac_hex(frac: float) -> str:
    """The hex-string threshold below which ~frac of uniform 32-bit
    hashes fall."""
    return format(min(int(frac * 2**32), 2**32 - 1), "08x")


def split_by_hash(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Add ``split`` in {train, val, test, ...} by hash bucket of the
    key.  ``weights`` maps split name -> fraction (must sum to ~1);
    boundaries are cumulative over the dict's insertion order."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    h = _hash_prefix(F.col(key_col))
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = h < _frac_hex(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def sample_by_hash(df: DataFrame, p: float, key_col: str = "doc_id") -> DataFrame:
    """Deterministic ~p-fraction sample by hash threshold."""
    return df.where(_hash_prefix(F.col(key_col)) < _frac_hex(p))


def quantile_bucket_sample(
    df: DataFrame,
    score_col: str,
    rates: list[float],
    key_col: str = "chunk_id",
    bucket_col: str = "quality_bucket",
) -> DataFrame:
    """Quality-curriculum mixture: bucket rows into ``len(rates)``
    EXACT score quantiles (bucket ``q0`` = lowest scores) and keep a
    deterministic hash-threshold sample of each bucket at its rate —
    e.g. ``rates=[0.1, 0.5, 1.0]`` keeps 10% of the worst-quality
    tercile and all of the best (the CCNet/Gopher-style
    quality-stratified mixing step of a pretraining pipeline, driven
    by any per-document score such as
    :func:`textsearch.unigram_logprob`).

    Exactness: interpolated percentiles (percentile_cont) mix float
    arithmetic into the bucket BOUNDARY, which a cross-engine oracle
    can't pin.  Instead the cut for bucket i is the smallest score
    whose cumulative count reaches ``ceil((i+1)*n/k)`` — a rank
    statistic over the (score -> count) relation, all integer logic on
    already-rounded score values, so bucket membership is bit-stable
    across engines and reruns.  The cuts are two 1-row aggregates
    folded into the plan as literals (the BM25 corpus-scalar pattern).

    Scale shape: the cumulative count runs over the DISTINCT-score
    relation, not the corpus — bounded by the score's rounding
    granularity (round-6 logprobs: thousands of distinct values for
    millions of docs), so the single-partition window is a deliberate
    small-relation exception, same class as the vocab relation in
    unigram_logprob.  Membership itself is a narrow pushable filter.
    At 100 TB with a score column too fine to group, swap the exact
    cuts for approx_percentile and keep everything else.
    """
    import math

    k = len(rates)
    n = df.count()
    dist = df.groupBy(score_col).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(score_col).rowsBetween(Window.unboundedPreceding, 0)
    cum = dist.withColumn("cc", F.sum("c").over(w))
    cuts = [math.ceil((i + 1) * n / k) for i in range(k - 1)]
    trow = cum.agg(
        *[
            F.min(F.when(F.col("cc") >= c, F.col(score_col))).alias(f"t{i}")
            for i, c in enumerate(cuts)
        ]
    ).collect()[0]
    expr = None
    for i in range(k - 1):
        cond = F.col(score_col) <= F.lit(trow[f"t{i}"])
        expr = F.when(cond, f"q{i}") if expr is None else expr.when(cond, f"q{i}")
    expr = F.lit("q0") if expr is None else expr.otherwise(f"q{k - 1}")
    b = df.withColumn(bucket_col, expr)
    return stratified_sample_by_hash(
        b,
        {f"q{i}": r for i, r in enumerate(rates)},
        group_col=bucket_col,
        key_col=key_col,
    )


def stratified_sample_by_hash(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-group sampling — the domain-mixture knob of a
    training-data pipeline (e.g. keep 100% of books, 30% of common
    crawl): each group samples at its ``rates`` fraction by the same
    md5-threshold rule as :func:`sample_by_hash`, so membership is a
    pure function of (group rate, key) — rerun/backfill stable, and an
    upsampled rerate keeps every previously selected row (thresholds
    only move).  Groups absent from ``rates`` sample at
    ``default_rate``.  Pure narrow filter: no shuffle, pushable work,
    rates compiled into one CASE expression."""
    h = _hash_prefix(F.col(key_col))
    expr = None
    for g, p in sorted(rates.items()):
        cond = (F.col(group_col) == g) & (h < F.lit(_frac_hex(p)))
        expr = cond if expr is None else (expr | cond)
    others = (~F.col(group_col).isin(list(rates))) & (
        h < F.lit(_frac_hex(default_rate))
    )
    expr = others if expr is None else (expr | others)
    return df.where(expr)


GLOBAL_PACK_MAX_ROWS = 10_000_000


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 2048,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    shard_col: str | None = None,
    max_global_rows: int | None = GLOBAL_PACK_MAX_ROWS,
) -> DataFrame:
    """Assign each document a ``bin_id``: contiguous docs (in
    ``order_col`` order, per shard) whose exclusive running token sum
    falls in the same ``budget_tokens`` window share a bin.

    SCALE GUARD: with ``shard_col=None`` the prefix sum is an empty
    partitionBy — Spark moves EVERY row through one task.  That is the
    semantics the global-bin oracle needs, but it must not silently
    ship at corpus scale, so the global path refuses above
    ``max_global_rows`` (bounded probe via limit+count, not a full
    count) and tells the caller to shard.  Pass ``shard_col`` (e.g.
    the ``split`` column or ``hash_shard_col``'s prefix bucket) for
    per-shard independent packing — one window per shard, full
    parallelism, bin_id unique per (shard, bin).  ``max_global_rows=
    None`` skips the probe for callers that know the input is small."""
    part = [shard_col] if shard_col else []
    if shard_col is None and max_global_rows is not None:
        probed = df.limit(max_global_rows + 1).count()
        if probed > max_global_rows:
            raise ValueError(
                f"pack_sequences(shard_col=None) on >{max_global_rows} rows "
                "would run the whole prefix sum in ONE task; pass shard_col "
                "(e.g. from hash_shard_col) or raise max_global_rows"
            )
    w = (
        Window.partitionBy(*part)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(token_col).over(w) - F.col(token_col)  # exclusive prefix
    return df.withColumn("bin_id", F.floor(running / budget_tokens).cast("long"))


def hash_shard_col(order_col: str = "doc_id", n_shards: int = 256):
    """A deterministic shard column for :func:`pack_sequences` at
    corpus scale: the md5-prefix bucket of the order key (same hash
    family as split_by_hash, so the DuckDB oracle can recompute it).
    Documents stay contiguous WITHIN a shard; bins never span shards —
    the standard sharded-packing contract for LLM pretraining (each
    shard is an independent stream of bins)."""
    bucket = F.conv(F.substring(F.md5(F.col(order_col).cast("string")), 1, 4), 16, 10)
    return F.pmod(bucket.cast("long"), F.lit(n_shards)).alias("shard")


def pack_concat(
    df: DataFrame,
    budget_tokens: int = 2048,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str | None = None,
    sep: str = "\n",
) -> DataFrame:
    """Materialize packed training rows from :func:`pack_sequences`:
    one row per bin with the concatenated text (in order), the member
    doc ids (the boundary metadata a loss-masking dataloader needs)
    and the token total.  The groupBy collects one bin's documents —
    bounded by budget_tokens, so the agg buffer is bounded too."""
    packed = pack_sequences(df, budget_tokens, token_col, order_col, shard_col)
    parts = ([F.col(shard_col)] if shard_col else []) + [F.col("bin_id")]
    sorted_structs = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(text_col).alias("t")))
    )
    return (
        packed.groupBy(*parts)
        .agg(
            F.array_join(
                F.transform(sorted_structs, lambda s: s["t"]), sep
            ).alias("packed_text"),
            F.sort_array(F.collect_list(order_col)).alias("member_ids"),
            F.sum(token_col).alias("total_tokens"),
        )
    )


def window_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split each document into overlapping token windows — the
    long-document chunker for training-sequence prep and RAG indexing:
    (id, chunk_idx, chunk_text, n_tokens), stride = window - overlap,
    window k covering tokens [k*stride, k*stride + window).  The last
    window may be shorter; token-less documents produce no chunks.

    Pure Catalyst HOFs: tokenize once per row, explode a
    sequence(0, n_windows-1), rebuild each chunk with slice +
    array_join — no Python, no shuffle at all (narrow projection of
    the scan; at 100 TB this chunker runs map-side inside the same
    stage as the parquet read)."""
    if overlap >= window:
        raise ValueError(f"overlap {overlap} must be < window {window}")
    stride = window - overlap
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0
    )
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("toks"), F.size(toks).alias("n")
    ).where(F.col("n") > 0)
    nwin = F.when(F.col("n") <= window, F.lit(1)).otherwise(
        F.ceil((F.col("n") - F.lit(window)) / F.lit(float(stride))).cast("int")
        + F.lit(1)
    )
    piece = F.slice(
        F.col("toks"), F.col("chunk_idx") * stride + 1, window
    )
    return (
        base.select(
            "id", "toks",
            F.explode(F.sequence(F.lit(0), nwin - 1)).alias("chunk_idx"),
        )
        .select(
            "id",
            "chunk_idx",
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).cast("long").alias("n_tokens"),
        )
        .orderBy("id", "chunk_idx")
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram: int = 3,
    divisor: int = 8,
    salt: str = "cdc",
) -> DataFrame:
    """Content-defined chunking: split each document at token positions
    where the rolling hash of the ``gram`` trailing tokens is 0 mod
    ``divisor`` (FastCDC/rsync-style boundaries at token granularity).
    Unlike fixed windows, boundaries are a function of LOCAL CONTENT
    only — inserting a paragraph at the top of a page shifts every
    fixed-window chunk but leaves every content-defined chunk after the
    edit region byte-identical, so chunk-hash dedup keeps matching
    re-crawled pages that gained a banner or nav block (the dominant
    near-dup mode in web corpora).  Expected chunk length ~``divisor``
    tokens past the first eligible cut.

    Returns (id, chunk_idx, chunk_text, chunk_hash, n_tokens); the
    final token always closes the last chunk; documents shorter than
    ``gram`` tokens yield one whole-document chunk.

    Scale shape: pure Catalyst higher-order functions — tokenize,
    boundary scan, and chunk slicing all happen per-row inside the scan
    stage; nothing shuffles (the trailing orderBy is presentation
    only).  The boundary hash is the portable md5-prefix recipe so the
    DuckDB oracle replays it bit-for-bit."""
    if gram < 1 or divisor < 1:
        raise ValueError("gram and divisor must be >= 1")
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0
    )
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("toks"), F.size(toks).alias("n")
    ).where(F.col("n") > 0)

    def _cut(i):  # rolling hash of the gram ENDING at 1-based position i
        g = F.array_join(F.slice(F.col("toks"), i - F.lit(gram - 1), gram), " ")
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "|"), g)), 1, 8), 16, 10
        ).cast("long")
        return h % divisor == 0

    inner = F.when(
        F.col("n") > gram,
        F.filter(F.sequence(F.lit(gram), F.col("n") - 1), _cut),
    ).otherwise(F.expr("array()").cast("array<int>"))
    staged = base.select(
        "id", "toks", F.concat(inner, F.array(F.col("n"))).alias("b")
    )

    def _piece(j):  # tokens (b[j-1], b[j]] — b is ascending, 1-based ends
        start = F.when(j == 1, F.lit(1)).otherwise(
            F.element_at(F.col("b"), (j - 1).cast("int")) + 1
        )
        length = F.element_at(F.col("b"), j.cast("int")) - start + 1
        return F.slice(F.col("toks"), start, length)

    chunks = F.transform(
        F.sequence(F.lit(1), F.size("b")),
        lambda j: F.struct(
            (j - 1).cast("int").alias("chunk_idx"),
            F.array_join(_piece(j), " ").alias("chunk_text"),
            F.size(_piece(j)).cast("long").alias("n_tokens"),
        ),
    )
    return (
        staged.select("id", F.explode(chunks).alias("c"))
        .select(
            "id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.md5(F.col("c.chunk_text")).alias("chunk_hash"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
        .orderBy("id", "chunk_idx")
    )


def temperature_sample(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    target_frac: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """Temperature-based mixture sampling (the mT5 / XLM-R language-
    balancing rule, Xue et al. 2021 §3.1): group g is sampled with
    probability proportional to n_g^alpha, flattening the corpus's
    Zipfian group skew so giant sources stop drowning small ones.
    Per-group keep rate r_g = min(1, target_frac * N * p_g / n_g)
    with p_g = n_g^alpha / sum_h n_h^alpha; rows keep via the
    deterministic md5-uniform u(id) < r_g, so membership is a pure
    function of the row — rerun- and batch-split-stable like every
    other sampler here.

    -> (id, group, n_group, rate, kept) for every input row.

    Cross-engine exactness design: alpha=0.5 uses sqrt, which IEEE
    754 requires to be correctly rounded (identical on every engine,
    unlike pow/libm); the per-group sqrt is rounded to 6 dp and
    accumulated as DECIMAL so the denominator is order-independent
    (double SUM order is engine-unspecified); the remaining rate
    arithmetic is a fixed-shape per-row double expression.  Other
    alpha values work but route through pow — fine in production,
    not bit-replayable in an oracle.

    Scale shape: one count agg over (group) — group cardinality rows,
    broadcast back; two driver scalars folded as literals (the BM25
    corpus-scalar pattern); the keep test is a scan-stage predicate.
    Nothing but (group, n) crosses a shuffle at any corpus size.
    """
    g, i = F.col(group_col), F.col(id_col)
    cnt = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_group"))
    if alpha == 0.5:
        s_expr = F.round(F.sqrt(F.col("n_group").cast("double")), 6).cast(
            "decimal(18,6)"
        )
    else:
        s_expr = F.round(
            F.pow(F.col("n_group").cast("double"), F.lit(float(alpha))), 6
        ).cast("decimal(18,6)")
    cnt = cnt.select(group_col, "n_group", s_expr.alias("s"))
    tot = cnt.agg(
        F.sum("s").cast("decimal(38,6)").alias("den"),
        F.sum("n_group").alias("total"),
    ).collect()[0]
    den, total = float(tot["den"]), float(tot["total"])
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_frac))
        * F.lit(total)
        * (F.col("s").cast("double") / F.lit(den))
        / F.col("n_group").cast("double"),
    )
    rates = cnt.select(group_col, "n_group", rate.alias("rate"))
    h32 = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    u = (h32 + F.lit(0.5)) / F.lit(float(1 << 32))
    return (
        df.select(i.alias("id"), g.alias("group"))
        .join(F.broadcast(rates.withColumnRenamed(group_col, "group")), "group")
        .select(
            "id",
            "group",
            "n_group",
            F.round("rate", 6).alias("rate"),
            (u < F.col("rate")).cast("long").alias("kept"),
        )
    )


def cluster_balanced_sample(
    assign: DataFrame,
    per_cluster: int = 30,
    id_col: str = "id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Cluster-balanced subsample: from a clustering assignment (e.g.
    :func:`~graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators.similarity.kmeans_assign`),
    keep an EXPECTED ``per_cluster`` rows from every cluster — the
    diversity-preserving draw behind cluster-balanced curation (big
    boilerplate clusters are downsampled hard, small rare clusters
    survive whole), the selection half of the SemDeDup regime.

    Membership is a deterministic hash test made ENGINE-EXACT with
    pure integer arithmetic: keep row iff

        u32(md5(id)) * n_cluster  <  per_cluster * 2^32

    i.e. rate = per_cluster / n_cluster compared without ever forming
    the float — both sides are exact BIGINTs (u32 < 2^32, n < 2^31:
    the product stays far below 2^63), so the kept set is identical
    across engines, partitionings, and reruns, and batch-split stable
    like every hash sampler here.  Clusters with n <= per_cluster keep
    everything (rate >= 1).

    Returns (id, cluster, n_cluster, kept) for every input row —
    callers filter ``kept`` (keeping the flag makes the expected-rate
    accounting auditable downstream).

    Scale shape: ONE k-row count aggregate broadcast back onto the
    stream; the keep test is a scan predicate.  Nothing but
    (cluster, count) pairs shuffle."""
    counts = assign.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n_cluster")
    )
    u32 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        assign.join(F.broadcast(counts), cluster_col)
        .select(
            F.col(id_col).alias("id"),
            F.col(cluster_col).alias("cluster"),
            "n_cluster",
            (
                u32 * F.col("n_cluster")
                < F.lit(int(per_cluster) * 4294967296)
            ).cast("long").alias("kept"),
        )
        .orderBy("id")
    )
