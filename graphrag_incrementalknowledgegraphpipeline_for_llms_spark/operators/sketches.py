"""Deterministic mergeable sketches: KMV distinct-count and k-min
quantile sampling.

Sketch operators are the scale answer when an exact aggregate's state
is unbounded: exact COUNT(DISTINCT x) shuffles every distinct value;
exact percentiles sort the column.  Both sketches here keep O(k) state
per group, merge associatively across partitions (map-side combine
does most of the work — the shuffle carries one k-array per group per
map task), and are DETERMINISTIC: the "random" hash is Spark's
xxhash64, so every run — and the pure-Python pytest oracle — produces
bit-identical sketches.  That determinism is what HLL/t-digest
implementations can't give an exact-comparison test harness.

* KMV (k minimum values): keep the k smallest hash values of the set.
  Estimate: (k-1) / normalized k-th minimum — the classic bottom-k
  estimator (relative error ~ 1/sqrt(k-2)).  Exact when the group has
  fewer than k distinct values (the sketch IS the distinct set then).
* k-min sample quantiles: the same bottom-k trick keeps a uniform
  (hash-ordered) sample of distinct values; quantiles read from the
  sample.  Coarser than KLL at the same k, but mergeable,
  deterministic, and honest about its error (documented, not hidden).

Shuffle shape: ``dropDuplicates([group, hash])`` first (map-side
combine removes repeat values before any exchange), then a window
``row_number() <= k`` over (group, hash-ascending).  The shuffle
carries (group, 8-byte hash) pairs only, and the window is sort-based
streaming state — one row in flight per group.  A
``collect_set``-then-slice aggregate would be simpler but its buffer
is unbounded — the exact thing a sketch exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Spark xxhash64 returns signed 64-bit; shift to unsigned order by
# flipping the sign bit so "smallest hash" is well-defined uniformly.
_SIGN = -(1 << 63)

_M64 = float(1 << 64)


def _uhash(col) -> "F.Column":
    """xxhash64 mapped to an order-preserving unsigned rank (stored
    signed: h XOR sign-bit), so ascending sort = unsigned hash order."""
    return F.xxhash64(col).bitwiseXOR(F.lit(_SIGN))


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV sketch: (group..., kmv: array<bigint> — the k
    smallest distinct unsigned-ordered hashes, ascending).

    Mergeable: union two sketch tables and re-run ``kmv_merge`` (or
    this function over the union of raw tables) — bottom-k of a union
    = bottom-k of concatenated bottom-k's."""
    group_cols = group_cols or []
    hashed = df.select(
        *group_cols, _uhash(F.col(value_col)).alias("_h")
    ).dropDuplicates([*group_cols, "_h"])
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("_h") if group_cols else Window.partitionBy(F.lit(1)).orderBy("_h")
    topk = hashed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return topk.groupBy(*group_cols).agg(F.sort_array(F.collect_list("_h")).alias("kmv"))


def kmv_merge(sketches: DataFrame, group_cols: list[str] | None = None, k: int = 256) -> DataFrame:
    """Merge sketch rows (e.g. from different days/partitions of a
    table): concatenate, distinct, keep the k smallest."""
    group_cols = group_cols or []
    return sketches.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))), 1, k
        ).alias("kmv")
    )


def kmv_estimate(sketches: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate per sketch row.

    |kmv| < k  -> the sketch saw every distinct value: exact count.
    |kmv| == k -> (k-1) / R where R = fraction of hash space below the
    k-th minimum (unsigned)."""
    n = F.size("kmv")
    kth = F.element_at(F.col("kmv"), k)
    # unsigned fraction of 2^64 below the k-th minimum
    frac = (kth.cast("double") - F.lit(float(_SIGN))) / F.lit(_M64)
    est = F.when(n < k, n.cast("double")).otherwise((F.lit(float(k - 1))) / frac)
    return sketches.withColumn("distinct_est", F.round(est, 3))


def kmin_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Approximate per-group quantiles of DISTINCT values from a
    deterministic bottom-k-by-hash sample: keep the k values whose
    hashes are smallest (a uniform sample of the distinct set), read
    quantiles off the sorted sample.

    Error: sample-of-distincts quantiles — right for "what does a
    typical VALUE look like" (p50 token count over distinct docs),
    wrong for frequency-weighted quantiles; use the exact
    ``percentile`` on a pre-aggregated table for the latter."""
    group_cols = group_cols or []
    hashed = df.select(
        *group_cols, F.col(value_col).alias("_v"), _uhash(F.col(value_col)).alias("_h")
    ).dropDuplicates([*group_cols, "_h"])
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("_h") if group_cols else Window.partitionBy(F.lit(1)).orderBy("_h")
    topk = hashed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    sample = topk.groupBy(*group_cols).agg(F.array_sort(F.collect_list("_v")).alias("_sample"))
    qcols = [
        F.element_at(
            F.col("_sample"),
            F.greatest(
                F.lit(1), F.ceil(F.size("_sample") * F.lit(float(p))).cast("int")
            ),
        ).alias(f"q{int(p * 100)}")
        for p in probs
    ]
    return sample.select(*group_cols, *qcols)


def hll_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    hash_family: str = "xxh64",
) -> DataFrame:
    """HyperLogLog register rows (Flajolet et al. 2007) — the
    industry-standard distinct sketch, here in its DETERMINISTIC,
    cross-engine-exact form: a 32-bit hash splits into a ``p``-bit
    register index and a ``32-p``-bit suffix whose leading-zero run
    (+1) is the register candidate; the sketch is the per-register
    MAX.  Rows are (group..., bucket, rho) — at most ``2^p`` per
    group, map-side combined (max is algebraic), merged by
    :func:`hll_merge` with plain max again.

    Leading-zero count is integer-exact in both engines via
    ``length(bin(x))`` (no float log2 — ``floor(log2(2^k))`` can land
    on k-1 in binary floating point).  vs KMV (kmv_sketch): HLL state
    is 2^p bytes-ish and error ~1.04/sqrt(2^p); KMV keeps k hashes
    with error ~1/sqrt(k-2) but doubles as a uniform sample of the
    distinct set.  Both live here because both appear in real
    pipeline stacks."""
    gc = list(group_cols or [])
    m = 1 << p
    rem = 32 - p
    v = F.col(value_col).cast("string")
    if hash_family == "md5":
        h32 = F.conv(F.substring(F.md5(v), 1, 8), 16, 10).cast("long")
    else:
        h32 = F.pmod(F.xxhash64(v), F.lit(1 << 32))
    bucket = F.shiftright(h32, rem)
    x = F.pmod(h32, F.lit(1 << rem))
    rho = F.when(x == 0, F.lit(rem + 1)).otherwise(
        F.lit(rem + 1) - F.length(F.bin(x))
    )
    return (
        df.select(*gc, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*gc, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(sketches: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Union of HLL sketches = per-register max (associative,
    commutative — per-day sketches fold into the corpus sketch)."""
    gc = list(group_cols or [])
    return sketches.groupBy(*gc, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    sketch: DataFrame, group_cols: list[str] | None = None, p: int = 8
) -> DataFrame:
    """Distinct-count estimate from HLL registers, small-range
    corrected (linear counting below 2.5m with empty registers — the
    published recipe).  All register arithmetic is INTEGER
    (``Σ 2^(rem+1-rho)`` plus ``2^(rem+1)`` per absent register), so
    the only floats are one literal-alpha multiply + one divide (and
    ``ln`` in the small-range branch), identical IEEE in both engines;
    rounded to 6dp like every cross-engine double."""
    gc = list(group_cols or [])
    m = 1 << p
    rem = 32 - p
    scale = 1 << (rem + 1)
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = sketch.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            # pyspark's shiftleft() wrapper insists on int bits; the SQL
            # function takes a column expression
            F.call_function("shiftleft", F.lit(1), F.lit(rem + 1) - F.col("rho"))
        ).alias("s_present"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("n_present")) * F.lit(scale)
    e_raw = F.lit(alpha * m * m * scale) / s
    v_zero = F.lit(m) - F.col("n_present")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(m) / v_zero),
    ).otherwise(e_raw)
    return agg.select(
        *gc, F.round(est, 6).alias("est_distinct")
    )


def bottomk_row_sample(
    df: DataFrame,
    id_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    salt_buckets: int = 32,
    hash_family: str = "xxh64",
) -> DataFrame:
    """Uniform per-group ROW sample of size ≤k — the
    frequency-weighted sibling of :func:`kmin_quantiles`'s
    distinct-value sample: rows are ranked by a hash of their IDENTITY
    (``id_col``), not their value, so repeated values keep their
    multiplicity and the sample estimates the row distribution.

    Mergeable: bottom-k by hash is associative —
    ``bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B))``
    (pytest-pinned), so per-partition / per-day sketches union into
    the corpus sketch without re-reading rows.

    Scale shape (why two levels): a single ``row_number`` window over
    each group sort-buffers the WHOLE group on one reducer — the exact
    hot-group pathology windows have at 100 TB.  Level 1 salts the
    window key with ``pmod(hash, salt_buckets)`` so each reducer sorts
    only its slice and emits ≤k rows; level 2 re-selects bottom-k from
    the ≤ salt_buckets*k survivors per group (correct BECAUSE the
    sketch is mergeable).  ``hash_family='md5'`` ranks by the md5 hex
    string for cross-engine oracles; the engine default stays
    xxhash64."""
    gc = list(group_cols or [])
    idc = F.col(id_col).cast("string")
    hcol = F.md5(idc) if hash_family == "md5" else _uhash(idc)
    x = df.withColumn("_h", hcol).withColumn(
        "_salt", F.pmod(F.xxhash64(idc), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(*gc, "_salt").orderBy("_h")
    cand = (
        x.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = (
        Window.partitionBy(*gc).orderBy("_h")
        if gc
        else Window.partitionBy(F.lit(1)).orderBy("_h")
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def row_quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    probs: list[float],
    group_cols: list[str] | None = None,
    k: int = 256,
    salt_buckets: int = 32,
    hash_family: str = "xxh64",
) -> DataFrame:
    """Per-group quantiles read off a :func:`bottomk_row_sample`:
    O(k) state, mergeable, deterministic.  Quantile = element at
    ``ceil(p * n)`` of the sorted sample (no interpolation — the
    returned value is always a real data point, and the index math is
    identical IEEE across engines).  Standard bottom-k sample error:
    ±O(1/sqrt(k)) in rank."""
    gc = list(group_cols or [])
    s = bottomk_row_sample(
        df.select(*gc, value_col, id_col), id_col, gc, k, salt_buckets, hash_family
    )
    sample = s.groupBy(*gc).agg(
        F.array_sort(F.collect_list(value_col)).alias("_sample")
    )
    qcols = [
        F.element_at(
            F.col("_sample"),
            F.greatest(
                F.lit(1), F.ceil(F.size("_sample") * F.lit(float(p))).cast("int")
            ),
        ).alias(f"q{int(p * 100)}")
        for p in probs
    ]
    return sample.select(
        *gc, F.size("_sample").cast("long").alias("n_sampled"), *qcols
    )


def _cms_bucket(term, j: int, width: int, hash_family: str = "xxh64"):
    """Row j's bucket for a term: hash(j || ':' || term) mod width.
    ``hash_family='md5'`` uses the engine's portable 32-bit md5 prefix
    (conv of the first 8 hex chars) so a SQL oracle can replay the
    sketch bit-for-bit; xxh64 is the production default (one JVM hash
    per row instead of an md5 + string conv)."""
    key = F.concat_ws(":", F.lit(str(j)), term)
    if hash_family == "md5":
        h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64(key).bitwiseXOR(F.lit(_SIGN))
    return F.pmod(h, F.lit(width))


def count_min_sketch(
    df: DataFrame,
    term_col: str,
    width: int = 1024,
    depth: int = 4,
    hash_family: str = "xxh64",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a term
    stream: -> (j, bucket, c) with depth x width counters, c = number
    of input rows hashing to (j, bucket).  Estimates are
    OVERCOUNTS-only: est(t) = min_j counter[j][h_j(t)] >= true(t),
    with error <= 2N/width at probability 1 - 2^-depth.

    The 100-TB property is the STATE BOUND: the sketch is depth*width
    counters regardless of vocabulary size, built by one hash
    aggregate (map-side combine does almost all the summing — each
    task emits at most depth*width partial rows), and two sketches
    merge by adding counters (a groupBy-sum over their union), so
    per-day partial sketches compose into the corpus sketch without
    touching raw data again — the same O(1)-state contract as KMV.
    """
    t = df.select(F.col(term_col).alias("t"))
    rows = t.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(F.col("t"), j, width, hash_family).alias(
                            "bucket"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("jb")
    )
    return rows.groupBy(
        F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge CMS partials (same width/depth/hash): counters add."""
    return sketches.groupBy("j", "bucket").agg(F.sum("c").alias("c"))


def heavy_hitters(
    df: DataFrame,
    term_col: str,
    k: int = 20,
    width: int = 1024,
    depth: int = 4,
    hash_family: str = "xxh64",
    sketch: DataFrame | None = None,
) -> DataFrame:
    """Top-k heavy hitters by Count-Min estimate: -> (term, est)
    ordered est desc / term.  The candidate set is the distinct terms
    (exact identities, estimated counts — the standard candidate-pass
    formulation; at stream scale the candidates come from a bounded
    space like the token vocabulary, which Zipf keeps far smaller
    than the corpus).  Pass a prebuilt/merged ``sketch`` to score
    against accumulated history instead of just ``df``.

    est(t) >= true(t) always; ties broken by term so the output is
    deterministic for any width."""
    if sketch is None:
        sketch = count_min_sketch(df, term_col, width, depth, hash_family)
    cand = df.select(F.col(term_col).alias("term")).distinct()
    probes = cand.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(F.col("term"), j, width, hash_family).alias(
                            "bucket"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("jb"),
    ).select("term", F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket"))
    # LEFT join + zero-fill: a counter row absent from the sketch IS a
    # zero counter — with a prebuilt/merged ``sketch`` an unseen term's
    # empty buckets must drive its min to 0, not vanish from the probe
    # (an inner join would report min over only the collided buckets)
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
        .orderBy(F.desc("est"), "term")
        .limit(k)
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_words: int = 256,
    k: int = 4,
    hash_family: str = "xxh64",
) -> DataFrame:
    """Distributed Bloom filter build -> (word, bits): m_words 32-bit
    words (stored in BIGINT so the SQL twin never hits signed-shift
    overflow), k probe positions per key via the same portable hash
    family as the CMS (hash(i ':' key) mod 32*m_words).

    The 100-TB contract matches the other sketches: state is O(m)
    regardless of key count, the build is ONE hash aggregate whose
    map-side combine ORs per-task partials down to <= m_words rows
    per task, and two filters over the same (m_words, k, family)
    merge by bitwise OR (:func:`bloom_merge`) — so per-day crawl
    partials compose into the frontier filter without re-reading raw
    data.  No false negatives ever; false-positive rate is the
    standard (1 - e^{-kn/m})^k.
    """
    m_bits = m_words * 32
    key = F.col(key_col)
    pos = F.explode(
        F.array(
            *[
                _cms_bucket(key, i, m_bits, hash_family).alias("p")
                for i in range(k)
            ]
        )
    ).alias("p")
    p = df.select(pos)
    return p.groupBy((F.col("p") / 32).cast("long").alias("word")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 32) AS INT))")
        ).alias("bits")
    )


def bloom_merge(sketches: DataFrame) -> DataFrame:
    """Merge Bloom partials (same m_words/k/family): bits OR."""
    return sketches.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    probes: DataFrame,
    sketch: DataFrame,
    key_col: str,
    m_words: int = 256,
    k: int = 4,
    hash_family: str = "xxh64",
) -> DataFrame:
    """Membership test -> (key, maybe_present): present iff all k bits
    are set.  The sketch side is O(m) rows and is broadcast, so the
    probe is a map-side join — at 10^12 probe rows this is one scan
    with zero shuffle on the big side (the k-row explode per probe
    collapses back with a map-side-combinable min).
    """
    m_bits = m_words * 32
    key = F.col(key_col)
    pr = probes.select(
        key.alias("key"),
        F.explode(
            F.array(
                *[_cms_bucket(key, i, m_bits, hash_family) for i in range(k)]
            )
        ).alias("p"),
    )
    joined = pr.join(
        F.broadcast(sketch),
        (F.col("p") / 32).cast("long") == F.col("word"),
        "left",
    ).select(
        "key",
        F.when(
            F.col("bits").isNotNull()
            & (
                F.col("bits").bitwiseAND(
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 32) AS INT))")
                )
                != 0
            ),
            1,
        )
        .otherwise(0)
        .alias("hit"),
    )
    return joined.groupBy("key").agg(
        F.min("hit").cast("long").alias("maybe_present")
    )
