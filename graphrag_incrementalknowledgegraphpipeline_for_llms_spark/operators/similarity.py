"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the correctness baseline: one narrow pass
  computing the score (JVM array math via zip_with/aggregate, no UDF),
  then TakeOrderedAndProject.  At 100 TB this is a full scan but zero
  shuffle — the right baseline shape.
* LSH-bucketed ANN — the scale path: sign-random-projection buckets
  from a deterministic hyperplane set (seeded numpy, broadcast as
  literal arrays); candidates share >= 1 band bucket, re-ranked exactly.
* embedding near-dup pairs — cosine >= threshold within LSH buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a, b):
    """Cosine similarity between two array columns, double math."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def brute_force_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    score = cosine_col(F.col(vec_col), q)
    return (
        embeddings.select(F.col(id_col).alias("vec_id"), F.round(score, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype("float64")


def _planes_lit(planes: np.ndarray):
    """ONE nested-array literal for all plane dots: n_planes separate
    dot-aggregate expressions (each a dim-literal array) made the
    analyzed tree huge — plan compile dominated the first execution
    (~5 s at n_planes=16, dim=64).  The packed form is one expression;
    per-row work is identical."""
    return F.array(*[F.array(*[F.lit(float(w)) for w in p]) for p in planes])


def _srp_bits(vec, planes: np.ndarray):
    """'0'/'1' sign-bit array of the plane dots for a double vector
    column — THE single definition of the SRP bucketing rule, shared
    by srp_buckets and build_quantized_index (and mirrored literally
    in the DuckDB oracles)."""
    return F.transform(
        _planes_lit(planes),
        lambda p: F.when(_dot(vec, p) >= 0, F.lit("1")).otherwise(F.lit("0")),
    )


def _band_structs(bits_col, n_planes: int, bands: int):
    """explode(...) of (band, bucket) structs sliced from a staged
    bits-array attribute."""
    per_band = n_planes // bands
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.array_join(
                        F.slice(bits_col, b * per_band + 1, per_band), ""
                    ).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
    )


def _staged_quantize(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id_col, v double-array, scale) with the staged-select
    discipline (scale is multi-referenced downstream; a non-cheap
    alias co-defined in its consuming select re-expands per consumer)
    — THE single definition of the int8 scale rule, shared by
    quantize_int8 and build_quantized_index."""
    xd = embeddings.select(
        id_col,
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    sc0 = xd.select(
        id_col,
        "v",
        (F.array_max(F.transform(F.col("v"), F.abs)) / F.lit(127.0)).alias("m"),
    )
    return sc0.select(
        id_col,
        "v",
        F.when(F.col("m") == 0, F.lit(1.0)).otherwise(F.col("m")).alias("scale"),
    )


def srp_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection LSH: (id, band, bucket).  Hyperplanes are
    deterministic literals compiled into the plan (tiny: n_planes*dim
    doubles), so executors need no side channel."""
    planes = _hyperplanes(dim, n_planes, seed)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # stage the bit computation so the `bands` band-struct expressions
    # slice an attribute instead of re-evaluating every plane dot
    staged = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _srp_bits(vec, planes).alias("_bits"),
    )
    band_rows = _band_structs(F.col("_bits"), n_planes, bands).alias("bb")
    return staged.select("id", "vec", band_rows).select(
        "id", "vec", "bb.band", "bb.bucket"
    )


def ann_topk(
    embeddings: DataFrame,
    query: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: restrict to vectors sharing >= 1 band bucket with the
    query, re-rank exactly.  Bucket filter is a broadcast semi-join of
    <= `bands` literal keys — effectively partition pruning."""
    import numpy as _np

    planes = _hyperplanes(dim, n_planes, seed)
    qv = _np.asarray(query, dtype="float64")
    qbits = (planes @ qv >= 0).astype(int)
    per_band = n_planes // bands
    qbuckets = {
        (b, "".join(map(str, qbits[b * per_band : (b + 1) * per_band]))) for b in range(bands)
    }
    bucketed = srp_buckets(embeddings, dim, n_planes, bands, seed, id_col, vec_col)
    cond = None
    for b, bk in sorted(qbuckets):
        c = (F.col("band") == b) & (F.col("bucket") == bk)
        cond = c if cond is None else (cond | c)
    cands = bucketed.where(cond).select("id", "vec").distinct()
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        cands.select(
            F.col("id").alias("vec_id"), F.round(cosine_col(F.col("vec"), q), 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means-coarse-quantizer scale path.
# Training samples a bounded prefix to the driver (standard IVF
# practice: centroids are trained on a sample, applied to the corpus);
# assignment + probing are narrow per-row JVM expressions, so at 100 TB
# the assign pass is a map-only job and a table PARTITIONED BY list_id
# turns probes into partition pruning.
# ---------------------------------------------------------------------------

def ivf_training_pool(
    embeddings: DataFrame,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_frac: float | None = None,
) -> DataFrame:
    """The (possibly hash-filtered) pool centroid training draws its
    ordered ``sample`` from.

    ``sample_frac=None`` (the default) AUTO-DERIVES the rate: a bounded
    probe (``limit(8*sample + 1).count()`` — the pack_sequences guard
    pattern, reads at most that many rows) decides whether the corpus
    is small enough to skip the filter; if it isn't, a column-pruned
    id count sizes ``frac`` so ``frac * n ~= 4 * sample`` survive into
    the top-k heap.  Pass an explicit float to pin the rate, or
    ``sample_frac >= 1.0`` to force the unfiltered full-corpus scan.

    The filter itself is sampling.sample_by_hash — a pushed-down
    md5-threshold predicate on the id, so membership (and therefore
    the trained centroids) is a pure function of the id: identical
    across reruns, partitionings and incremental growth of the tail
    (new ids hash in, existing ids never shift out)."""
    pool = embeddings.select(id_col, vec_col)
    if sample_frac is None:
        probe_cap = 8 * sample
        probed = pool.select(id_col).limit(probe_cap + 1).count()
        if probed > probe_cap:
            n = pool.select(id_col).count()
            sample_frac = min(1.0, (4.0 * sample) / max(n, 1))
        else:
            sample_frac = 1.0
    if sample_frac < 1.0:
        from .sampling import sample_by_hash

        pool = sample_by_hash(pool, sample_frac, key_col=id_col)
    return pool


def ivf_train_centroids(
    embeddings: DataFrame,
    dim: int,
    n_lists: int = 16,
    iters: int = 8,
    sample: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_frac: float | None = None,
) -> np.ndarray:
    """Deterministic Lloyd's k-means over a bounded driver-side sample
    (deterministic, no RNG over data; init = seeded gaussian).
    Returns (n_lists, dim) float64.

    ``sample_frac``: hash-rate pre-filter (see ivf_training_pool).
    Without it the limit is a TakeOrderedAndProject over the WHOLE
    corpus — every vector scanned and heap-compared to sample 10k
    rows; the None default now derives a rate from a bounded row probe
    instead of falling back to that full scan."""
    pool = ivf_training_pool(embeddings, sample, id_col, vec_col, sample_frac)
    rows = pool.orderBy(id_col).limit(sample).collect()
    x = np.asarray([list(r[vec_col]) for r in rows], dtype="float64")
    return _lloyd(x, n_lists, iters, seed, dim)


def _lloyd(
    x: "np.ndarray", n_lists: int, iters: int, seed: int, dim: int
) -> "np.ndarray":
    """Deterministic driver-side Lloyd's k-means (shared by the IVF
    coarse quantizer and the PQ sub-codebooks)."""
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    if len(cent) < n_lists:  # tiny corpora: pad with jittered copies
        extra = cent[rng.choice(len(cent), n_lists - len(cent))] + 1e-3 * rng.randn(
            n_lists - len(cent), dim
        )
        cent = np.vstack([cent, extra])
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(n_lists):
            m = assign == j
            if m.any():
                cent[j] = x[m].mean(axis=0)
    return cent


def _dist2_to_centroid(vec, centroid: np.ndarray):
    c = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``list_id`` = argmin squared distance to the centroids
    (centroids are plan literals, like srp_buckets' hyperplanes).
    Narrow map-only pass — no shuffle."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dists = F.array(*[_dist2_to_centroid(vec, c) for c in centroids])
    list_id = F.array_position(dists, F.array_min(dists)) - F.lit(1)
    return embeddings.withColumn("list_id", list_id.cast("int"))


def ivf_topk(
    embeddings: DataFrame,
    query: list[float],
    centroids: np.ndarray,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: restrict to the ``nprobe`` lists whose centroids are
    nearest the query, re-rank exactly by cosine.  The list filter is a
    literal IN-predicate — partition pruning when the table is stored
    partitioned by list_id."""
    q = np.asarray(query, dtype="float64")
    order = (((centroids - q[None, :]) ** 2).sum(axis=1)).argsort()
    probe = [int(j) for j in order[:nprobe]]
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    qcol = F.array(*[F.lit(float(v)) for v in query])
    return (
        assigned.where(F.col("list_id").isin(probe))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_col(F.col(vec_col), qcol), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def srp_candidate_pairs(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distinct (a_id, b_id) pairs sharing >= 1 SRP band bucket — the
    scale-safe candidate source for near-dup verification.  Join key is
    (band, bucket): skew is bounded by true near-dup cluster sizes, the
    same shape as minhash_lsh_candidates."""
    b = srp_buckets(embeddings, dim, n_planes, bands, seed, id_col, vec_col).select(
        "id", "band", "bucket"
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, ["band", "bucket"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a_id"), F.col("r.id").alias("b_id"))
        .distinct()
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str | None = None,
    candidates: DataFrame | None = None,
    dim: int | None = None,
    n_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate vector pairs by exact cosine.  Candidate source:

    * ``candidates`` (a_id, b_id) — verify those pairs (external
      blocking, e.g. :func:`srp_candidate_pairs`).
    * ``group_col`` — within-group join (bounded small groups; the
      oracle-checkable variant).
    * neither — SRP-LSH bucket co-membership (requires ``dim``); the
      former all-pairs cross join is gone.

    SRP sizing at scale: bucket count per band is 2^(n_planes/bands);
    the default 16/4 (16 buckets) is calibrated to the sf0.01 oracle
    corpus — at N vectors size n_planes/bands so 2^bits >> N /
    tolerable-bucket-size, and note that band-collision recall for a
    TRUE near-dup pair (cosine >= 0.9, angle <= 26 deg) stays high at
    8-10 bits per band, while low thresholds like 0.3 inherently need
    more bands (textbook SRP recall curve — the dial, not a bug)."""
    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        *([F.col(group_col).alias("grp")] if group_col else []),
    )
    if candidates is None and group_col is None:
        if dim is None:
            raise ValueError(
                "embedding_near_dups without group_col/candidates needs dim= "
                "for the SRP-LSH default path (all-pairs is not offered)"
            )
        candidates = srp_candidate_pairs(
            embeddings, dim, n_planes=n_planes, bands=bands,
            id_col=id_col, vec_col=vec_col,
        )
    # per-VECTOR double cast + norm computed once on the n-row side
    # tables instead of per candidate pair (dot/(na*nb) is the same
    # IEEE expression cosine_col evaluates, so scores are identical)
    based = base.withColumn(
        "vec", F.transform(F.col("vec"), lambda x: x.cast("double"))
    ).withColumn("_n", _norm(F.col("vec")))
    if candidates is not None:
        a = based.select(
            F.col("id").alias("a_id"),
            F.col("vec").alias("vec_a"),
            F.col("_n").alias("_na"),
        )
        b = based.select(
            F.col("id").alias("b_id"),
            F.col("vec").alias("vec_b"),
            F.col("_n").alias("_nb"),
        )
        sim = F.round(
            _dot(F.col("vec_a"), F.col("vec_b")) / (F.col("_na") * F.col("_nb")), 6
        )
        return (
            candidates.join(a, "a_id")
            .join(b, "b_id")
            .select("a_id", "b_id", sim.alias("cosine"))
            .where(F.col("cosine") >= threshold)
        )
    l, r = based.alias("l"), based.alias("r")
    sim = F.round(
        _dot(F.col("l.vec"), F.col("r.vec")) / (F.col("l._n") * F.col("r._n")), 6
    )
    return (
        l.join(r, [F.col("l.grp") == F.col("r.grp")])
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a_id"), F.col("r.id").alias("b_id"), sim.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``scale =
    max(|x|)/127``, ``q_i = trunc(x_i / scale)`` (toward zero — the
    one rounding rule Spark's int cast and DuckDB's trunc() share).
    Returns (id, qv array<int>, scale).  At 100 TB this is the
    difference between holding embeddings in memory and not: 4x
    smaller than float32, and the quantized cosine needs NO
    dequantization (scales cancel — see :func:`quantized_topk`).

    Staged selects on purpose: ``scale`` is referenced by every lane
    of the quantize transform, and a multiply-referenced non-cheap
    alias co-defined in its consuming select gets re-expanded per
    consumer by projection collapse (the measured minhash pathology) —
    each derived level lives in its own select."""
    sc = _staged_quantize(embeddings, id_col, vec_col)
    return sc.select(
        id_col,
        F.transform(F.col("v"), lambda x: (x / F.col("scale")).cast("int")).alias(
            "qv"
        ),
        "scale",
    )


def _py_quantize_int8(vec) -> list[int]:
    """Driver-side twin of :func:`quantize_int8` for literal query
    vectors — same double math, same toward-zero truncation."""
    v = [float(x) for x in vec]
    m = max((abs(x) for x in v), default=0.0) / 127.0
    s = 1.0 if m == 0 else m
    return [int(x / s) for x in v]


def quantized_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by cosine over int8-quantized vectors — the
    memory-bound scale path for brute-force similarity (4x smaller
    scans than :func:`brute_force_topk`; SRP/IVF bucket the CANDIDATE
    set, this shrinks the BYTES).  The per-vector scales cancel in the
    cosine, so the score is ``dot(qa, qb) / (||qa|| * ||qb||)`` — pure
    INTEGER dot and norms divided once, which is bit-identical across
    engines by construction (no float accumulation order anywhere).
    Returns (vec_id, qcosine) ranked desc with id tie-break.

    This variant quantizes ON THE FLY (one float scan), so it only
    pays off once the quantized table is MATERIALIZED — that composed
    shape (build :func:`build_quantized_index` once, prune by the
    query's SRP buckets, integer re-rank) is
    :func:`quantized_ann_topk`."""
    qd = quantize_int8(embeddings, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("vec_id"), "qv"
    )
    return _quantized_rerank(qd, query, k)


def _quantized_rerank(qd: DataFrame, query: list[float], k: int) -> DataFrame:
    """Shared integer re-rank over a (vec_id, qv array<int>) relation:
    quantize the query driver-side, integer dot / integer norms, round
    6, desc with id tie-break.  Zero-norm corpus vectors are excluded
    (0/0 is NaN, which Spark's desc sort puts FIRST); an all-zero
    query returns empty."""
    q = _py_quantize_int8(query)
    qn = sum(x * x for x in q) ** 0.5
    if qn == 0:
        # an all-zero query has no cosine neighborhood; 0/0 would be
        # NaN, which Spark sorts ABOVE every real score in desc order
        return qd.select(
            F.col("vec_id"), F.lit(0.0).alias("qcosine")
        ).limit(0)
    qarr = F.array(*[F.lit(int(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col("qv"), qarr, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("qv"), lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    # staged select: dot and nrm are each referenced downstream, and a
    # multi-referenced aggregate alias co-defined in its consuming
    # select re-expands per consumer (projection collapse)
    staged = qd.select(
        F.col("vec_id"), dot.alias("_dot"), nrm.alias("_n")
    )
    return (
        # all-zero corpus vectors (nrm 0) are excluded, not ranked:
        # their 0/0 score is NaN and Spark's desc sort puts NaN FIRST,
        # which would displace a real neighbor from the top-k
        staged.where(F.col("_n") > 0)
        .select(
            "vec_id",
            F.round(F.col("_dot") / (F.col("_n") * F.lit(float(qn))), 6).alias(
                "qcosine"
            ),
        )
        .orderBy(F.desc("qcosine"), "vec_id")
        .limit(k)
    )


def build_quantized_index(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ONE float pass over the corpus producing the materializable
    quantized-ANN index: ``(band, bucket, vec_id, qv array<int>)``.

    This is the 100-TB shape for embedding similarity: write the
    result PARTITIONED BY (band, bucket) and every query scans only
    its ``bands`` matching buckets (partition pruning via literal
    predicates) and only int8 payloads (4x fewer bytes than float32
    — the exploded `bands` copies of qv cost the same bytes as ONE
    float copy, so the index is no larger than the raw embeddings).
    Scale and the float vector are deliberately NOT stored: the
    quantized cosine needs neither (scales cancel — see
    :func:`quantized_topk`).

    Staged selects: scale, qv and the SRP bit array each reference
    the double vector / each other multiple times, and a
    multi-referenced non-cheap alias co-defined in its consuming
    select re-expands per consumer (projection collapse) — each
    derived level is an attribute of its own select."""
    planes = _hyperplanes(dim, n_planes, seed)
    sc = _staged_quantize(
        embeddings.select(F.col(id_col).alias("vec_id"), vec_col), "vec_id", vec_col
    )
    qd = sc.select(
        "vec_id",
        F.transform(F.col("v"), lambda x: (x / F.col("scale")).cast("int")).alias("qv"),
        _srp_bits(F.col("v"), planes).alias("_bits"),
    )
    band_rows = _band_structs(F.col("_bits"), n_planes, bands).alias("bb")
    return qd.select("vec_id", "qv", band_rows).select(
        "bb.band", "bb.bucket", "vec_id", "qv"
    )


def quantized_ann_topk(
    embeddings: DataFrame | None,
    query: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: DataFrame | None = None,
) -> DataFrame:
    """The COMPOSED quantized-ANN query: SRP bucket pruning for the
    candidate set x int8 quantization for the bytes, over a
    once-materialized :func:`build_quantized_index`.

    * ``index=`` (the production path): pass the materialized index
      (e.g. read back from a catalog table partitioned by
      (band, bucket)); the query never touches float embeddings —
      it scans <= ``bands`` buckets of int8 rows and integer-re-ranks.
    * ``embeddings=`` only (the test/oracle path): the index is built
      inline — same plan shape, one extra float pass.

    The bucket filter is an OR of ``bands`` (band = b AND bucket = s)
    literal conjunctions — partition pruning on a partitioned index,
    an ordinary pushed predicate otherwise.  A vector sharing several
    buckets with the query is deduped by (vec_id, qv) before the
    re-rank so it is scored once."""
    if index is None:
        if embeddings is None:
            raise ValueError("pass either embeddings or a prebuilt index")
        index = build_quantized_index(
            embeddings, dim, n_planes, bands, seed, id_col, vec_col
        )
    planes = _hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query, dtype="float64")
    qbits = (planes @ qv >= 0).astype(int)
    per_band = n_planes // bands
    cond = None
    for b in range(bands):
        bk = "".join(map(str, qbits[b * per_band : (b + 1) * per_band]))
        c = (F.col("band") == b) & (F.col("bucket") == bk)
        cond = c if cond is None else (cond | c)
    cands = index.where(cond).select("vec_id", "qv").distinct()
    return _quantized_rerank(cands, query, k)


def auto_srp_planes(n_rows: int, bands: int = 4, target_bucket: int = 256) -> int:
    """SRP plane count sized to the corpus: enough bits per band that
    the EXPECTED bucket occupancy is ~``target_bucket`` rows, so the
    bucket self-join stays ~linear in N instead of quadratic in bucket
    size (candidate pairs per bucket are C(occupancy, 2) — a fixed
    16-bucket layout measured 6.4x-of-linear at a mere 10x corpus).
    More bits per band lowers per-band recall for mid-cosine pairs;
    compensate with more ``bands`` when hunting low thresholds — the
    textbook SRP dial, now sized instead of hardcoded."""
    import math

    bits = max(2, math.ceil(math.log2(max(n_rows / max(target_bucket, 1), 2))))
    return bands * min(bits, 24)


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.8,
    dim: int | None = None,
    n_planes: int | str = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication verdict (Abbas et al.
    2023): a document is a semantic duplicate if some LOWER-id document
    is cosine-similar above ``threshold``.  Returns one row per input —
    (vec_id, kept, dup_of) with ``dup_of`` = the smallest dominating id
    (NULL when kept) — so the keep-list, the drop-list, and the
    redirect map all come from one output.

    Survivor rule: *dominated by ANY lower id*, not the sequential
    greedy scan (which would need the dominator itself to have been
    kept).  The rule is deterministic, needs no iteration, and
    over-drops only chains a > b > c where cos(a,b) and cos(b,c) pass
    but cos(a,c) does not — at SemDeDup's high thresholds those chains
    are themselves near-duplicate clusters, and dropping them is the
    conservative direction for a dedup.  Clustering proxy: SRP-LSH
    band buckets stand in for SemDeDup's k-means clusters (both only
    bound the candidate search; the cosine check is exact), keeping
    the whole operator deterministic and oracle-replayable.

    Scale shape: candidates come from the banded SRP equi-join (never
    all pairs); the verdict is a ``min(a_id)`` aggregate over dominated
    ids plus one broadcast-friendly left join back to the id set —
    only (id, band, bucket) and (a_id, b_id) pairs ever shuffle.
    Pass ``n_planes="auto"`` to size the bucket count from a row count
    (one cheap COUNT job) via :func:`auto_srp_planes` — the fixed
    default 16 is calibrated to the oracle corpus, not to 100 TB."""
    if n_planes == "auto":
        n_planes = auto_srp_planes(embeddings.count(), bands=bands)
    pairs = embedding_near_dups(
        embeddings,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        candidates=candidates,
        dim=dim,
        n_planes=n_planes,
        bands=bands,
    )
    dom = pairs.groupBy("b_id").agg(F.min("a_id").alias("dup_of"))
    return (
        embeddings.select(F.col(id_col).alias("vec_id"))
        .join(dom, F.col("vec_id") == F.col("b_id"), "left")
        .select(
            "vec_id",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search"): the memory-side ANN story.  dim splits
# into m subspaces; each subspace gets its own k-centroid codebook
# (shared deterministic Lloyd, _lloyd); a vector compresses to m small
# ints (m bytes at k<=256 — 32x smaller than float32x64), and a query
# scans CODES with an ADC lookup table instead of floats.  Complements
# the int8 quantizer (4x) and IVF (list pruning): at 100 TB the scan
# side is PQ codes partitioned by an IVF list, floats touched only for
# the final re-rank.
# ---------------------------------------------------------------------------


def pq_train_codebooks(
    embeddings: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    iters: int = 8,
    sample: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_frac: float | None = None,
) -> np.ndarray:
    """(m, k, dim/m) float64 codebooks from ONE bounded driver-side
    training pool (same probe/limit machinery as the IVF trainer);
    subspace j trains with seed+j so codebooks differ."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    pool = ivf_training_pool(embeddings, sample, id_col, vec_col, sample_frac)
    rows = pool.orderBy(id_col).limit(sample).collect()
    x = np.asarray([list(r[vec_col]) for r in rows], dtype="float64")
    return np.stack(
        [
            _lloyd(x[:, j * dsub : (j + 1) * dsub], k, iters, seed + j, dsub)
            for j in range(m)
        ]
    )


def _codebook_lit(codebooks: np.ndarray):
    return F.lit([[[float(v) for v in c] for c in cb] for cb in codebooks])


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, code: array<int>) — one narrow map stage, zero shuffle.

    The codebook folds into the plan as ONE nested array literal and
    the whole encode is higher-order functions over it (the
    srp_buckets one-literal lesson: m*k separate distance expressions
    made plan compilation dominate the first run).  The BINARY
    transform lambda receives (element, index) — here the index IS the
    subspace id, the exact behavior that silently shadowed a captured
    default arg in round 1 (dedup docstring); used deliberately."""
    mm, kk, dsub = codebooks.shape
    cb = _codebook_lit(codebooks)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def _code_for(cbm, mi):
        sub = F.slice(vec, mi.cast("int") * dsub + 1, dsub)
        dists = F.transform(
            cbm,
            lambda c: F.aggregate(
                F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        *keep_cols,
        F.transform(cb, _code_for).alias("code"),
    )


def pq_topk(
    codes: DataFrame,
    query: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over PQ codes: the per-subspace distance table from
    the query to every centroid is computed on the DRIVER (m*k doubles)
    and folded in as a literal; the scan is one lookup-sum per code —
    no floats read.  With ``rerank`` (the original embeddings), the
    ``rerank_factor * k`` ADC candidates join back for exact cosine —
    the standard ADC + re-rank recipe.  Returns (vec_id, adc_dist2
    [, cosine])."""
    q = np.asarray(query, dtype="float64")
    mm, kk, dsub = codebooks.shape
    table = [
        [float(((q[j * dsub : (j + 1) * dsub] - codebooks[j][c]) ** 2).sum()) for c in range(kk)]
        for j in range(mm)
    ]
    tlit = F.lit(table)
    adc = F.aggregate(
        F.zip_with(
            F.col("code"),
            tlit,
            lambda cj, row: F.element_at(row, cj + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = codes.select("vec_id", adc.alias("adc_dist2"))
    n_cand = k * rerank_factor if rerank is not None else k
    cand = scored.orderBy(F.col("adc_dist2").asc(), F.col("vec_id").asc()).limit(
        n_cand
    )
    if rerank is None:
        return cand
    vec = rerank.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    qlit = F.array(*[F.lit(float(v)) for v in q])
    exact = (
        cand.join(vec, "vec_id")
        .select("vec_id", "adc_dist2", cosine_col(F.col("_v"), qlit).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )
    return exact


def ivf_pq_index(
    embeddings: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ index rows (vec_id, list_id, code) — the faiss-default
    composition: coarse k-means list for pruning, PQ code for the
    scan.  ONE narrow map stage computes both (assignment and code are
    expressions over the same vector); write it
    ``partitionBy("list_id")`` and a probe becomes partition pruning
    over scans that read m-byte codes instead of dim*4-byte floats."""
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    return pq_encode(assigned, codebooks, id_col, vec_col, keep_cols=("list_id",))


def ivf_pq_topk(
    index: DataFrame,
    query: list[float],
    centroids: np.ndarray,
    codebooks: np.ndarray,
    nprobe: int = 3,
    k: int = 10,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the ``nprobe`` nearest lists (literal IN-predicate ->
    partition pruning on a list_id-partitioned index), ADC-scan their
    PQ codes, optionally re-rank exactly against the float table."""
    q = np.asarray(query, dtype="float64")
    order = (((centroids - q[None, :]) ** 2).sum(axis=1)).argsort()
    probe = [int(j) for j in order[:nprobe]]
    cand = index.where(F.col("list_id").isin(probe)).select("vec_id", "code")
    return pq_topk(
        cand, query, codebooks, k, rerank, rerank_factor, id_col, vec_col
    )


def _sqdist_lit(vec, centroid: list) -> "F.Column":
    """Squared L2 distance from a vector column to a centroid folded
    as literals — a LEFT fold in index order (F.aggregate), the same
    order DuckDB's list_sum walks, so the doubles are bit-identical
    cross-engine."""
    carr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, carr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: dict | None = None,
) -> DataFrame:
    """Distributed Lloyd k-means, fully SQL-expressible and
    cross-engine exact — the clustering primitive behind
    cluster-balanced data curation (SemDeDup / DiverseEvol regimes:
    cluster the corpus embeddings, then sample per cluster).

    Unlike :func:`ivf_train_centroids` (driver-side numpy over a
    bounded sample — the right shape for a quick index build, but
    rows-only for the oracle), EVERY vector votes here and every step
    is a DataFrame op, so a DuckDB oracle can replay it exactly:

    * seeds = the k vectors with the smallest md5(id) (deterministic,
      tie-free, a TakeOrdered — no global sort), cluster ids assigned
      in that md5 order;
    * assignment = argmin over k squared-L2 distances computed from
      centroid LITERALS (k*dims doubles folded into the plan — the
      scan-stage shape: zero shuffle, zero join), ties to the lower
      cluster id via struct array_min;
    * update = per-cluster per-dimension mean, ROUNDED TO 6 DP — the
      rounding is the determinism contract: both engines re-derive
      bit-identical centroids regardless of partitioning/sum order,
      the FastRP round-before-dot trick applied to Lloyd;
    * a cluster that loses all members keeps its previous centroid
      (both engines, same rule).

    Returns (id, cluster, dist2) after ``iters`` centroid updates,
    dist2 rounded to 6, ordered by id.

    Scale shape: per round ONE scan with the argmin expression + ONE
    hash aggregate shuffling k×dims partial (sum, count) pairs —
    nothing else moves; the k×dims centroid table (bounded: 8×64
    doubles here) is the only driver round-trip.  At 100 TB this is
    the canonical map-side-combine k-means; raise ``iters`` for
    quality, each round costs one pass."""
    base = _kmeans_base(embeddings, id_col, vec_col)
    if cents is None:
        # cents: optionally inject an already-fitted model (the
        # _kmeans_fit dict) so consumers sharing one fit skip the
        # seed + per-round update collects — same assignment rule
        cents = _kmeans_fit(base, k, iters)
    if cents is None:
        return embeddings.sparkSession.createDataFrame(
            [], "id string, cluster int, dist2 double"
        )
    return (
        _kmeans_argmin(base, cents)
        .select("id", "cluster", F.round("dist2", 6).alias("dist2"))
        .orderBy("id")
    )


def _kmeans_base(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return embeddings.select(
        F.col(id_col).cast("string").alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )


def _kmeans_argmin(base: DataFrame, cents: dict) -> DataFrame:
    """Scan-stage argmin over centroid LITERALS: (id, v, cluster,
    dist2), ties to the lower cluster id — the kmeans_assign
    assignment rule, shared by every consumer of a fitted model."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _sqdist_lit(F.col("v"), cents[ci]).alias("d"),
                    F.lit(ci).alias("c"),
                )
                for ci in sorted(cents)
            ]
        )
    )
    return base.select(
        "id", "v", best["c"].alias("cluster"), best["d"].alias("dist2")
    )


def _kmeans_fit(base: DataFrame, k: int, iters: int) -> dict | None:
    """The Lloyd loop factored out of :func:`kmeans_assign` (identical
    semantics, pinned by its python-replay + oracle): md5-ordered
    seeds, ``iters`` rounds of assign + ROUND(AVG, 6) centroid update,
    empty clusters carry forward.  Returns {cluster: centroid} or
    None on empty input — the fitted model the clustering-quality
    evaluators (silhouette / Davies-Bouldin) score against."""
    seed_rows = (
        base.select("id", "v", F.md5(F.col("id")).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    if not seed_rows:
        return None
    cents = {
        i: list(r["v"]) for i, r in enumerate(sorted(seed_rows, key=lambda r: r["h"]))
    }
    dims = len(cents[0])
    for _ in range(iters):
        upd = (
            _kmeans_argmin(base, cents)
            .groupBy("cluster")
            .agg(
                *[
                    F.round(F.avg(F.col("v")[i]), 6).alias(f"c{i}")
                    for i in range(dims)
                ]
            )
            .collect()
        )
        for r in upd:
            cents[r["cluster"]] = [r[f"c{i}"] for i in range(dims)]
    return cents


def simplified_silhouette(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: dict | None = None,
) -> DataFrame:
    """Per-cluster simplified silhouette of the :func:`kmeans_assign`
    model — the internal clustering-quality panel next to
    :func:`cluster_label_purity` (external, needs ground truth) and
    :func:`davies_bouldin` (the between/within ratio): for each point
    a = Euclidean distance to its OWN centroid, b = distance to the
    nearest OTHER centroid, s = (b - a) / max(a, b) ∈ [-1, 1]
    (the Hruschka/Vendramin centroid approximation of Rousseeuw's
    silhouette — O(n·k) instead of the O(n²) pairwise original, the
    only formulation that exists at corpus scale).

    Engine-exact trace: distances are left-fold squared-L2 against
    centroid literals (the kmeans determinism contract); own/runner
    are order statistics 1 and 2 of the per-point (d, cluster) sort —
    ties to the lower cluster, so a point equidistant to two centroids
    scores exactly 0 in both engines.  Since b >= a by construction,
    max(a, b) = b and s = (√b - √a) / √b, guarded to 0 when √b = 0.

    Returns (cluster, n_points, silhouette) ordered by cluster;
    silhouette = ROUND(AVG(s), 6).

    Scale shape: ONE scan with a k-literal sort expression + ONE
    k-row hash aggregate — identical cost to the assignment pass
    itself; nothing but (cluster, s) pairs ever shuffles."""
    base = _kmeans_base(embeddings, id_col, vec_col)
    if cents is None:
        cents = _kmeans_fit(base, k, iters)
    if cents is None or len(cents) < 2:
        return embeddings.sparkSession.createDataFrame(
            [], "cluster int, n_points bigint, silhouette double"
        )
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    _sqdist_lit(F.col("v"), cents[ci]).alias("d"),
                    F.lit(ci).alias("c"),
                )
                for ci in sorted(cents)
            ]
        )
    )
    own, runner = ranked[0], ranked[1]
    sa, sb = F.sqrt(own["d"]), F.sqrt(runner["d"])
    s = F.when(sb > 0, (sb - sa) / sb).otherwise(F.lit(0.0))
    return (
        base.select(own["c"].alias("cluster"), s.alias("s"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.round(F.avg("s"), 6).alias("silhouette"),
        )
        .orderBy("cluster")
    )


def davies_bouldin(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: dict | None = None,
) -> DataFrame:
    """Per-cluster Davies-Bouldin similarity R_i = max_{j≠i}
    (S_i + S_j) / M_ij over the :func:`kmeans_assign` model, where
    S_i = mean Euclidean distance of cluster i's members to their
    centroid (ROUND 6 — the cross-engine rounding contract applied to
    the scatter before any division) and M_ij = centroid separation.
    The DB index is the mean of R_i; per-cluster rows localize WHICH
    cluster is entangled with which neighbourhood (high R = overlap —
    split or re-seed), which the scalar index hides.

    Returns (cluster, n_points, scatter, r_db) ordered by cluster.
    Duplicate centroids (M = 0) are excluded from the max, same rule
    both engines; a cluster whose every rival collapsed onto it
    drops out rather than emitting an infinity.

    Scale shape: the corpus contributes ONE scan + ONE k-row hash
    aggregate (the scatter); the k(k-1) separation table is computed
    from the fitted centroids driver-side (k·dims doubles, the same
    bounded round-trip the fit already made — left-fold order matches
    list_sum / F.aggregate bit-for-bit) and broadcast-joined against
    the k-row scatter.  The corpus never shuffles."""
    import math

    base = _kmeans_base(embeddings, id_col, vec_col)
    if cents is None:
        cents = _kmeans_fit(base, k, iters)
    if cents is None or len(cents) < 2:
        return embeddings.sparkSession.createDataFrame(
            [], "cluster int, n_points bigint, scatter double, r_db double"
        )
    scat = (
        _kmeans_argmin(base, cents)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.round(F.avg(F.sqrt("dist2")), 6).alias("scatter"),
        )
    )
    mrows = []
    for i in sorted(cents):
        for j in sorted(cents):
            if i == j:
                continue
            d = 0.0
            for a, b in zip(cents[i], cents[j]):
                d += (a - b) * (a - b)
            mrows.append((i, j, math.sqrt(d)))
    sep = embeddings.sparkSession.createDataFrame(mrows, "i int, j int, m double")
    si = scat.select(
        F.col("cluster").alias("i"), "n_points", F.col("scatter").alias("s_i")
    )
    sj = scat.select(F.col("cluster").alias("j"), F.col("scatter").alias("s_j"))
    return (
        sep.where(F.col("m") > 0)
        .join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .groupBy(
            F.col("i").alias("cluster"),
            F.col("n_points"),
            F.col("s_i").alias("scatter"),
        )
        .agg(
            F.round(
                F.max((F.col("s_i") + F.col("s_j")) / F.col("m")), 6
            ).alias("r_db")
        )
        .orderBy("cluster")
    )


def ann_recall_at_k(
    embeddings: DataFrame,
    k: int = 10,
    n_queries: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """In-engine ANN quality evaluation: recall@k of the SRP-LSH index
    against exact brute force, per query — the continuous-eval job a
    production ANN deployment runs to catch index drift (recall decay
    after re-shards, plane-count misconfiguration, degenerate
    buckets), computed WITHOUT leaving the engine.

    Queries = the ``n_queries`` vectors with the smallest
    md5(id) (the deterministic draw every sampler here uses).  Both
    ranking arms share ONE scored relation: each corpus row computes
    its cosine against every query from a LITERAL query array inside
    the scan stage (a transform + explode — no join, no cartesian;
    n_queries * dims doubles folded into the plan), then

    * exact arm  = rank <= k per query over all rows,
    * ANN arm    = rank <= k per query over SRP bucket-mates only
      (the same :func:`srp_buckets` relation the index uses),

    and recall@k = |arms' intersection| / k.  Ties rank (cosine desc,
    id) — the dots are LEFT folds in index order, bit-identical
    cross-engine, so the oracle replays the ranking exactly.

    Returns (qid, n_candidates, hits, recall) ordered by qid.

    Scale shape: one scan computes all n_queries scores (scan-stage
    expressions); the per-query rank is a (qid)-keyed window over
    n_queries * n rows — the eval-job shape, not the serving path
    (serving uses :func:`ann_topk`'s TakeOrdered); the candidate arm
    semi-joins the bucket relation first.  At 100 TB you run this on
    a hash sample of the corpus — the recall estimate only needs
    enough rows per bucket, not the full index."""
    from pyspark.sql.window import Window

    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    qrows = (
        base.select("id", "v", F.md5(F.col("id").cast("string")).alias("h"))
        .orderBy("h")
        .limit(n_queries)
        .collect()
    )
    if not qrows:
        return embeddings.sparkSession.createDataFrame(
            [], "qid long, n_candidates bigint, hits bigint, recall double"
        )
    qlit = F.array(
        *[
            F.struct(
                F.lit(r["id"]).alias("qid"),
                F.array(*[F.lit(float(x)) for x in r["v"]]).alias("qv"),
            )
            for r in sorted(qrows, key=lambda r: r["id"])
        ]
    )
    sc = base.select(
        "id",
        F.explode(
            F.transform(
                qlit,
                lambda q: F.struct(
                    q["qid"].alias("qid"),
                    (
                        _dot(F.col("v"), q["qv"])
                        / (_norm(F.col("v")) * _norm(q["qv"]))
                    ).alias("c"),
                ),
            )
        ).alias("s"),
    ).select("id", F.col("s.qid").alias("qid"), F.col("s.c").alias("c"))
    rank_w = Window.partitionBy("qid").orderBy(F.desc("c"), "id")
    exact = (
        sc.withColumn("rn", F.row_number().over(rank_w))
        .where(F.col("rn") <= k)
        .select("qid", "id")
    )
    dim = len(qrows[0]["v"])
    bk = srp_buckets(
        embeddings, dim, n_planes=n_planes, bands=bands, id_col=id_col, vec_col=vec_col
    ).select("id", "band", "bucket")
    qids = [r["id"] for r in qrows]
    qb = bk.where(F.col("id").isin(qids)).select(
        F.col("id").alias("qid"), "band", "bucket"
    )
    cand = (
        bk.join(qb, ["band", "bucket"])
        .select("id", "qid")
        .distinct()
    )
    ann = (
        sc.join(cand, ["id", "qid"])
        .withColumn("rn", F.row_number().over(rank_w))
        .where(F.col("rn") <= k)
        .select("qid", "id")
    )
    ncand = cand.groupBy("qid").agg(F.count(F.lit(1)).alias("n_candidates"))
    hits = (
        exact.join(ann, ["qid", "id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    qdf = embeddings.sparkSession.createDataFrame(
        [(int(i),) for i in qids], "qid long"
    )
    return (
        qdf.join(ncand, "qid", "left")
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("hits", F.lit(0)).alias("hits"),
            F.round(F.coalesce("hits", F.lit(0)) / F.lit(float(k)), 6).alias(
                "recall"
            ),
        )
        .orderBy("qid")
    )


def matryoshka_recall_at_k(
    embeddings: DataFrame,
    trunc_dim: int = 16,
    k: int = 10,
    n_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka truncation eval: recall@k of ranking by the FIRST
    ``trunc_dim`` dimensions against the full-dim exact ranking — the
    measurement that decides whether an MRL-style truncated index (4×
    less storage and scan at dim 16 of 64) is safe for this corpus,
    computed in-engine like :func:`ann_recall_at_k` (same
    deterministic md5 query draw, same shared-scored-relation shape:
    ONE scan computes BOTH cosines per (row, query) from literal
    query arrays — prefix slices are scan-stage expressions, no
    second pass, no join).  A zero prefix norm scores -2 (below any
    cosine) in both engines rather than NaN-sorting first.

    Returns (qid, hits, recall) ordered by qid.

    Scale shape: identical to the ANN eval — n_queries * n scored
    rows through two (qid)-keyed rank windows; at 100 TB run it on a
    hash sample, the estimate doesn't need the full corpus."""
    from pyspark.sql.window import Window

    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    qrows = (
        base.select("id", "v", F.md5(F.col("id").cast("string")).alias("h"))
        .orderBy("h")
        .limit(n_queries)
        .collect()
    )
    if not qrows:
        return embeddings.sparkSession.createDataFrame(
            [], "qid long, hits bigint, recall double"
        )

    def _tcos(vt, qt_lit):
        qt = F.array(*[F.lit(float(x)) for x in qt_lit])
        nv = F.aggregate(
            F.transform(vt, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
        nq = F.aggregate(
            F.transform(qt, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
        return F.when(
            (nv == 0) | (nq == 0), F.lit(-2.0)
        ).otherwise(_dot(vt, qt) / (F.sqrt(nv) * F.sqrt(nq)))

    qlit = F.array(
        *[
            F.struct(
                F.lit(r["id"]).alias("qid"),
                F.array(*[F.lit(float(x)) for x in r["v"]]).alias("qv"),
            )
            for r in sorted(qrows, key=lambda r: r["id"])
        ]
    )
    vt = F.slice(F.col("v"), 1, trunc_dim)
    # full cosine from the struct array; truncated cosine per query as
    # a separate literal expression (keyed by qid through a map)
    sc = base.select(
        "id",
        vt.alias("vt"),
        F.explode(
            F.transform(
                qlit,
                lambda q: F.struct(
                    q["qid"].alias("qid"),
                    # same zero-norm sentinel as _tcos: an all-zero
                    # embedding must score -2 (below any cosine), not
                    # NaN — NaN sorts above every value in a DESC
                    # window and would pollute the exact top-k arm
                    F.when(
                        (
                            F.aggregate(
                                F.transform(F.col("v"), lambda x: x * x),
                                F.lit(0.0),
                                lambda a, x: a + x,
                            )
                            == 0
                        )
                        | (
                            F.aggregate(
                                F.transform(q["qv"], lambda x: x * x),
                                F.lit(0.0),
                                lambda a, x: a + x,
                            )
                            == 0
                        ),
                        F.lit(-2.0),
                    )
                    .otherwise(
                        _dot(F.col("v"), q["qv"])
                        / (_norm(F.col("v")) * _norm(q["qv"]))
                    )
                    .alias("cf"),
                ),
            )
        ).alias("s"),
    ).select("id", "vt", F.col("s.qid").alias("qid"), F.col("s.cf").alias("cf"))
    trunc_score = None
    for r in sorted(qrows, key=lambda r: r["id"]):
        expr = _tcos(F.col("vt"), list(r["v"])[:trunc_dim])
        trunc_score = (
            F.when(F.col("qid") == r["id"], expr)
            if trunc_score is None
            else trunc_score.when(F.col("qid") == r["id"], expr)
        )
    sc = sc.select("id", "qid", "cf", trunc_score.alias("ct"))
    rank_w = Window.partitionBy("qid").orderBy(F.desc("cf"), "id")
    rank_t = Window.partitionBy("qid").orderBy(F.desc("ct"), "id")
    exact = (
        sc.withColumn("rn", F.row_number().over(rank_w))
        .where(F.col("rn") <= k)
        .select("qid", "id")
    )
    trunc = (
        sc.withColumn("rn", F.row_number().over(rank_t))
        .where(F.col("rn") <= k)
        .select("qid", "id")
    )
    hits = (
        exact.join(trunc, ["qid", "id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    qdf = embeddings.sparkSession.createDataFrame(
        [(int(r["id"]),) for r in qrows], "qid long"
    )
    return (
        qdf.join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce("hits", F.lit(0)).alias("hits"),
            F.round(F.coalesce("hits", F.lit(0)) / F.lit(float(k)), 6).alias(
                "recall"
            ),
        )
        .orderBy("qid")
    )


def lsh_bucket_stats(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH index health report: per band, how the corpus distributes
    over SRP buckets — n_buckets, max bucket size, and the exact
    candidate-pair mass sum(size*(size-1)/2).  The pair mass IS the
    cost of every bucketed self-join downstream (ann candidates,
    near-dup pairs): a degenerate band (one mega-bucket) shows up here
    as pair mass ~ n^2/2 BEFORE you pay for the join — the
    check-the-histogram-first discipline every 100 TB LSH deployment
    runs, the index-side sibling of :func:`ann_recall_at_k` (recall
    says "buckets too small", pair mass says "buckets too big").

    All-integer aggregates — engine-exact, no rounding.

    Returns (band, n_buckets, n_vectors, max_bucket, candidate_pairs)
    ordered by band.

    Scale shape: the bucket relation (id, band, bucket) -> ONE
    (band, bucket) count aggregate (map-side combined) -> ONE |bands|-
    row rollup.  Raw vectors never shuffle."""
    bk = srp_buckets(
        embeddings, dim, n_planes=n_planes, bands=bands, id_col=id_col, vec_col=vec_col
    )
    per_bucket = bk.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        per_bucket.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("sz").alias("n_vectors"),
            F.max("sz").alias("max_bucket"),
            F.sum(
                (F.col("sz") * (F.col("sz") - F.lit(1)) / F.lit(2)).cast("bigint")
            ).alias("candidate_pairs"),
        )
        .orderBy("band")
    )


def mmr_rerank(
    embeddings: DataFrame,
    query: list[float],
    k: int = 5,
    pool: int = 20,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell-Goldstein,
    SIGIR 1998): greedily pick ``k`` results from a relevance top-
    ``pool``, each step maximizing ``lam * relevance - (1-lam) *
    max-similarity-to-already-selected`` — the diversification pass a
    GraphRAG retriever runs so the context window isn't five copies of
    the same paragraph.  Plain top-k is the lam=1 degenerate case;
    lam=0.5 (default) weighs novelty equal to relevance.

    -> (rank 1..k, vec_id, relevance, max_sim, mmr), ordered by rank.
    rank 1 is the pure-relevance winner (max_sim 0.0 by definition).

    Determinism contract: relevance and every pairwise similarity are
    rounded to 6 dp BEFORE any comparison or combination (max over
    identically-rounded values is exact; ``0.5*rel - 0.5*ms`` over
    6-dp doubles is one identical IEEE expression per engine), ties
    broken by id — the greedy trace is engine-exact, which is what
    lets the oracle replay it as k unrolled SQL steps.  Pass ``lam``
    values that are exact binary floats (0.5, 0.25, 0.75) if you need
    that cross-engine property: the complement ``1-lam`` is folded as
    a literal in both engines.

    Scale shape: candidate generation is the ONLY data-scale stage —
    the default is the exact brute-force scan; pass ``candidates=``
    (e.g. srp/ivf ANN top-pool) to prune it.  The pool is then
    localCheckpointed (pool rows, one short-circuited lineage — the
    k greedy steps must not re-trigger the corpus scan) and each step
    is one Catalyst job over <= pool rows: selected vectors fold back
    as LITERAL arrays (the HITS-norm pattern — never a crossJoin, so
    the no-cartesian plan audit holds) and the argmax is an
    orderBy-limit-1 on the rounded score — a bounded 1-row collect
    per step, k total.  For many queries at once, group per query and
    run this loop inside applyInPandas instead."""
    if not 1 <= k <= pool:
        raise ValueError("need 1 <= k <= pool")
    qd = [float(x) for x in query]
    if candidates is None:
        candidates = brute_force_topk(
            embeddings, qd, k=pool, id_col=id_col, vec_col=vec_col
        )
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    cand = (
        candidates.select("vec_id", F.col("cosine").alias("relevance"))
        .join(vecs, "vec_id")
        .localCheckpoint(eager=True)
    )
    lam = float(lam)
    com = 1.0 - lam
    picked: list[tuple] = []
    sel_vecs: list[list[float]] = []
    remaining = cand
    for rank in range(1, k + 1):
        sims = [
            F.round(
                cosine_col(F.col("_v"), F.array(*[F.lit(x) for x in sv])), 6
            )
            for sv in sel_vecs
        ]
        if len(sims) > 1:
            ms = F.greatest(*sims)
        elif sims:
            ms = sims[0]
        else:
            ms = F.lit(0.0)
        scored = remaining.select(
            "vec_id",
            "relevance",
            "_v",
            ms.alias("max_sim"),
            F.round(
                F.lit(lam) * F.col("relevance") - F.lit(com) * ms, 6
            ).alias("mmr"),
        )
        top = scored.orderBy(F.desc("mmr"), "vec_id").limit(1).collect()
        if not top:
            break
        r = top[0]
        picked.append(
            (rank, r["vec_id"], float(r["relevance"]), float(r["max_sim"]), float(r["mmr"]))
        )
        sel_vecs.append([float(x) for x in r["_v"]])
        remaining = remaining.where(F.col("vec_id") != F.lit(r["vec_id"]))
    spark = embeddings.sparkSession
    picks = spark.createDataFrame(
        picked,
        "rank int, vec_id long, relevance double, max_sim double, mmr double",
    )
    return picks.orderBy("rank")


def knn_graph(
    embeddings: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_fanout: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch k-NN GRAPH construction over SRP-LSH candidates: every
    vector keeps its top-``k`` bucket-co-members by exact cosine — the
    all-nodes-at-once shape (one bucketed self-join) behind embedding-
    graph clustering, SemDeDup-style cluster pruning, label
    propagation over semantic neighbors, and kNN-classifier features.
    Per-query ANN (:func:`ann_topk`) answers ONE query cheaply; this
    materializes the whole directed neighbor graph in two shuffles.

    -> (vec_id, nbr_id, cosine, rank 1..k) directed (each node ranks
    its own candidates; a node inside a dense near-dup cluster may
    appear as nbr of many), rounded-6 cosine, ties by nbr id, ordered
    (vec_id, rank).  Recall caveat shared with every SRP path: only
    bucket co-members are candidates — a true neighbor hashing into
    disjoint buckets in all bands is missed (multi-band OR makes that
    geometrically unlikely for close pairs).

    Scale shape: candidates come from a SUCCESSOR WINDOW inside each
    (band, bucket) — members order by md5(id) and each pairs with its
    next ``max_fanout`` neighbors (both directions), generated with
    LEAD over the bucket window, NOT a bucket self-join.  A bucket
    self-join is quadratic in bucket size, and on a corpus with big
    near-dup clusters (exactly what a web crawl has) that is the
    C(n,2) blowup the dedup family's collapse-exact guard kills:
    measured 78 s at the 10x-replica corpus vs 6 s with the window
    form, identical results wherever buckets fit inside the fan-out
    (every bucket at the verification SFs does).  Candidate volume is
    bounded by N * bands * max_fanout — linear, partitioning-
    independent, deterministic.  The per-node top-k is one window over
    the candidate relation (integer-ranked after the 6dp round, id
    tie-break)."""
    b = srp_buckets(
        embeddings, dim, n_planes, bands, seed, id_col, vec_col
    ).select("id", "band", "bucket")
    ww = Window.partitionBy("band", "bucket").orderBy(
        F.md5(F.col("id").cast("string")), F.col("id")
    )
    succ = F.array(
        *[F.lead("id", i).over(ww) for i in range(1, max_fanout + 1)]
    )
    fwd = (
        b.select("id", succ.alias("_s"))
        .select(F.col("id").alias("src"), F.explode("_s").alias("dst"))
        .where(F.col("dst").isNotNull())
    )
    cand = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    # norms are per-VECTOR, not per-pair: compute them once on the
    # n-row vector table and carry them through the joins, so each of
    # the ~n*bands*fanout candidate pairs pays one dot product instead
    # of a dot plus two 2d-element norm re-evaluations (guide §1.2
    # per-task work; dot/(na*nb) is the same IEEE expression as
    # cosine_col, so the rounded scores are bit-identical)
    vecs = embeddings.select(
        F.col(id_col).alias("_vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).select("_vid", "_v", _norm(F.col("_v")).alias("_n"))
    scored = (
        cand.join(
            vecs.select(
                F.col("_vid").alias("src"),
                F.col("_v").alias("_va"),
                F.col("_n").alias("_na"),
            ),
            "src",
        )
        .join(
            vecs.select(
                F.col("_vid").alias("dst"),
                F.col("_v").alias("_vb"),
                F.col("_n").alias("_nb"),
            ),
            "dst",
        )
        .select(
            "src",
            "dst",
            F.round(
                _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), "dst")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("src").alias("vec_id"),
            F.col("dst").alias("nbr_id"),
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
        .orderBy("vec_id", "rank")
    )


def centroid_outliers(
    embeddings: DataFrame,
    dim: int = 64,
    z_threshold: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-cluster embedding outliers — vectors far from their own
    label's centroid, the mislabeled/off-distribution sweep a
    curation pass runs before training on a labeled (or clustered)
    corpus (the SemDeDup/DiverseEvol complement: dedup prunes the
    too-close, this flags the too-far).

    Same determinism contract as :func:`kmeans_assign`: per-label
    per-dimension centroid means are ROUNDED TO 6 DP (both engines
    re-derive them bit-identically regardless of sum order), the
    squared-L2 distance is a LEFT fold in index order over centroid
    LITERALS (:func:`_sqdist_lit` — bit-identical to DuckDB's
    list_sum walk) rounded to 6, and the per-label z-score follows the
    events.zscore_outliers precedent (stats over the ROUNDED distance
    column).  Labels with <2 members or zero variance emit nothing.

    Returns (vec_id, label, dist2, z) for vectors with z >
    ``z_threshold``, ordered by vec_id.

    Scale shape: ONE hash aggregate shuffles |labels| x dim (sum,
    count) partials; the |labels| x dim centroid table is the only
    driver round-trip (bounded by construction); distance + z are
    scan-stage expressions against broadcast per-label stats — the
    corpus never shuffles."""
    base = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(label_col).cast("int").alias("label"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    cent_rows = (
        base.groupBy("label")
        .agg(*[F.round(F.avg(F.col("v")[i]), 6).alias(f"c{i}") for i in range(dim)])
        .collect()
    )
    if not cent_rows:
        return embeddings.sparkSession.createDataFrame(
            [], "vec_id long, label int, dist2 double, z double"
        )
    cents = {r["label"]: [r[f"c{i}"] for i in range(dim)] for r in cent_rows}
    # chained CASE: label -> squared distance to ITS centroid literals
    chain = F.lit(None).cast("double")
    for lbl in sorted(cents):
        chain = F.when(
            F.col("label") == lbl, _sqdist_lit(F.col("v"), cents[lbl])
        ).otherwise(chain)
    scored = base.select(
        "vec_id", "label", F.round(chain, 6).alias("dist2")
    )
    stats = scored.groupBy("label").agg(
        F.avg("dist2").alias("_m"), F.stddev("dist2").alias("_sd")
    )
    z = (F.col("dist2") - F.col("_m")) / F.col("_sd")
    return (
        scored.join(F.broadcast(stats), "label")
        .where(F.col("_sd").isNotNull() & (F.col("_sd") > 0))
        .where(z > F.lit(z_threshold))
        .select("vec_id", "label", "dist2", F.round(z, 6).alias("z"))
        .orderBy("vec_id")
    )


def kcenter_greedy(
    embeddings: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> tuple[list, list]:
    """The bounded greedy farthest-point trace behind
    :func:`kcenter_sample` / :func:`kcenter_coverage` — returns
    (picked, sel_vecs): ``picked`` is the [(rank, vec_id, max_sim)]
    trace, ``sel_vecs`` the selected vectors in rank order (k * dim
    floats — driver-bounded by construction).  Exposed so the two
    consumers can share ONE greedy run (the kmeans_assign(cents=...)
    injection seam): the trace is deterministic, so sharing it cannot
    change either query's rows."""
    src = candidates if candidates is not None else embeddings
    vecs = src.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    # the pool is re-scanned k times (one literal-cosine pass per
    # greedy pick): materialize it once so each pass reads cached
    # blocks instead of replaying the upstream scan+cast — the pool
    # is bounded by contract at scale (pass candidates=), so the
    # checkpoint is coreset-pool-sized
    vecs = vecs.localCheckpoint(eager=True)
    seed = vecs.orderBy("vec_id").limit(1).collect()
    if not seed:
        return [], []
    picked = [(1, int(seed[0]["vec_id"]), 0.0)]
    sel_vecs = [[float(x) for x in seed[0]["_v"]]]
    for rank in range(2, k + 1):
        sims = [
            F.round(
                cosine_col(F.col("_v"), F.array(*[F.lit(x) for x in sv])), 6
            )
            for sv in sel_vecs
        ]
        ms = F.greatest(*sims) if len(sims) > 1 else sims[0]
        top = (
            vecs.where(~F.col("vec_id").isin([p[1] for p in picked]))
            .select("vec_id", "_v", ms.alias("max_sim"))
            .orderBy("max_sim", "vec_id")
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        picked.append((rank, int(r["vec_id"]), float(r["max_sim"])))
        sel_vecs.append([float(x) for x in r["_v"]])
    return picked, sel_vecs


def kcenter_sample(
    embeddings: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
    greedy: tuple[list, list] | None = None,
) -> DataFrame:
    """Greedy k-center / farthest-point traversal (Gonzalez 1985):
    pick ``k`` vectors that maximally SPREAD over the embedding space
    — each step adds the point whose maximum cosine to the already-
    selected centers is smallest (i.e. the farthest point).  The
    data-selection pass behind diverse coreset sampling, seed picking
    for clustering, and eval-set construction; 2-approximation of the
    optimal k-center cover.  :func:`mmr_rerank` trades relevance
    against novelty inside a retrieval pool; this is the pure-novelty,
    whole-corpus variant (no query).

    Determinism contract (the MMR contract, reused): every pairwise
    cosine is rounded to 6 dp BEFORE comparison, the argmin breaks
    ties on min id, and the seed center is the MINIMUM id — not a
    random row — so the greedy trace is engine-exact and the oracle
    replays it as k unrolled SQL steps.

    -> (rank 1..k, vec_id, max_sim), ordered by rank; ``max_sim`` is
    the winner's cosine to its nearest selected center at pick time
    (0.0 for the seed) — the coverage radius trace, non-decreasing-ish
    as the space fills.

    Scale shape: k bounded passes, each ONE scan-stage map (cosines
    against <= k selected vectors folded back as LITERAL arrays — the
    HITS-norm / MMR pattern, never a crossJoin) + a 1-row argmin
    reduce (orderBy-limit-1 collect, bounded).  No shuffle of the
    corpus, no state beyond k * dim floats on the driver.  At real
    corpus scale pass ``candidates=`` (e.g. a hash-sampled or
    SRP-bucket-thinned pool) to bound the per-step scan — greedy
    k-center on a uniform pool is the standard coreset recipe."""
    if k < 1:
        raise ValueError("need k >= 1")
    if greedy is None:
        greedy = kcenter_greedy(
            embeddings, k=k, id_col=id_col, vec_col=vec_col, candidates=candidates
        )
    picked, _ = greedy
    if not picked:
        return embeddings.sparkSession.createDataFrame(
            [], "rank int, vec_id long, max_sim double"
        )
    out = embeddings.sparkSession.createDataFrame(
        picked, "rank int, vec_id long, max_sim double"
    )
    return out.orderBy("rank")


def kcenter_coverage(
    embeddings: DataFrame,
    k: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    greedy: tuple[list, list] | None = None,
) -> DataFrame:
    """Coverage audit of the greedy k-center pick: after
    :func:`kcenter_sample` selects k centers (same exact trace),
    every NON-center point scores its cosine to the nearest center —
    the minimum of those (the worst-covered point) IS the k-center
    objective in cosine form, the number that says whether the
    coreset actually spans the space or left a region stranded.
    Reports (k, radius_cos, mean_cos, n_covered, worst_id); worst_id
    = MIN id among radius ties (deterministic).

    Same determinism contract as the selection itself: per-center
    cosines ROUND(·, 6) before the max, so both engines agree on the
    nearest center and on the radius.

    Scale shape: the selection's k bounded passes + ONE more scan
    with k literal-center cosines and a 1-row aggregate — no joins,
    no shuffle beyond the final reduce."""
    if greedy is None:
        greedy = kcenter_greedy(embeddings, k=k, id_col=id_col, vec_col=vec_col)
    picked, sel_vecs = greedy
    ids = [p[1] for p in picked]
    spark = embeddings.sparkSession
    schema = (
        "k int, radius_cos double, mean_cos double, n_covered bigint, "
        "worst_id long"
    )
    if not ids:
        return spark.createDataFrame([], schema)
    vecs = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).localCheckpoint(eager=True)
    # the greedy trace already carries the selected vectors (same
    # double-cast _v values the cmap collect re-fetched), rank order
    sims = [
        F.round(cosine_col(F.col("_v"), F.array(*[F.lit(x) for x in sv])), 6)
        for sv in sel_vecs
    ]
    ms = F.greatest(*sims) if len(sims) > 1 else sims[0]
    cov = vecs.where(~F.col("vec_id").isin(ids)).select(
        "vec_id", ms.alias("ms")
    )
    a = cov.agg(
        F.min("ms").alias("radius_cos"),
        F.round(F.avg("ms"), 6).alias("mean_cos"),
        F.count(F.lit(1)).cast("long").alias("n_covered"),
    ).collect()[0]
    if a["n_covered"] == 0:
        # every vector was selected as a center (corpus size <= k):
        # there is no uncovered point, so no worst id to report
        return spark.createDataFrame([], schema)
    worst = (
        cov.where(F.col("ms") == F.lit(a["radius_cos"]))
        .agg(F.min("vec_id"))
        .collect()[0][0]
    )
    return spark.createDataFrame(
        [(k, a["radius_cos"], a["mean_cos"], a["n_covered"], int(worst))],
        schema,
    )


def cluster_label_purity(
    assignments: DataFrame,
    labels: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster",
    label_id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-cluster label purity — the standard external clustering
    evaluation when a ground-truth label column exists: for each
    cluster, its size, the majority label (smallest label on count
    ties — deterministic), the majority count, and purity =
    majority_n / n.  Weighted-average purity over clusters is the
    corpus purity score; per-cluster rows localize WHICH clusters are
    mixed (the ones semantic dedup / balanced sampling should not
    trust).

    Scale shape: one (cluster, label) hash agg over the assignment
    join (map-side combined; cardinality k x |labels|, tiny), then a
    k-row max/sum re-agg and a tie-break min — never a window over
    the corpus.  The assignment-label join is id-keyed; at corpus
    scale both sides are already co-partitioned by the id they were
    produced with."""
    a = assignments.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("cluster")
    )
    l = labels.select(
        F.col(label_id_col).alias("_id"), F.col(label_col).alias("label")
    )
    counts = (
        a.join(l, "_id")
        .groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    mx = counts.groupBy("cluster").agg(
        F.max("cnt").alias("majority_n"), F.sum("cnt").alias("n")
    )
    return (
        counts.join(mx, "cluster")
        .where(F.col("cnt") == F.col("majority_n"))
        .groupBy("cluster", "n", "majority_n")
        .agg(F.min("label").alias("majority_label"))
        .select(
            "cluster",
            F.col("n").cast("long").alias("n"),
            "majority_label",
            F.col("majority_n").cast("long").alias("majority_n"),
            F.round(
                F.col("majority_n").cast("double") / F.col("n").cast("double"), 6
            ).alias("purity"),
        )
        .orderBy("cluster")
    )
