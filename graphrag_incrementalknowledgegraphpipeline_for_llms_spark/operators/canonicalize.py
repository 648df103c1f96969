"""Entity canonicalization: connected components over the
mention-similarity graph (north_star requirement; no analog in the
reference, which keys concepts purely by lemma hash).

Implementation: the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) expressed as plain DataFrame joins — O(log n) rounds, each
round two groupBy-min aggregations + joins, no collect_list (so a hot
entity with millions of aliases never materializes a giant array; the
min-aggregate is map-side combinable, which IS the skew story).  Node
ids are compared as strings (any total order works).  Each round is
localCheckpoint'ed to truncate lineage, and convergence is detected by
an order-insensitive checksum of the edge set.

Entity linking: candidate pairs come from (a) lemma equality — free,
same concept_id by construction — and (b) an alias dictionary
broadcast to every executor (BROADCAST hash join: the Bloom-filter
role of the north_star at sandbox scale; at 10^12 docs enable
spark.sql.optimizer.runtime.bloomFilter.enabled so the scan side is
pre-filtered before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import scale


def _canon(e: DataFrame) -> DataFrame:
    return e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")).where(
        F.col("u") != F.col("v")
    ).distinct()


def _checksum(e: DataFrame):
    # decimal(38,0) sum: immune to ANSI long-overflow on hash sums
    row = e.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def _local_contract(e: DataFrame) -> DataFrame:
    """Partition-local union-find contraction — the standard CC
    pre-pass: each task collapses ITS edges to (node ->
    partition-local min root) star edges in ONE narrow pass (no
    shuffle).  Connectivity is preserved exactly — every in-partition
    path collapses onto its root, and nodes shared across partitions
    chain the roots — while the edge list shrinks to <= the distinct
    node count per partition and becomes star-shaped, so the global
    large/small-star loop only resolves the cross-partition residue:
    1-3 rounds instead of O(log longest-path) (a chain graph is the
    worst case the lag-edge CC query feeds it).  The final labels are
    unchanged: a component's global min id is the min of its OWN
    local group, hence survives contraction as a live node, and
    large/small-star converges to min-id stars on any
    connectivity-equivalent input.  Per-task state is O(nodes in the
    partition) — bounded by the ~100k-row partitions
    scale.iter_parts targets, never corpus-global."""

    def contract(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for u, v in zip(pdf["u"], pdf["v"]):
                if u not in parent:
                    parent[u] = u
                if v not in parent:
                    parent[v] = v
                ru, rv = find(u), find(v)
                if ru == rv:
                    continue
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
        us, vs = [], []
        for x in parent:
            r = find(x)
            if r != x:
                us.append(x)
                vs.append(r)
        if us:
            yield pd.DataFrame({"u": us, "v": vs})

    return e.mapInPandas(contract, schema=e.schema)


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """With edges directed high->low, connect each smaller neighbor and
    u itself to the minimum of the neighborhood."""
    d = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        d.join(m, "u")
        .select(F.col("v").alias("n"), F.col("m"))
        .unionByName(m.select(F.col("u").alias("n"), F.col("m")))
    )
    return (
        out.where(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, src: str = "u", dst: str = "v", max_iter: int = 30
) -> DataFrame:
    """-> (id, component) with component = min node id of the
    component.  Nodes appearing only in self-loops / isolated are the
    caller's to union in (see canonical_concepts)."""
    spark = edges.sparkSession
    e = _canon(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    e = e.localCheckpoint(eager=True)
    # size-derived iteration parallelism: materializing a small edge
    # table at the session's full shuffle-partition count every round
    # makes task scheduling the dominant cost (same pathology as
    # pagerank_und — measured there 22 s -> 7.5 s); the formula keeps
    # full parallelism for billion-edge graphs
    parts = scale.iter_parts(spark, e.count())
    e = e.coalesce(parts)
    prev = None
    # loop shuffles sized to the (counted) edge table, not the session
    # default (functions/scale.py); lazy checkpoint fuses each round's
    # materialization with its fixpoint checksum into ONE job.  The
    # partition-local contraction pre-pass (one narrow mapInPandas
    # stage, fused into round 1's probe) star-shapes the edge list so
    # the loop below converges in its cross-partition residue rounds.
    with scale.scoped_shuffle_partitions(spark, parts):
        e = scale.ckpt(_canon(_local_contract(e)), parts)
        for _ in range(max_iter):
            e = scale.ckpt(_small_star(_large_star(e)), parts)
            cur = _checksum(e)
            if cur == prev:
                break
            prev = cur
    # converged: every edge is (member, root)
    members = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id")).distinct().withColumn("component", F.col("id"))
    return members.unionByName(roots).distinct()


_BLOOM_K = 5  # probes; with ~20 bits/key the FP rate is ~5e-4


def _bloom_h1h2(col):
    """Split Spark's xxhash64 into the two 31-bit non-negative halves
    of Kirsch-Mitzenmacher double hashing (h2 forced odd so probe
    strides never collapse).  Used identically on the build side
    (collected to the driver) and the probe side (stays in the plan),
    so parity is by construction — no Python hash implementation."""
    h = F.xxhash64(col)
    mask = F.lit((1 << 31) - 1)
    h1 = h.bitwiseAND(mask)
    h2 = (
        F.call_function("shiftrightunsigned", h, F.lit(32))
        .bitwiseAND(mask)
        .bitwiseOR(F.lit(1))
    )
    return h1, h2


def bloom_lemma_filter(alias_pairs: DataFrame, bits_per_key: int = 20):
    """Build a Bloom filter over BOTH columns of the alias dictionary
    and return a predicate factory — the north_star's
    Bloom-filter-backed alias lookup, explicit rather than left to the
    optimizer (Spark's ``bloom_filter_agg`` expression is
    optimizer-internal, not in the SQL registry, so the sketch is
    assembled here from first principles).

    Build: one pass over the (small, broadcast-sized) dictionary
    computes (h1, h2) per key IN SPARK via ``xxhash64``; the driver
    packs ``k`` double-hash probe positions into an int64 word array
    sized ``bits_per_key * n`` bits.  Probe: the word array is folded
    into the plan as an array literal (the BM25 corpus-scalar
    pattern) and tested with pure bit arithmetic — ``element_at`` +
    unsigned shift + AND, all whole-stage-codegen expressions, ZERO
    join and ZERO Python in the hot path.  At 10^12 docs the mention
    relation is pruned to (alias hits + FP rate) BEFORE its
    distinct() shuffle.  False positives are harmless — the exact
    broadcast join downstream re-checks equality; Bloom guarantees no
    false negatives, so the gated output is provably identical.

    Returns None when the dictionary is empty (caller skips linking).
    """
    keys = (
        alias_pairs.select(F.col("lemma_a").alias("k"))
        .unionByName(alias_pairs.select(F.col("lemma_b").alias("k")))
        .distinct()
    )
    return _bloom_filter_from(keys, bits_per_key)


def bloom_keys_filter(keys: DataFrame, key_col: str, bits_per_key: int = 20):
    """Bloom predicate factory over one key column of a dimension
    table (same build/probe machinery as :func:`bloom_lemma_filter`;
    used by functions/openie.link_heads for vocabulary pruning).
    Returns None when the dimension is empty."""
    return _bloom_filter_from(
        keys.select(F.col(key_col).alias("k")).distinct(), bits_per_key
    )


def _bloom_filter_from(keys: DataFrame, bits_per_key: int):
    h1c, h2c = _bloom_h1h2(F.col("k"))
    hashes = keys.select(h1c.alias("h1"), h2c.alias("h2")).collect()
    if not hashes:
        return None
    m_bits = max(1024, bits_per_key * len(hashes))
    m_bits += (-m_bits) % 64
    words = [0] * (m_bits // 64)
    for r in hashes:
        for i in range(_BLOOM_K):
            pos = (r["h1"] + i * r["h2"]) % m_bits
            words[pos // 64] |= 1 << (pos % 64)
    # Spark longs are signed: re-bias words with the top bit set
    words_lit = F.lit([w - (1 << 64) if w >= (1 << 63) else w for w in words])

    def gate(lemma_col):
        h1, h2 = _bloom_h1h2(lemma_col)
        cond = None
        for i in range(_BLOOM_K):
            pos = F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))
            word = F.element_at(
                words_lit, (F.floor(pos / 64) + 1).cast("int")
            )
            bit = F.call_function(
                "shiftrightunsigned", word, F.pmod(pos, F.lit(64)).cast("int")
            ).bitwiseAND(F.lit(1)) == 1
            cond = bit if cond is None else (cond & bit)
        return cond

    return gate


def alias_edges(mentions: DataFrame, alias_pairs: DataFrame) -> DataFrame:
    """Entity-link candidate edges from an alias dictionary
    (lemma_a, lemma_b).  The dictionary is broadcast (small dim);
    output edges are concept-id pairs.  A Bloom-filter gate built
    from the dictionary prunes the mention relation BEFORE the
    distinct() shuffle (see :func:`bloom_lemma_filter`); the exact
    equi-join then discards Bloom false positives, so the output is
    identical to the ungated plan."""
    a = F.broadcast(alias_pairs)
    gate = bloom_lemma_filter(alias_pairs)
    lem = mentions.select("lemma", "concept_id")
    if gate is None:
        return lem.limit(0).select(
            F.col("concept_id").alias("u"), F.col("concept_id").alias("v")
        )
    lem = lem.where(gate(F.col("lemma"))).distinct()
    return (
        lem.alias("x")
        .join(a.alias("al"), F.col("x.lemma") == F.col("al.lemma_a"))
        .join(lem.alias("y"), F.col("al.lemma_b") == F.col("y.lemma"))
        .select(F.col("x.concept_id").alias("u"), F.col("y.concept_id").alias("v"))
    )


def canonical_concepts(mentions: DataFrame, alias_pairs: DataFrame | None) -> DataFrame:
    """-> (concept_id, canonical_id): every concept mapped to its
    cluster representative (min concept_id of the connected component
    of the alias graph; identity when unlinked)."""
    all_ids = mentions.select("concept_id").distinct()
    if alias_pairs is None:
        return all_ids.withColumn("canonical_id", F.col("concept_id"))
    e = alias_edges(mentions, alias_pairs)
    cc = connected_components(e)
    return (
        all_ids.join(cc, all_ids.concept_id == cc.id, "left")
        .select(
            "concept_id",
            F.coalesce(F.col("component"), F.col("concept_id")).alias("canonical_id"),
        )
    )


def rewrite_triples(triples: DataFrame, concept_map: DataFrame) -> DataFrame:
    """Rewrite triple endpoints onto canonical ids (two broadcast-able
    joins; the map is |distinct concepts|, far smaller than triples)."""
    m = F.broadcast(concept_map)
    return (
        triples.join(
            m.withColumnRenamed("concept_id", "subj_id").withColumnRenamed(
                "canonical_id", "subj_canon"
            ),
            "subj_id",
            "left",
        )
        .join(
            m.withColumnRenamed("concept_id", "obj_id").withColumnRenamed(
                "canonical_id", "obj_canon"
            ),
            "obj_id",
            "left",
        )
        .select(
            F.coalesce("subj_canon", "subj_id").alias("subj_id"),
            "predicate",
            F.coalesce("obj_canon", "obj_id").alias("obj_id"),
            "confidence",
            "evidence",
            "chunk_id",
        )
    )
