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
    e = _canon(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    e = e.localCheckpoint(eager=True)
    # size-derived iteration parallelism: materializing a small edge
    # table at the session's full shuffle-partition count every round
    # makes task scheduling the dominant cost (same pathology as
    # pagerank_und — measured there 22 s -> 7.5 s); the formula keeps
    # full parallelism for billion-edge graphs
    sc = edges.sparkSession.sparkContext
    parts = min(sc.defaultParallelism, max(8, e.count() // 100_000 + 1))
    e = e.coalesce(parts)
    prev = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).coalesce(parts).localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    # converged: every edge is (member, root)
    members = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id")).distinct().withColumn("component", F.col("id"))
    return members.unionByName(roots).distinct()


def alias_edges(mentions: DataFrame, alias_pairs: DataFrame) -> DataFrame:
    """Entity-link candidate edges from an alias dictionary
    (lemma_a, lemma_b).  The dictionary is broadcast (small dim);
    output edges are concept-id pairs."""
    a = F.broadcast(alias_pairs)
    lem = mentions.select("lemma", "concept_id").distinct()
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
