"""Connected components (large-star/small-star) and entity linking."""

from pyspark.sql import functions as F

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import canonicalize


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "u string, v string")
    return {
        r["id"]: r["component"]
        for r in canonicalize.connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_chain_long(spark):
    n = 40
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n)]
    got = _cc(spark, edges)
    assert set(got.values()) == {"n000"}
    assert len(got) == n + 1


def test_star_hub(spark):
    edges = [("hub", f"s{i:02d}") for i in range(20)]
    got = _cc(spark, edges)
    assert set(got.values()) == {"hub"}


def test_self_loops_and_dups_ignored(spark):
    got = _cc(spark, [("a", "a"), ("a", "b"), ("b", "a")])
    assert got == {"a": "a", "b": "a"}


def test_canonical_concepts_with_aliases(spark):
    mentions = spark.createDataFrame(
        [
            ("c1", "id_ml", "machine_learning", "Machine Learning", "NER"),
            ("c1", "id_ai", "ai", "AI", "acronym"),
            ("c2", "id_kg", "knowledge_graph", "Knowledge Graph", "NER"),
        ],
        "chunk_id string, concept_id string, lemma string, surface string, origin string",
    )
    aliases = spark.createDataFrame(
        [("machine_learning", "ai")], "lemma_a string, lemma_b string"
    )
    got = {
        r["concept_id"]: r["canonical_id"]
        for r in canonicalize.canonical_concepts(mentions, aliases).collect()
    }
    # ml and ai collapse to one canonical id; kg stays itself
    assert got["id_kg"] == "id_kg"
    assert got["id_ml"] == got["id_ai"] == min("id_ml", "id_ai")


def test_rewrite_triples(spark):
    triples = spark.createDataFrame(
        [("id_ai", "related_to", "id_kg", 0.9, "e", "c1")],
        "subj_id string, predicate string, obj_id string, confidence double, evidence string, chunk_id string",
    )
    cmap = spark.createDataFrame(
        [("id_ai", "id_ml"), ("id_kg", "id_kg")], "concept_id string, canonical_id string"
    )
    rows = canonicalize.rewrite_triples(triples, cmap).collect()
    assert rows[0]["subj_id"] == "id_ml" and rows[0]["obj_id"] == "id_kg"


class TestBloomAliasGate:
    """bloom_lemma_filter: no false negatives (every dictionary lemma
    passes), real pruning on non-dictionary lemmas, and gated
    alias_edges output identical to the exact join alone."""

    def _mentions(self, spark, lemmas):
        return spark.createDataFrame(
            [(f"c{i}", f"id_{l}", l, l, "NER") for i, l in enumerate(lemmas)],
            "chunk_id string, concept_id string, lemma string, surface string, origin string",
        )

    def test_no_false_negatives_and_prunes(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import canonicalize

        aliases = spark.createDataFrame(
            [("machine_learning", "ai"), ("knowledge_graph", "kg")],
            "lemma_a string, lemma_b string",
        )
        gate = canonicalize.bloom_lemma_filter(aliases)
        dict_lemmas = ["machine_learning", "ai", "knowledge_graph", "kg"]
        noise = [f"noise_{i}" for i in range(500)]
        m = self._mentions(spark, dict_lemmas + noise)
        from pyspark.sql import functions as F

        kept = {r["lemma"] for r in m.where(gate(F.col("lemma"))).collect()}
        assert set(dict_lemmas) <= kept  # Bloom guarantees no FN
        # 1.6M bits over 4 keys: FP rate is ~0 — expect real pruning
        assert len(kept) < 50

    def test_gated_edges_equal_exact_join(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import canonicalize
        from pyspark.sql import functions as F

        aliases = spark.createDataFrame(
            [("machine_learning", "ai")], "lemma_a string, lemma_b string"
        )
        m = self._mentions(
            spark, ["machine_learning", "ai", "kg"] + [f"x{i}" for i in range(100)]
        )
        got = {
            (r["u"], r["v"])
            for r in canonicalize.alias_edges(m, aliases).collect()
        }
        # exact-join-only reference (replicates the pre-gate plan)
        lem = m.select("lemma", "concept_id").distinct()
        ref = {
            (r["u"], r["v"])
            for r in lem.alias("x")
            .join(F.broadcast(aliases).alias("al"), F.col("x.lemma") == F.col("al.lemma_a"))
            .join(lem.alias("y"), F.col("al.lemma_b") == F.col("y.lemma"))
            .select(F.col("x.concept_id").alias("u"), F.col("y.concept_id").alias("v"))
            .collect()
        }
        assert got == ref and got == {("id_machine_learning", "id_ai")}

    def test_empty_dictionary(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import canonicalize

        aliases = spark.createDataFrame([], "lemma_a string, lemma_b string")
        assert canonicalize.bloom_lemma_filter(aliases) is None
        m = self._mentions(spark, ["a_lemma"])
        assert canonicalize.alias_edges(m, aliases).count() == 0


def _uf_reference(edges):
    """Pure-Python union-find oracle: component = min id."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return {x: find(x) for x in parent}


def test_local_contract_prepass_matches_union_find(spark):
    """The partition-local contraction pre-pass must leave CC labels
    identical to a pure union-find on an adversarial mix of chains,
    stars and cross-links, under several partition layouts."""
    import random

    rng = random.Random(7)
    edges = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(60)]          # long chain
    edges += [(f"h", f"s{i:02d}") for i in range(15)]                  # star
    edges += [("c005", "s03"), ("z9", "z8"), ("z8", "z7")]             # bridges + tail
    edges += [
        (f"r{rng.randrange(30):02d}", f"r{rng.randrange(30):02d}")
        for _ in range(50)
    ]                                                                   # random blob
    edges = [(u, v) for u, v in edges if u != v]
    want = _uf_reference(edges)
    for nparts in (1, 3, 16):
        df = spark.createDataFrame(edges, "u string, v string").repartition(nparts)
        got = {
            r["id"]: r["component"]
            for r in canonicalize.connected_components(df).collect()
        }
        assert got == want, f"mismatch at {nparts} partitions"
