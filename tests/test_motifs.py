"""Motif pattern matching: find() vs hand-joins, triad_census vs a
brute-force itertools classifier."""

from itertools import combinations, permutations

import pytest

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.plans import motifs


def _edges_df(spark, edges, rel=None):
    if rel is None:
        return spark.createDataFrame(edges, "src_id string, dst_id string")
    return spark.createDataFrame(edges, "src_id string, dst_id string, rel string")


EDGES = [
    ("a", "b"), ("b", "c"), ("a", "c"),          # transitive triangle
    ("x", "y"), ("y", "z"), ("z", "x"),          # pure 3-cycle
    ("c", "d"), ("d", "e"),                      # open wedge c->d->e
]


class TestFind:
    def test_two_hop_paths(self, spark):
        got = {
            (r["a"], r["b"], r["c"])
            for r in motifs.find(_edges_df(spark, EDGES), "(a)-->(b); (b)-->(c)").collect()
        }
        exp = {
            (u1, v1, v2)
            for (u1, v1) in EDGES
            for (u2, v2) in EDGES
            if v1 == u2
        }
        assert got == exp

    def test_negated_shortcut(self, spark):
        got = {
            (r["a"], r["b"], r["c"])
            for r in motifs.find(
                _edges_df(spark, EDGES), "(a)-->(b); (b)-->(c); !(a)-->(c)"
            ).collect()
        }
        e = set(EDGES)
        exp = {
            (u1, v1, v2)
            for (u1, v1) in EDGES
            for (u2, v2) in EDGES
            if v1 == u2 and (u1, v2) not in e
        }
        assert got == exp

    def test_rel_variable_binding(self, spark):
        e = _edges_df(
            spark,
            [("a", "b", "is_a"), ("b", "c", "part_of"), ("a", "c", "is_a")],
            rel=True,
        )
        rows = motifs.find(
            e, "(a)-[r1]->(b); (b)-[r2]->(c)", rel="rel"
        ).collect()
        assert {(r["a"], r["r1"], r["b"], r["r2"], r["c"]) for r in rows} == {
            ("a", "is_a", "b", "part_of", "c"),
        }

    def test_shared_rel_variable_joins_on_it(self, spark):
        e = _edges_df(
            spark,
            [("a", "b", "is_a"), ("b", "c", "part_of"), ("b", "d", "is_a")],
            rel=True,
        )
        rows = motifs.find(e, "(a)-[r]->(b); (b)-[r]->(c)", rel="rel").collect()
        assert {(r["a"], r["b"], r["c"]) for r in rows} == {("a", "b", "d")}

    def test_errors(self, spark):
        e = _edges_df(spark, EDGES)
        with pytest.raises(ValueError, match="disconnected"):
            motifs.find(e, "(a)-->(b); (c)-->(d)")
        with pytest.raises(ValueError, match="unbound"):
            motifs.find(e, "(a)-->(b); !(a)-->(c)")
        with pytest.raises(ValueError, match="self-loop"):
            motifs.find(e, "(a)-->(a)")
        with pytest.raises(ValueError, match="not understood"):
            motifs.find(e, "(a)==>(b)")
        with pytest.raises(ValueError, match="edge variable"):
            motifs.find(e, "(a)-[r]->(b)")  # no rel column given


def _py_census(edges):
    e = {(a, b) for a, b in edges if a != b}
    nodes = sorted({x for p in e for x in p})
    trans = cyc = 0
    for t in combinations(nodes, 3):
        perms = list(permutations(t))
        if any((x, y) in e and (y, z) in e and (x, z) in e for x, y, z in perms):
            trans += 1
        elif any((x, y) in e and (y, z) in e and (z, x) in e for x, y, z in perms):
            cyc += 1
    wedges = {
        (b, frozenset((a, c)))
        for (a, b) in e
        for (b2, c) in e
        if b2 == b and c != a and (a, c) not in e and (c, a) not in e
    }
    return trans, cyc, len(wedges)


class TestTriadCensus:
    def _run(self, spark, edges):
        row = motifs.triad_census(_edges_df(spark, edges)).collect()[0]
        assert (
            row["n_transitive"], row["n_cyclic"], row["n_open"]
        ) == _py_census(edges)

    def test_crafted(self, spark):
        self._run(spark, EDGES)

    def test_dense_triad_counts_once(self, spark):
        # complete digraph on 3 nodes: one transitive triple, no
        # pure cycle, no open wedge
        nodes = ["p", "q", "r"]
        edges = [(a, b) for a in nodes for b in nodes if a != b]
        self._run(spark, edges)

    def test_cycle_plus_chord_is_transitive(self, spark):
        self._run(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("b", "a")])

    def test_random_digraph(self, spark):
        import random

        rng = random.Random(7)
        nodes = [f"n{i}" for i in range(14)]
        edges = sorted(
            {(rng.choice(nodes), rng.choice(nodes)) for _ in range(70)}
        )
        edges = [(a, b) for a, b in edges if a != b]
        self._run(spark, edges)


def test_node_edge_namespace_clash_is_refused(spark):
    e = _edges_df(spark, [("a", "b", "is_a")], rel=True)
    with pytest.raises(ValueError, match="both node and edge"):
        motifs.find(e, "(a)-[x]->(b); (x)-->(c)", rel="rel")
    with pytest.raises(ValueError, match="both node and edge"):
        motifs.find(e, "(a)-[a]->(b)", rel="rel")
