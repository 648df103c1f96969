"""Motif (graph-pattern) matching compiled to DataFrame joins.

A GraphFrames-style ``find`` surface (cf. graphframes.GraphFrame.find;
the reference exposes no pattern queries, so this is part of the
beyond-reference query surface): a pattern string like

    "(a)-->(b); (b)-->(c); !(a)-->(c)"

is parsed into edge terms and compiled into a chain of equi-joins over
the edge relation — one alias per positive term, joined on the shared
node variables — plus one left-anti join per negated term.  The result
has one column per named node variable (and per named edge variable
when the edge view carries a ``rel`` column).

Semantics follow GraphFrames: matches are HOMOMORPHISMS — distinct
variable names may bind the same node (callers add ``WHERE a != c``
when they want injectivity), and duplicate edge terms may bind the
same edge.  Negated terms must only use variables bound by positive
terms and contribute no columns.

Scale shape: the compiled plan is nothing but hash equi-joins on node
ids over the (src, dst[, rel]) edge list — Catalyst reorders and
broadcasts as sizes dictate, AQE handles skewed hub keys at runtime.
A k-term pattern is a k-way self-join: the same shape (and cost
profile) as the wedge/triangle machinery in plans/queries.py, which
is the known-scalable way to count motifs on billion-edge graphs
(cf. the _wedge_candidates hub cap there for the skew story).  Anti
joins stream map-side against the broadcast edge set when small, and
shuffle-hash otherwise — never a cartesian product: patterns whose
positive terms share no variable with what came before would
cross-join, and ``find`` REFUSES those instead (a disconnected
pattern is two independent queries; run them separately and combine).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_RE = re.compile(
    r"^(!?)\s*\(\s*(\w*)\s*\)\s*-\s*(?:\[\s*(\w*)\s*\])?\s*-?>\s*\(\s*(\w*)\s*\)$"
)


def _parse(pattern: str) -> list[tuple[bool, str, str, str]]:
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM_RE.match(raw)
        if not m:
            raise ValueError(f"motif term not understood: {raw!r}")
        neg, a, rel, b = m.group(1) == "!", m.group(2), m.group(3), m.group(4)
        if not a or not b:
            raise ValueError(
                f"motif term {raw!r}: anonymous nodes are not supported — "
                "name every endpoint"
            )
        if neg and rel:
            raise ValueError(
                f"motif term {raw!r}: negated terms cannot bind an edge variable"
            )
        if a == b:
            raise ValueError(
                f"motif term {raw!r}: self-loop terms are not supported "
                "(loops are dropped from the edge view anyway)"
            )
        terms.append((neg, a, rel or "", b))
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find(
    edges: DataFrame,
    pattern: str,
    src: str = "src_id",
    dst: str = "dst_id",
    rel: str | None = None,
) -> DataFrame:
    """Match ``pattern`` against a directed edge view and return one
    row per match, one column per named variable.

    ``edges``: columns ``src``/``dst`` (node ids) and optionally
    ``rel`` (edge label) when patterns bind edge variables like
    ``(a)-[r]->(b)``.  The edge list is de-duplicated on the used
    columns first, so multigraph inputs count each distinct
    (src, rel, dst) once — the same convention as the triangle/wedge
    counters."""
    terms = _parse(pattern)
    uses_rel = any(t[2] for t in terms)
    if uses_rel and rel is None:
        raise ValueError(
            "pattern binds an edge variable but no `rel` column was given"
        )
    cols = [F.col(src).alias("_s"), F.col(dst).alias("_d")]
    if uses_rel:
        cols.append(F.col(rel).alias("_r"))
    e = edges.select(*cols).distinct()

    # node and edge variables live in ONE joinable namespace (a shared
    # name means an equi-join), so a name used both as a node and as an
    # edge variable would silently join ids against rel labels — refuse
    node_vars = {t[1] for t in terms} | {t[3] for t in terms}
    edge_vars = {t[2] for t in terms if t[2]}
    clash = node_vars & edge_vars
    if clash:
        raise ValueError(
            f"variables used as both node and edge names: {sorted(clash)}"
        )

    df = None
    bound: set[str] = set()
    # positive terms first (GraphFrames order-independence: anti joins
    # only ever REMOVE rows, so applying them after all positives is
    # equivalent to any interleaving)
    for neg, a, r, b in sorted(terms, key=lambda t: t[0]):
        if neg:
            missing = {a, b} - bound
            if missing:
                raise ValueError(
                    f"negated term !({a})-->({b}) uses unbound variables: "
                    f"{sorted(missing)}"
                )
            t = e.select(F.col("_s").alias(a), F.col("_d").alias(b))
            df = df.join(t, on=[a, b], how="left_anti")
            continue
        sel = [F.col("_s").alias(a), F.col("_d").alias(b)]
        if r:
            sel.append(F.col("_r").alias(r))
        t = e.select(*sel)
        if df is None:
            df = t
        else:
            on = sorted(({a, b} | ({r} if r else set())) & bound)
            if not on:
                raise ValueError(
                    f"term ({a})-->({b}) shares no variable with the "
                    "pattern so far — disconnected patterns cross-join; "
                    "split the query instead"
                )
            # same variable twice in one term that is already bound
            df = df.join(t, on=on, how="inner")
        bound |= {a, b} | ({r} if r else set())
    return df.select(*sorted(bound))


def triad_census(edges: DataFrame, src: str = "src_id", dst: str = "dst_id") -> DataFrame:
    """Directed triangle census over distinct non-loop edges: one row
    (n_transitive, n_cyclic, n_open) counting unordered node triples
    {x, y, z} whose induced subgraph contains

    - transitive: some labeling a->b, b->c with the shortcut a->c
      (counted once per unordered TRIPLE, however many labelings its
      edges admit — dense triads class here),
    - cyclic: exactly a 3-cycle a->b->c->a with no further edge on
      the triple (a cycle plus any chord already admits a transitive
      labeling and is counted there — the classes are disjoint),
    - open: wedges a->b->c with NO edge between a and c in either
      direction, counted once per (center b, unordered endpoint
      pair) — the un-closed wedges link prediction feeds on.

    A 3-class roll-up of the 16-type Holland-Leinhardt census, which
    is what the KG analytics consume (transitivity ratio = closure
    evidence).

    Built ON the motif compiler — each class is one ``find`` call plus
    an aggregate, so the whole census is three independent join trees
    over the same deduplicated edge list."""
    e = (
        edges.select(F.col(src).alias("src_id"), F.col(dst).alias("dst_id"))
        .where(F.col(src) != F.col(dst))
        .distinct()
        .localCheckpoint(eager=True)
    )
    def _triples_once(df: DataFrame) -> int:
        # one count per unordered {a, b, c} whatever the labeling
        arr = F.array_sort(F.array("a", "b", "c"))
        return (
            df.select(
                arr[0].alias("x"), arr[1].alias("y"), arr[2].alias("z")
            )
            .distinct()
            .count()
        )

    inj = (
        (F.col("a") != F.col("b"))
        & (F.col("b") != F.col("c"))
        & (F.col("a") != F.col("c"))
    )
    # transitive: a->b, b->c, a->c with a,b,c pairwise distinct —
    # dense triads admit several labelings, so dedupe to the triple
    trans = _triples_once(
        find(e, "(a)-->(b); (b)-->(c); (a)-->(c)").where(inj)
    )
    # cyclic: a->b->c->a with no reversed edge on the triple (on 3
    # nodes any extra edge beyond the cycle is a reversal, and a
    # cycle + chord admits a transitive labeling -> classed above);
    # triple-dedup collapses the 3 rotations
    pure_cyc = _triples_once(
        find(
            e,
            "(a)-->(b); (b)-->(c); (c)-->(a); "
            "!(b)-->(a); !(c)-->(b); !(a)-->(c)",
        ).where(inj)
    )
    # open: a->b->c, no a->c, no c->a; keyed by center b — distinct on
    # the unordered {a, c} pair around it so a<->c reciprocal wedges
    # aren't double-counted
    open_w = (
        find(e, "(a)-->(b); (b)-->(c); !(a)-->(c); !(c)-->(a)")
        .where((F.col("a") != F.col("c")))
        .select(
            "b",
            F.least("a", "c").alias("lo"),
            F.greatest("a", "c").alias("hi"),
        )
        .distinct()
        .count()
    )
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(trans, pure_cyc, open_w)],
        "n_transitive long, n_cyclic long, n_open long",
    )
