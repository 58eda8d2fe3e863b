"""MIS / matching / spanning forest invariants on karate + random."""

from collections import defaultdict

from networkit_spark.graph import Graph
from networkit_spark.operators.components import (
    connected_components, num_components,
)
from networkit_spark.operators.structures import (
    matching_coarsening, maximal_independent_set, maximal_matching,
    spanning_forest,
)


def _adj(edges):
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    return adj


def test_mis_independent_and_maximal(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    adj = _adj(edges)
    mis = {r["id"] for r in maximal_independent_set(g).collect()
           if r["in_mis"]}
    assert mis
    for v in mis:  # independence
        assert not (adj[v] & mis)
    for v in range(n):  # maximality
        if v not in mis:
            assert adj[v] & mis, v


def test_matching_disjoint_and_maximal(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    adj = _adj(edges)
    eset = {(min(u, v), max(u, v)) for u, v in edges}
    m = [(r["u"], r["v"]) for r in maximal_matching(g).collect()]
    assert m
    used = set()
    for u, v in m:
        assert (u, v) in eset          # matched pairs are edges
        assert u not in used and v not in used  # vertex-disjoint
        used.update((u, v))
    for (u, v) in eset:                # maximal
        assert u in used or v in used, (u, v)


def test_matching_coarsening(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    m = maximal_matching(g)
    k = m.count()
    coarse, labels = matching_coarsening(g, m)
    assert coarse.num_vertices() == n - k
    assert labels.count() == n


def test_spanning_forest(spark):
    # two components: 0-5 path-ish + 6-8 triangle
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 5),
             (6, 7), (7, 8), (6, 8)]
    g = Graph.from_rows(spark, edges, directed=False)
    t = [(r["parent"], r["child"]) for r in spanning_forest(g).collect()]
    ncomp = num_components(connected_components(g))
    assert len(t) == 9 - ncomp
    eset = {(min(u, v), max(u, v)) for u, v in edges}
    children = [c for _, c in t]
    assert len(set(children)) == len(children)  # one parent per child
    for p, c in t:
        assert (min(p, c), max(p, c)) in eset


def test_spanning_forest_karate_connected(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    t = [(r["parent"], r["child"]) for r in spanning_forest(g).collect()]
    assert len(t) == n - 1
    # the tree connects all vertices
    adj = _adj(t)
    seen = {0}
    stack = [0]
    while stack:
        v = stack.pop()
        for w in adj[v]:
            if w not in seen:
                seen.add(w)
                stack.append(w)
    assert len(seen) == n


def test_weighted_local_max_matching(spark):
    """by_weight=True = LocalMaxMatcher / PathGrowingMatcher semantics:
    a 1/2-approximation of the maximum-weight matching (Preis)."""
    import itertools
    import random

    rng = random.Random(7)
    n = 12
    edges = []
    seen = set()
    while len(edges) < 26:
        u, v = rng.randrange(n), rng.randrange(n)
        if u == v or (min(u, v), max(u, v)) in seen:
            continue
        seen.add((min(u, v), max(u, v)))
        edges.append((u, v, float(rng.randrange(1, 50))))
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    got = {(r["u"], r["v"]) for r in
           maximal_matching(g, by_weight=True).collect()}
    wmap = {(min(u, v), max(u, v)): w for u, v, w in edges}
    # valid matching
    used = [x for e in got for x in e]
    assert len(used) == len(set(used))
    assert all(e in wmap for e in got)
    got_w = sum(wmap[e] for e in got)
    # brute-force optimum over all matchings (n small)
    best = 0.0
    es = list(wmap.items())

    def rec(i, forbidden, acc):
        nonlocal best
        if acc + sum(w for (e, w) in es[i:]) <= best:
            return
        if i == len(es):
            best = max(best, acc)
            return
        (u, v), w = es[i]
        rec(i + 1, forbidden, acc)
        if u not in forbidden and v not in forbidden:
            rec(i + 1, forbidden | {u, v}, acc + w)

    rec(0, frozenset(), 0.0)
    assert got_w >= 0.5 * best
    # dominance fixture: the heavy middle edge must be picked
    g2 = Graph.from_rows(
        spark, [(0, 1, 1.0), (1, 2, 10.0), (2, 3, 1.0)],
        directed=False, n=4)
    got2 = {(r["u"], r["v"]) for r in
            maximal_matching(g2, by_weight=True).collect()}
    assert got2 == {(1, 2)}
