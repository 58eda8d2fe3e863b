"""Maximal cliques vs a direct python Bron–Kerbosch oracle
(reference cpp/clique/MaximalCliques.cpp semantics: every maximal
clique exactly once)."""

from collections import defaultdict

from networkit_spark.graph import Graph
from networkit_spark.operators.cliques import max_clique, maximal_cliques


def _bk_oracle(edges, n):
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    out = []

    def bk(r, p, x):
        if not p and not x:
            out.append(tuple(sorted(r)))
            return
        pivot = max(p | x, key=lambda u: len(adj[u] & p))
        for u in sorted(p - adj[pivot]):
            bk(r | {u}, p & adj[u], x & adj[u])
            p = p - {u}
            x = x | {u}

    bk(set(), set(range(n)), set())
    # bk over all vertices misses isolated ones only if adj lacks them;
    # range(n) includes them, and an isolated vertex is its own maximal
    # clique (p∩adj = ∅ immediately)
    return sorted(out)


def test_karate_maximal_cliques(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    got = sorted(tuple(r["clique"])
                 for r in maximal_cliques(g).collect())
    want = _bk_oracle(edges, n)
    assert got == want
    assert max_clique(g) == 5  # known karate clique number


def test_cliques_core_order_same_result(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    got = sorted(tuple(r["clique"])
                 for r in maximal_cliques(g, order="core").collect())
    assert got == _bk_oracle(edges, n)


def test_cliques_random_graph(spark):
    import random
    rng = random.Random(7)
    n = 40
    edges = sorted({(min(u, v), max(u, v))
                    for u, v in ((rng.randrange(n), rng.randrange(n))
                                 for _ in range(160)) if u != v})
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    got = sorted(tuple(r["clique"])
                 for r in maximal_cliques(g).collect())
    assert got == _bk_oracle(edges, n)


def test_cliques_isolated_and_edgeless(spark):
    g = Graph.from_rows(spark, [(0, 1)], directed=False, n=4)
    got = sorted(tuple(r["clique"])
                 for r in maximal_cliques(g).collect())
    assert got == [(0, 1), (2,), (3,)]
