"""Hyperbolicity vs a brute-force 4-point-condition oracle."""

import itertools

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.hyperbolicity import hyperbolicity


def _oracle(edges, n):
    """Brute force: BFS distance matrix + max over all quadruples."""
    INF = 10 ** 9
    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    D = np.full((n, n), INF, dtype=np.int64)
    for s in range(n):
        D[s, s] = 0
        q = [s]
        while q:
            nq = []
            for x in q:
                for y in adj[x]:
                    if D[s, y] == INF:
                        D[s, y] = D[s, x] + 1
                        nq.append(y)
            q = nq
    best = 0.0
    for a, b, c, d in itertools.combinations(range(n), 4):
        if max(D[a, b], D[c, d], D[a, c], D[b, d], D[a, d], D[b, c]) >= INF:
            continue  # cross-component quadruple: skipped (max per comp)
        s1 = D[a, b] + D[c, d]
        s2 = D[a, c] + D[b, d]
        s3 = D[a, d] + D[b, c]
        x, y, _ = sorted([s1, s2, s3], reverse=True)
        best = max(best, (x - y) / 2.0)
    return best


def test_c4_cycle_is_one_hyperbolic(spark):
    # HyperbolicityGTest.cpp testHyperbolicity fixture: the 4-cycle
    g = Graph.from_rows(
        spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0)],
        directed=False)
    assert hyperbolicity(g) == 1.0


def test_tree_and_clique_are_zero_hyperbolic(spark):
    tree = Graph.from_rows(
        spark, [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (1, 4, 1.0),
                (2, 5, 1.0)], directed=False)
    assert hyperbolicity(tree) == 0.0
    k5 = Graph.from_rows(
        spark, [(u, v, 1.0) for u in range(5) for v in range(u + 1, 5)],
        directed=False)
    assert hyperbolicity(k5) == 0.0


def test_small_world_matches_bruteforce(spark):
    # deterministic 24-node ring + chords
    n = 24
    edges = [(i, (i + 1) % n) for i in range(n)]
    edges += [(i, (i + 7) % n) for i in range(0, n, 3)]
    edges = sorted({(min(u, v), max(u, v)) for u, v in edges})
    g = Graph.from_rows(spark, [(u, v, 1.0) for u, v in edges],
                        directed=False)
    want = _oracle(edges, n)
    assert want > 0  # fixture sanity: non-tree-like
    assert hyperbolicity(g) == want
    # tighter sampling must not change the exact answer
    assert hyperbolicity(g, sample_pairs=4) == want


def test_n_below_4_and_disconnected(spark):
    tiny = Graph.from_rows(spark, [(0, 1, 1.0), (1, 2, 1.0)],
                           directed=False)
    assert hyperbolicity(tiny) == 0.0
    two_comps = Graph.from_rows(
        spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
                (10, 11, 1.0), (11, 12, 1.0), (12, 13, 1.0),
                (13, 10, 1.0)], directed=False)
    with pytest.raises(ValueError):
        hyperbolicity(two_comps)
    # max over components: the C4 component dominates
    assert hyperbolicity(two_comps, check_connected=False) == 1.0


def test_karate_matches_bruteforce(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, [(u, v, 1.0) for u, v in edges],
                        directed=False)
    want = _oracle(edges, n)
    assert hyperbolicity(g) == want
