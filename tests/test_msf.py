"""Maximum / random-maximum / union-maximum / uniformly-random
spanning forests vs exact python Kruskal / union-find oracles."""

import random

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.msf import (
    maximum_spanning_forest, random_maximum_spanning_forest,
    random_spanning_forest, union_maximum_spanning_forest,
)


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[ra] = rb
            return True
        return False


def _rand_weighted(seed, n=60, m=150, classes=7):
    """Random weighted graph with heavy weight ties (small class count
    so the UMSF is a real superset of any one MSF)."""
    rng = random.Random(seed)
    seen, edges = set(), []
    while len(edges) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u == v or (min(u, v), max(u, v)) in seen:
            continue
        seen.add((min(u, v), max(u, v)))
        edges.append((u, v, float(rng.randrange(1, classes + 1))))
    return edges, n


def _kruskal_max_weight(edges):
    uf = _UF()
    total, count = 0.0, 0
    for u, v, w in sorted(edges, key=lambda e: -e[2]):
        if uf.union(u, v):
            total += w
            count += 1
    return total, count


def _umsf_oracle(edges):
    """Edge in UMSF iff endpoints disconnected using strictly heavier
    edges (UnionMaximumSpanningForest.cpp:42-79 defining property)."""
    out = set()
    for u, v, w in edges:
        uf = _UF()
        for a, b, w2 in edges:
            if w2 > w:
                uf.union(a, b)
        if uf.find(u) != uf.find(v):
            out.add((min(u, v), max(u, v), w))
    return out


def _check_is_forest(forest_edges, edges, n):
    """Forest edges are acyclic and span each component of `edges`."""
    uf = _UF()
    for a, b, _ in forest_edges:
        assert uf.union(a, b), f"cycle at ({a},{b})"
    full = _UF()
    for u, v, _ in edges:
        full.union(u, v)
    comps_full = len({full.find(x) for x in range(n)})
    comps_forest = len({uf.find(x) for x in range(n)})
    assert comps_forest == comps_full


def test_maximum_spanning_forest_matches_kruskal(spark):
    edges, n = _rand_weighted(1)
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    forest = [(r["a"], r["b"], r["weight"])
              for r in maximum_spanning_forest(g).collect()]
    want_total, want_count = _kruskal_max_weight(edges)
    assert len(forest) == want_count
    assert sum(w for _, _, w in forest) == pytest.approx(want_total)
    _check_is_forest(forest, edges, n)


def test_random_msf_is_maximum_and_seed_deterministic(spark):
    edges, n = _rand_weighted(2)
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    f1 = sorted((r["a"], r["b"], r["weight"])
                for r in random_maximum_spanning_forest(g, seed=7).collect())
    f2 = sorted((r["a"], r["b"], r["weight"])
                for r in random_maximum_spanning_forest(g, seed=7).collect())
    f3 = sorted((r["a"], r["b"], r["weight"])
                for r in random_maximum_spanning_forest(g, seed=8).collect())
    assert f1 == f2
    want_total, want_count = _kruskal_max_weight(edges)
    for f in (f1, f3):
        assert len(f) == want_count
        assert sum(w for _, _, w in f) == pytest.approx(want_total)
        _check_is_forest(f, edges, n)
    assert f1 != f3  # ties resolved differently (classes=7 forces ties)


def test_union_msf_matches_bruteforce_oracle(spark):
    edges, n = _rand_weighted(3, n=40, m=90, classes=4)
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    got = {(r["a"], r["b"], r["weight"])
           for r in union_maximum_spanning_forest(g).collect()}
    want = _umsf_oracle(edges)
    assert got == want
    # the union contains every max forest: check one
    msf = {(r["a"], r["b"], r["weight"])
           for r in maximum_spanning_forest(g).collect()}
    assert msf <= got


def test_union_msf_class_guard(spark):
    edges, n = _rand_weighted(4, n=20, m=30, classes=10)
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    with pytest.raises(ValueError, match="max_classes"):
        union_maximum_spanning_forest(g, max_classes=3)


def test_random_spanning_forest_uniform_walk(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    t1 = random_spanning_forest(g, seed=5)
    t2 = random_spanning_forest(g, seed=5)
    assert t1 == t2  # deterministic per seed
    assert len(t1) == n - 1  # karate is connected
    _check_is_forest([(a, b, 1.0) for a, b in t1],
                     [(u, v, 1.0) for u, v in edges], n)
    # different seeds give different trees with overwhelming probability
    t3 = random_spanning_forest(g, seed=6)
    assert t1 != t3
