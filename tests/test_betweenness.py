"""Betweenness vs the reference goldens and a python Brandes oracle."""

from collections import defaultdict, deque

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.betweenness import (
    betweenness, edge_betweenness, estimate_betweenness,
)

# the reference's 6-node fixture (CentralityGTest.cpp:42-70)
BC6_EDGES = [(0, 2), (1, 2), (2, 3), (2, 4), (3, 5), (4, 5)]
BC6_GOLDEN = {0: 0.0, 1: 0.0, 2: 15.0, 3: 3.0, 4: 3.0, 5: 1.0}


def _brandes_oracle(edges, n):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    bc = {v: 0.0 for v in range(n)}
    for s in range(n):
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        preds = defaultdict(list)
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_reference_golden(spark):
    g = Graph.from_rows(spark, BC6_EDGES, directed=False)
    got = {r["id"]: r["score"] for r in betweenness(g).collect()}
    for v, want in BC6_GOLDEN.items():
        assert got[v] == pytest.approx(want, abs=1e-9)


def test_betweenness_karate_vs_oracle(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    got = {r["id"]: r["score"] for r in betweenness(g).collect()}
    want = _brandes_oracle(edges, n)
    for v in range(n):
        assert got[v] == pytest.approx(want[v], rel=1e-9)


def test_estimate_with_all_sources_is_exact(spark):
    g = Graph.from_rows(spark, BC6_EDGES, directed=False)
    got = {r["id"]: r["score"]
           for r in estimate_betweenness(g, n_samples=6).collect()}
    for v, want in BC6_GOLDEN.items():
        assert got[v] == pytest.approx(want, abs=1e-9)


def test_normalized(spark):
    g = Graph.from_rows(spark, BC6_EDGES, directed=False)
    got = {r["id"]: r["score"]
           for r in betweenness(g, normalized=True).collect()}
    pairs = (6 - 1) * (6 - 2) / 2  # undirected: (n-1)(n-2)/2
    assert got[2] == pytest.approx(15.0 / pairs)


def test_edge_betweenness_path(spark):
    # P3: 0-1-2. Ordered pairs: each edge carries (0,1),(1,0) style
    # dependencies; summed over both orientations each edge gets 4
    g = Graph.from_rows(spark, [(0, 1), (1, 2)], directed=False)
    rows = edge_betweenness(g).collect()
    canon = defaultdict(float)
    for r in rows:
        canon[tuple(sorted((r["src"], r["dst"])))] += r["score"]
    assert canon[(0, 1)] == pytest.approx(4.0)
    assert canon[(1, 2)] == pytest.approx(4.0)


def test_approx_betweenness_rk_error_bound(spark, karate):
    # ApproxBetweenness.cpp (RK): scores estimate bc/(n(n-1)) within
    # +-eps w.p. >= 1-delta; CentralityGTest.cpp:104 smoke fixture
    from networkit_spark.graph import Graph
    from networkit_spark.operators.betweenness import (
        approx_betweenness, betweenness,
    )

    edges, n = karate
    g = Graph.from_rows(spark, [(u, v, 1.0) for u, v in edges],
                        directed=False)
    exact = {r["id"]: r["score"]
             for r in betweenness(g).collect()}  # ordered-pair convention
    approx = {r["id"]: r["score"]
              for r in approx_betweenness(g, epsilon=0.1, delta=0.1).collect()}
    assert set(approx) == set(exact)
    norm = n * (n - 1)
    worst = max(abs(approx[v] - exact[v] / norm) for v in exact)
    assert worst <= 0.1, f"RK error {worst} exceeds eps"


def test_approx_betweenness_tiny_diameter_zero(spark):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.betweenness import approx_betweenness

    k4 = Graph.from_rows(spark, [(u, v, 1.0) for u in range(4)
                                 for v in range(u + 1, 4)], directed=False)
    out = approx_betweenness(k4)
    assert all(r["score"] == 0.0 for r in out.collect())


def test_weighted_betweenness_reference_golden(spark):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.betweenness import weighted_betweenness

    # CentralityGTest.cpp:131-168 weighted fixture
    edges = [(0, 2, 3.0), (1, 2, 2.0), (2, 3, 3.0), (2, 4, 2.0),
             (2, 5, 1.5), (3, 5, 3.0), (4, 5, 2.0), (5, 6, 3.0),
             (5, 7, 2.0)]
    g = Graph.from_rows(spark, edges, directed=False)
    got = {r["id"]: r["score"] for r in weighted_betweenness(g).collect()}
    want = {0: 0.0, 1: 0.0, 2: 23.0, 3: 0.0, 4: 0.0, 5: 23.0,
            6: 0.0, 7: 0.0}
    for v, s in want.items():
        assert got[v] == pytest.approx(s, abs=1e-3), (v, got[v])


def test_weighted_matches_unweighted_on_unit_weights(spark, karate):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.betweenness import (
        betweenness, weighted_betweenness)

    edges, n = karate
    g = Graph.from_rows(spark, [(u, v, 1.0) for u, v in edges],
                        directed=False)
    exact = {r["id"]: r["score"] for r in betweenness(g).collect()}
    got = {r["id"]: r["score"] for r in weighted_betweenness(g).collect()}
    for v in range(n):
        assert got[v] == pytest.approx(exact[v], rel=1e-9), v


def test_weighted_betweenness_rejects_nonpositive(spark):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.betweenness import weighted_betweenness

    g = Graph.from_rows(spark, [(0, 1, 0.0), (1, 2, 1.0)],
                        directed=False)
    with pytest.raises(ValueError):
        weighted_betweenness(g)
