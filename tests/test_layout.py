"""PivotMDS vs a pure-numpy replication of the reference pipeline
(PivotMDS.cpp:23-106) on karate: same pivots, same BFS distances, same
raw-distance explicit-entry double centering, same eigensolve."""

from collections import defaultdict, deque

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.layout import choose_pivots, pivot_mds


def _bfs_dists(adj, s):
    dist = {s: 0}
    q = deque([s])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _numpy_pivot_mds(edges, n, pivots, dim):
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    k = len(pivots)
    explicit = {}  # (v, j) -> d, reached pairs only
    for j, p in enumerate(pivots):
        for v, d in _bfs_dists(adj, p).items():
            explicit[(v, j)] = float(d)
    row_mean = np.zeros(n)
    col_mean = np.zeros(k)
    for (v, j), d in explicit.items():
        row_mean[v] += d / k
        col_mean[j] += d / n
    grand = row_mean.sum() / (2 * n) + col_mean.sum() / (2 * k)
    C = np.zeros((n, k))
    for (v, j), d in explicit.items():
        C[v, j] = d - row_mean[v] - col_mean[j] + grand
    M = C.T @ C
    evals, evecs = np.linalg.eigh(M)
    order = np.argsort(evals)[::-1][:dim]
    out = np.zeros((n, dim))
    for d_i, idx in enumerate(order):
        vec = evecs[:, idx]
        if vec[np.argmax(np.abs(vec))] < 0:
            vec = -vec
        out[:, d_i] = C @ vec
    return out


def test_pivot_mds_matches_numpy_replication(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    pivots = choose_pivots(g, 8, seed=3)
    assert len(pivots) == len(set(pivots)) == 8
    got = pivot_mds(g, dim=2, num_pivots=8, seed=3)
    assert got.columns == ["id", "x0", "x1"]
    rows = {int(r["id"]): (r["x0"], r["x1"]) for r in got.collect()}
    assert len(rows) == n
    want = _numpy_pivot_mds(edges, n, pivots, dim=2)
    for v in range(n):
        assert rows[v][0] == pytest.approx(want[v, 0], abs=1e-8)
        assert rows[v][1] == pytest.approx(want[v, 1], abs=1e-8)
    # a layout that collapses to a point is wrong
    xs = np.array([rows[v] for v in range(n)])
    assert xs.std(axis=0).min() > 1e-6


def test_pivot_mds_disconnected_and_isolated(spark):
    # two components + an isolated vertex: must not crash, isolated
    # vertices (never reached by any pivot when pivots miss them)
    # still get coordinate rows
    edges = [(0, 1), (1, 2), (3, 4)]
    g = Graph.from_rows(spark, edges, directed=False, n=6)
    got = pivot_mds(g, dim=2, num_pivots=3, seed=1)
    assert got.count() == 6
    assert set(got.columns) == {"id", "x0", "x1"}


def test_fruchterman_reingold_structure_and_bounds(spark):
    """Grid-bucketed FR: (a) positions stay in the unit frame, (b) the
    layout pulls cliques together — mean intra-clique edge length ends
    below the mean inter-clique distance, (c) deterministic for a
    seed at fixed partitioning (rows-only gate rationale: float
    force-sum order)."""
    from networkit_spark.operators.layout import fruchterman_reingold

    # two 4-cliques joined by one bridge
    cl1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cl2 = [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
    g = Graph.from_rows(spark, cl1 + cl2 + [(3, 4)], directed=False)
    out = fruchterman_reingold(g, max_iter=25, seed=7)
    pos = {r["id"]: (r["x"], r["y"]) for r in out.collect()}
    assert len(pos) == 8
    for x, y in pos.values():
        assert 0.0 <= x <= 1.0 and 0.0 <= y <= 1.0

    import itertools
    import math

    def d(u, v):
        return math.dist(pos[u], pos[v])

    intra = [d(u, v) for u, v in cl1 + cl2]
    inter = [d(u, v) for u, v in itertools.product(range(4), range(4, 8))
             if (u, v) != (3, 4)]
    assert sum(intra) / len(intra) < sum(inter) / len(inter)


def test_fruchterman_reingold_displacement_capped(spark):
    """Every round moves a node at most the cooling step (reference
    move(): exactly `step` along the net force, then clamp) — one
    round from a fixed start can displace at most step=1.0."""
    from networkit_spark.operators.layout import fruchterman_reingold

    g = Graph.from_rows(spark, [(0, 1), (1, 2), (2, 0)], directed=False)
    before = fruchterman_reingold(g, max_iter=0)
    after1 = fruchterman_reingold(g, max_iter=1)
    b = {r["id"]: (r["x"], r["y"]) for r in before.collect()}
    a = {r["id"]: (r["x"], r["y"]) for r in after1.collect()}
    import math
    for i in b:
        assert math.dist(b[i], a[i]) <= 1.0 + 1e-9
