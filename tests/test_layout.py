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


def test_multilevel_layout_prolong_and_refine(spark):
    """MultilevelLayouter: coarse FR at the base, prolong + refine up —
    result stays in frame, keeps all nodes, and separates the two
    planted clusters at least as well as random placement."""
    from networkit_spark.operators.layout import multilevel_layout

    # two 10-cliques + one bridge -> PLP contracts, recursion kicks in
    cl1 = [(a, b) for a in range(10) for b in range(a + 1, 10)]
    cl2 = [(a, b) for a in range(10, 20) for b in range(a + 1, 20)]
    g = Graph.from_rows(spark, cl1 + cl2 + [(9, 10)], directed=False)
    out = multilevel_layout(g, n_thresh=5, fr_iter=15, seed=3)
    pos = {r["id"]: (r["x"], r["y"]) for r in out.collect()}
    assert len(pos) == 20
    for x, y in pos.values():
        assert 0.0 <= x <= 1.0 and 0.0 <= y <= 1.0

    import itertools
    import math
    intra = [math.dist(pos[u], pos[v]) for u, v in cl1 + cl2]
    inter = [math.dist(pos[u], pos[v])
             for u, v in itertools.product(range(10), range(10, 20))
             if (u, v) != (9, 10)]
    assert sum(intra) / len(intra) < sum(inter) / len(inter)


def test_maxent_stress_reduces_stress(spark):
    """MaxentStress: the solve chain must reduce the k-hop stress
    energy Σ_S w·(‖x_u−x_v‖−d)² below the random-circle start, keep
    every vertex, and reject disconnected input."""
    import math
    from collections import deque

    import pytest as _pytest

    from networkit_spark.operators.layout import maxent_stress

    cl1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    cl2 = [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    edges = cl1 + cl2 + [(4, 5)]
    g = Graph.from_rows(spark, edges, directed=False)
    out = maxent_stress(g, k=2, max_solves_per_alpha=3,
                        final_alpha=0.25, seed=9)
    pos = {r["id"]: (r["x"], r["y"]) for r in out.collect()}
    assert len(pos) == 10
    assert all(math.isfinite(x) and math.isfinite(y)
               for x, y in pos.values())

    # python oracle: k=2 hop distances + the reference's init layout
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    S = {}
    for s in adj:
        dist = {s: 0}
        q = deque([s])
        while q:
            x = q.popleft()
            if dist[x] >= 2:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        for v, d in dist.items():
            if d >= 1:
                S[(s, v)] = d

    def stress(p):
        return sum((math.dist(p[u], p[v]) - d) ** 2 / (d * d)
                   for (u, v), d in S.items()) / 2

    # the operator's deterministic circle init (same hash law)
    init = maxent_stress(g, k=2, max_solves_per_alpha=0,
                         final_alpha=2.0, seed=9)
    ipos = {r["id"]: (r["x"], r["y"]) for r in init.collect()}
    assert stress(pos) < stress(ipos)

    g2 = Graph.from_rows(spark, [(0, 1), (2, 3)], directed=False)
    with _pytest.raises(ValueError, match="connected"):
        maxent_stress(g2)
