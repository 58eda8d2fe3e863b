"""Closeness family vs python BFS oracles on karate."""

from collections import defaultdict, deque

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.closeness import (
    approx_closeness, closeness, diameter, eccentricity, group_degree,
    harmonic_closeness, top_closeness,
)


def _bfs_dists(adj, s):
    dist = {s: 0}
    q = deque([s])
    while q:
        v = q.popleft()
        for w in adj[v]:
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    return dist


def _adj(edges):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def test_closeness_karate(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    adj = _adj(edges)
    got = {r["id"]: r["score"] for r in closeness(g).collect()}
    gotn = {r["id"]: r["score"]
            for r in closeness(g, normalized=True).collect()}
    for v in range(n):
        sd = sum(d for d in _bfs_dists(adj, v).values())
        assert got[v] == pytest.approx(1.0 / sd)
        assert gotn[v] == pytest.approx((n - 1) / sd)


def test_harmonic_and_disconnected(spark):
    # two components: harmonic is defined, closeness throws
    g = Graph.from_rows(spark, [(0, 1), (1, 2), (3, 4)], directed=False)
    got = {r["id"]: r["score"] for r in harmonic_closeness(g).collect()}
    assert got[1] == pytest.approx(2.0)          # 1/1 + 1/1
    assert got[0] == pytest.approx(1.0 + 0.5)    # 1 + 1/2
    assert got[3] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        closeness(g)


def test_approx_closeness_all_samples_exact(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    exact = {r["id"]: r["score"] for r in closeness(g).collect()}
    approx = {r["id"]: r["score"]
              for r in approx_closeness(g, n_samples=n).collect()}
    for v in range(n):
        assert approx[v] == pytest.approx(exact[v])


def test_eccentricity_diameter_karate(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    adj = _adj(edges)
    got = {r["id"]: r["ecc"] for r in eccentricity(g).collect()}
    want_diam = 0
    for v in range(n):
        ecc = max(_bfs_dists(adj, v).values())
        assert got[v] == ecc
        want_diam = max(want_diam, ecc)
    assert diameter(g, algo="exact") == want_diam == 5
    est = diameter(g, algo="estimate")
    assert est <= want_diam
    assert est >= want_diam / 2  # double-sweep is at worst a 2-approx


def test_top_closeness(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    top = top_closeness(g, 3).collect()
    allc = sorted(((r["score"], -r["id"]) for r in closeness(g).collect()),
                  reverse=True)
    want_ids = [-x[1] for x in allc[:3]]
    assert [r["id"] for r in top] == want_ids


def test_group_degree_greedy(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    adj = _adj(edges)
    # python greedy oracle with the same (gain desc, id asc) tie-break
    covered: set = set()
    want = []
    for _ in range(3):
        best, best_gain = None, -1
        for v in sorted(adj):
            if v in want:
                continue
            gain = len(adj[v] - covered)
            if gain > best_gain:
                best, best_gain = v, gain
        want.append(best)
        covered |= adj[best]
    assert group_degree(g, 3) == want


def test_group_closeness_greedy_oracle(spark, karate):
    # greedy oracle over the exact BFS distance matrix, same tie-breaks
    from networkit_spark.graph import Graph
    from networkit_spark.operators.closeness import group_closeness

    edges, n = karate
    g = Graph.from_rows(spark, [(u, v, 1.0) for u, v in edges],
                        directed=False)
    INF = 2.0 * n
    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    D = [[INF] * n for _ in range(n)]
    for s in range(n):
        D[s][s] = 0
        q = [s]
        while q:
            nq = []
            for x in q:
                for y in adj[x]:
                    if D[s][y] >= INF:
                        D[s][y] = D[s][x] + 1
                        nq.append(y)
            q = nq
    cur = [INF] * n
    want = []
    for _ in range(3):
        gains = []
        for u in range(n):
            if u in want:
                continue
            gains.append((sum(max(0.0, cur[v] - D[u][v]) for v in range(n)), -u))
        gains.sort(reverse=True)
        pick = -gains[0][1]
        want.append(pick)
        cur = [min(cur[v], D[pick][v]) for v in range(n)]
    assert group_closeness(g, 3) == want


def test_group_closeness_star_center_first(spark):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.closeness import group_closeness

    star = Graph.from_rows(spark, [(0, i, 1.0) for i in range(1, 6)],
                           directed=False)
    out = group_closeness(star, 2)
    assert out[0] == 0 and len(out) == 2


def test_diameter_range_exact_on_karate(spark, karate):
    from networkit_spark.operators.closeness import diameter_range

    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    lb, ub = diameter_range(g, error=0.0)
    assert (lb, ub) == (5, 5)  # karate diameter golden


def test_diameter_range_bounds_and_error(spark):
    from networkit_spark.operators.closeness import diameter_range

    # path of 12 nodes ∪ a triangle (disconnected, multi-component)
    edges = [(i, i + 1) for i in range(11)] + [(20, 21), (21, 22), (20, 22)]
    g = Graph.from_rows(spark, edges, directed=False)
    lb, ub = diameter_range(g, error=0.0)
    assert (lb, ub) == (11, 11)
    lb2, ub2 = diameter_range(g, error=0.5)
    assert lb2 <= 11 <= ub2 and ub2 <= lb2 + 0.5 * lb2


def test_vertex_diameter_pedantic_upper_bound(spark, karate):
    from networkit_spark.operators.closeness import (
        estimated_vertex_diameter, estimated_vertex_diameter_pedantic)

    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    vd = estimated_vertex_diameter_pedantic(g)
    # true vertex diameter = edge diameter + 1 = 6; pedantic is an UPPER
    # bound computed from one BFS: maxD + maxD2 + 1
    assert vd >= 6
    vs = estimated_vertex_diameter(g, 4, seed=7)
    assert vs >= 1

    # exact on a path graph: one BFS from any node p gives
    # maxD + maxD2 >= diameter; from an endpoint it is exact
    path = Graph.from_rows(spark, [(i, i + 1) for i in range(9)],
                           directed=False)
    vdp = estimated_vertex_diameter_pedantic(path)
    assert vdp >= 10
