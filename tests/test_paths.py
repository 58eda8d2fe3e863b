"""All simple paths + commute-time distance vs python oracles
(reference cpp/distance/AllSimplePaths.h, CommuteTimeDistance.cpp)."""

from collections import defaultdict

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.paths import (
    all_simple_paths, commute_time_distances,
)


def _paths_oracle(edges, s, t, cutoff, directed=False):
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            if not directed:
                adj[v].add(u)
    out = []

    def dfs(path):
        if len(path) - 1 > cutoff:
            return
        if path[-1] == t:
            out.append(tuple(path))
            return
        if len(path) - 1 == cutoff:
            return
        for nb in sorted(adj[path[-1]]):
            if nb not in path:
                dfs(path + [nb])

    dfs([s])
    return sorted(out)


def test_all_simple_paths_karate(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    got = sorted(tuple(r["path"])
                 for r in all_simple_paths(g, 16, 5, cutoff=4).collect())
    assert got == _paths_oracle(edges, 16, 5, 4)
    assert got  # 16 and 5 are 2 hops apart; cutoff 4 finds paths


def test_all_simple_paths_directed(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (1, 3), (3, 0)]
    g = Graph.from_rows(spark, edges, directed=True)
    got = sorted(tuple(r["path"])
                 for r in all_simple_paths(g, 0, 3, cutoff=4).collect())
    assert got == _paths_oracle(edges, 0, 3, 4, directed=True)
    assert (0, 1, 2, 3) in got and (0, 2, 3) in got


def test_all_simple_paths_trivial(spark):
    g = Graph.from_rows(spark, [(0, 1)], directed=False)
    rows = all_simple_paths(g, 0, 0, cutoff=3).collect()
    assert [tuple(r["path"]) for r in rows] == [(0,)]


def test_commute_time_path_graph(spark):
    """On a tree, ECTD(u,v) = 2·m·dist(u,v) (effective resistance =
    path length): P3 has C(0,1) = 4, C(0,2) = 8."""
    g = Graph.from_rows(spark, [(0, 1), (1, 2)], directed=False)
    got = {(r["u"], r["v"]): r["ectd"]
           for r in commute_time_distances(g).collect()}
    assert got[(0, 1)] == pytest.approx(4.0)
    assert got[(1, 2)] == pytest.approx(4.0)
    assert got[(0, 2)] == pytest.approx(8.0)


def test_commute_time_triangle_symmetry(spark):
    """K3: every pair identical by symmetry; R_eff = 2/3, vol = 6 →
    ECTD = 4."""
    g = Graph.from_rows(spark, [(0, 1), (1, 2), (0, 2)], directed=False)
    got = [r["ectd"] for r in commute_time_distances(g).collect()]
    assert got == pytest.approx([4.0, 4.0, 4.0])


def test_reverse_bfs(spark):
    from networkit_spark.operators.distances import bfs, reverse_bfs
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)]
    g = Graph.from_rows(spark, edges, directed=True)
    fwd = {r["id"]: r["dist"] for r in bfs(g, 0).collect()}
    rev = {r["id"]: r["dist"] for r in reverse_bfs(g, 0).collect()}
    # distance TO 0: 3->0 is 1 hop; 1->3->0 is 2; 2->3->0 is 2
    assert rev[0] == 0 and rev[3] == 1 and rev[1] == 2 and rev[2] == 2
    assert fwd[1] == 1  # and forward differs from reverse on a cycle
