"""Algebraic (semiring SpMV) layer vs its non-algebraic twins: the
fixpoints are the same by construction, so equality is exact."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.semiring import (
    algebraic_bellman_ford, algebraic_bfs, algebraic_triangle_counting,
    spmv,
)
from networkit_spark.operators.distances import bfs, sssp


def test_spmv_plus_times(spark):
    # y = A^T x on a 3-node chain with weights
    A = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 3.0), (0, 2, 5.0)],
        "row long, col long, val double")
    x = spark.createDataFrame(
        [(0, 1.0), (1, 10.0), (2, 100.0)], "id long, val double")
    got = {r["id"]: r["val"] for r in spmv(A, x).collect()}
    assert got == {1: 2.0, 2: 35.0}  # y1 = 2*1; y2 = 3*10 + 5*1


def test_spmv_min_plus(spark):
    A = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 3.0), (0, 2, 10.0)],
        "row long, col long, val double")
    x = spark.createDataFrame(
        [(0, 0.0), (1, 2.0)], "id long, val double")
    got = {r["id"]: r["val"] for r in spmv(A, x, add="min",
                                           mul="plus").collect()}
    assert got == {1: 2.0, 2: 5.0}  # min(0+10, 2+3)


def test_algebraic_bfs_matches_bfs(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    want = {r["id"]: r["dist"] for r in bfs(g, 0).collect()}
    got = {r["id"]: r["dist"] for r in algebraic_bfs(g, 0).collect()}
    assert got == want


def test_algebraic_bellman_ford_matches_sssp(spark):
    edges = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0), (2, 3, 1.0),
             (1, 3, 9.0), (4, 5, 1.0)]
    g = Graph.from_rows(spark, edges, directed=True, n=6)
    want = {r["id"]: r["dist"] for r in sssp(g, 0).collect()}
    got = {r["id"]: r["dist"] for r in algebraic_bellman_ford(g, 0).collect()}
    assert got.keys() == want.keys()
    for k in want:
        if want[k] is None:
            assert got[k] is None
        else:
            assert got[k] == pytest.approx(want[k])


def test_algebraic_triangles_karate(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    got = {r["id"]: r["triangles"]
           for r in algebraic_triangle_counting(g).collect()}
    # python oracle: per-node closed wedges / 2
    adj = {}
    for u, v in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    assert sum(got.values()) // 3 == 45  # karate has 45 triangles
    for v in range(n):
        nbrs = sorted(adj.get(v, ()))
        t = sum(len(adj[a] & adj[v] & {b for b in nbrs if b > a})
                for a in nbrs)
        assert got[v] == t, v


def test_algebraic_pagerank_matches_pagerank(spark, karate):
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.operators.semiring import algebraic_pagerank

    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    want = {r["id"]: r["rank"]
            for r in pagerank(g, fixed_iters=8).collect()}
    got = {r["id"]: r["rank"]
           for r in algebraic_pagerank(g, iters=8).collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
