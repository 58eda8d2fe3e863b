"""Link prediction, coarsening, centrality — vs hand/NumPy oracles."""

import math
from collections import defaultdict

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.centrality import (
    eigenvector_centrality, katz_centrality,
)
from networkit_spark.operators.coarsening import (
    coarsen, graph_difference, partition_intersection,
)
from networkit_spark.operators.linkpred import (
    adamic_adar_index, common_neighbors_index, jaccard_index,
    preferential_attachment_index, total_neighbors_index,
)
from tests.conftest import PR8_EDGES


def _nbrs(edges, n):
    nb = defaultdict(set)
    for e in edges:
        u, v = int(e[0]), int(e[1])
        if u != v:
            nb[u].add(v)
            nb[v].add(u)
    return nb


def test_linkpred_indices_vs_python(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    nb = _nbrs(edges, n)

    cn = {(r["u"], r["v"]): r["score"] for r in common_neighbors_index(g).collect()}
    jc = {(r["u"], r["v"]): r["score"] for r in jaccard_index(g).collect()}
    aa = {(r["u"], r["v"]): r["score"] for r in adamic_adar_index(g).collect()}
    pa = {(r["u"], r["v"]): r["score"] for r in preferential_attachment_index(g).collect()}
    tn = {(r["u"], r["v"]): r["score"] for r in total_neighbors_index(g).collect()}

    want_pairs = {(u, v) for u in range(n) for v in range(u + 1, n)
                  if nb[u] & nb[v]}
    assert set(cn) == want_pairs
    for (u, v) in want_pairs:
        inter = nb[u] & nb[v]
        union = nb[u] | nb[v]
        assert cn[(u, v)] == len(inter)
        assert jc[(u, v)] == pytest.approx(len(inter) / len(union))
        assert aa[(u, v)] == pytest.approx(
            sum(1.0 / math.log(len(nb[w])) for w in inter))
        assert pa[(u, v)] == len(nb[u]) * len(nb[v])
        assert tn[(u, v)] == len(union)


def test_coarsen_weights_and_selfloops(spark):
    # 2 communities {0,1},{2,3}; intra edges become self-loops
    g = Graph.from_rows(spark, [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 4.0), (0, 3, 1.0)])
    labels = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20), (3, 20)], "id long, label long")
    c = coarsen(g, labels)
    got = {(r["src"], r["dst"]): r["weight"] for r in c.edges.collect()}
    assert got == {(10, 10): 2.0, (20, 20): 4.0, (10, 20): 2.0}
    assert c.num_vertices() == 2


def test_partition_intersection(spark):
    p1 = spark.createDataFrame([(0, 1), (1, 1), (2, 1), (3, 2)], "id long, label long")
    p2 = spark.createDataFrame([(0, 5), (1, 5), (2, 6), (3, 6)], "id long, label long")
    out = {r["id"]: r["label"] for r in partition_intersection(p1, p2).collect()}
    # meet: {0,1} together, {2} alone, {3} alone; labels = min member ids
    assert out == {0: 0, 1: 0, 2: 2, 3: 3}


def test_graph_difference_events(spark):
    g1 = Graph.from_rows(spark, [(0, 1, 1.0), (1, 2, 2.0)])
    g2 = Graph.from_rows(spark, [(1, 2, 3.0), (2, 3, 1.0)])
    got = {(r["type"], r["u"], r["v"]): r["w"]
           for r in graph_difference(g1, g2).collect()}
    assert got == {
        ("EDGE_REMOVAL", 0, 1): 0.0,
        ("EDGE_WEIGHT_UPDATE", 1, 2): 3.0,
        ("EDGE_ADDITION", 2, 3): 1.0,
    }


def _eig_oracle(edges, n, iters=200):
    A = np.zeros((n, n))
    for e in edges:
        u, v = int(e[0]), int(e[1])
        w = float(e[2]) if len(e) > 2 else 1.0
        A[u, v] += w
        A[v, u] += w
    x = np.full(n, 1.0 / n)
    for _ in range(iters):
        x = A @ x
        x /= np.linalg.norm(x)
    return x


def test_eigenvector_centrality_pr8(spark):
    g = Graph.from_rows(spark, PR8_EDGES, directed=False)
    out = eigenvector_centrality(g, tol=1e-8, max_iter=300)
    got = np.array([{r["id"]: r["score"] for r in out.collect()}[i]
                    for i in range(8)])
    want = _eig_oracle(PR8_EDGES, 8)
    assert np.allclose(got, want, atol=1e-5)


def test_katz_unit_norm_and_order(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    out = katz_centrality(g, alpha=0.01, beta=0.1, tol=1e-8)
    scores = {r["id"]: r["score"] for r in out.collect()}
    assert abs(sum(v * v for v in scores.values()) - 1.0) < 1e-9
    nb = _nbrs(edges, n)
    # hub (node 33, highest degree) should outrank a leaf
    leaf = min(range(n), key=lambda u: len(nb[u]))
    hub = max(range(n), key=lambda u: len(nb[u]))
    assert scores[hub] > scores[leaf]
