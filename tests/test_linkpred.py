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


def test_more_linkpred_indices_vs_python(spark, karate):
    from pyspark.sql import functions as F
    from networkit_spark.operators.linkpred import (
        katz_index, neighborhood_distance_index, neighbors_measure_index,
        resource_allocation_index, same_community_index, u_degree_index,
        v_degree_index,
    )

    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    nb = _nbrs(edges, n)
    eset = {(u, v) for u in nb for v in nb[u]}
    want_pairs = {(u, v) for u in range(n) for v in range(u + 1, n)
                  if nb[u] & nb[v]}
    pairs = spark.createDataFrame(sorted(want_pairs), "u long, v long")

    ra = {(r["u"], r["v"]): r["score"] for r in resource_allocation_index(g).collect()}
    nd = {(r["u"], r["v"]): r["score"] for r in neighborhood_distance_index(g).collect()}
    nm = {(r["u"], r["v"]): r["score"] for r in neighbors_measure_index(g, pairs).collect()}
    ud = {(r["u"], r["v"]): r["score"] for r in u_degree_index(g, pairs).collect()}
    vd = {(r["u"], r["v"]): r["score"] for r in v_degree_index(g, pairs).collect()}
    for (u, v) in want_pairs:
        inter = nb[u] & nb[v]
        assert ra[(u, v)] == pytest.approx(sum(1.0 / len(nb[w]) for w in inter))
        assert nd[(u, v)] == pytest.approx(
            len(inter) / math.sqrt(len(nb[u]) * len(nb[v])))
        want_nm = sum(1 for a in nb[u] for b in nb[v]
                      if a == b or (a, b) in eset)
        assert nm[(u, v)] == want_nm
        assert ud[(u, v)] == len(nb[u])
        assert vd[(u, v)] == len(nb[v])

    labels = spark.createDataFrame([(i, i % 2) for i in range(n)],
                                   "id long, label long")
    sc = {(r["u"], r["v"]): r["score"]
          for r in same_community_index(pairs, labels).collect()}
    for (u, v) in want_pairs:
        assert sc[(u, v)] == (1.0 if u % 2 == v % 2 else 0.0)

    # Katz on a small pair set vs walk-counting oracle
    some = sorted(want_pairs)[:20]
    kz = {(r["u"], r["v"]): r["score"] for r in katz_index(
        g, spark.createDataFrame(some, "u long, v long"),
        beta=0.05, max_path_length=4).collect()}
    import numpy as np
    A = np.zeros((n, n))
    for (u, v) in eset:
        A[u, v] = 1
    acc = np.zeros((n, n))
    P = np.eye(n)
    for ln in range(1, 5):
        P = P @ A
        acc += (0.05 ** ln) * P
    for (u, v) in some:
        assert kz[(u, v)] == pytest.approx(acc[u, v], rel=1e-9)


def test_thresholder_sampler_and_metrics(spark):
    from networkit_spark.operators.linkpred import (
        auc, precision_recall_curve, random_link_sampler, roc_curve,
        threshold_by_count, threshold_by_percentage, threshold_by_score,
    )

    preds = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.8), (1, 2, 0.4), (2, 3, 0.2)],
        "u long, v long, score double")
    assert {(r["u"], r["v"]) for r in threshold_by_score(preds, 0.5).collect()} \
        == {(0, 1), (0, 2)}
    assert threshold_by_count(preds, 3).count() == 3
    assert threshold_by_percentage(preds, 0.5).count() == 2

    test_edges = spark.createDataFrame([(0, 1), (1, 2)], "u long, v long")
    roc = roc_curve(preds, test_edges)
    a = auc(roc)
    # perfect separation would be 1.0; here positives rank 1st and 3rd:
    # curve points (fpr,tpr): (0,.5) (.5,.5) (.5,1) (1,1) -> area 0.75
    assert a == pytest.approx(0.75)
    pr = precision_recall_curve(preds, test_edges)
    rows = {(round(r["recall"], 3), round(r["precision"], 3))
            for r in pr.collect()}
    assert (0.5, 1.0) in rows and (1.0, 0.667) in rows

    g = Graph.from_rows(spark, [(i, i + 1) for i in range(40)],
                        directed=False)
    sub = random_link_sampler(g, 0.5, seed=7)
    kept = sub.num_edges()
    assert 0 < kept < 40
    # determinism
    assert random_link_sampler(g, 0.5, seed=7).num_edges() == kept


def test_adjusted_rand_index_bug_for_bug(spark):
    """Python replica of the reference's runImpl (including its
    set_union-instead-of-set_difference bug) on a small graph."""
    from networkit_spark.graph import Graph
    from networkit_spark.operators.linkpred import adjusted_rand_index

    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (0, 4)]
    g = Graph.from_rows(spark, edges, directed=False)
    adj = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    n = len(adj)

    def ref(u, v):
        common = adj[u] & adj[v]
        union = adj[u] | adj[v]
        a, b, c, d = (float(len(common)), float(len(union)),
                      float(len(union)), float(n - len(union)))
        denom = a * b + a * c + 2 * a * d + b * b + b * d + c * c + c * d
        return 0.0 if denom == 0 else 2 * (a * d - b * c) / denom

    got = {(r["u"], r["v"]): r["score"]
           for r in adjusted_rand_index(g).collect()}
    assert got, "no pairs"
    for (u, v), s in got.items():
        assert s == pytest.approx(ref(u, v), rel=1e-12), (u, v)
