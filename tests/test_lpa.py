import numpy as np

from networkit_spark.graph import Graph
from networkit_spark.operators.lpa import (
    canonicalize_labels, label_propagation, modularity,
)
from tests.conftest import PR8_EDGES
from tests.oracles import canonicalize, lpa_sync_ref, modularity_ref


def _labels(df, n):
    rows = {r["id"]: r["label"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def _clique(lo, k):
    return [(lo + u, lo + v) for u in range(k) for v in range(u + 1, k)]


def test_two_cliques_exact_vs_sync_oracle(spark):
    edges = _clique(0, 8) + _clique(8, 8) + [(7, 8)]
    n = 16
    g = Graph.from_rows(spark, edges, directed=False)
    out = canonicalize_labels(label_propagation(g, theta=0))
    oracle = canonicalize(lpa_sync_ref(edges, n, theta=0))
    assert np.array_equal(_labels(out, n), oracle)
    # planted structure recovered: each clique one community
    labs = _labels(out, n)
    assert len(set(labs[:8].tolist())) == 1
    assert len(set(labs[8:].tolist())) == 1


def test_isolated_nodes_stay_singletons(spark):
    edges = _clique(0, 4)
    g = Graph.from_rows(spark, edges, directed=False, n=6)  # 4,5 isolated
    out = canonicalize_labels(label_propagation(g, theta=0))
    labs = _labels(out, 6)
    assert labs[4] == 4 and labs[5] == 5


def test_weighted_tiebreak_smallest_label(spark):
    # node 2 sees label-weight ties from {0,1}: smallest label wins
    edges = [(0, 2, 1.0), (1, 2, 1.0)]
    g = Graph.from_rows(spark, edges, directed=False)
    oracle = lpa_sync_ref(edges, 3, theta=0, max_iter=1)
    out = label_propagation(g, theta=0, max_iter=1)
    assert np.array_equal(_labels(out, 3), oracle)
    assert _labels(out, 3)[2] == 0  # tie -> smallest label


def test_partition_covers_nodeset_karate(spark, karate):
    # mirrors reference python test test_algorithms.py:157-177
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    out = canonicalize_labels(label_propagation(g))
    labs = _labels(out, n)
    assert len(labs) == n
    oracle = canonicalize(lpa_sync_ref(edges, n))
    assert np.array_equal(labs, oracle)


def test_modularity_vs_oracle(spark):
    edges = _clique(0, 8) + _clique(8, 8) + [(7, 8)]
    n = 16
    g = Graph.from_rows(spark, edges, directed=False)
    labels_df = canonicalize_labels(label_propagation(g, theta=0))
    labs = _labels(labels_df, n)
    got = modularity(g, labels_df)
    want = modularity_ref([(u, v, 1.0) for u, v in edges], labs, n)
    assert abs(got - want) < 1e-12
    assert -0.5 <= got <= 1.0


def test_modularity_self_loop_counted_twice(spark):
    edges = [(0, 1, 1.0), (0, 0, 2.0)]
    g = Graph.from_rows(spark, edges, directed=False)
    labels_df = spark.createDataFrame([(0, 0), (1, 1)], "id long, label long")
    got = modularity(g, labels_df)
    want = modularity_ref(edges, np.array([0, 1]), 2)
    assert abs(got - want) < 1e-12
