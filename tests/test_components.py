import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.components import (
    component_sizes, connected_components, extract_largest_component, num_components,
)
from tests.conftest import CC20_EDGES, CC20_N
from tests.oracles import cc_ref


def _labels(df, n):
    rows = {r["id"]: r["component"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


@pytest.mark.parametrize("algorithm", ["minlabel", "star"])
def test_cc20_golden(spark, algorithm):
    g = Graph.from_rows(spark, CC20_EDGES, directed=False, n=CC20_N)
    out = connected_components(g, algorithm=algorithm)
    labels = _labels(out, CC20_N)
    oracle = cc_ref(CC20_EDGES, CC20_N)
    assert np.array_equal(labels, oracle)  # exact, canonical min-member ids
    assert num_components(out) == 5
    assert labels[0] == labels[19] and labels[3] == labels[7]
    assert labels[15] == 15  # isolated node is its own component


@pytest.mark.parametrize("algorithm", ["minlabel", "star"])
def test_cc_karate_single_component(spark, karate, algorithm):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    out = connected_components(g, algorithm=algorithm)
    labels = _labels(out, n)
    assert np.array_equal(labels, cc_ref(edges, n))
    assert len(set(labels.tolist())) == 1


def test_cc_directed_treated_weakly(spark):
    # WeaklyConnectedComponents == CC on symmetrized edges
    g = Graph.from_rows(spark, [(0, 1), (2, 1), (3, 4)], directed=True, n=5)
    out = connected_components(g)
    labels = _labels(out, 5)
    assert labels.tolist() == [0, 0, 0, 3, 3]


def test_component_sizes_and_largest(spark):
    g = Graph.from_rows(spark, CC20_EDGES, directed=False, n=CC20_N)
    labels = connected_components(g)
    sizes = {r["component"]: r["size"] for r in component_sizes(labels).collect()}
    assert sizes == {0: 7, 3: 5, 10: 5, 13: 2, 15: 1}
    sub = extract_largest_component(g, labels)
    assert sub.num_edges() == 6  # the 7-node path component


def test_degree_centrality_and_centralization(spark):
    # star K1,4: center degree 4, leaves 1 -> centralization 1.0
    from networkit_spark.graph import Graph
    from networkit_spark.operators.degrees import (
        centralization, degree_centrality, degree_centralization,
    )

    star = Graph.from_rows(spark, [(0, i, 1.0) for i in range(1, 5)],
                           directed=False)
    dc = {r["id"]: r["score"] for r in degree_centrality(star).collect()}
    assert dc == {0: 4.0, 1: 1.0, 2: 1.0, 3: 1.0, 4: 1.0}
    dcn = {r["id"]: r["score"]
           for r in degree_centrality(star, normalized=True).collect()}
    assert dcn[0] == 1.0 and dcn[1] == 0.25
    assert degree_centralization(star) == 1.0
    # cycle: all degrees equal -> centralization 0
    c5 = Graph.from_rows(spark, [(i, (i + 1) % 5, 1.0) for i in range(5)],
                         directed=False)
    assert degree_centralization(c5) == 0.0
    # oracle check on an asymmetric graph: path P4 (degrees 1,2,2,1)
    p4 = Graph.from_rows(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)],
                         directed=False)
    # center=2, sum=6, n=4, max=3: (2*4-6)/(3*4-6) = 2/6
    assert abs(centralization(
        degree_centrality(p4), 3.0) - 2.0 / 6.0) < 1e-12
