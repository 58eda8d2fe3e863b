import numpy as np

from networkit_spark.graph import Graph
from networkit_spark.operators.triangles import (
    avg_local_clustering_coefficient, global_clustering_coefficient,
    global_triangle_count, local_clustering_coefficients, triangle_counts,
    triangle_edge_scores,
)
from tests.conftest import K4_EDGES, P4_EDGES, PR8_EDGES
from tests.oracles import lcc_ref, triangles_ref


def _vals(df, col, n):
    rows = {r["id"]: r[col] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_k4_goldens(spark):
    g = Graph.from_rows(spark, K4_EDGES, directed=False)
    assert global_triangle_count(g) == 4
    assert _vals(triangle_counts(g), "triangles", 4).tolist() == [3, 3, 3, 3]
    edge_scores = triangle_edge_scores(g).collect()
    assert all(r["triangles"] == 2 for r in edge_scores) and len(edge_scores) == 6
    assert np.allclose(_vals(local_clustering_coefficients(g), "lcc", 4), 1.0)
    assert abs(global_clustering_coefficient(g) - 1.0) < 1e-12


def test_p4_no_triangles(spark):
    g = Graph.from_rows(spark, P4_EDGES, directed=False)
    assert global_triangle_count(g) == 0
    assert _vals(triangle_counts(g), "triangles", 4).tolist() == [0, 0, 0, 0]


def test_pr8_hand_counted(spark):
    g = Graph.from_rows(spark, PR8_EDGES, directed=False)
    tri, total = triangles_ref(PR8_EDGES, 8)
    assert global_triangle_count(g) == total == 2
    assert _vals(triangle_counts(g), "triangles", 8).tolist() == tri.tolist()
    assert np.allclose(_vals(local_clustering_coefficients(g), "lcc", 8),
                       lcc_ref(PR8_EDGES, 8))


def test_karate_vs_oracle(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    tri, total = triangles_ref(edges, n)
    assert global_triangle_count(g) == total
    assert _vals(triangle_counts(g), "triangles", n).tolist() == tri.tolist()
    assert np.allclose(_vals(local_clustering_coefficients(g), "lcc", n),
                       lcc_ref(edges, n))


def test_multi_edges_and_self_loops_ignored(spark):
    # duplicate edges + self loops must not inflate counts
    edges = K4_EDGES + [(0, 1), (1, 0), (2, 2)]
    g = Graph.from_rows(spark, edges, directed=False)
    assert global_triangle_count(g) == 4


def test_quadrangle_scores_trivial(spark):
    """ChibaNishizekiQuadrangleEdgeScoreGTest.cpp:16-36 (C4)."""
    from networkit_spark.operators.triangles import quadrangle_edge_scores
    g = Graph.from_rows(spark, [(0, 1), (0, 2), (1, 3), (2, 3)],
                        directed=False)
    got = {(r["lo"], r["hi"]): r["quadrangles"]
           for r in quadrangle_edge_scores(g).collect()}
    assert got == {(0, 1): 1, (0, 2): 1, (1, 3): 1, (2, 3): 1}


def test_quadrangle_scores_simple(spark):
    """ChibaNishizekiQuadrangleEdgeScoreGTest.cpp:38-76 (7-node)."""
    from networkit_spark.operators.triangles import quadrangle_edge_scores
    edges = [(0, 1), (0, 3), (0, 4), (0, 6), (1, 2), (1, 3), (2, 3),
             (3, 5), (3, 6), (4, 5)]
    g = Graph.from_rows(spark, edges, directed=False)
    got = {(r["lo"], r["hi"]): r["quadrangles"]
           for r in quadrangle_edge_scores(g).collect()}
    assert got == {(0, 1): 2, (0, 3): 2, (0, 4): 1, (0, 6): 1,
                   (1, 2): 1, (1, 3): 1, (2, 3): 1, (3, 5): 1,
                   (3, 6): 1, (4, 5): 1}
