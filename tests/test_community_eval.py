import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.community_eval import (
    adjusted_rand_dissimilarity, conductance, coverage, edge_cut,
    graph_structural_rand_dissimilarity, jaccard_dissimilarity,
    nmi_distance, rand_dissimilarity,
)

# two triangles bridged by one edge; ground-truth communities = triangles
EDGES = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
LABELS = [(i, i // 3) for i in range(6)]


def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "id long, label long")


def test_quality_measures(spark):
    g = Graph.from_rows(spark, EDGES, directed=False)
    lab = _labels(spark, LABELS)
    assert edge_cut(g, lab) == 1.0
    assert coverage(g, lab) == pytest.approx(6 / 7)
    # 2-partition: vol each side = 7, cut = 1
    assert conductance(g, lab) == pytest.approx(1 / 7)


def test_conductance_rejects_non_bipartition(spark):
    g = Graph.from_rows(spark, EDGES, directed=False)
    lab = _labels(spark, [(i, i) for i in range(6)])
    with pytest.raises(ValueError):
        conductance(g, lab)


def test_similarity_identical_partitions(spark):
    g = Graph.from_rows(spark, EDGES, directed=False)
    lab = _labels(spark, LABELS)
    assert rand_dissimilarity(lab, lab) == pytest.approx(0.0)
    assert adjusted_rand_dissimilarity(lab, lab) == pytest.approx(0.0)
    assert jaccard_dissimilarity(lab, lab) == pytest.approx(0.0)
    assert nmi_distance(lab, lab) == pytest.approx(0.0)
    assert graph_structural_rand_dissimilarity(g, lab, lab) == pytest.approx(0.0)


def test_similarity_vs_one_cluster(spark):
    # p2 = everything in one cluster: s11=6, sumEta=15, n=6, total=15
    lab1 = _labels(spark, LABELS)
    lab2 = _labels(spark, [(i, 0) for i in range(6)])
    # rand_d = 1 - (s11 + s00)/total with s00 = 15 + 6 - (6 + 15) = 0
    assert rand_dissimilarity(lab1, lab2) == pytest.approx(1 - 6 / 15)
    # jaccard_d = 1 - 6/(6 + 15 - 6)
    assert jaccard_dissimilarity(lab1, lab2) == pytest.approx(1 - 6 / 15)
    # ARI vs the trivial partition: randIndex == expected (chance-level
    # agreement), so ARI = 0 and dissimilarity = 1
    # (max = 0.5*(6+15) = 10.5, expected = 6*15/15 = 6, si = 6)
    assert adjusted_rand_dissimilarity(lab1, lab2) == pytest.approx(1.0)
    # NMI: H(eta) = 0 -> NMI = 2*0/(H1+0)... MI=0, so distance = 1
    assert nmi_distance(lab1, lab2) == pytest.approx(1.0)
