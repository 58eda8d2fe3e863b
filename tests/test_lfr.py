"""LFR benchmark generator (reference LFRGenerator.cpp,
GeneratorsGTest: testLFRGenerator) and community-detection validation
on its ground truth — PLM must match-or-beat PLP and recover the
planted communities."""

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.community_eval import nmi_distance
from networkit_spark.operators.lpa import label_propagation, modularity
from networkit_spark.operators.plm import plm
from networkit_spark.sources.generators import lfr_graph, powerlaw_sequence


def test_powerlaw_sequence_bounds_and_shape():
    rng = np.random.default_rng(3)
    s = powerlaw_sequence(5000, 4, 40, 2.0, rng)
    assert s.min() >= 4 and s.max() <= 40
    # power law: the smallest value dominates
    assert (s == 4).sum() > (s >= 20).sum()


def test_lfr_structure_and_determinism():
    edges, labels = lfr_graph(300, mu=0.1, seed=7)
    e2, l2 = lfr_graph(300, mu=0.1, seed=7)
    assert edges == e2 and (labels == l2).all()
    assert (labels >= 0).all()
    # mixing: intra fraction tracks 1-mu
    intra = sum(1 for u, v in edges if labels[u] == labels[v])
    assert 0.8 <= intra / len(edges) <= 0.97
    edges4, labels4 = lfr_graph(300, mu=0.4, seed=7)
    intra4 = sum(1 for u, v in edges4 if labels4[u] == labels4[v])
    assert 0.45 <= intra4 / len(edges4) <= 0.72
    # community sizes respect the [smin, smax] band (up to runt folding)
    sizes = np.bincount(labels)
    assert sizes.min() >= 5 and sizes.max() <= 100


def test_plm_beats_plp_and_recovers_lfr_ground_truth(spark):
    edges, truth = lfr_graph(300, mu=0.1, seed=7)
    g = Graph.from_rows(spark, edges, directed=False)
    truth_df = spark.createDataFrame(
        [(i, int(t)) for i, t in enumerate(truth)], "id long, label long")

    plm_labels = plm(g)
    plp_labels = label_propagation(g, theta=-1, max_iter=8)
    q_plm = modularity(g, plm_labels)
    q_plp = modularity(g, plp_labels)
    assert q_plm >= q_plp - 1e-9
    assert q_plm > 0.5
    # NMI distance < 0.3  <=>  NMI > 0.7 vs planted communities
    assert nmi_distance(plm_labels, truth_df) < 0.3
