"""PLM (Louvain) — quality-based verification (labels themselves are
tie-break dependent; modularity and ground-truth recovery are not)."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.community_eval import nmi_distance
from networkit_spark.operators.lpa import modularity
from networkit_spark.operators.plm import plm
from networkit_spark.sources.generators import planted_partition_edges


def test_plm_karate_modularity(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    labels = plm(g)
    q = modularity(g, labels)
    # reference PLM reaches ~0.41 on karate; anything below 0.35 means
    # the local-move/gain logic is broken (singletons give q≈-0.05,
    # one-cluster gives 0)
    assert q >= 0.35
    k = labels.select("label").distinct().count()
    assert 2 <= k <= 8


def test_plm_beats_or_matches_singletons_and_recovers_planted(spark):
    edges, truth = planted_partition_edges(80, 4, p_in=0.5, p_out=0.02,
                                           seed=7)
    g = Graph.from_rows(spark, edges, directed=False)
    labels = plm(g)
    q = modularity(g, labels)
    assert q > 0.4
    truth_df = spark.createDataFrame(
        [(i, int(t)) for i, t in enumerate(truth)], "id long, label long")
    # near-perfect recovery of the planted blocks
    assert nmi_distance(labels, truth_df) < 0.1


def test_plm_refine_no_worse(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    q_plain = modularity(g, plm(g))
    q_ref = modularity(g, plm(g, refine=True))
    assert q_ref >= q_plain - 1e-9
