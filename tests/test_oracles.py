"""Validate the NumPy oracles against the reference's hard-coded goldens
(FIXTURES.md §2) before they are trusted to judge the engine."""

import numpy as np

from tests.conftest import (
    CC20_EDGES, CC20_N, K4_EDGES, P4_EDGES, PR8_EDGES, PR8_EXPECTED, load_karate,
)
from tests.oracles import cc_ref, lcc_ref, lpa_sync_ref, pagerank_ref, triangles_ref


def test_pagerank_oracle_pr8_golden():
    pr = pagerank_ref(PR8_EDGES, 8, damp=0.85, tol=1e-8)
    assert np.allclose(pr, PR8_EXPECTED, atol=1e-4)
    assert abs(pr.sum() - 1.0) < 1e-12


def test_cc_oracle_cc20_golden():
    labels = cc_ref(CC20_EDGES, CC20_N)
    assert len(set(labels.tolist())) == 5
    assert labels[0] == labels[19]
    assert labels[3] == labels[7]
    # canonical labels = min member id
    expected = {0: 0, 19: 0, 3: 3, 7: 3, 10: 10, 17: 10, 13: 13, 15: 15}
    for node, lab in expected.items():
        assert labels[node] == lab


def test_triangles_oracle_goldens():
    tri, g = triangles_ref(K4_EDGES, 4)
    assert g == 4 and all(t == 3 for t in tri)
    tri, g = triangles_ref(P4_EDGES, 4)
    assert g == 0 and all(t == 0 for t in tri)
    tri, g = triangles_ref(PR8_EDGES, 8)
    assert g == 2
    assert tri.tolist() == [0, 0, 2, 1, 1, 2, 0, 0]


def test_lcc_oracle_k4():
    assert np.allclose(lcc_ref(K4_EDGES, 4), 1.0)


def test_karate_loads():
    edges, n = load_karate()
    assert n == 34 and len(edges) == 78
    labels = cc_ref(edges, n)
    assert len(set(labels.tolist())) == 1


def test_lpa_oracle_two_cliques():
    # two K4 cliques bridged by one edge -> 2 communities
    c1 = [(u, v) for u in range(4) for v in range(u + 1, 4)]
    c2 = [(u + 4, v + 4) for u in range(4) for v in range(u + 1, 4)]
    edges = c1 + c2 + [(3, 4)]
    labels = lpa_sync_ref(edges, 8, theta=0)
    assert len(set(labels[:4].tolist())) == 1
    assert len(set(labels[4:].tolist())) == 1
