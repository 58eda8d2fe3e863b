"""PageRankNibble / ApproximatePageRank vs the ACL invariant and a
python sweep oracle (reference cpp/scd/ApproximatePageRank.cpp:20-62,
PageRankNibble.cpp:20-100)."""

from collections import defaultdict

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.scd import (
    approximate_pagerank, page_rank_nibble, sweep_table,
)

ALPHA, EPS = 0.15, 1e-4


def _lazy_ppr(edges, n, seed, alpha):
    """Dense exact lazy personalized PageRank:
    ppr = alpha·e_s·(I − (1−alpha)·W_lazy)^{-1},
    W_lazy = (I + D^{-1}A)/2 row-stochastic (the walk the ACL push
    discounts — ApproximatePageRank.cpp:24-35)."""
    A = np.zeros((n, n))
    for u, v in edges:
        if u != v:
            A[u, v] += 1.0
            A[v, u] += 1.0
    d = A.sum(axis=1)
    P = A / d[:, None]
    W = 0.5 * (np.eye(n) + P)
    e = np.zeros(n)
    e[seed] = 1.0
    return alpha * e @ np.linalg.inv(np.eye(n) - (1 - alpha) * W)


def test_apr_acl_invariant(spark, karate):
    """0 <= lazy_ppr(v) − p(v) < eps·vol(v), and the terminal residual
    bound r(v) < eps·vol(v) — push-order-free guarantees."""
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    rows = approximate_pagerank(g, seed=0, alpha=ALPHA, epsilon=EPS).collect()
    got = {r["id"]: (r["p"], r["r"], r["vol"]) for r in rows}
    exact = _lazy_ppr(edges, n, 0, ALPHA)
    for v in range(n):
        p, r, vol = got.get(v, (0.0, 0.0, None))
        if vol is None:
            vol = 0.0
        assert r < EPS * vol + 1e-12
        diff = exact[v] - p
        assert diff >= -1e-9
        assert diff < EPS * vol + 1e-9


def test_apr_deterministic_and_mass_conserving(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    a = sorted((r["id"], r["p"], r["r"])
               for r in approximate_pagerank(g, 33, ALPHA, EPS).collect())
    b = sorted((r["id"], r["p"], r["r"])
               for r in approximate_pagerank(g, 33, ALPHA, EPS).collect())
    assert a == b
    # alpha-discounted mass conservation: Σp + Σr == 1 exactly
    tot = sum(p for _, p, _ in a) + sum(r for _, _, r in a)
    assert tot == pytest.approx(1.0, abs=1e-9)


def test_sweep_matches_python_oracle(spark, karate):
    """Conductance of every sweep prefix recomputed set-wise in python
    from the SAME p values — the window formulation must agree."""
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    pr = approximate_pagerank(g, 0, ALPHA, EPS)
    sw = {r["rank"]: (r["id"], r["cond"])
          for r in sweep_table(g, pr).collect()}
    adj = defaultdict(dict)
    for u, v in edges:
        if u != v:
            adj[u][v] = adj[v].get(u, 0) + 1
            adj[v][u] = adj[u][v]
    vol = {u: float(sum(adj[u].values())) for u in adj}
    total = sum(vol.values())
    prefix, cut, cvol = set(), 0.0, 0.0
    for k in sorted(sw):
        v, cond = sw[k]
        for nb, w in adj[v].items():
            cut += -w if nb in prefix else w
        cvol += vol[v]
        prefix.add(v)
        den = min(cvol, total - cvol)
        # full-support prefix: cut==0, den==0; the operator's 1e-300
        # guard makes that 0.0 (the reference's 0/0 NaN never wins the
        # argmin either — PageRankNibble.cpp:71 requires |S| < n)
        want = cut / den if den > 0 else 0.0
        assert cond == pytest.approx(want, abs=1e-9), k


def test_nibble_community_shape(spark, karate):
    """Community around hub 33 contains the seed, is a proper subset,
    and beats the conductance of the singleton seed set."""
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    comm = {r["id"] for r in page_rank_nibble(g, 33, ALPHA, EPS).collect()}
    assert 33 in comm
    assert 1 < len(comm) < n
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    cut = sum(1 for u in comm for v in adj[u] if v not in comm)
    volS = sum(len(adj[u]) for u in comm)
    total = 2 * len(edges)
    cond = cut / min(volS, total - volS)
    seed_cond = len(adj[33]) / min(len(adj[33]), total - len(adj[33]))
    assert cond < seed_cond


def test_nibble_leaves_no_scratch_dir(spark, karate):
    """The result must be materialized before the scratch cleanup so
    gate sweeps don't accumulate nibble-* dirs under the state root
    (and a post-cleanup action must not try to re-read deleted files)."""
    import glob

    from networkit_spark.plans.scratch import state_root

    edges, _ = karate
    g = Graph.from_rows(spark, edges, directed=False)
    pattern = state_root().rstrip("/") + "/scratch/nibble-*"
    before = set(glob.glob(pattern))
    comm = page_rank_nibble(g, 33, ALPHA, EPS)
    assert comm.count() > 0  # action AFTER cleanup still answers
    assert set(glob.glob(pattern)) == before
    comm.unpersist()


def test_apr_rejects_directed(spark):
    g = Graph.from_rows(spark, [(0, 1), (1, 2)], directed=True)
    with pytest.raises(ValueError, match="undirected"):
        approximate_pagerank(g, 0)


def _gce_oracle(edges, seed):
    """Exact python replica of gce_expand's greedy (GCE.cpp:190-196
    deltaM, same (max dQ, min id) tie-break)."""
    adj = defaultdict(dict)
    for u, v in edges:
        if u != v:
            adj[u][v] = 1.0
            adj[v][u] = 1.0
    comm = {seed}
    int_w, ext_w, q = 0.0, float(sum(adj[seed].values())), 0.0
    while True:
        shell = {v for u in comm for v in adj[u] if v not in comm}
        best, best_dq = None, None
        for v in sorted(shell):
            din = sum(w for nb, w in adj[v].items() if nb in comm)
            dex = sum(adj[v].values()) - din
            den = ext_w - din + dex
            dq = (float("inf") if den <= 0 else (int_w + din) / den) - q
            if dq >= 0 and (best is None or dq > best_dq):
                best, best_dq = v, dq
        if best is None:
            break
        din = sum(w for nb, w in adj[best].items() if nb in comm)
        dex = sum(adj[best].values()) - din
        comm.add(best)
        int_w += din
        ext_w += dex - din
        q += best_dq
    return sorted(comm)


@pytest.mark.parametrize("seed", [0, 16, 33])
def test_gce_matches_python_oracle(spark, karate, seed):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    from networkit_spark.operators.scd import gce_expand
    got = gce_expand(g, seed)
    assert got == _gce_oracle(edges, seed)
    assert seed in got
