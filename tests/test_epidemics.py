"""SEIR epidemic supersteps vs an exact python mirror of the
reference sweep (deterministic at trans_p in {0, 1})."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.epidemics import (
    E, I, R, S, epidemic_simulation_seir,
)


def _python_seir(edges, n, zero, t_max, trans_p, e_time, i_time):
    """Mirror of EpidemicSimulationSEIR.cpp:16-100 for trans_p 0/1."""
    assert trans_p in (0.0, 1.0)
    adj = {v: set() for v in range(n)}
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    st = {v: S for v in range(n)}
    ts = {v: 0 for v in range(n)}
    st[zero] = I
    census = []
    for t in range(t_max):
        cur = dict(st)
        cur_ts = dict(ts)
        contacted = set()
        for u in range(n):
            if cur[u] == I:
                contacted |= adj[u]
        for u in range(n):
            if cur[u] == S and trans_p == 1.0 and u in contacted:
                st[u], ts[u] = E, t
            elif cur[u] == E and t - cur_ts[u] >= e_time:
                st[u], ts[u] = I, t
            elif cur[u] == I and t - cur_ts[u] >= i_time:
                st[u], ts[u] = R, t
        for s in (S, E, I, R):
            census.append((t, s, sum(1 for v in range(n) if st[v] == s)))
    return census


def test_seir_wavefront_p1_path(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    g = Graph.from_rows(spark, edges, directed=False, n=5)
    got = sorted(
        (r["t"], r["state"], r["count"])
        for r in epidemic_simulation_seir(
            g, zero=0, t_max=12, trans_p=1.0, e_time=0, i_time=1)
        .collect())
    want = sorted(_python_seir(edges, 5, 0, 12, 1.0, 0, 1))
    assert got == want
    # everyone ends Removed
    assert (11, R, 5) in got


def test_seir_p0_only_zero(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    census, final = epidemic_simulation_seir(
        g, zero=0, t_max=5, trans_p=0.0, e_time=1, i_time=2,
        return_states=True)
    rows = {(r["t"], r["state"]): r["count"] for r in census.collect()}
    assert rows[(0, S)] == n - 1 and rows[(0, I)] == 1
    assert rows[(4, R)] == 1 and rows[(4, S)] == n - 1
    got = {r["id"]: r["st"] for r in final.collect()}
    assert got[0] == R and sum(1 for v in got.values() if v == S) == n - 1


def test_seir_karate_p1_all_removed(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    got = sorted(
        (r["t"], r["state"], r["count"])
        for r in epidemic_simulation_seir(
            g, zero=0, t_max=16, trans_p=1.0, e_time=0, i_time=1)
        .collect())
    want = sorted(_python_seir(edges, n, 0, 16, 1.0, 0, 1))
    assert got == want
    assert (15, R, n) in got


def test_seir_stochastic_is_deterministic_per_seed(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)

    def run(seed):
        return sorted(
            (r["t"], r["state"], r["count"])
            for r in epidemic_simulation_seir(
                g, zero=0, t_max=8, trans_p=0.4, e_time=1, i_time=3,
                seed=seed).collect())

    a, b, c = run(1), run(1), run(2)
    assert a == b
    assert a != c
    # census is a partition of all n nodes at every tick
    by_t = {}
    for t, _s, cnt in a:
        by_t[t] = by_t.get(t, 0) + cnt
    assert set(by_t.values()) == {n}
