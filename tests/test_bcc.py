"""Biconnected components vs a sequential Tarjan-lowpoint oracle."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.bcc import (
    articulation_points, biconnected_components, num_biconnected_components,
)


def _oracle(edges, nodes):
    """Iterative Tarjan BCC: returns frozenset of frozensets of edges."""
    adj = {v: [] for v in nodes}
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    idx = {v: None for v in nodes}
    low = {}
    comps = []
    counter = [0]
    for root in nodes:
        if idx[root] is not None:
            continue
        stack = [(root, None, iter(adj[root]))]
        estack = []
        idx[root] = low[root] = counter[0]
        counter[0] += 1
        while stack:
            v, parent_edge, it = stack[-1]
            advanced = False
            for w in it:
                if idx[w] is None:
                    idx[w] = low[w] = counter[0]
                    counter[0] += 1
                    estack.append((v, w))
                    stack.append((w, v, iter(adj[w])))
                    advanced = True
                    break
                elif w != parent_edge and idx[w] < idx[v]:
                    estack.append((v, w))
                    low[v] = min(low[v], idx[w])
            if not advanced:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[v])
                    if low[v] >= idx[p]:
                        comp = set()
                        while estack:
                            x, y = estack[-1]
                            if idx[x] >= idx[v]:
                                estack.pop()
                                comp.add((min(x, y), max(x, y)))
                            elif (x, y) == (p, v):
                                estack.pop()
                                comp.add((min(x, y), max(x, y)))
                                break
                            else:
                                break
                        comps.append(frozenset(comp))
    return frozenset(c for c in comps if c)


def _spark_partition(out):
    groups = {}
    for r in out.collect():
        groups.setdefault(r["component"], set()).add((r["src"], r["dst"]))
    return frozenset(frozenset(s) for s in groups.values())


CASES = [
    # two triangles sharing an articulation vertex + a pendant edge
    [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (4, 5)],
    # pure tree: every edge its own BCC
    [(0, 1), (1, 2), (1, 3), (3, 4)],
    # single cycle: one BCC
    [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)],
    # two components: a C4 and a path
    [(0, 1), (1, 2), (2, 3), (3, 0), (10, 11), (11, 12)],
    # theta graph (two vertices joined by three paths): one BCC
    [(0, 1), (1, 5), (0, 2), (2, 5), (0, 3), (3, 4), (4, 5)],
]


@pytest.mark.parametrize("edges", CASES)
def test_bcc_matches_tarjan(spark, edges):
    nodes = sorted({x for e in edges for x in e})
    g = Graph.from_rows(spark, [(u, v, 1.0) for u, v in edges],
                        directed=False)
    out = biconnected_components(g)
    assert _spark_partition(out) == _oracle(edges, nodes)


def test_bcc_karate(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, [(u, v, 1.0) for u, v in edges],
                        directed=False)
    out = biconnected_components(g).persist()
    want = _oracle(edges, list(range(n)))
    assert _spark_partition(out) == want
    assert num_biconnected_components(out) == len(want)
    # articulation points: vertices in >= 2 oracle components
    incid = {}
    for comp in want:
        for u, v in comp:
            for x in (u, v):
                incid.setdefault(x, set()).add(comp)
    want_aps = {x for x, cs in incid.items() if len(cs) >= 2}
    got_aps = {r["id"] for r in articulation_points(out).collect()}
    assert got_aps == want_aps


def test_bcc_rejects_directed(spark):
    g = Graph.from_rows(spark, [(0, 1, 1.0)], directed=True)
    with pytest.raises(ValueError):
        biconnected_components(g)
