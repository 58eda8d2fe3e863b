"""SCC vs a python Kosaraju oracle."""

from collections import defaultdict

from networkit_spark.graph import Graph
from networkit_spark.operators.scc import (
    num_strong_components, strongly_connected_components,
)


def _kosaraju(edges, nodes):
    adj = defaultdict(list)
    radj = defaultdict(list)
    for u, v in edges:
        if u != v:
            adj[u].append(v)
            radj[v].append(u)
    order = []
    seen = set()
    for s in nodes:
        if s in seen:
            continue
        stack = [(s, iter(adj[s]))]
        seen.add(s)
        while stack:
            v, it = stack[-1]
            adv = False
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(adj[w])))
                    adv = True
                    break
            if not adv:
                order.append(v)
                stack.pop()
    comp = {}
    for s in reversed(order):
        if s in comp:
            continue
        group = [s]
        comp[s] = None
        i = 0
        while i < len(group):
            v = group[i]
            i += 1
            for w in radj[v]:
                if w not in comp:
                    comp[w] = None
                    group.append(w)
        label = max(group)
        for v in group:
            comp[v] = label
    return comp


def test_scc_hand_cases(spark):
    # cycle 0->1->2->0, tail 2->3, cycle 3->4->3 ... plus isolated 9
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3)]
    g = Graph.from_rows(spark, edges, directed=True)
    g = Graph(g.edges, directed=True,
              vertices=g.vertices.union(
                  spark.createDataFrame([(9,)], "id long")).distinct())
    got = {r["id"]: r["component"]
           for r in strongly_connected_components(g).collect()}
    assert got[0] == got[1] == got[2] == 2
    assert got[3] == got[4] == 4
    assert got[9] == 9


def test_scc_random_vs_kosaraju(spark):
    from networkit_spark.sources.generators import erdos_renyi_edges

    edges = erdos_renyi_edges(60, 0.05, seed=11, directed=True)
    edges = [(u, v) for u, v in edges if u != v]
    g = Graph.from_rows(spark, edges, directed=True)
    got = {r["id"]: r["component"]
           for r in strongly_connected_components(g).collect()}
    nodes = sorted({u for e in edges for u in e})
    want = _kosaraju(edges, nodes)
    for v in nodes:
        assert got[v] == want[v], (v, got[v], want[v])
    assert num_strong_components(
        strongly_connected_components(g)) == len(set(want.values())) + (
            len(got) - len(want))
