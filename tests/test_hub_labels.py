"""Hub-labeling distance oracle vs BFS ground truth."""

from collections import deque

from networkit_spark.graph import Graph
from networkit_spark.operators.hub_labels import (
    hub_labeling, query_distance, query_distances)


def _bfs(adj, s):
    dist = {s: 0}
    q = deque([s])
    while q:
        x = q.popleft()
        for y in adj.get(x, ()):
            if y not in dist:
                dist[y] = dist[x] + 1
                q.append(y)
    return dist


def test_full_hub_labeling_exact(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = hub_labeling(g)
    pairs = spark.createDataFrame(
        [(u, v) for u in range(0, n, 5) for v in range(n)],
        "u long, v long")
    got = {(r["u"], r["v"]): r["d"]
           for r in query_distances(labels, pairs).collect()}
    for u in range(0, n, 5):
        dist = _bfs(adj, u)
        for v in range(n):
            assert got[(u, v)] == dist.get(v), (u, v)


def test_truncated_hubs_upper_bound_and_unreachable(spark):
    # path 0-1-2-3-4 ∪ isolated pair 10-11
    g = Graph.from_rows(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)],
                        directed=False)
    labels = hub_labeling(g, n_hubs=2)  # highest degree: 1, 2 (deg 2)
    # covered pair: exact (path through a hub)
    assert query_distance(labels, 0, 4) == 4
    # cross-component: no common hub -> None
    assert query_distance(labels, 0, 10) is None
    # full labeling distinguishes unreachable (None) exactly
    full = hub_labeling(g)
    assert query_distance(full, 10, 11) == 1
    assert query_distance(full, 0, 11) is None
