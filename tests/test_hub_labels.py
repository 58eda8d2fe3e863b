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


def test_pruned_labeling_shrinks_and_stays_exact(spark, karate):
    """Batch dominance pruning (PrunedLabeling.h:286-307 semantics):
    the index strictly shrinks on karate while every query answered by
    the full oracle stays exact."""
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    full = hub_labeling(g)
    pruned = hub_labeling(g, pruned=True)
    assert pruned.count() < full.count()
    pairs = spark.createDataFrame(
        [(u, v) for u in range(0, n, 3) for v in range(n)],
        "u long, v long")
    got = {(r["u"], r["v"]): r["d"]
           for r in query_distances(pruned, pairs).collect()}
    for u in range(0, n, 3):
        dist = _bfs(adj, u)
        for v in range(n):
            assert got[(u, v)] == dist.get(v), (u, v)


def test_pruned_bounded_hubs_exact_where_covered(spark):
    # two triangles joined by a path through a high-degree center
    g = Graph.from_rows(
        spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 6),
                (6, 4)], directed=False)
    full = hub_labeling(g, n_hubs=4)
    pruned = hub_labeling(g, n_hubs=4, pruned=True)
    assert pruned.count() <= full.count()
    pairs = spark.createDataFrame(
        [(u, v) for u in range(7) for v in range(7) if u < v],
        "u long, v long")
    want = {(r["u"], r["v"]): r["d"]
            for r in query_distances(full, pairs).collect()}
    got = {(r["u"], r["v"]): r["d"]
           for r in query_distances(pruned, pairs).collect()}
    assert got == want
