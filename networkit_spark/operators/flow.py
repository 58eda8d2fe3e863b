"""Max flow (Edmonds–Karp).

Reference: /root/reference/networkit/cpp/flow/EdmondsKarp.cpp — BFS
augmenting paths to a fixpoint, flow value + source-side min cut.

Augmenting-path max flow is inherently sequential (each augmentation
depends on the previous residual state) — the reference is a
single-machine loop too, so this is a DRIVER-SIDE operator with a hard
``max_edges`` guard, like `paths.commute_time_distances`. Undirected
edges get capacity in both directions (the reference's undirected
semantics)."""

from __future__ import annotations

from collections import defaultdict, deque

from networkit_spark.graph import Graph


def max_flow(g: Graph, source: int, sink: int,
             max_edges: int = 500_000) -> tuple[float, set[int]]:
    """Returns (max flow value, source side of a min cut)."""
    if source == sink:
        raise ValueError("source == sink")
    rows = g.edges.select("src", "dst", "weight").collect()
    if len(rows) > max_edges:
        raise ValueError(
            f"max_flow is the reference's sequential exact algorithm; "
            f"m={len(rows)} exceeds max_edges={max_edges}")
    cap: dict[tuple[int, int], float] = defaultdict(float)
    adj: dict[int, set[int]] = defaultdict(set)
    for r in rows:
        u, v, w = int(r["src"]), int(r["dst"]), float(r["weight"])
        if u == v:
            continue
        cap[(u, v)] += w
        adj[u].add(v)
        adj[v].add(u)  # residual arcs exist both ways
        if not g.directed:
            cap[(v, u)] += w

    flow = 0.0
    while True:
        # BFS for the shortest augmenting path in the residual graph
        parent: dict[int, int] = {source: source}
        q = deque([source])
        while q and sink not in parent:
            u = q.popleft()
            for v in sorted(adj[u]):
                if v not in parent and cap[(u, v)] > 1e-12:
                    parent[v] = u
                    q.append(v)
        if sink not in parent:
            return flow, set(parent)
        bottleneck = float("inf")
        v = sink
        while v != source:
            u = parent[v]
            bottleneck = min(bottleneck, cap[(u, v)])
            v = u
        v = sink
        while v != source:
            u = parent[v]
            cap[(u, v)] -= bottleneck
            cap[(v, u)] += bottleneck
            v = u
        flow += bottleneck
