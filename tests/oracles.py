"""Pure-NumPy/Python oracles replicating the reference semantics exactly.

Each oracle cites the reference implementation it replicates; oracles are
themselves validated against the reference's hard-coded golden values (see
FIXTURES.md §2) in test_oracles.py.
"""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np


def _adj(edges, n, directed=False):
    """adjacency dict u -> list[(v, w)] over stored edges (+ reverse if
    undirected; self-loop once)."""
    adj = defaultdict(list)
    for e in edges:
        u, v = int(e[0]), int(e[1])
        w = float(e[2]) if len(e) > 2 else 1.0
        adj[u].append((v, w))
        if not directed and u != v:
            adj[v].append((u, w))
    return adj


def pagerank_ref(edges, n, damp=0.85, tol=1e-8, directed=False, max_iter=10**6,
                 fixed_iters=None):
    """Replicates /root/reference/networkit/cpp/centrality/PageRank.cpp:20-71:
    pull over in-edges with w/weightedDegree, teleport (1-damp)/n, L2 stop,
    final sum-normalization, NO dangling redistribution."""
    adj = _adj(edges, n, directed)
    wdeg = np.zeros(n)
    for u, nbrs in adj.items():
        wdeg[u] = sum(w for _, w in nbrs)
    # in-edges of u: (v, w) such that v->u
    in_edges = defaultdict(list)
    for u, nbrs in adj.items():
        for v, w in nbrs:
            in_edges[v].append((u, w))
    pr = np.full(n, 1.0 / n)
    teleport = (1.0 - damp) / n
    iters = fixed_iters if fixed_iters is not None else max_iter
    for it in range(iters):
        new = np.full(n, teleport)
        for u in range(n):
            s = 0.0
            for v, w in in_edges[u]:
                if wdeg[v] > 0:
                    s += pr[v] * w / wdeg[v]
            new[u] += damp * s
        l2 = float(np.sqrt(((new - pr) ** 2).sum()))
        pr = new
        if fixed_iters is None and l2 <= tol:
            break
    return pr / pr.sum()


def cc_ref(edges, n):
    """BFS labeling (/root/reference/networkit/cpp/components/
    ConnectedComponents.cpp:22-55), canonicalized to min member id."""
    adj = _adj(edges, n, directed=False)
    label = [-1] * n
    for s in range(n):
        if label[s] != -1:
            continue
        comp = [s]
        label[s] = s
        q = deque([s])
        while q:
            u = q.popleft()
            for v, _ in adj[u]:
                if label[v] == -1:
                    label[v] = s
                    comp.append(v)
                    q.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    return np.array(label)


def lpa_sync_ref(edges, n, theta=None, max_iter=100):
    """Synchronous LPA with the reference's tie-break: heaviest neighbor
    label, ties -> smallest label id
    (/root/reference/networkit/cpp/community/PLP.cpp:80-102); isolated
    nodes stay singletons (PLP.cpp:50-61); stop when updated <= theta
    (default n/1e5, PLP.cpp:41-43). Deterministic (Jacobi) variant of the
    reference's async OpenMP loop."""
    if theta is None:
        theta = n / 1e5
    adj = _adj(edges, n, directed=False)
    labels = np.arange(n)
    for _ in range(max_iter):
        new = labels.copy()
        updated = 0
        for u in range(n):
            if not adj[u]:
                continue
            wsum = defaultdict(float)
            for v, w in adj[u]:
                wsum[labels[v]] += w
            # heaviest, tie -> smallest label
            best = min(wsum.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if best != labels[u]:
                new[u] = best
                updated += 1
        labels = new
        if updated <= theta:
            break
    return labels


def canonicalize(labels: np.ndarray) -> np.ndarray:
    """Map each label to the min node id carrying it (mandate: 'exact after
    canonicalization')."""
    rep: dict[int, int] = {}
    for u, l in enumerate(labels):
        l = int(l)
        if l not in rep or u < rep[l]:
            rep[l] = u
    return np.array([rep[int(l)] for l in labels])


def triangles_ref(edges, n):
    """Per-node triangle counts via the reference's degree-ordered wedge
    scan (/root/reference/networkit/cpp/edgescores/
    TriangleEdgeScore.cpp:18-110): orient u->v iff deg(u)>deg(v) or
    (deg equal and u<v); each triangle counted once per corner."""
    adj = _adj(edges, n, directed=False)
    deg = np.array([len(set(v for v, _ in adj[u]) - {u}) for u in range(n)])
    # simple O(sum deg^2) enumeration at test scale
    nbrs = [set(v for v, _ in adj[u] if v != u) for u in range(n)]
    tri = np.zeros(n, dtype=np.int64)
    global_count = 0
    for u in range(n):
        for v in nbrs[u]:
            if v <= u:
                continue
            common = nbrs[u] & nbrs[v]
            for w in common:
                if w > v:
                    tri[u] += 1
                    tri[v] += 1
                    tri[w] += 1
                    global_count += 1
    return tri, global_count


def lcc_ref(edges, n):
    """Local clustering coefficient c(u)=2·tri(u)/(deg(u)(deg(u)-1)), 0 if
    deg<2 (/root/reference/networkit/cpp/centrality/
    LocalClusteringCoefficient.cpp:14,47-83)."""
    adj = _adj(edges, n, directed=False)
    nbrs = [set(v for v, _ in adj[u] if v != u) for u in range(n)]
    deg = np.array([len(s) for s in nbrs])
    tri, _ = triangles_ref(edges, n)
    out = np.zeros(n)
    mask = deg >= 2
    out[mask] = 2.0 * tri[mask] / (deg[mask] * (deg[mask] - 1.0))
    return out


def modularity_ref(edges, labels, n):
    """Modularity = coverage - Σ_C (vol_C/totalW)²/4 with self-loop weight
    counted twice in volume and total
    (/root/reference/networkit/cpp/community/Modularity.cpp:28-91,
    Coverage.cpp). edges are stored-once undirected."""
    intra = 0.0
    total = 0.0
    vol = defaultdict(float)
    for e in edges:
        u, v = int(e[0]), int(e[1])
        w = float(e[2]) if len(e) > 2 else 1.0
        total += w
        if labels[u] == labels[v]:
            intra += w
        vol[int(labels[u])] += w
        vol[int(labels[v])] += w  # self-loop: u==v adds twice — intended
    coverage = intra / total
    expected = sum((vc / total) ** 2 / 4.0 for vc in vol.values())
    return coverage - expected
