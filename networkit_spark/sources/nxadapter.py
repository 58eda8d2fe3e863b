"""NetworkX bridge.

Reference: /root/reference/networkit/nxadapter.py — nx2nk / nk2nx
convert between a networkx.Graph and the engine's Graph. networkx is a
driver-side single-machine library, so both directions are driver-side
by nature; the export is guarded like every other collect-based path
(flow.max_flow convention). networkx itself is optional (import-try —
it is not in this container); both functions raise a clear ImportError
lazily instead of failing at module import.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from networkit_spark.graph import Graph


def _nx():
    try:
        import networkx as nx
    except ImportError as ex:  # pragma: no cover - env-dependent
        raise ImportError(
            "networkx is not installed; nxadapter needs it "
            "(pip install networkx)") from ex
    return nx


def from_networkx(spark: SparkSession, nx_graph,
                  weight_attr: str | None = None) -> Graph:
    """networkx.Graph -> Graph, remapping node ids to consecutive
    0-based longs in iteration order (nxadapter.py:nx2nk semantics)."""
    idmap = {u: i for i, u in enumerate(nx_graph.nodes())}
    directed = nx_graph.is_directed()
    rows = []
    for u, v, data in nx_graph.edges(data=True):
        w = float(data.get(weight_attr, 1.0)) if weight_attr else 1.0
        rows.append((idmap[u], idmap[v], w))
    edges = spark.createDataFrame(
        rows or [(0, 0, 1.0)], "src long, dst long, weight double")
    if not rows:
        edges = edges.limit(0)
    vertices = spark.createDataFrame(
        [(i,) for i in idmap.values()] or [(0,)], "id long")
    if not idmap:
        vertices = vertices.limit(0)
    return Graph(edges, directed=directed,
                 weighted=weight_attr is not None, vertices=vertices)


def to_networkx(g: Graph, max_edges: int = 1_000_000):
    """Graph -> networkx.(Di)Graph with 'weight' edge attributes
    (nxadapter.py:nk2nx). Driver-side; guarded by max_edges."""
    nx = _nx()
    rows = g.edges.select("src", "dst", "weight").collect()
    if len(rows) > max_edges:
        raise ValueError(
            f"to_networkx materializes on the driver; m={len(rows)} "
            f"exceeds max_edges={max_edges}")
    out = nx.DiGraph() if g.directed else nx.Graph()
    out.add_nodes_from(int(r["id"]) for r in g.vertices.collect())
    for r in rows:
        out.add_edge(int(r["src"]), int(r["dst"]),
                     weight=float(r["weight"]))
    return out
