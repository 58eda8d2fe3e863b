"""Graph: an immutable edge-DataFrame view of a (possibly weighted, possibly
directed) graph.

Maps the reference's adjacency-list ``Graph`` (see
/root/reference/networkit/cpp/graph/Graph.h:79-115) onto the Spark data
model described in SURVEY.md §1.4:

  - edges(src: long, dst: long, weight: double) — one row per stored edge.
    For *undirected* graphs each edge is stored ONCE in canonical
    orientation is NOT required; ``symmetrized()`` produces the both-ways
    view used by message-passing kernels (the reference stores both half
    edges, Graph.cpp:600-643 — symmetrization is the shuffle-friendly
    equivalent of GraphBuilder's autoCompleteEdges).
  - vertices(id: long) — distinct endpoint ids, optionally unioned with an
    explicit vertex table so isolated nodes survive (the reference's
    ``exists`` bitmap, Graph.h:102).

Everything is lazy; ``n`` / ``m`` are computed once and cached on first use
(the reference keeps counters n/m, Graph.h:90-96).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EDGE_COLS = ("src", "dst", "weight")


class Graph:
    """Immutable snapshot of a graph as an edge DataFrame.

    Mutations (addEdge / removeEdge / removeNode in the reference,
    Graph.cpp:600-700) are expressed as constructors of *new* Graph
    snapshots: union / anti-join on the edge DataFrame.
    """

    def __init__(
        self,
        edges: DataFrame,
        directed: bool = False,
        weighted: bool | None = None,
        vertices: DataFrame | None = None,
    ):
        cols = edges.columns
        if "weight" not in cols:
            edges = edges.withColumn("weight", F.lit(1.0))
            if weighted is None:
                weighted = False
        if weighted is None:
            weighted = True
        self.edges = edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        )
        self.directed = directed
        self.weighted = weighted
        self._vertices_extra = (
            vertices.select(F.col(vertices.columns[0]).cast("long").alias("id"))
            if vertices is not None
            else None
        )
        self._n: int | None = None
        self._m: int | None = None

    # -- construction ------------------------------------------------------

    @classmethod
    def from_rows(cls, spark, rows, directed: bool = False, n: int | None = None):
        """Build from [(u, v[, w]), ...] literal rows (test/golden graphs)."""
        norm = [(int(r[0]), int(r[1]), float(r[2]) if len(r) > 2 else 1.0) for r in rows]
        weighted = any(len(r) > 2 for r in rows)
        edges = spark.createDataFrame(norm, "src long, dst long, weight double")
        vertices = None
        if n is not None:
            vertices = spark.range(n).withColumnRenamed("id", "id")
        return cls(edges, directed=directed, weighted=weighted, vertices=vertices)

    # -- vertex / edge views ----------------------------------------------

    @property
    def vertices(self) -> DataFrame:
        """Distinct node ids (id: long); includes isolated nodes if an
        explicit vertex table was given."""
        v = (
            self.edges.select(F.col("src").alias("id"))
            .union(self.edges.select(F.col("dst").alias("id")))
        )
        if self._vertices_extra is not None:
            v = v.union(self._vertices_extra)
        return v.distinct()

    def symmetrized(self) -> DataFrame:
        """Both-direction edge view for undirected semantics.

        Mirrors GraphBuilder autoCompleteEdges
        (/root/reference/networkit/cpp/graph/GraphBuilder.cpp toGraph):
        every stored (u,v) also appears as (v,u). Self-loops are NOT
        duplicated (the reference stores a self-loop once,
        Graph.cpp:625-629).
        """
        if self.directed:
            return self.edges
        rev = self.edges.filter("src != dst").select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return self.edges.unionByName(rev)

    # -- scalar stats ------------------------------------------------------

    def num_vertices(self) -> int:
        if self._n is None:
            self._n = self.vertices.count()
        return self._n

    def num_edges(self) -> int:
        """Stored edge count m (one per undirected edge, reference
        Graph.h:92)."""
        if self._m is None:
            self._m = self.edges.count()
        return self._m

    def num_self_loops(self) -> int:
        return self.edges.filter("src = dst").count()

    def total_edge_weight(self) -> float:
        """Σ weights over stored edges (reference Graph.cpp:866-876)."""
        row = self.edges.agg(F.sum("weight").alias("s")).collect()[0]
        return float(row["s"] or 0.0)

    def density(self) -> float:
        n = self.num_vertices()
        if n < 2:
            return 0.0
        m = self.num_edges() - self.num_self_loops()
        denom = n * (n - 1) if self.directed else n * (n - 1) / 2
        return m / denom

    # -- projections (reference pyx Graph toUndirected/toUnweighted etc.) --

    def to_unweighted(self) -> "Graph":
        return Graph(
            self.edges.withColumn("weight", F.lit(1.0)),
            directed=self.directed,
            weighted=False,
            vertices=self._vertices_extra,
        )

    def to_undirected(self) -> "Graph":
        return Graph(self.edges, directed=False, weighted=self.weighted,
                     vertices=self._vertices_extra)

    def transpose(self) -> "Graph":
        t = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return Graph(t, directed=self.directed, weighted=self.weighted,
                     vertices=self._vertices_extra)

    def remove_self_loops(self) -> "Graph":
        return Graph(self.edges.filter("src != dst"), directed=self.directed,
                     weighted=self.weighted, vertices=self._vertices_extra)

    def subgraph_from_nodes(self, nodes: DataFrame) -> "Graph":
        """Induced subgraph (reference subgraphFromNodes): semi-join both
        endpoints against the node set. ``nodes`` small → broadcast."""
        ids = F.broadcast(nodes.select(F.col(nodes.columns[0]).alias("id")).distinct())
        e = (
            self.edges.join(ids, self.edges.src == ids.id, "left_semi")
        )
        ids2 = F.broadcast(nodes.select(F.col(nodes.columns[0]).alias("id")).distinct())
        e = e.join(ids2, e.dst == ids2.id, "left_semi")
        return Graph(e, directed=self.directed, weighted=self.weighted)
