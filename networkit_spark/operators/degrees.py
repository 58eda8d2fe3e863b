"""Per-node degree aggregations.

Reference semantics (/root/reference/networkit/cpp/graph/Graph.h:565-582,
Graph.cpp:536-566):
  - degree(u)          = |outEdges[u]|; undirected degree counts each incident
                         edge once, self-loop once.
  - weightedDegree(u)  = Σ weights of out-edges (unweighted ⇒ degree·1.0);
                         this is PageRank's out-degree normalizer.
  - volume(u)          = weightedDegree with the self-loop weight counted
                         TWICE (Graph.cpp:548-566); feeds Modularity.

All are single hash aggregations (Catalyst does partial+final map-side
combine automatically) left-joined back to the vertex set so 0-degree nodes
appear explicitly — the reference iterates all existing nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def _with_all_vertices(g: Graph, agg: DataFrame, col: str, zero) -> DataFrame:
    return (
        g.vertices.join(agg, "id", "left")
        .select("id", F.coalesce(F.col(col), F.lit(zero)).alias(col))
    )


def out_degrees(g: Graph) -> DataFrame:
    """(id, degree). For undirected graphs this is THE degree."""
    agg = (
        g.symmetrized()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return _with_all_vertices(g, agg, "degree", 0)


def in_degrees(g: Graph) -> DataFrame:
    source = g.edges if g.directed else g.symmetrized()
    agg = (
        source.groupBy(F.col("dst").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return _with_all_vertices(g, agg, "degree", 0)


def weighted_out_degrees(g: Graph) -> DataFrame:
    """(id, wdeg) — Σ out-edge weights (Graph.cpp:536-546)."""
    agg = (
        g.symmetrized()
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("weight").alias("wdeg"))
    )
    return _with_all_vertices(g, agg, "wdeg", 0.0)


def volumes(g: Graph) -> DataFrame:
    """(id, volume) — weightedDegree + self-loop weight counted twice
    (Graph.cpp:548-566)."""
    agg = (
        g.symmetrized()
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.sum(
                F.col("weight")
                * F.when(F.col("src") == F.col("dst"), F.lit(2.0)).otherwise(F.lit(1.0))
            ).alias("volume")
        )
    )
    return _with_all_vertices(g, agg, "volume", 0.0)


def degree_centrality(g: Graph, normalized: bool = False) -> DataFrame:
    """(id, score) — DegreeCentrality
    (/root/reference/networkit/cpp/centrality/DegreeCentrality.cpp:15-40):
    score = degree, optionally normalized by the max possible degree (n-1).
    """
    deg = out_degrees(g)
    if not normalized:
        return deg.select("id", F.col("degree").cast("double").alias("score"))
    n = g.num_vertices()
    return deg.select(
        "id", (F.col("degree") / F.lit(float(max(n - 1, 1)))).alias("score")
    )


def assortativity(g: Graph) -> float:
    """Degree assortativity: Pearson correlation of endpoint degrees over
    edges (/root/reference/networkit/cpp/correlation/Assortativity.cpp)."""
    deg = out_degrees(g)
    e = g.symmetrized() if not g.directed else g.edges
    joined = (
        e.join(deg.withColumnRenamed("degree", "deg_src"), e.src == deg.id)
        .drop("id")
    )
    deg2 = out_degrees(g).withColumnRenamed("degree", "deg_dst").withColumnRenamed("id", "id2")
    joined = joined.join(deg2, joined.dst == deg2.id2).drop("id2")
    row = joined.agg(F.corr("deg_src", "deg_dst").alias("r")).collect()[0]
    return float(row["r"]) if row["r"] is not None else float("nan")


def centralization(scores: DataFrame, max_score: float,
                   score_col: str = "score") -> float:
    """Freeman centralization of a score vector
    (/root/reference/networkit/cpp/centrality/Centrality.cpp:62-80):
    Σ_v (center − c(v)) / Σ_v (max_theoretical − c(v)) where center is
    the observed maximum and ``max_score`` the theoretical one (n−1 for
    degree — DegreeCentrality.cpp maximum()). One aggregation."""
    row = scores.agg(
        F.max(score_col).alias("center"),
        F.sum(score_col).alias("total"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    center, total, n = float(row["center"] or 0.0), float(row["total"] or 0.0), int(row["n"])
    denom = max_score * n - total
    if denom == 0.0:
        return 0.0
    return (center * n - total) / denom


def degree_centralization(g: Graph) -> float:
    """Freeman degree centralization (max for a star: 1.0)."""
    n = g.num_vertices()
    return centralization(degree_centrality(g), float(max(n - 1, 1)))
