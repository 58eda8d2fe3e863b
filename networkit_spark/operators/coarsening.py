"""Coarsening and partition set-operations.

  - ``coarsen``: ParallelPartitionCoarsening
    (/root/reference/networkit/cpp/coarsening/
    ParallelPartitionCoarsening.cpp:20-70): contract nodes by label; the
    coarse edge (cu, cv) weight = Σ fine weights; intra-community edges
    become self-loops. One edges⋈labels⋈labels + hash aggregation.
  - ``project_back``: ClusteringProjector — map coarse labels to fine
    nodes through the contraction map.
  - ``partition_intersection``: PartitionIntersection.h — the meet of two
    partitions: nodes in the same subset iff together in BOTH.
  - ``graph_difference``: dynamics/GraphDifference.cpp — edge edit script
    between two snapshots as typed event rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def coarsen(g: Graph, labels: DataFrame, label_col: str = "label") -> Graph:
    """Community graph: vertices = labels, edges = aggregated fine edges.
    For undirected graphs the coarse pair is canonicalized (lo, hi) so
    (a,b) and (b,a) fine edges merge."""
    lab = labels.select("id", F.col(label_col).alias("_l"))
    e = (
        g.edges
        .join(lab.withColumnRenamed("id", "src").withColumnRenamed("_l", "l_src"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("_l", "l_dst"), "dst")
    )
    if g.directed:
        pairs = e.select(F.col("l_src").alias("src"), F.col("l_dst").alias("dst"), "weight")
    else:
        pairs = e.select(
            F.least("l_src", "l_dst").alias("src"),
            F.greatest("l_src", "l_dst").alias("dst"),
            "weight",
        )
    coarse = pairs.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    coarse_vertices = labels.select(F.col(label_col).alias("id")).distinct()
    return Graph(coarse, directed=g.directed, weighted=True,
                 vertices=coarse_vertices)


def project_back(fine_to_coarse: DataFrame, coarse_labels: DataFrame,
                 label_col: str = "label") -> DataFrame:
    """(id, label): assign each fine node the label of its coarse node.
    ``fine_to_coarse`` is (id, coarse_id); ``coarse_labels`` is
    (id=coarse_id, label)."""
    return (
        fine_to_coarse.join(
            coarse_labels.withColumnRenamed("id", "coarse_id"), "coarse_id")
        .select("id", label_col)
    )


def partition_intersection(p1: DataFrame, p2: DataFrame,
                           label_col: str = "label") -> DataFrame:
    """(id, label): meet of two partitions — the label is the canonical
    min node id sharing the same (l1, l2) pair."""
    j = (
        p1.select("id", F.col(label_col).alias("l1"))
        .join(p2.select("id", F.col(label_col).alias("l2")), "id")
    )
    reps = j.groupBy("l1", "l2").agg(F.min("id").alias("rep"))
    return j.join(reps, ["l1", "l2"]).select("id", F.col("rep").alias(label_col))


def graph_difference(g1: Graph, g2: Graph) -> DataFrame:
    """Edit script g1 → g2 as typed GraphEvent rows (type, u, v, w):
    EDGE_REMOVAL for edges only in g1, EDGE_ADDITION only in g2,
    EDGE_WEIGHT_UPDATE for weight changes (GraphEvent.h:24-39 naming)."""
    e1 = g1.edges.select("src", "dst", F.col("weight").alias("w1"))
    e2 = g2.edges.select("src", "dst", F.col("weight").alias("w2"))
    j = e1.join(e2, ["src", "dst"], "full_outer")
    return j.select(
        F.when(F.col("w2").isNull(), F.lit("EDGE_REMOVAL"))
        .when(F.col("w1").isNull(), F.lit("EDGE_ADDITION"))
        .when(F.col("w1") != F.col("w2"), F.lit("EDGE_WEIGHT_UPDATE"))
        .otherwise(F.lit("NONE")).alias("type"),
        F.col("src").alias("u"), F.col("dst").alias("v"),
        F.coalesce("w2", F.lit(0.0)).alias("w"),
    ).filter(F.col("type") != "NONE")
