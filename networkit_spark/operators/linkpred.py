"""Link-prediction indices — neighborhood-intersection joins.

Reference semantics (/root/reference/networkit/cpp/linkprediction/):
  - CommonNeighborsIndex (CommonNeighborsIndex.cpp:13-15): |N(u) ∩ N(v)|
  - JaccardIndex: |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
  - AdamicAdarIndex: Σ_{w ∈ N(u)∩N(v)} 1/ln(deg(w))
  - PreferentialAttachmentIndex: |N(u)|·|N(v)|
  - TotalNeighborsIndex: |N(u) ∪ N(v)|

All reduce to ONE wedge self-join ``edges a ⋈ edges b ON a.dst = b.src``
grouped by the endpoints, plus degree arithmetic (|A∪B| = |A|+|B|−|A∩B|)
— no neighbor-set materialization, so the plan scales as the wedge count
(bounded by Σ deg², and AQE splits skewed hub keys).

Self-loops are excluded from neighborhoods; pairs returned with u < v.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def _sym(g: Graph) -> DataFrame:
    e = g.edges.filter("src != dst").select("src", "dst")
    return e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def _degrees(sym: DataFrame) -> DataFrame:
    return sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))


def common_neighbor_stats(g: Graph, min_common: int = 1) -> DataFrame:
    """(u, v, common, deg_u, deg_v) for all pairs with ≥ min_common shared
    neighbors, u < v — the shared substrate of every index below."""
    sym = _sym(g).persist()
    deg = _degrees(sym)
    a, b = sym.alias("a"), sym.alias("b")
    wedges = (
        a.join(b, (F.col("a.dst") == F.col("b.dst"))
               & (F.col("a.src") < F.col("b.src")))
        .groupBy(F.col("a.src").alias("u"), F.col("b.src").alias("v"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    if min_common > 1:
        wedges = wedges.filter(F.col("common") >= min_common)
    return (
        wedges.join(deg.withColumnRenamed("id", "u")
                    .withColumnRenamed("deg", "deg_u"), "u")
        .join(deg.withColumnRenamed("id", "v")
              .withColumnRenamed("deg", "deg_v"), "v")
        .select("u", "v", "common", "deg_u", "deg_v")
    )


def common_neighbors_index(g: Graph) -> DataFrame:
    return common_neighbor_stats(g).select(
        "u", "v", F.col("common").cast("double").alias("score"))


def jaccard_index(g: Graph) -> DataFrame:
    s = common_neighbor_stats(g)
    return s.select(
        "u", "v",
        (F.col("common")
         / (F.col("deg_u") + F.col("deg_v") - F.col("common"))).alias("score"),
    )


def preferential_attachment_index(g: Graph) -> DataFrame:
    s = common_neighbor_stats(g)
    return s.select(
        "u", "v", (F.col("deg_u") * F.col("deg_v")).cast("double").alias("score"))


def total_neighbors_index(g: Graph) -> DataFrame:
    s = common_neighbor_stats(g)
    return s.select(
        "u", "v",
        (F.col("deg_u") + F.col("deg_v") - F.col("common"))
        .cast("double").alias("score"),
    )


def adamic_adar_index(g: Graph) -> DataFrame:
    """Σ 1/ln(deg(w)) over shared neighbors w — needs the per-wedge degree
    of the SHARED endpoint, so the aggregation happens over wedges joined
    to deg(w) before the group-by."""
    sym = _sym(g).persist()
    deg = _degrees(sym)
    a, b = sym.alias("a"), sym.alias("b")
    wedges = (
        a.join(b, (F.col("a.dst") == F.col("b.dst"))
               & (F.col("a.src") < F.col("b.src")))
        .select(F.col("a.src").alias("u"), F.col("b.src").alias("v"),
                F.col("a.dst").alias("w"))
    )
    return (
        wedges.join(deg.withColumnRenamed("id", "w"), "w")
        .groupBy("u", "v")
        .agg(F.sum(1.0 / F.log(F.col("deg"))).alias("score"))
    )
