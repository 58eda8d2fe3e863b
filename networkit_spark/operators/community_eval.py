"""Partition quality and partition-similarity measures.

Reference semantics (/root/reference/networkit/cpp/community/):
  - EdgeCut.cpp:12-20 — Σ w over stored edges whose endpoints disagree.
  - Coverage.cpp — intra-community weight / total weight.
  - Conductance.cpp:13-52 — 2-partition only: cut / min(vol₀, vol₁) with
    vol = Σ weightedDegree.
  - NodeStructuralRandMeasure.cpp — pair-counting dissimilarity
    1 − (s11+s00)/C(n,2).
  - GraphStructuralRandMeasure.cpp:13-36 — edge-restricted variant:
    1 − (e11+e00)/m.
  - AdjustedRandMeasure.cpp:9-57 — 1 − ARI with the expected/max index
    correction.
  - JaccardMeasure.cpp — 1 − s11/(sumZeta + sumEta − s11).
  - NMIDistance.cpp:19-130 + DynamicNMIDistance.cpp:132-161 —
    NMI = 2·MI/(H(ζ)+H(η)) with log₂ entropies; distance = 1 − NMI.

Every measure is one or two hash aggregations over (id, label) joins —
the pair-counting family needs only three scalars (Σ C(|C|,2) per side
and over the intersection), never materialized pairs, so all of it runs
at any scale. Dissimilarity conventions follow the reference (0 = same
partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def _lab(labels: DataFrame, label_col: str, out: str) -> DataFrame:
    return labels.select("id", F.col(label_col).alias(out))


def _edge_labels(g: Graph, labels: DataFrame, label_col: str) -> DataFrame:
    lab = _lab(labels, label_col, "_l")
    return (
        g.edges
        .join(lab.withColumnRenamed("id", "src")
              .withColumnRenamed("_l", "l_src"), "src")
        .join(lab.withColumnRenamed("id", "dst")
              .withColumnRenamed("_l", "l_dst"), "dst")
    )


def edge_cut(g: Graph, labels: DataFrame, label_col: str = "label") -> float:
    """EdgeCut::getQuality — total weight of inter-community stored edges."""
    row = _edge_labels(g, labels, label_col).agg(
        F.sum(F.when(F.col("l_src") != F.col("l_dst"), F.col("weight"))
              .otherwise(F.lit(0.0))).alias("cut")).collect()[0]
    return float(row["cut"] or 0.0)


def coverage(g: Graph, labels: DataFrame, label_col: str = "label") -> float:
    """Coverage — intra-community weight / total weight."""
    row = _edge_labels(g, labels, label_col).agg(
        F.sum("weight").alias("total"),
        F.sum(F.when(F.col("l_src") == F.col("l_dst"), F.col("weight"))
              .otherwise(F.lit(0.0))).alias("intra")).collect()[0]
    total = float(row["total"] or 0.0)
    return float(row["intra"] or 0.0) / total if total else 0.0


def conductance(g: Graph, labels: DataFrame, label_col: str = "label") -> float:
    """Conductance::getQuality — requires a 2-partition: cut weight over
    min of the two volumes (vol = Σ weighted degree per side)."""
    lab = _lab(labels, label_col, "_l")
    k = lab.select("_l").distinct().count()
    if k != 2:
        raise ValueError(f"conductance needs a 2-partition, got {k} blocks")
    el = _edge_labels(g, labels, label_col)
    cut = el.agg(F.sum(
        F.when(F.col("l_src") != F.col("l_dst"), F.col("weight"))
        .otherwise(F.lit(0.0))).alias("c")).collect()[0]["c"] or 0.0
    vols = (
        el.select(F.col("l_src").alias("_l"), "weight")
        .union(el.select(F.col("l_dst").alias("_l"), "weight"))
        .groupBy("_l").agg(F.sum("weight").alias("vol"))
        .collect()
    )
    denom = min(float(r["vol"]) for r in vols)
    return float(cut) / denom if denom else 0.0


def _pair_sums(p1: DataFrame, p2: DataFrame, label_col: str = "label"):
    """(n, sum1, sum2, sum_inter): the three Σ C(size,2) scalars shared by
    every pair-counting measure, from one contingency aggregation."""
    j = _lab(p1, label_col, "_a").join(_lab(p2, label_col, "_b"), "id")
    n = j.count()
    c2 = lambda c: F.sum(F.col(c) * (F.col(c) - 1) / 2)  # noqa: E731
    s1 = j.groupBy("_a").agg(F.count(F.lit(1)).alias("s")) \
        .agg(c2("s")).collect()[0][0] or 0.0
    s2 = j.groupBy("_b").agg(F.count(F.lit(1)).alias("s")) \
        .agg(c2("s")).collect()[0][0] or 0.0
    si = j.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("s")) \
        .agg(c2("s")).collect()[0][0] or 0.0
    return n, float(s1), float(s2), float(si)


def rand_dissimilarity(p1: DataFrame, p2: DataFrame,
                       label_col: str = "label") -> float:
    """NodeStructuralRandMeasure: 1 − (s11 + s00) / C(n,2)."""
    n, s1, s2, si = _pair_sums(p1, p2, label_col)
    total = n * (n - 1) / 2
    if total == 0:
        return 0.0
    s00 = total + si - (s1 + s2)
    return 1.0 - (si + s00) / total


def adjusted_rand_dissimilarity(p1: DataFrame, p2: DataFrame,
                                label_col: str = "label") -> float:
    """AdjustedRandMeasure: 1 − (randIndex − expected)/(max − expected)."""
    n, s1, s2, si = _pair_sums(p1, p2, label_col)
    total = n * (n - 1) / 2
    max_index = 0.5 * (s1 + s2)
    expected = s1 * s2 / total if total else 0.0
    if max_index == 0 or max_index == expected:
        return 0.0
    return 1.0 - (si - expected) / (max_index - expected)


def jaccard_dissimilarity(p1: DataFrame, p2: DataFrame,
                          label_col: str = "label") -> float:
    """JaccardMeasure: 1 − s11 / (sumZeta + sumEta − s11)."""
    _, s1, s2, si = _pair_sums(p1, p2, label_col)
    denom = s1 + s2 - si
    return 1.0 - (si / denom if denom else 0.0)


def graph_structural_rand_dissimilarity(
        g: Graph, p1: DataFrame, p2: DataFrame,
        label_col: str = "label") -> float:
    """GraphStructuralRandMeasure: over stored edges only,
    1 − (e11 + e00)/m."""
    lab1 = _lab(p1, label_col, "_a")
    lab2 = _lab(p2, label_col, "_b")
    e = g.edges.select("src", "dst")
    j = (
        e.join(lab1.withColumnRenamed("id", "src")
               .withColumnRenamed("_a", "a_src"), "src")
        .join(lab1.withColumnRenamed("id", "dst")
              .withColumnRenamed("_a", "a_dst"), "dst")
        .join(lab2.withColumnRenamed("id", "src")
              .withColumnRenamed("_b", "b_src"), "src")
        .join(lab2.withColumnRenamed("id", "dst")
              .withColumnRenamed("_b", "b_dst"), "dst")
    )
    row = j.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(((F.col("a_src") == F.col("a_dst"))
               == (F.col("b_src") == F.col("b_dst"))).cast("long")).alias("agree"),
    ).collect()[0]
    m = int(row["m"])
    if m == 0:
        raise ValueError("graph-structural rand measure undefined without edges")
    return 1.0 - float(row["agree"]) / m


def nmi_distance(p1: DataFrame, p2: DataFrame,
                 label_col: str = "label") -> float:
    """NMIDistance: 1 − 2·MI/(H₁+H₂) with log₂ entropies (0 if H₁+H₂=0)."""
    import math

    j = _lab(p1, label_col, "_a").join(_lab(p2, label_col, "_b"), "id")
    n = j.count()
    if n == 0:
        return 0.0
    cells = j.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("s")).collect()
    sz1: dict = {}
    sz2: dict = {}
    for r in cells:
        sz1[r["_a"]] = sz1.get(r["_a"], 0) + int(r["s"])
        sz2[r["_b"]] = sz2.get(r["_b"], 0) + int(r["s"])
    mi = 0.0
    for r in cells:
        s = int(r["s"])
        mi += (s / n) * math.log2(s * n / (sz1[r["_a"]] * sz2[r["_b"]]))
    h1 = -sum(s / n * math.log2(s / n) for s in sz1.values())
    h2 = -sum(s / n * math.log2(s / n) for s in sz2.values())
    if h1 + h2 == 0.0:
        return 0.0
    return 1.0 - 2.0 * mi / (h1 + h2)


# -- local (per-community) evaluation measures ------------------------------
# (LocalPartitionEvaluation family: IntrapartitionDensity.cpp,
# PartitionHubDominance.cpp, IsolatedInterpartitionConductance.cpp /
# -Expansion.cpp, StablePartitionNodes.cpp, PartitionFragmentation.cpp —
# each returns one value per community; min/max/avg are one more agg.)

def _sym_w(g: Graph) -> DataFrame:
    e = g.edges.filter("src != dst").select(
        "src", "dst", F.col("weight").cast("double").alias("w"))
    return e.union(e.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst"), "w"))


def intrapartition_density(g: Graph, labels: DataFrame,
                           label_col: str = "label") -> DataFrame:
    """(label, density): intra edges / C(|C|,2); 1.0 when |C| < 2
    (IntrapartitionDensity.cpp:10-50)."""
    el = _edge_labels(g, labels, label_col)
    intra = (el.filter((F.col("l_src") == F.col("l_dst"))
                       & (F.col("src") != F.col("dst")))
             .groupBy(F.col("l_src").alias(label_col))
             .agg(F.count(F.lit(1)).alias("ie")))
    sizes = labels.groupBy(label_col).agg(F.count(F.lit(1)).alias("sz"))
    possible = F.col("sz") * (F.col("sz") - 1) / 2
    return sizes.join(intra, label_col, "left").select(
        label_col,
        F.when(possible > 0,
               F.coalesce("ie", F.lit(0)) / possible)
        .otherwise(F.lit(1.0)).alias("density"))


def partition_hub_dominance(g: Graph, labels: DataFrame,
                            label_col: str = "label") -> DataFrame:
    """(label, dominance): max internal degree / (|C|−1); 1.0 for
    singletons (PartitionHubDominance.cpp:10-45)."""
    lab = _lab(labels, label_col, "_l")
    sym = _sym_w(g)
    internal = (
        sym.join(lab.withColumnRenamed("id", "src")
                 .withColumnRenamed("_l", "ls"), "src")
        .join(lab.withColumnRenamed("id", "dst")
              .withColumnRenamed("_l", "ld"), "dst")
        .filter(F.col("ls") == F.col("ld"))
        .groupBy(F.col("src").alias("id"), F.col("ls").alias(label_col))
        .agg(F.count(F.lit(1)).alias("ideg"))
    )
    maxdeg = internal.groupBy(label_col).agg(F.max("ideg").alias("mx"))
    sizes = labels.groupBy(label_col).agg(F.count(F.lit(1)).alias("sz"))
    return sizes.join(maxdeg, label_col, "left").select(
        label_col,
        F.when(F.col("sz") > 1,
               F.coalesce("mx", F.lit(0)) / (F.col("sz") - 1))
        .otherwise(F.lit(1.0)).alias("dominance"))


def isolated_interpartition_conductance(
        g: Graph, labels: DataFrame, label_col: str = "label",
        expansion: bool = False) -> DataFrame:
    """(label, value): per-community cut / min(vol_C, totalVol − vol_C)
    (IsolatedInterpartitionConductance.cpp; volumes count every incident
    stored edge once per endpoint). ``expansion=True`` divides by
    min(|C|, n − |C|) instead (IsolatedInterpartitionExpansion)."""
    el = _edge_labels(g, labels, label_col)
    per_side = el.select(F.col("l_src").alias(label_col), "weight",
                         (F.col("l_src") != F.col("l_dst")).alias("x")) \
        .union(el.select(F.col("l_dst").alias(label_col), "weight",
                         (F.col("l_src") != F.col("l_dst")).alias("x")))
    agg = per_side.groupBy(label_col).agg(
        F.sum(F.when(F.col("x"), F.col("weight")).otherwise(0.0)).alias("cut"),
        F.sum("weight").alias("vol"))
    total = float(el.agg(F.sum(F.col("weight") * 2)).collect()[0][0] or 0.0)
    sizes = labels.groupBy(label_col).agg(F.count(F.lit(1)).alias("sz"))
    n = labels.count()
    j = sizes.join(agg, label_col, "left").select(
        label_col, F.coalesce("cut", F.lit(0.0)).alias("cut"),
        F.coalesce("vol", F.lit(0.0)).alias("vol"), "sz")
    if expansion:
        denom = F.least(F.col("sz"), F.lit(n) - F.col("sz")).cast("double")
    else:
        denom = F.least(F.col("vol"), F.lit(total) - F.col("vol"))
    return j.select(
        label_col,
        F.when(denom > 0, F.col("cut") / denom).otherwise(F.lit(0.0))
        .alias("value"))


def stable_partition_nodes(g: Graph, labels: DataFrame,
                           label_col: str = "label") -> DataFrame:
    """(id, stable): a node is stable iff its weight into its OWN
    community is positive and strictly greater than its weight into any
    other single community; isolated nodes are stable
    (StablePartitionNodes.cpp:15-45)."""
    lab = _lab(labels, label_col, "_l")
    sym = _sym_w(g)
    nbr_w = (
        sym.join(lab.withColumnRenamed("id", "dst")
                 .withColumnRenamed("_l", "nl"), "dst")
        .groupBy(F.col("src").alias("id"), "nl")
        .agg(F.sum("w").alias("lw"))
    )
    own = lab.join(nbr_w, (lab.id == nbr_w.id) & (lab._l == nbr_w.nl),
                   "left").select(lab.id.alias("id"),
                                  F.coalesce("lw", F.lit(0.0)).alias("ow"))
    best_other = (
        lab.join(nbr_w, "id")
        .filter(F.col("nl") != F.col("_l"))
        .groupBy("id").agg(F.max("lw").alias("bw"))
    )
    has_nbr = nbr_w.select("id").distinct()
    return (
        labels.select("id")
        .join(own, "id", "left")
        .join(best_other, "id", "left")
        .join(has_nbr.withColumn("_h", F.lit(1)), "id", "left")
        .select(
            "id",
            F.when(F.col("_h").isNull(), F.lit(True))   # isolated: stable
            .when(F.col("ow") <= 0, F.lit(False))
            .when(F.col("bw").isNull(), F.lit(True))
            .otherwise(F.col("bw") < F.col("ow")).alias("stable"))
    )


def partition_fragmentation(g: Graph, labels: DataFrame,
                            label_col: str = "label") -> DataFrame:
    """(label, fragmentation): 1 − |largest connected fragment| / |C|
    (PartitionFragmentation.cpp:10-75 — intersection with the CC
    partition; 0 = community is connected)."""
    from networkit_spark.operators.components import connected_components

    cc = connected_components(g).withColumnRenamed("component", "_cc")
    j = labels.select("id", label_col).join(cc, "id")
    frag_sizes = j.groupBy(label_col, "_cc").agg(
        F.count(F.lit(1)).alias("fs"))
    max_frag = frag_sizes.groupBy(label_col).agg(F.max("fs").alias("mf"))
    sizes = labels.groupBy(label_col).agg(F.count(F.lit(1)).alias("sz"))
    return sizes.join(max_frag, label_col).select(
        label_col, (1.0 - F.col("mf") / F.col("sz")).alias("fragmentation"))
