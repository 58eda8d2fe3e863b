"""Graph set-operations, edge indexing, and partition utilities.

Reference: Graph.append / Graph.merge (pyx Graph rel. 259-279),
Graph::indexEdges (Graph.cpp:216-262), Partition::compact
(Partition.h:211), MissingLinksFinder (pyx:8630), workflow profiling
composites (community.py:48-64, profiling/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph


def append(g1: Graph, g2: Graph) -> Graph:
    """Disjoint union: g2's node ids shifted past g1's max id
    (Graph.append semantics)."""
    max_id = g1.vertices.agg(F.max("id")).collect()[0][0]
    offset = int(max_id) + 1 if max_id is not None else 0
    shifted = g2.edges.select(
        (F.col("src") + offset).alias("src"),
        (F.col("dst") + offset).alias("dst"), "weight")
    v2 = g2.vertices.select((F.col("id") + offset).alias("id"))
    return Graph(g1.edges.unionByName(shifted),
                 directed=g1.directed, weighted=g1.weighted or g2.weighted,
                 vertices=g1.vertices.union(v2))


def merge(g1: Graph, g2: Graph) -> Graph:
    """Union on shared ids; duplicate edges collapse (Graph.merge)."""
    e = g1.edges.unionByName(g2.edges).groupBy("src", "dst").agg(
        F.max("weight").alias("weight"))
    return Graph(e, directed=g1.directed, weighted=g1.weighted or g2.weighted,
                 vertices=g1.vertices.union(g2.vertices))


def ordered_dense_ids(df: DataFrame, cols: list[str],
                      out_col: str = "dense_id") -> DataFrame:
    """Append ``out_col`` = global 0-based rank of the row in the
    lexicographic order of ``cols`` (rows must be distinct on ``cols``).

    Distributed two-pass assignment — the equivalent of a global
    ``row_number() OVER (ORDER BY cols)`` WITHOUT the single-partition
    sort that plan collapses to: (1) range-repartition on ``cols`` (order
    across partitions), (2) count rows per partition (a tiny collect),
    (3) per-partition ``row_number`` window + the broadcast cumulative
    offset. Correct for ANY boundary choice the range partitioner makes,
    since offsets come from the actual counts."""
    spark = df.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(npart, *cols) \
        .withColumn("_pid", F.spark_partition_id()).persist()
    counts = {int(r["_pid"]): int(r["cnt"]) for r in
              ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:
        return df.withColumn(out_col, F.lit(0).cast("long")).filter(F.lit(False))
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col,
                    (F.row_number().over(w) - 1 + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )


def ordered_prefix_sums(df: DataFrame, cols: list[str],
                        val_col: str, out_col: str = "cum") -> DataFrame:
    """Append ``out_col`` = inclusive prefix sum of ``val_col`` in the
    lexicographic order of ``cols`` — the same distributed two-pass
    shape as :func:`ordered_dense_ids` (range partition, tiny
    per-partition totals collect, broadcast offsets + local window), so
    no single-partition global sort."""
    spark = df.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(npart, *cols) \
        .withColumn("_pid", F.spark_partition_id()).persist()
    sums = {int(r["_pid"]): float(r["s"]) for r in
            ranged.groupBy("_pid").agg(F.sum(val_col).alias("s")).collect()}
    offsets, acc = [], 0.0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += sums[pid]
    if not offsets:
        return df.withColumn(out_col, F.lit(0.0)).filter(F.lit(False))
    off_df = spark.createDataFrame(offsets, "_pid int, _off double")
    w = Window.partitionBy("_pid").orderBy(*cols) \
        .rowsBetween(Window.unboundedPreceding, 0)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.sum(val_col).over(w) + F.col("_off"))
        .drop("_pid", "_off")
    )


def index_edges(g: Graph) -> DataFrame:
    """(src, dst, weight, edge_id): stable ids in canonical scan order —
    one id per undirected edge, assigned on the (lo, hi) orientation
    (Graph::indexEdges assigns one id per undirected edge on the u>=v
    side, Graph.cpp:234-243). Id assignment is the distributed two-pass
    :func:`ordered_dense_ids` (no global sort)."""
    canon = g.edges.select(
        "src", "dst", "weight",
        F.least("src", "dst").alias("_lo"), F.greatest("src", "dst").alias("_hi"))
    ids = ordered_dense_ids(canon.select("_lo", "_hi").distinct(),
                            ["_lo", "_hi"], "edge_id")
    return canon.join(ids, ["_lo", "_hi"]).select(
        "src", "dst", "weight", F.col("edge_id").cast("long").alias("edge_id"))


def compact_partition(labels: DataFrame, label_col: str = "label") -> DataFrame:
    """Partition::compact — relabel to dense 0..k-1 preserving label
    order (distributed two-pass rank; no single-partition sort)."""
    mapping = ordered_dense_ids(labels.select(label_col).distinct(),
                                [label_col], "_new")
    return labels.join(mapping, label_col).select(
        "id", F.col("_new").alias(label_col))


def missing_links(g: Graph, k_hop: int = 2) -> DataFrame:
    """(u, v) node pairs at distance exactly 2 (non-adjacent pairs with a
    common neighbor) — MissingLinksFinder's candidate set, the usual
    link-prediction target. Enumerating ALL non-edges is O(n²); distance-2
    pairs are the wedge join minus existing edges."""
    e = g.edges.filter("src != dst").select("src", "dst")
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
                  ).distinct()
    a, b = sym.alias("a"), sym.alias("b")
    cand = (
        a.join(b, (F.col("a.dst") == F.col("b.dst"))
               & (F.col("a.src") < F.col("b.src")))
        .select(F.col("a.src").alias("u"), F.col("b.src").alias("v"))
        .distinct()
    )
    existing = sym.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v"))
    return cand.join(existing, ["u", "v"], "left_anti")


def profile(g: Graph) -> dict:
    """One-stop structural profile (the reference's profiling battery,
    profiling/profiling.py:202-260, reduced to scalars)."""
    from networkit_spark.operators.components import (
        connected_components, num_components)
    from networkit_spark.operators.degrees import out_degrees
    from networkit_spark.operators.triangles import (
        global_clustering_coefficient, global_triangle_count)

    deg = out_degrees(g).agg(
        F.min("degree"), F.max("degree"), F.avg("degree")).collect()[0]
    return {
        "n": g.num_vertices(),
        "m": g.num_edges(),
        "density": g.density(),
        "self_loops": g.num_self_loops(),
        "min_degree": int(deg[0]),
        "max_degree": int(deg[1]),
        "avg_degree": float(deg[2]),
        "components": num_components(connected_components(g)),
        "triangles": global_triangle_count(g),
        "global_clustering": global_clustering_coefficient(g),
    }


def gini(values: DataFrame, col: str | None = None) -> float:
    """Gini coefficient of a value column (reference stats.py exposes
    `gini` from the C++ aux): G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over
    ascending-sorted values. The sort rank comes from the two-pass
    range-partitioned `ordered_dense_ids` (docs/PLANS.md rule 3 — no
    single-partition window), so the whole computation is two
    aggregations at any scale."""
    col = col or values.columns[-1]
    v = values.select(F.col(col).cast("double").alias("x"),
                      F.monotonically_increasing_id().alias("_tie"))
    ranked = ordered_dense_ids(v, ["x", "_tie"], out_col="i")
    agg = ranked.agg(
        F.sum((F.col("i") + 1) * F.col("x")).alias("iwx"),
        F.sum("x").alias("sx"),
        F.count(F.lit(1)).alias("n")).collect()[0]
    n, sx = int(agg["n"]), float(agg["sx"])
    if n == 0 or sx == 0:
        return 0.0
    return 2.0 * float(agg["iwx"]) / (n * sx) - (n + 1.0) / n
