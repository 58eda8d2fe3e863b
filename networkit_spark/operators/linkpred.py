"""Link-prediction indices — neighborhood-intersection joins.

Reference semantics (/root/reference/networkit/cpp/linkprediction/):
  - CommonNeighborsIndex (CommonNeighborsIndex.cpp:13-15): |N(u) ∩ N(v)|
  - JaccardIndex: |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
  - AdamicAdarIndex: Σ_{w ∈ N(u)∩N(v)} 1/ln(deg(w))
  - ResourceAllocationIndex (ResourceAllocationIndex.cpp:13-19):
    Σ_{w ∈ N(u)∩N(v)} 1/deg(w)
  - PreferentialAttachmentIndex: |N(u)|·|N(v)|
  - TotalNeighborsIndex: |N(u) ∪ N(v)|
  - NeighborhoodDistanceIndex (NeighborhoodDistanceIndex.cpp:13-17):
    |N(u)∩N(v)| / sqrt(|N(u)|·|N(v)|)
  - NeighborsMeasureIndex (NeighborsMeasureIndex.cpp:12-22): count of
    (a,b) ∈ N(u)×N(v) with a == b or (a,b) ∈ E
  - SameCommunityIndex (SameCommunityIndex.cpp:29-30): 1 iff same block
  - U/VDegreeIndex: deg(u) / deg(v)
  - KatzIndex (KatzIndex.cpp:34-60): Σ_{l≤L} β^l · #paths_l(u,v)
  - LinkThresholder byScore/byCount/byPercentage, RandomLinkSampler,
    ROC / PrecisionRecall evaluation metrics

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


def adjusted_rand_index(g: Graph) -> DataFrame:
    """(u, v, score): the reference's per-pair AdjustedRandIndex —
    REPRODUCED BUG-FOR-BUG (/root/reference/networkit/cpp/
    linkprediction/AdjustedRandIndex.cpp:26-39: ``uDifference`` and
    ``vDifference`` are built with ``std::set_union`` instead of
    ``set_difference``, so b = c = |N(u)∪N(v)|). With
    a = |N(u)∩N(v)|, b = c = |N(u)∪N(v)|, d = n − |N(u)∪N(v)|:

        score = 2(ad − bc) / (ab + ac + 2ad + b² + bd + c² + cd),
        0 when the denominator is 0.

    Matching the reference's outputs exactly is the point of parity —
    the textbook formula would disagree with every score the reference
    ever produced. Pairs with ≥ 1 common neighbor, u < v (the
    LinkPredictor ``runAll`` domain restricted the same way as the other
    indices here)."""
    n = g.num_vertices()
    s = common_neighbor_stats(g)
    a = F.col("common").cast("double")
    un = (F.col("deg_u") + F.col("deg_v") - F.col("common")).cast("double")
    b = un
    c = un
    d = F.lit(float(n)) - un
    denom = a * b + a * c + 2 * a * d + b * b + b * d + c * c + c * d
    return s.select(
        "u", "v",
        F.when(denom == 0, F.lit(0.0))
        .otherwise(2 * (a * d - b * c) / denom).alias("score"))


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


def resource_allocation_index(g: Graph) -> DataFrame:
    """Σ 1/deg(w) over shared neighbors w (ResourceAllocationIndex.cpp:
    13-19) — Adamic-Adar's shape with 1/deg instead of 1/ln(deg)."""
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
        .agg(F.sum(1.0 / F.col("deg")).alias("score"))
    )


def neighborhood_distance_index(g: Graph) -> DataFrame:
    """|N(u)∩N(v)| / sqrt(deg_u · deg_v) — neighborhood cosine."""
    s = common_neighbor_stats(g)
    return s.select(
        "u", "v",
        (F.col("common") / F.sqrt(F.col("deg_u") * F.col("deg_v")))
        .alias("score"))


def u_degree_index(g: Graph, pairs: DataFrame) -> DataFrame:
    """(u, v, score=deg(u)) for the given candidate pairs."""
    deg = _degrees(_sym(g))
    return pairs.join(deg.withColumnRenamed("id", "u"), "u").select(
        "u", "v", F.col("deg").cast("double").alias("score"))


def v_degree_index(g: Graph, pairs: DataFrame) -> DataFrame:
    """(u, v, score=deg(v)) for the given candidate pairs."""
    deg = _degrees(_sym(g))
    return pairs.join(deg.withColumnRenamed("id", "v"), "v").select(
        "u", "v", F.col("deg").cast("double").alias("score"))


def same_community_index(pairs: DataFrame, labels: DataFrame,
                         label_col: str = "label") -> DataFrame:
    """1.0 iff u and v share a community (SameCommunityIndex.cpp:29-30)."""
    lab = labels.select("id", F.col(label_col).alias("_l"))
    return (
        pairs.join(lab.withColumnRenamed("id", "u")
                   .withColumnRenamed("_l", "_lu"), "u")
        .join(lab.withColumnRenamed("id", "v")
              .withColumnRenamed("_l", "_lv"), "v")
        .select("u", "v",
                (F.col("_lu") == F.col("_lv")).cast("double").alias("score"))
    )


def neighbors_measure_index(g: Graph, pairs: DataFrame) -> DataFrame:
    """Count of (a, b) ∈ N(u)×N(v) with a == b OR (a, b) ∈ E
    (NeighborsMeasureIndex.cpp:12-22) = |N(u)∩N(v)| + #(u→a→b→v walks).

    The walk term is a 3-hop join restricted to the candidate pairs —
    cost Σ_{(u,v)} deg(u)·avg-overlap, so keep ``pairs`` pruned (e.g.
    the distance-2 candidates from missing_links)."""
    sym = _sym(g).persist()
    nu = sym.select(F.col("src").alias("u"), F.col("dst").alias("a"))
    nv = sym.select(F.col("src").alias("v"), F.col("dst").alias("b"))
    common = (
        pairs.join(nu, "u").join(nv.withColumnRenamed("b", "a"), ["v", "a"])
        .groupBy("u", "v").agg(F.count(F.lit(1)).alias("_c"))
    )
    e_ab = sym.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    walks = (
        pairs.join(nu, "u").join(e_ab, "a").join(nv, ["v", "b"])
        .groupBy("u", "v").agg(F.count(F.lit(1)).alias("_w"))
    )
    return (
        pairs.join(common, ["u", "v"], "left")
        .join(walks, ["u", "v"], "left")
        .select("u", "v",
                (F.coalesce("_c", F.lit(0)) + F.coalesce("_w", F.lit(0)))
                .cast("double").alias("score"))
    )


def katz_index(g: Graph, pairs: DataFrame, beta: float = 0.005,
               max_path_length: int = 5) -> DataFrame:
    """Σ_{l=1..L} β^l · #paths of length l between u and v
    (KatzIndex.cpp:34-60; "paths" = walks, revisits allowed).

    Distributed shape: for the distinct sources u of ``pairs``, iterate
    (root, node, walk-count) frontier expansion l times (one join + one
    aggregation per hop — walk counts stay per-root, so the state is
    bounded by |roots|·n, not n²) and accumulate β^l · count onto the
    matching (root=u, node=v) pairs."""
    spark = g.edges.sparkSession
    sym = _sym(g).persist()
    roots = pairs.select(F.col("u").alias("root")).distinct()
    state = roots.select("root", F.col("root").alias("node"),
                         F.lit(1.0).alias("cnt"))
    acc = None
    for depth in range(1, max_path_length + 1):
        state = (
            state.join(sym.withColumnRenamed("src", "node"), "node")
            .groupBy("root", F.col("dst").alias("node"))
            .agg(F.sum("cnt").alias("cnt"))
        )
        # plan depth grows one join per hop; L is small (≤ ~6), so no
        # lineage cut is needed (localCheckpoint is banned in loops here —
        # see plans/superstep.py on its stats blowup)
        hit = (
            pairs.join(state,
                       (pairs.u == state.root) & (pairs.v == state.node))
            .select("u", "v",
                    (F.lit(float(beta) ** depth) * F.col("cnt")).alias("_s"))
        )
        acc = hit if acc is None else acc.unionByName(hit)
    return (
        pairs.join(acc.groupBy("u", "v").agg(F.sum("_s").alias("score")),
                   ["u", "v"], "left")
        .select("u", "v", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


# -- thresholding / sampling / evaluation (LinkThresholder.cpp,
#    RandomLinkSampler.cpp, ROCMetric.cpp, PrecisionRecallMetric.cpp) ------

def threshold_by_score(predictions: DataFrame, min_score: float) -> DataFrame:
    """LinkThresholder::byScore — keep predictions with score ≥ minScore."""
    return predictions.filter(F.col("score") >= min_score).select("u", "v")


def threshold_by_count(predictions: DataFrame, num_links: int) -> DataFrame:
    """LinkThresholder::byCount — the numLinks highest-scored pairs
    (desc score, then asc (u, v) like PredictionsSorter)."""
    return (
        predictions.orderBy(F.desc("score"), F.asc("u"), F.asc("v"))
        .limit(num_links).select("u", "v")
    )


def threshold_by_percentage(predictions: DataFrame,
                            percentage: float) -> DataFrame:
    """LinkThresholder::byPercentage — top fraction of predictions."""
    if not 0.0 <= percentage <= 1.0:
        raise ValueError("percentage must be in [0, 1]")
    return threshold_by_count(predictions,
                              int(percentage * predictions.count()))


def random_link_sampler(g: Graph, ratio: float, seed: int = 42) -> Graph:
    """RandomLinkSampler: keep ~ratio of stored edges, deterministically
    (hash-uniform per edge — reproducible train/test splits)."""
    u = (F.xxhash64("src", "dst", F.lit(seed)).cast("double")
         / F.lit(float(1 << 64))) + F.lit(0.5)
    return Graph(g.edges.filter(u < ratio), directed=g.directed,
                 weighted=g.weighted, vertices=g.vertices)


def _curve_base(predictions: DataFrame, test_edges: DataFrame) -> DataFrame:
    """Scored predictions labeled against the held-out edge set, with
    cumulative TP/FP in descending-score order (the shared substrate of
    ROC and precision-recall). One global-order window — evaluation is
    candidate-set-sized, not graph-sized."""
    from pyspark.sql import Window

    t = test_edges.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"),
        F.lit(1).alias("_pos"))
    lab = predictions.join(t, ["u", "v"], "left").select(
        "u", "v", "score", F.coalesce("_pos", F.lit(0)).alias("_pos"))
    w = Window.orderBy(F.desc("score"), F.asc("u"), F.asc("v")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return lab.select(
        "score", "_pos",
        F.sum("_pos").over(w).alias("tp"),
        (F.sum(1 - F.col("_pos")).over(w)).alias("fp"),
    )


def roc_curve(predictions: DataFrame, test_edges: DataFrame) -> DataFrame:
    """(threshold, fpr, tpr) points of the ROC curve (ROCMetric.cpp)."""
    base = _curve_base(predictions, test_edges).persist()
    tot = base.agg(F.max("tp").alias("p"), F.max("fp").alias("n")).collect()[0]
    p, n = float(tot["p"] or 0) or 1.0, float(tot["n"] or 0) or 1.0
    return base.select(
        F.col("score").alias("threshold"),
        (F.col("fp") / F.lit(n)).alias("fpr"),
        (F.col("tp") / F.lit(p)).alias("tpr"),
    )


def precision_recall_curve(predictions: DataFrame,
                           test_edges: DataFrame) -> DataFrame:
    """(threshold, recall, precision) points (PrecisionRecallMetric.cpp)."""
    base = _curve_base(predictions, test_edges).persist()
    p = float(base.agg(F.max("tp")).collect()[0][0] or 0) or 1.0
    return base.select(
        F.col("score").alias("threshold"),
        (F.col("tp") / F.lit(p)).alias("recall"),
        (F.col("tp") / (F.col("tp") + F.col("fp"))).alias("precision"),
    )


def auc(curve: DataFrame, x_col: str = "fpr", y_col: str = "tpr") -> float:
    """Trapezoidal area under a curve DataFrame (EvaluationMetric AUC)."""
    from pyspark.sql import Window

    w = Window.orderBy(x_col, y_col)
    seg = curve.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"),
        F.lag(x_col, 1, 0.0).over(w).alias("x0"),
        F.lag(y_col, 1, 0.0).over(w).alias("y0"))
    row = seg.agg(F.sum(
        (F.col("x") - F.col("x0")) * (F.col("y") + F.col("y0")) / 2.0
    ).alias("a")).collect()[0]
    return float(row["a"] or 0.0)
