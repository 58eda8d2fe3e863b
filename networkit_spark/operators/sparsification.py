"""Edge sparsification: score edges, then keep the strongest fraction.

Reference model (/root/reference/networkit/cpp/sparsification/*,
networkit/sparsification.py:214-607): a Sparsifier = an edge-score pass +
``GlobalThresholdFilter`` keeping edges with score ≥ t; the Python layer
binary-searches t to hit a target edge ratio. Spark mapping: scores are the
triangle/jaccard joins we already have; the ratio search is a single
``approxQuantile`` (exact at test scale via relativeError=0) instead of a
binary search — one pass, no iteration.

Scores implemented:
  - triangle score (TriangleEdgeScore, §2.4)
  - local-similarity / Jaccard score (LocalSimilarityScore family):
    |N(u)∩N(v)| / |N(u)∪N(v)| per edge
  - random score (RandomEdgeScore): seeded hash-uniform — deterministic
  - EdgeScoreNormalizer: min-max rescale; EdgeScoreBlender: convex mix
  - EdgeScoreAsWeight: write a score back as the edge weight
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.triangles import (
    _distinct_edges, triangle_edge_scores,
)


def jaccard_edge_scores(g: Graph) -> DataFrame:
    """(lo, hi, score): neighborhood Jaccard per existing edge."""
    e = _distinct_edges(g)
    sym = e.select(F.col("lo").alias("src"), F.col("hi").alias("dst")).union(
        e.select(F.col("hi").alias("src"), F.col("lo").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    tri = triangle_edge_scores(g)  # common neighbors of an edge == triangles on it
    return (
        tri.join(deg.withColumnRenamed("id", "lo").withColumnRenamed("deg", "dlo"), "lo")
        .join(deg.withColumnRenamed("id", "hi").withColumnRenamed("deg", "dhi"), "hi")
        .select("lo", "hi",
                (F.col("triangles")
                 / (F.col("dlo") + F.col("dhi") - F.col("triangles"))).alias("score"))
    )


def random_edge_scores(g: Graph, seed: int = 42) -> DataFrame:
    """(lo, hi, score): deterministic hash-uniform score in [0,1)."""
    e = _distinct_edges(g)
    h = F.xxhash64("lo", "hi", F.lit(seed))
    return e.select("lo", "hi",
                    ((h.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5))
                    .alias("score"))


def normalize_scores(scores: DataFrame, score_col: str = "score",
                     lower: float = 0.0, upper: float = 1.0) -> DataFrame:
    """EdgeScoreNormalizer: min-max rescale into [lower, upper]."""
    row = scores.agg(F.min(score_col).alias("lo"), F.max(score_col).alias("hi")
                     ).collect()[0]
    lo, hi = float(row["lo"]), float(row["hi"])
    span = (hi - lo) or 1.0
    return scores.withColumn(
        score_col,
        F.lit(lower) + (F.col(score_col) - F.lit(lo)) / F.lit(span)
        * F.lit(upper - lower),
    )


def blend_scores(a: DataFrame, b: DataFrame, alpha: float = 0.5,
                 score_col: str = "score") -> DataFrame:
    """EdgeScoreBlender: alpha·a + (1-alpha)·b on shared (lo, hi)."""
    return (
        a.select("lo", "hi", F.col(score_col).alias("_a"))
        .join(b.select("lo", "hi", F.col(score_col).alias("_b")), ["lo", "hi"])
        .select("lo", "hi",
                (F.lit(alpha) * F.col("_a")
                 + F.lit(1 - alpha) * F.col("_b")).alias(score_col))
    )


def global_threshold_filter(g: Graph, scores: DataFrame, threshold: float,
                            above: bool = True) -> Graph:
    """GlobalThresholdFilter: keep edges with score ≥ t (or ≤ t)."""
    cond = F.col("score") >= threshold if above else F.col("score") <= threshold
    kept = scores.filter(cond).select("lo", "hi")
    e = (
        g.edges.join(
            kept,
            (F.least("src", "dst") == F.col("lo"))
            & (F.greatest("src", "dst") == F.col("hi")),
            "left_semi",
        )
    )
    return Graph(e, directed=g.directed, weighted=g.weighted)


def sparsify_to_ratio(g: Graph, scores: DataFrame, ratio: float,
                      relative_error: float = 0.0) -> Graph:
    """Keep ~ratio of edges by score (the Python layer's parameterization
    search, replaced by a quantile)."""
    t = scores.approxQuantile("score", [1.0 - ratio], relative_error)[0]
    return global_threshold_filter(g, scores, t, above=True)


def score_as_weight(g: Graph, scores: DataFrame) -> Graph:
    """EdgeScoreAsWeight: replace edge weights with scores."""
    e = (
        g.edges.join(
            scores,
            (F.least("src", "dst") == F.col("lo"))
            & (F.greatest("src", "dst") == F.col("hi")),
            "left",
        )
        .select("src", "dst", F.coalesce("score", F.lit(0.0)).alias("weight"))
    )
    return Graph(e, directed=g.directed, weighted=True)


def _sym_with_deg(g: Graph):
    """((src,dst) both orientations, deg table) for the per-ego windows."""
    e = _distinct_edges(g)
    sym = e.select(F.col("lo").alias("src"), F.col("hi").alias("dst")).union(
        e.select(F.col("hi").alias("src"), F.col("lo").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))
    return sym, deg


def scan_scores(g: Graph) -> DataFrame:
    """(lo, hi, score): SCAN structural similarity
    (SCANStructuralSimilarityScore.cpp:11):
    (triangles(e) + 1) / sqrt((deg(u)+1)·(deg(v)+1))."""
    _, deg = _sym_with_deg(g)
    tri = triangle_edge_scores(g)
    return (
        tri.join(deg.withColumnRenamed("id", "lo")
                 .withColumnRenamed("deg", "dlo"), "lo")
        .join(deg.withColumnRenamed("id", "hi")
              .withColumnRenamed("deg", "dhi"), "hi")
        .select("lo", "hi",
                ((F.col("triangles") + 1)
                 / F.sqrt((F.col("dlo") + 1) * (F.col("dhi") + 1)))
                .alias("score"))
    )


def local_degree_scores(g: Graph) -> DataFrame:
    """(lo, hi, score): LocalDegreeScore.cpp:40-84 — per ego i, rank
    neighbors by degree DESC with competition ranking (ties share), edge
    exponent e = 1 − log(rank)/log(deg(i)) (1 if deg ≤ 1), final score =
    max over the two egos. One window over the sym edge table."""
    from pyspark.sql import Window

    sym, deg = _sym_with_deg(g)
    per_ego = (
        sym.join(deg.withColumnRenamed("id", "dst")
                 .withColumnRenamed("deg", "ndeg"), "dst")
        .join(deg.withColumnRenamed("id", "src")
              .withColumnRenamed("deg", "edeg"), "src")
    )
    w = Window.partitionBy("src").orderBy(F.desc("ndeg"))
    scored = per_ego.withColumn("rank", F.rank().over(w)).select(
        "src", "dst",
        F.when(F.col("edeg") <= 1, F.lit(1.0))
        .otherwise(1.0 - F.log("rank") / F.log("edeg")).alias("e"))
    return (
        scored.groupBy(F.least("src", "dst").alias("lo"),
                       F.greatest("src", "dst").alias("hi"))
        .agg(F.max("e").alias("score"))
    )


def local_similarity_scores(g: Graph) -> DataFrame:
    """(lo, hi, score): LocalSimilarityScore.cpp:28-64 — per ego i, rank
    neighbors by edge Jaccard triangles/(deg_i+deg_j−triangles) DESC
    (ordinal rank, ties broken by smaller neighbor id first), exponent
    1 − log(rank)/log(deg(i)); score = max over egos."""
    from pyspark.sql import Window

    sym, deg = _sym_with_deg(g)
    tri = triangle_edge_scores(g)
    sym_tri = (
        sym.join(tri, (F.least("src", "dst") == F.col("lo"))
                 & (F.greatest("src", "dst") == F.col("hi")))
        .join(deg.withColumnRenamed("id", "src")
              .withColumnRenamed("deg", "edeg"), "src")
        .join(deg.withColumnRenamed("id", "dst")
              .withColumnRenamed("deg", "ndeg"), "dst")
        .select("src", "dst", "edeg",
                (F.col("triangles")
                 / (F.col("edeg") + F.col("ndeg") - F.col("triangles")))
                .alias("sim"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    scored = sym_tri.withColumn("rank", F.row_number().over(w)).select(
        "src", "dst",
        F.when(F.col("edeg") <= 1, F.lit(1.0))
        .otherwise(1.0 - F.log("rank") / F.log("edeg")).alias("e"))
    return (
        scored.groupBy(F.least("src", "dst").alias("lo"),
                       F.greatest("src", "dst").alias("hi"))
        .agg(F.max("e").alias("score"))
    )


def multiscale_scores(g: Graph) -> DataFrame:
    """(lo, hi, score): MultiscaleScore.cpp:20-62 — per ego i normalize
    incident weights p = w/Σw; significance = 1 − (1−p)^(deg−1); score =
    max over egos (the multiscale-backbone p-value complement)."""
    e = _distinct_edges(g)
    w_e = g.edges.filter("src != dst").select(
        F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi"),
        F.col("weight").cast("double").alias("w")
    ).groupBy("lo", "hi").agg(F.max("w").alias("w"))
    sym = w_e.select(F.col("lo").alias("src"), F.col("hi").alias("dst"), "w") \
        .union(w_e.select(F.col("hi").alias("src"), F.col("lo").alias("dst"),
                          "w"))
    tot = sym.groupBy("src").agg(F.sum("w").alias("sw"),
                                 F.count(F.lit(1)).alias("k"))
    scored = sym.join(tot, "src").select(
        "src", "dst",
        (1.0 - F.pow(1.0 - F.col("w") / F.col("sw"), F.col("k") - 1))
        .alias("p"))
    return (
        scored.groupBy(F.least("src", "dst").alias("lo"),
                       F.greatest("src", "dst").alias("hi"))
        .agg(F.max("p").alias("score"))
    )


def simmelian_overlap_scores(g: Graph, max_rank: int = 10) -> DataFrame:
    """(lo, hi, score): Simmelian overlap (SimmelianOverlapScore.cpp /
    SimmelianScore.cpp) — rank each ego's neighbors by per-edge triangle
    count DESC (competition ranking), score(u,v) = |{w : rank_u(w) ≤
    maxRank ∧ rank_v(w) ≤ maxRank}| — the number of strong ties the two
    endpoints share."""
    from pyspark.sql import Window

    sym, _ = _sym_with_deg(g)
    tri = triangle_edge_scores(g)
    sym_tri = sym.join(tri, (F.least("src", "dst") == F.col("lo"))
                       & (F.greatest("src", "dst") == F.col("hi"))) \
        .select("src", "dst", "triangles")
    w = Window.partitionBy("src").orderBy(F.desc("triangles"))
    top = (sym_tri.withColumn("rank", F.rank().over(w))
           .filter(F.col("rank") <= max_rank)
           .select(F.col("src").alias("ego"), F.col("dst").alias("nbr"))
           .persist())
    e = _distinct_edges(g)
    a = top.select(F.col("ego").alias("lo"), "nbr")
    b = top.select(F.col("ego").alias("hi"), "nbr")
    overlap = (
        e.join(a, "lo").join(b, ["hi", "nbr"])
        .groupBy("lo", "hi").agg(F.count(F.lit(1)).alias("ov"))
    )
    return e.join(overlap, ["lo", "hi"], "left").select(
        "lo", "hi", F.coalesce("ov", F.lit(0)).cast("double").alias("score"))


def forest_fire_scores(g: Graph, pf: float = 0.6,
                       target_burnt_ratio: float = 1.0,
                       batch_fires: int = 64, seed: int = 42,
                       max_batches: int = 32) -> DataFrame:
    """(lo, hi, score): ForestFireScore
    (/root/reference/networkit/cpp/sparsification/ForestFireScore.cpp:
    16-80): repeatedly start fires at random nodes, spread each fire to
    unvisited neighbors with burn probability ``pf``, count burns per
    edge until ≥ ``target_burnt_ratio``·m total edge-burns, then
    normalize by the max burn count.

    Distributed variant (documented difference): the reference burns a
    Geometric(pf) number of random unvisited neighbors per active node;
    here each candidate edge burns INDEPENDENTLY with probability pf
    via a deterministic counter-based hash (same expected spread
    behavior, executor-friendly — no sequential per-node draw).
    ``batch_fires`` fires run SIMULTANEOUSLY as one hash-keyed BFS
    (state (fire, node)); batches repeat until the burnt-ratio target.
    Edges never burnt score 0."""
    from networkit_spark.plans.scratch import Scratch

    spark = g.edges.sparkSession
    sc = Scratch(spark, "ff")
    count_rows = F.count(F.lit(1)).alias("rows")
    e = _distinct_edges(g)
    e = sc.cut(e, "edges")
    m = e.count()
    sym = sc.cut(e.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
                 .union(e.select(F.col("hi").alias("src"),
                                 F.col("lo").alias("dst"))), "sym")

    burnt = None
    total_burnt = 0
    for batch in range(max_batches):
        if total_burnt >= target_burnt_ratio * m:
            break
        starts = (
            g.vertices.select("id")
            .orderBy(F.xxhash64("id", F.lit(seed), F.lit(batch)))
            .limit(batch_fires)
            .select(F.xxhash64("id", F.lit(batch)).alias("fire"),
                    F.col("id"))
        )
        frontier = sc.cut(starts, f"b{batch}f0")
        visited = frontier
        rnd = 0
        while True:
            rnd += 1
            u01 = (F.pmod(F.xxhash64("fire", "src", "dst", F.lit(seed + 1),
                                     F.lit(rnd)),
                          F.lit(1 << 40)).cast("double") + 0.5) \
                / F.lit(float(1 << 40))
            burns, bm = sc.cut_observed(
                frontier.withColumnRenamed("id", "src")
                .join(sym, "src")
                .join(visited.withColumnRenamed("id", "dst"),
                      ["fire", "dst"], "left_anti")
                .filter(u01 < F.lit(pf))
                .select("fire", "src", "dst").distinct(),
                [count_rows], name=f"b{batch}burn{rnd}")
            nb = int(bm["rows"] or 0)
            if nb == 0:
                break
            total_burnt += nb
            edge_rows = burns.select(F.least("src", "dst").alias("lo"),
                                     F.greatest("src", "dst").alias("hi"))
            burnt = edge_rows if burnt is None else burnt.union(edge_rows)
            frontier = sc.cut(
                burns.select("fire", F.col("dst").alias("id")).distinct(),
                f"b{batch}f{rnd}")
            visited = sc.cut(visited.union(frontier))
        if burnt is not None:
            burnt = sc.cut(burnt, f"b{batch}acc")

    if burnt is None:
        out = e.select("lo", "hi", F.lit(0.0).alias("score")).persist()
    else:
        counts = burnt.groupBy("lo", "hi").agg(
            F.count(F.lit(1)).alias("burns"))
        mx = counts.agg(F.max("burns")).collect()[0][0] or 1
        out = (
            e.join(counts, ["lo", "hi"], "left")
            .select("lo", "hi",
                    (F.coalesce("burns", F.lit(0)).cast("double")
                     / F.lit(float(mx))).alias("score"))
            .persist()
        )
    out.count()
    sc.cleanup()
    return out


def geometric_mean_scores(scores: DataFrame, score_col: str = "score") -> DataFrame:
    """GeometricMeanScore (reference cpp/edgescores/GeometricMeanScore.cpp:
    23-41): normalize a per-edge attribute by the geometric mean of its
    endpoints' incident-attribute sums — score'(u,v) = a(u,v) /
    sqrt(nodeSum(u)*nodeSum(v)), 0 where a <= 0.

    One groupBy over the exploded endpoints plus two broadcast-friendly
    joins back; no iteration, survives any scale the input scores do."""
    a = scores.select("lo", "hi", F.col(score_col).alias("_att"))
    sums = (
        a.select(F.col("lo").alias("id"), "_att")
        .union(a.select(F.col("hi").alias("id"), "_att"))
        .groupBy("id").agg(F.sum("_att").alias("_ns"))
    )
    return (
        a.join(sums.select(F.col("id").alias("lo"), F.col("_ns").alias("_nlo")), "lo")
        .join(sums.select(F.col("id").alias("hi"), F.col("_ns").alias("_nhi")), "hi")
        .select("lo", "hi",
                F.when(F.col("_att") > 0,
                       F.col("_att") / F.sqrt(F.col("_nlo") * F.col("_nhi")))
                .otherwise(F.lit(0.0)).alias("score"))
    )


def linearize_scores(scores: DataFrame, score_col: str = "score",
                     inverse: bool = False, seed: int = 42) -> DataFrame:
    """EdgeScoreLinearizer (reference cpp/edgescores/EdgeScoreLinearizer.cpp:
    20-57): replace each score by its normalized sort position
    pos/(m-1) (ascending; ``inverse`` sorts descending), i.e. linearize an
    arbitrary score distribution into uniform [0,1]. The reference breaks
    ties randomly; we use a seeded xxhash64 so the result is deterministic.
    m == 1 maps to 0.5 like the reference special case.

    The global ordering is the semantics, but NOT via a global-order
    window (that collapses to one partition — docs/PLANS.md rule 3):
    positions come from the two-pass range-partitioned rank
    (`ordered_dense_ids`), distributed at any m."""
    from networkit_spark.operators.graph_tools import ordered_dense_ids
    m = scores.count()
    if m == 1:
        return scores.select("lo", "hi", F.lit(0.5).alias("score"))
    sgn = -1 if inverse else 1
    tie = F.xxhash64("lo", "hi", F.lit(seed))
    keyed = scores.select(
        "lo", "hi",
        (F.lit(sgn) * F.col(score_col)).alias("_k1"),
        (F.lit(sgn) * tie).alias("_k2"))
    return (
        ordered_dense_ids(keyed, ["_k1", "_k2"], "_pos")
        .select("lo", "hi",
                (F.col("_pos").cast("double")
                 / F.lit(float(m - 1))).alias("score"))
    )


def prefix_jaccard_scores(g: Graph,
                          attribute: DataFrame | None = None) -> DataFrame:
    """(lo, hi, score): PrefixJaccardScore — max over rank prefixes of
    the Jaccard similarity of the endpoints' top-attribute neighbor
    sets (edgescores/PrefixJaccardScore.cpp:19-147).

    Reference semantics mirrored exactly: each ego ranks its incident
    edges by attribute DESC with competition ranking (ties share the
    rank = #strictly-greater neighbors); for an edge (u,v), at every
    rank r the partner-excluded prefix sets A_u(r), A_v(r) are compared
    and the best Jaccard wins. `attribute` is a per-edge (lo, hi, att)
    frame; default = triangle counts (the Simmelian pairing).

    Plan: J(r) changes only when a neighbor ENTERS a prefix, so each
    edge emits one event per incident neighbor (ru / rv / both→common
    at max(ru,rv)); a per-edge cumulative-sum window over the event
    ranks yields every prefix's (|∩|, |∪|) in one pass. Event volume is
    Σ_e (deg u + deg v) — the wedge cost class — and every window is
    partitioned (per ego / per edge), never global."""
    from pyspark.sql import Window

    if attribute is None:
        attribute = triangle_edge_scores(g).withColumnRenamed(
            "triangles", "att")
    att_col = attribute.columns[2]
    e = _distinct_edges(g)
    sym = e.select(F.col("lo").alias("u"), F.col("hi").alias("w"),
                   "lo", "hi").union(
        e.select(F.col("hi").alias("u"), F.col("lo").alias("w"),
                 "lo", "hi"))
    inc = sym.join(attribute.select("lo", "hi",
                                    F.col(att_col).alias("att")),
                   ["lo", "hi"]).select("u", "w", "att")
    ranked = inc.withColumn(
        "r", F.rank().over(Window.partitionBy("u")
                           .orderBy(F.desc("att"))) - 1)
    ev_u = (e.join(ranked.withColumnRenamed("u", "lo"), "lo")
            .filter(F.col("w") != F.col("hi"))
            .select("lo", "hi", "w", F.col("r").alias("ru")))
    ev_v = (e.join(ranked.withColumnRenamed("u", "hi"), "hi")
            .filter(F.col("w") != F.col("lo"))
            .select("lo", "hi", "w", F.col("r").alias("rv")))
    both = ev_u.join(ev_v, ["lo", "hi", "w"], "full_outer")
    deltas = (
        both.select(
            "lo", "hi",
            F.explode(F.array_compact(F.array(
                F.when(F.col("ru").isNotNull(),
                       F.struct(F.col("ru").alias("r"),
                                F.lit(1).alias("du"), F.lit(0).alias("dv"),
                                F.lit(0).alias("dc"))),
                F.when(F.col("rv").isNotNull(),
                       F.struct(F.col("rv").alias("r"),
                                F.lit(0).alias("du"), F.lit(1).alias("dv"),
                                F.lit(0).alias("dc"))),
                F.when(F.col("ru").isNotNull() & F.col("rv").isNotNull(),
                       F.struct(F.greatest("ru", "rv").alias("r"),
                                F.lit(0).alias("du"), F.lit(0).alias("dv"),
                                F.lit(1).alias("dc"))),
            ))).alias("d"))
        .select("lo", "hi", "d.r", "d.du", "d.dv", "d.dc")
        .groupBy("lo", "hi", "r")
        .agg(F.sum("du").alias("du"), F.sum("dv").alias("dv"),
             F.sum("dc").alias("dc"))
    )
    w = Window.partitionBy("lo", "hi").orderBy("r") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    jac = deltas.select(
        "lo", "hi",
        (F.sum("dc").over(w)
         / (F.sum("du").over(w) + F.sum("dv").over(w)
            - F.sum("dc").over(w))).alias("j"))
    best = jac.groupBy("lo", "hi").agg(F.max("j").alias("score"))
    return e.join(best, ["lo", "hi"], "left").select(
        "lo", "hi", F.coalesce("score", F.lit(0.0)).alias("score"))


def modularity_edge_scores(g: Graph) -> DataFrame:
    """(lo, hi, score): per-edge modularity gain
    score(u,v) = w(u,v)/W − (wdeg(u)/2W)·(wdeg(v)/2W)
    (scoring/ModularityScoring.h:84-93) — one broadcast-join column
    expression over the weighted-degree table."""
    from networkit_spark.operators.degrees import weighted_out_degrees

    W = float(g.edges.filter("src != dst").agg(
        F.sum("weight")).collect()[0][0] or 0.0)
    if W == 0.0:
        raise ValueError("modularity_edge_scores: total edge weight is 0")
    wdeg = weighted_out_degrees(g)
    e = g.edges.filter("src != dst").select(
        F.least("src", "dst").alias("lo"),
        F.greatest("src", "dst").alias("hi"),
        F.col("weight").cast("double").alias("w"),
    ).groupBy("lo", "hi").agg(F.max("w").alias("w"))
    return (
        e.join(F.broadcast(wdeg.withColumnRenamed("id", "lo")
                           .withColumnRenamed("wdeg", "d1")), "lo")
        .join(F.broadcast(wdeg.withColumnRenamed("id", "hi")
                          .withColumnRenamed("wdeg", "d2")), "hi")
        .select("lo", "hi",
                (F.col("w") / W
                 - (F.col("d1") / (2 * W)) * (F.col("d2") / (2 * W)))
                .alias("score"))
    )


def chance_corrected_triangle_scores(g: Graph) -> DataFrame:
    """(lo, hi, score): ChanceCorrectedTriangleScore
    (/root/reference/networkit/cpp/sparsification/
    ChanceCorrectedTriangleScore.cpp:15-30) — the observed triangle count
    on an edge divided by its expectation under random wiring:

        score(u,v) = triangles(u,v)·(n−2) / ((deg(u)−1)·(deg(v)−1))

    for edges on ≥ 1 triangle (both endpoint degrees are then ≥ 2, so
    the denominator is positive); edges with a degree-1 endpoint score 1;
    all other triangle-free edges score 0.

    One triangle pass + two broadcast degree joins + a column expression
    — same shuffle shape as the other edge scores."""
    from networkit_spark.operators.degrees import out_degrees

    n = g.num_vertices()
    tri = triangle_edge_scores(g)  # (lo, hi, triangles) per distinct edge
    deg = out_degrees(g)
    return (
        tri.join(F.broadcast(deg.withColumnRenamed("id", "lo")
                             .withColumnRenamed("degree", "d1")), "lo")
        .join(F.broadcast(deg.withColumnRenamed("id", "hi")
                          .withColumnRenamed("degree", "d2")), "hi")
        .select(
            "lo", "hi",
            F.when(F.col("triangles") > 0,
                   F.col("triangles") * F.lit(float(n - 2))
                   / ((F.col("d1") - 1) * (F.col("d2") - 1)))
            .when((F.col("d1") == 1) | (F.col("d2") == 1), F.lit(1.0))
            .otherwise(F.lit(0.0)).alias("score"))
    )
