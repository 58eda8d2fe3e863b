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
