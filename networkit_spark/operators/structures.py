"""Combinatorial structures: independent sets, matchings, spanning forests.

Reference counterparts (/root/reference/networkit/cpp/):
  - independentset/Luby.cpp — Luby's randomized maximal independent set;
  - matching/PathGrowingMatcher / LocalMaxMatcher — maximal matching;
  - graph/SpanningForest.cpp — one tree edge per non-root vertex;
  - coarsening/MatchingCoarsening.cpp — contract a matching.

All three kernels are the canonical O(log n)-round synchronous
algorithms, deterministic via counter-based hash priorities:
  - MIS (Luby): a remaining vertex joins when its priority beats every
    remaining neighbor's; winners' neighborhoods are removed.
  - Matching (local-max / handshake): every vertex points at its
    best-priority incident edge; an edge whose BOTH endpoints point at
    it is matched; matched vertices leave.
  - Spanning forest: level-synchronous BFS from each component's
    min-id root (components are disjoint, so all roots expand in ONE
    unkeyed frontier); the first-reach predecessor is the tree parent.
Each round is a join + aggregation with a parquet lineage cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.scratch import Scratch


def _cutter(spark):
    """Cluster-portable lineage cutter (plans/scratch.py)."""
    sc = Scratch(spark, "struct")
    return sc.cut, sc


def _sym(g: Graph) -> DataFrame:
    e = g.edges.filter("src != dst").select("src", "dst")
    return e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def maximal_independent_set(g: Graph, seed: int = 42,
                            max_rounds: int = 128) -> DataFrame:
    """(id, in_mis): Luby's MIS. Deterministic hash priorities per round."""
    spark = g.edges.sparkSession
    cut, scratch = _cutter(spark)
    sym = cut(_sym(g))
    remaining = cut(g.vertices.select("id"))
    mis = None
    for r in range(max_rounds):
        if remaining.isEmpty():
            break
        pri = F.xxhash64("id", F.lit(seed), F.lit(r))
        cand = remaining.select("id", pri.alias("p"))
        nbr_min = (
            sym.join(cand.withColumnRenamed("id", "src")
                     .withColumnRenamed("p", "ps"), "src")
            .join(cand.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("ps").alias("minp"))
        )
        winners = cut(
            cand.join(nbr_min, "id", "left")
            .filter(F.col("minp").isNull() | (F.col("p") < F.col("minp")))
            .select("id"))
        picked = winners.select("id", F.lit(True).alias("in_mis"))
        mis = picked if mis is None else cut(mis.union(picked))
        # remove winners and their neighbors
        killed = winners.union(
            sym.join(winners.withColumnRenamed("id", "src"), "src",
                     "left_semi").select(F.col("dst").alias("id"))).distinct()
        remaining = cut(remaining.join(killed, "id", "left_anti"))
        sym = cut(sym.join(killed.withColumnRenamed("id", "src"),
                           "src", "left_anti")
                  .join(killed.withColumnRenamed("id", "dst"),
                        "dst", "left_anti"))
    out = g.vertices.join(mis, "id", "left").select(
        "id", F.coalesce("in_mis", F.lit(False)).alias("in_mis")
    ).persist() if mis is not None else g.vertices.select(
        "id", F.lit(False).alias("in_mis")).persist()
    out.count()
    scratch.cleanup()
    return out


def maximal_matching(g: Graph, seed: int = 42,
                     max_rounds: int = 128,
                     by_weight: bool = False) -> DataFrame:
    """(u, v) matched pairs (u < v): local-max handshake matching —
    every remaining vertex points at its best-priority incident edge;
    mutually-pointed edges are matched; matched vertices leave.

    ``by_weight=True`` makes the priority (weight DESC, hash) — the
    reference LocalMaxMatcher / PathGrowingMatcher semantics (Preis
    local-max): the result is a ½-approximation of the maximum-WEIGHT
    matching, not merely maximal. Default False preserves the
    unweighted hash handshake."""
    spark = g.edges.sparkSession
    cut, scratch = _cutter(spark)
    if by_weight:
        e = g.edges.filter("src != dst").select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
            F.col("weight").cast("double").alias("w"),
        ).groupBy("lo", "hi").agg(F.max("w").alias("w"))
        sym = cut(
            e.select(F.col("lo").alias("src"), F.col("hi").alias("dst"), "w")
            .union(e.select(F.col("hi").alias("src"),
                            F.col("lo").alias("dst"), "w")))
    else:
        sym = cut(_sym(g))
    matched = None
    for r in range(max_rounds):
        if sym.isEmpty():
            break
        lo = F.least("src", "dst")
        hi = F.greatest("src", "dst")
        pri = F.xxhash64(lo, hi, F.lit(seed), F.lit(r))
        if by_weight:
            scored = sym.select("src", "dst", "w", pri.alias("p"))
            best = (
                scored.groupBy("src")
                .agg(F.max(F.struct(F.col("w"), -F.col("p"),
                                    F.col("dst"))).alias("b"))
                .select("src", F.col("b.dst").alias("dst"))
            )
        else:
            scored = sym.select("src", "dst", pri.alias("p"))
            best = (
                scored.groupBy("src")
                .agg(F.max(F.struct(-F.col("p"), F.col("dst"))).alias("b"))
                .select("src", F.col("b.dst").alias("dst"))
            )
        mutual = cut(
            best.alias("a").join(
                best.alias("b"),
                (F.col("a.src") == F.col("b.dst"))
                & (F.col("a.dst") == F.col("b.src")))
            .select(F.least("a.src", "a.dst").alias("u"),
                    F.greatest("a.src", "a.dst").alias("v"))
            .distinct())
        if mutual.isEmpty():
            break
        matched = mutual if matched is None else cut(matched.union(mutual))
        gone = mutual.select(F.col("u").alias("id")).union(
            mutual.select(F.col("v").alias("id"))).distinct()
        sym = cut(sym.join(gone.withColumnRenamed("id", "src"),
                           "src", "left_anti")
                  .join(gone.withColumnRenamed("id", "dst"),
                        "dst", "left_anti"))
    spark2 = g.edges.sparkSession
    if matched is None:
        out = spark2.createDataFrame([], "u long, v long").persist()
    else:
        out = matched.persist()
    out.count()
    scratch.cleanup()
    return out


def matching_coarsening(g: Graph, matching: DataFrame) -> tuple:
    """MatchingCoarsening.cpp: contract each matched pair into one
    supernode (labeled by the pair's min id; unmatched vertices keep
    their own id). Returns (coarse_graph, fine_to_coarse_labels)."""
    from networkit_spark.operators.coarsening import coarsen

    lab = (
        matching.select(F.col("u").alias("id"), F.col("u").alias("label"))
        .union(matching.select(F.col("v").alias("id"),
                               F.col("u").alias("label")))
    )
    labels = (
        g.vertices.join(lab, "id", "left")
        .select("id", F.coalesce("label", F.col("id")).alias("label"))
    )
    return coarsen(g, labels), labels


def spanning_forest(g: Graph, max_depth: int = 1 << 20) -> DataFrame:
    """(parent, child): one BFS tree edge per non-root vertex; roots are
    each component's min id (SpanningForest.cpp semantics — any spanning
    tree per component; ours is the deterministic min-parent BFS tree)."""
    from networkit_spark.operators.components import connected_components

    spark = g.edges.sparkSession
    cut, scratch = _cutter(spark)
    sym = cut(_sym(g))
    labels = connected_components(g)
    roots = labels.select(F.col("component").alias("id")).distinct()
    frontier = cut(roots)
    visited = frontier
    tree = None
    for _ in range(max_depth):
        nxt = (
            sym.join(frontier.withColumnRenamed("id", "src"), "src",
                     "left_semi")
            .join(visited.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .groupBy(F.col("dst").alias("child"))
            .agg(F.min("src").alias("parent"))
        )
        nxt = cut(nxt)
        if nxt.isEmpty():
            break
        tree = nxt if tree is None else cut(tree.union(nxt))
        frontier = cut(nxt.select(F.col("child").alias("id")))
        visited = cut(visited.union(frontier))
    if tree is None:
        out = spark.createDataFrame([], "parent long, child long").persist()
    else:
        out = tree.select("parent", "child").persist()
    out.count()
    scratch.cleanup()
    return out
