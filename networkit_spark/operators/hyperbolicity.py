"""Gromov δ-hyperbolicity — the berkoecal fork's signature module.

Reference: /root/reference/networkit/cpp/hyperbolicity/Hyperbolicity.cpp
(HYP_AKIBA: landmark upper bounds + far-apart-pair pruning per Borassi
et al., "On Computing the Hyperbolicity of Real-World Graphs", ESA'15;
tests cpp/hyperbolicity/test/HyperbolicityGTest.cpp:29-114). Semantics:
the four-point condition — for a quadruple (a,b,c,d) form the three
pairwise-distance sums

    S1 = d(a,b)+d(c,d)   S2 = d(a,c)+d(b,d)   S3 = d(a,d)+d(b,c)

and hyp(a,b,c,d) = (largest − second largest)/2; δ(G) is the maximum
over all quadruples. δ = 0 on trees and cliques; C4 has δ = 1.

Distributed formulation (relational re-expression of Borassi's
far-apart pruning, NOT a port of the sequential skyline scan):
  1. all-pairs distances from the batched multi-source BFS strata
     (operators/betweenness._brandes — the same substrate as the
     closeness family); the pair table (u, v, d) is parquet-cut once.
  2. LOWER BOUND: evaluate the 4-point condition on the quadruples of
     the top-``sample_pairs`` most-distant pairs (a broadcast-sized
     table — far pairs are where large δ values live).
  3. PRUNE, exactly: by Borassi Lemma 3.2, hyp(a,b,c,d) ≤
     ½·min(d(a,b), d(c,d)) for the pairing achieving S1. A quadruple
     can therefore only beat the lower bound δ₀ if BOTH pairs of its
     S1-pairing satisfy d ≥ 2δ₀ + 1 (distances are integers, δ moves
     in halves). Every such quadruple is enumerated by the self-join
     of the filtered pair table — the search is exact.
  4. evaluate candidates: self-join of candidate pairs (canonical
     pair-of-pairs order, all four nodes distinct) + four hash joins
     against the distance table for the cross distances, one max agg.
All joins/aggs are built-in column expressions (no Python in the hot
path); the candidate self-join is the dominant cost and shrinks
quadratically with the lower bound found in step 2.

The reference throws on disconnected input. Here unreachable pairs are
simply absent from the BFS pair table, so cross-component quadruples
drop out of the inner joins and the result is max over components —
``check_connected=True`` (default) mirrors the reference's throw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def _quad_delta(pairs_ab: DataFrame, pairs_cd: DataFrame,
                dist: DataFrame) -> DataFrame:
    """One row (delta) per quadruple from the pair-of-pairs join.

    ``pairs_*``: (a, b, dab) with a < b; ``dist``: (u, v, d) symmetric.
    Canonical order a < b, c < d, (a, c) lexicographic, all distinct.
    """
    ab = pairs_ab.select(F.col("u").alias("a"), F.col("v").alias("b"),
                         F.col("d").alias("dab"))
    cd = pairs_cd.select(F.col("u").alias("c"), F.col("v").alias("d_"),
                         F.col("d").alias("dcd"))
    quads = (
        ab.join(cd, (F.col("a") < F.col("c"))
                & (F.col("b") != F.col("c"))
                & (F.col("b") != F.col("d_"))
                & (F.col("a") != F.col("d_")))
    )
    for x, y, name in (("a", "c", "dac"), ("b", "d_", "dbd"),
                       ("a", "d_", "dad"), ("b", "c", "dbc")):
        quads = quads.join(
            dist.select(F.col("u").alias(x), F.col("v").alias(y),
                        F.col("d").alias(name)),
            [x, y])
    s1 = F.col("dab") + F.col("dcd")
    s2 = F.col("dac") + F.col("dbd")
    s3 = F.col("dad") + F.col("dbc")
    top = F.greatest(s1, s2, s3)
    mid = s1 + s2 + s3 - top - F.least(s1, s2, s3)
    return quads.select(((top - mid) / 2.0).alias("delta"))


def hyperbolicity(g: Graph, sample_pairs: int = 64,
                  check_connected: bool = True) -> float:
    """Exact Gromov hyperbolicity δ of the undirected view of ``g``.

    ``sample_pairs``: how many of the most-distant pairs seed the
    lower bound (bigger → tighter δ₀ → smaller candidate join).
    """
    from networkit_spark.operators.betweenness import _brandes
    from networkit_spark.plans.scratch import Scratch

    und = Graph(g.edges, directed=False, weighted=False,
                vertices=g.vertices)
    n = und.num_vertices()
    if n < 4:
        return 0.0
    if check_connected:
        from networkit_spark.operators.components import (
            connected_components, num_components)
        if num_components(connected_components(und)) != 1:
            raise ValueError(
                "Hyperbolicity.cpp semantics: graph must be connected "
                "(use check_connected=False for max over components)")

    sc = Scratch(g.edges.sparkSession, "hyp")
    sources = und.vertices.select(F.col("id").alias("s"))
    levels, sym = _brandes(und, sources, sc)
    rows = None
    for l, lv in enumerate(levels):
        if l == 0:
            continue
        r = lv.select(F.col("s").alias("u"), "v",
                      F.lit(l).cast("long").alias("d"))
        rows = r if rows is None else rows.union(r)
    sym.unpersist()
    if rows is None:
        sc.cleanup()
        return 0.0
    dist = sc.cut(rows, "dist")  # symmetric (u, v, d), d >= 1
    pairs = sc.cut(dist.filter(F.col("u") < F.col("v")), "pairs")

    # 2. lower bound from the most-distant pairs (broadcast-sized)
    top = sc.cut(pairs.orderBy(F.desc("d"), F.asc("u"), F.asc("v"))
                 .limit(sample_pairs), "top")
    btop = F.broadcast(top)
    lb_row = _quad_delta(btop, btop, dist).agg(
        F.max("delta").alias("m")).collect()[0]["m"]
    delta_lb = float(lb_row or 0.0)

    # 3-4. exact pruned search: only pairs with d >= 2·δ₀ + 1 can
    # participate in the S1-pairing of a quadruple beating δ₀
    cand = sc.cut(pairs.filter(F.col("d") >= 2 * delta_lb + 1), "cand")
    best_row = _quad_delta(cand, cand, dist).agg(
        F.max("delta").alias("m")).collect()[0]["m"]
    sc.cleanup()
    return max(delta_lb, float(best_row or 0.0))
