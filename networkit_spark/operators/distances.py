"""Traversals & distances: BFS, weighted SSSP, k-hop neighborhoods,
effective diameter (SURVEY.md §2.5).

Reference semantics:
  - BFS (/root/reference/networkit/cpp/distance/BFS.cpp:15-78): unweighted
    single-source distances; unreachable = infinity (we emit NULL).
  - Dijkstra (/root/reference/networkit/cpp/distance/Dijkstra.cpp): the
    heap is inherently sequential; the distributed equivalent with the
    same fixpoint is Bellman-Ford-style relaxation supersteps (each round
    relaxes every edge out of the improved frontier).
  - NeighborhoodFunction / EffectiveDiameterApproximation
    (/root/reference/networkit/cpp/distance/
    EffectiveDiameterApproximation.cpp:13-121): ANF/Flajolet-Martin
    bitmask sketches unioned per hop — the ancestor of HyperLogLog; our
    scale path uses Spark's native HLL++ sketches (approx_count_distinct
    semantics) per hop; the exact variant materializes k-hop reachability
    pairs (test scale / oracle parity).

All iterate under the checkpointed SuperstepRunner: frontier-only joins
(only improved vertices emit messages — the reference's active-set trick,
SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import SuperstepRunner


def _out_edges(g: Graph) -> DataFrame:
    return (g.edges if g.directed else g.symmetrized()).select(
        "src", "dst", "weight")


def bfs(g: Graph, source: int, max_depth: int | None = None,
        runner: SuperstepRunner | None = None) -> DataFrame:
    """(id, dist): hop distance from source; unreachable nodes NULL."""
    spark = g.edges.sparkSession
    edges = _out_edges(g).select("src", "dst").persist()
    vertices = g.vertices
    limit = max_depth if max_depth is not None else 1 << 30

    def init_fn() -> DataFrame:
        return vertices.select(
            "id",
            F.when(F.col("id") == source, F.lit(0)).cast("long").alias("dist"),
        )

    def step_fn(state: DataFrame, k: int) -> DataFrame:
        cur = state.select("id", "dist")
        frontier = cur.filter(F.col("dist") == k).select(F.col("id").alias("src"))
        reached = (
            edges.join(frontier, "src", "left_semi")
            .select(F.col("dst").alias("id")).distinct()
            .withColumn("new_dist", F.lit(k + 1).cast("long"))
        )
        return (
            cur.join(reached, "id", "left")
            .select(
                "id",
                F.coalesce("dist", "new_dist").alias("dist"),
                (F.col("dist").isNull() & F.col("new_dist").isNotNull())
                .cast("int").alias("_changed"),
            )
        )

    def stop_fn(metrics: dict, k: int) -> bool:
        return metrics.get("changed", 1) == 0 or k + 1 >= limit

    if runner is None:
        runner = SuperstepRunner(spark, job_id="bfs-anon", ephemeral=True)
    out = runner.run(init_fn, step_fn, stop_fn, max_iter=limit)
    edges.unpersist()
    return out


def relax_supersteps(edges: DataFrame, init_fn, spark,
                     max_iter: int = 200,
                     runner: SuperstepRunner | None = None,
                     job_id: str = "sssp-anon") -> DataFrame:
    """Bellman-Ford relaxation to fixpoint from an arbitrary initial
    (id, dist, _improved) state — the shared substrate of ``sssp`` (cold
    start from one source) and ``streaming.dyn.update_sssp`` (warm start
    from a batch of edge insertions). ``edges``: (src, dst, weight),
    already orientation-expanded."""

    def step_fn(state: DataFrame, k: int) -> DataFrame:
        cur = state.select("id", "dist", "_improved")
        frontier = cur.filter(F.col("_improved") == 1).select(
            F.col("id").alias("src"), F.col("dist").alias("fd"))
        relaxed = (
            edges.join(frontier, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("fd") + F.col("weight")).alias("cand"))
        )
        return (
            cur.select("id", "dist").join(relaxed, "id", "left")
            .select(
                "id",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("_newdist"),
                "dist",
            )
            .select(
                "id",
                F.when(F.col("_newdist") != float("inf"), F.col("_newdist"))
                .alias("dist"),
                (F.coalesce("dist", F.lit(float("inf"))) > F.col("_newdist"))
                .cast("int").alias("_improved"),
            )
            .withColumn("_changed", F.col("_improved"))
        )

    def stop_fn(metrics: dict, k: int) -> bool:
        return metrics.get("changed", 1) == 0

    if runner is None:
        runner = SuperstepRunner(spark, job_id=job_id, ephemeral=True)
    out = runner.run(init_fn, step_fn, stop_fn, max_iter=max_iter)
    return out.select("id", "dist")


def sssp(g: Graph, source: int, max_iter: int = 200,
         runner: SuperstepRunner | None = None) -> DataFrame:
    """(id, dist): weighted shortest-path distance (Bellman-Ford
    relaxation supersteps; same fixpoint as the reference's Dijkstra)."""
    spark = g.edges.sparkSession
    edges = _out_edges(g).persist()
    vertices = g.vertices

    def init_fn() -> DataFrame:
        return vertices.select(
            "id",
            F.when(F.col("id") == source, F.lit(0.0)).cast("double").alias("dist"),
        ).withColumn("_improved", (F.col("id") == source).cast("int"))

    out = relax_supersteps(edges, init_fn, spark, max_iter=max_iter,
                           runner=runner)
    edges.unpersist()
    return out


def k_hop_pairs(g: Graph, max_h: int, scratch=None) -> DataFrame:
    """(id, other, dist): exact pairwise hop distances up to max_h — the
    exact neighborhood function substrate (O(n·reach) rows: test scale /
    oracle parity only; the scale path is hll_neighborhood_function).

    Per-hop lineage cuts go through a :class:`Scratch` under the shared
    state root (docs/PLANS.md rule 1 — cluster-portable, unlike
    localCheckpoint). Pass a ``scratch`` you own to control cleanup
    (the returned frame reads its files); otherwise an internal one is
    created and its files back the result until scratch GC."""
    from networkit_spark.plans.scratch import Scratch

    sc = scratch if scratch is not None else Scratch(
        g.edges.sparkSession, "khop")
    edges = _out_edges(g).select("src", "dst").distinct()
    cur = g.vertices.select(F.col("id"), F.col("id").alias("other"),
                            F.lit(0).alias("dist"))
    all_pairs = cur
    for h in range(1, max_h + 1):
        nxt = (
            all_pairs.withColumnRenamed("other", "src")
            .join(edges, "src")
            .select("id", F.col("dst").alias("other"))
            .distinct()
            .join(all_pairs.select("id", "other").withColumn("_seen", F.lit(1)),
                  ["id", "other"], "left_anti")
            .withColumn("dist", F.lit(h))
        )
        nxt = sc.cut(nxt, name=f"hop{h}") if h < max_h else nxt
        all_pairs = all_pairs.unionByName(nxt)
    return all_pairs


def neighborhood_function(g: Graph, max_h: int) -> DataFrame:
    """(h, pairs): number of ordered pairs within distance ≤ h (h ≥ 1) —
    exact NeighborhoodFunction. The pair materialization lives in a
    Scratch that is cleaned up before returning; only the ≤ max_h
    (h, count) rows survive (rebuilt driver-side — bounded by max_h)."""
    from networkit_spark.plans.scratch import Scratch

    spark = g.edges.sparkSession
    sc = Scratch(spark, "nf")
    try:
        pairs = k_hop_pairs(g, max_h, scratch=sc)
        per_h = {int(r["dist"]): int(r["at_h"]) for r in
                 pairs.filter("dist > 0")
                 .groupBy("dist").agg(F.count(F.lit(1)).alias("at_h"))
                 .collect()}
    finally:
        sc.cleanup()
    rows, cum = [], 0
    for h in range(1, max_h + 1):
        cum += per_h.get(h, 0)
        rows.append((h, cum))
    return spark.createDataFrame(rows, "h long, pairs long")


def effective_diameter(g: Graph, ratio: float = 0.9, max_h: int = 64,
                       exact: bool = True) -> float:
    """Smallest h with NF(h) ≥ ratio · NF(max): EffectiveDiameter
    semantics (the reference's approximation stops at the same ratio,
    EffectiveDiameterApproximation.cpp:96-118; integer h, no
    interpolation). ``exact=False`` takes the ANF-faithful HLL sketch
    path (hll_neighborhood_function) — per-hop cost is one shuffle of
    fixed-size sketches, never the O(n·ball) pair materialization."""
    if exact:
        nf = neighborhood_function(g, max_h).collect()
        by_h = sorted((int(r["h"]), float(r["pairs"])) for r in nf)
    else:
        nf = hll_neighborhood_function(g, max_h).collect()
        by_h = sorted((int(r["h"]), float(r["pairs_est"])) for r in nf)
    if not by_h:
        return 0.0
    total = by_h[-1][1]
    for h, p in by_h:
        if p >= ratio * total:
            return float(h)
    return float(by_h[-1][0])


def hll_neighborhood_function(g: Graph, max_h: int, rsd: float = 0.05) -> DataFrame:
    """(h, pairs_est): approximate NF via per-hop HLL++ sketch union —
    Spark-native replacement for the reference's ANF bitmasks. Each hop
    unions neighbor sketches (hll_union_agg), so cost per hop is one
    shuffle of fixed-size sketches instead of reachability pairs."""
    edges = _out_edges(g).select("src", "dst").persist()
    n = g.num_vertices()
    # per-node singleton sketch of itself
    prev = g.vertices.groupBy("id").agg(F.hll_sketch_agg("id").alias("sketch"))
    rows = []
    for h in range(1, max_h + 1):
        nbr = (
            edges.join(prev.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.hll_union_agg("sketch").alias("nsk"))
        )
        cur = (
            prev.join(nbr, "id", "left")
            .select("id",
                    F.when(F.col("nsk").isNull(), F.col("sketch"))
                    .otherwise(F.hll_union("sketch", "nsk")).alias("sketch"))
        ).persist()
        est = cur.select(F.sum(F.hll_sketch_estimate("sketch")).alias("p")
                         ).collect()[0]["p"]
        # sketches seed with the node itself; the exact NF counts pairs
        # at distance >= 1 only, so subtract the n self-pairs
        rows.append((h, float(est) - n))
        prev.unpersist() if h > 1 else None
        prev = cur
    edges.unpersist()
    spark = g.edges.sparkSession
    return spark.createDataFrame(rows, "h long, pairs_est double")


def hop_plot(g: Graph, max_h: int) -> DataFrame:
    """(h, fraction): the hop plot — cumulative fraction of reachable
    ordered pairs within h hops (reference HopPlotApproximation semantics,
    exact variant): NF(h) / NF(max_h). One extra projection over
    neighborhood_function."""
    nf = neighborhood_function(g, max_h)
    total = nf.agg(F.max("pairs")).collect()[0][0] or 1
    return nf.select("h", (F.col("pairs") / F.lit(float(total)))
                     .alias("fraction"))


def reverse_bfs(g: Graph, source: int, max_depth: int | None = None,
                runner: SuperstepRunner | None = None) -> DataFrame:
    """(id, dist): hop distance TO ``source`` along edge direction
    (reference cpp/distance/ReverseBFS.cpp — BFS over in-edges). On an
    undirected graph this equals bfs()."""
    return bfs(g.transpose() if g.directed else g, source,
               max_depth=max_depth, runner=runner)


def bfs_sample(g: Graph, source: int, k: int = 50) -> Graph:
    """Node-induced subgraph of the k nodes closest to ``source``
    (reference sampling.py:bfsSample). The reference keeps the first k
    in DISCOVERY order — nondeterministic under parallel edge
    iteration; this version breaks the boundary level by id, so the
    sample is deterministic and the BFS is the distributed kernel."""
    d = bfs(g, source).filter(F.col("dist").isNotNull())
    from networkit_spark.operators.graph_tools import ordered_dense_ids

    take = ordered_dense_ids(d.select("id", "dist"), ["dist", "id"],
                             out_col="k").filter(F.col("k") < k)
    return g.subgraph_from_nodes(take.select("id"))
