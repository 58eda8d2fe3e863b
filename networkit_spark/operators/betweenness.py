"""Betweenness centrality — batched multi-source Brandes.

Reference: /root/reference/networkit/cpp/centrality/Betweenness.cpp:28-120
(exact, all sources; no halving on undirected graphs — each unordered
pair contributes twice, cf. the golden bc[2]=15 in
CentralityGTest.cpp:42-70), EstimateBetweenness.cpp (sampled sources,
scores scaled by n/#samples), and the edge-centrality accumulation
(Betweenness.cpp:75-96). ``betweenness`` is the unweighted (BFS) family;
``weighted_betweenness`` below implements the reference's
Dijkstra-when-weighted switch (Betweenness.cpp:57) as three relational
fixpoints (Bellman-Ford distances, σ path counts, δ dependencies).

Distributed shape — ALL sources run simultaneously, keyed by (s, v):
  forward: level-synchronous multi-source BFS accumulating σ (number of
    shortest s→v paths): one join + one anti-join + one aggregation per
    level; per-level frontiers are parquet-cut and kept (they are
    exactly the strata the backward pass needs). The frontier-empty
    check rides the cut write as an observation metric — one action per
    level.
  backward: dependency accumulation per descending level —
    δ(v) = Σ_{w : dist(w)=dist(v)+1, (v,w)∈E} σ_v/σ_w · (1 + δ(w)) —
    one join per level against the stored strata.
  bc(v) = Σ_s δ_s(v). State is O(#sources · reachable set); use
  ``estimate_betweenness`` (sampled sources) or ``approx_betweenness``
  (RK ε/δ path sampling) at scale — exact all-source betweenness is
  quadratic no matter the engine.

All lineage cuts live under the shared NKS_STATE_DIR root
(plans/scratch.py) so the operator is cluster-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.scratch import Scratch


def _sym_edges(g: Graph) -> DataFrame:
    e = g.edges.filter("src != dst").select("src", "dst")
    if g.directed:
        return e.distinct()
    return e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def _brandes(g: Graph, sources: DataFrame, sc: Scratch,
             max_depth: int = 1 << 20):
    """Returns (levels, sym): levels[l] = (s, v, sigma) stratum DataFrames
    of the multi-source shortest-path DAG (each a parquet-cut scan).

    Visited-set scan discipline (not O(D²)): on UNDIRECTED graphs BFS
    distances of adjacent vertices differ by at most 1, so a message
    from the depth-l frontier can only hit vertices at depth l−1, l, or
    l+1 — the dedup anti-join reads just the last TWO strata, O(1)
    scans per level. On DIRECTED graphs (an edge may point arbitrarily
    far back) a cumulative visited set is kept, re-cut every 8 levels so
    each level reads one cumulative cut + ≤ 8 tail strata instead of
    re-unioning all l previous strata."""
    sym = _sym_edges(g).repartition("src").persist()
    frontier = sc.cut(sources.select(F.col("s"), F.col("s").alias("v"),
                                     F.lit(1.0).alias("sigma")), "lv0")
    levels = [frontier]
    depth = 0
    vis_base = None   # directed only: cumulative cut of older strata
    vis_tail = [frontier]  # strata newer than vis_base
    while depth < max_depth:
        if not g.directed:
            recent = levels[-2:]
            visited = recent[0].select("s", "v")
            for lv in recent[1:]:
                visited = visited.union(lv.select("s", "v"))
        else:
            if len(vis_tail) > 8:
                merged = vis_base.select("s", "v") if vis_base is not None \
                    else None
                for lv in vis_tail:
                    part = lv.select("s", "v")
                    merged = part if merged is None else merged.union(part)
                vis_base = sc.cut(merged, f"vis{depth}")
                vis_tail = []
            visited = vis_base.select("s", "v") if vis_base is not None \
                else None
            for lv in vis_tail:
                part = lv.select("s", "v")
                visited = part if visited is None else visited.union(part)
        msgs = (
            levels[-1].join(sym.withColumnRenamed("src", "v"), "v")
            .select("s", F.col("dst").alias("v"), "sigma")
        )
        nxt, m = sc.cut_observed(
            msgs.groupBy("s", "v").agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["s", "v"], "left_anti"),
            [F.count(F.lit(1)).alias("rows")],
            name=f"lv{depth + 1}")
        if int(m["rows"] or 0) == 0:
            break
        levels.append(nxt)
        vis_tail.append(nxt)
        depth += 1
    return levels, sym


def _accumulate(levels, sym, sc: Scratch):
    """Backward pass: per-source dependencies δ(s, v), all levels."""
    deltas = None  # union of (s, v, delta) across processed levels
    delta_above = None  # (s, v, delta) for level l+1
    for l in range(len(levels) - 2, -1, -1):
        above = levels[l + 1]
        if delta_above is not None:
            above = above.join(delta_above, ["s", "v"], "left").select(
                "s", "v", "sigma",
                F.coalesce("delta", F.lit(0.0)).alias("delta"))
        else:
            above = above.select("s", "v", "sigma",
                                 F.lit(0.0).alias("delta"))
        contrib = (
            levels[l].join(sym.withColumnRenamed("src", "v"), "v")
            .select("s", "v", "sigma", F.col("dst").alias("w"))
            .join(above.select("s", F.col("v").alias("w"),
                               F.col("sigma").alias("sigma_w"),
                               F.col("delta").alias("delta_w")),
                  ["s", "w"])
            .groupBy("s", "v")
            .agg(F.sum(F.col("sigma") / F.col("sigma_w")
                       * (1.0 + F.col("delta_w"))).alias("delta"))
        )
        contrib = sc.cut(contrib, f"delta{l}")
        delta_above = contrib
        deltas = contrib if deltas is None else deltas.union(contrib)
    return deltas


def betweenness(g: Graph, normalized: bool = False,
                sources: DataFrame | None = None,
                scale: float = 1.0) -> DataFrame:
    """(id, score): exact Brandes betweenness (all sources), or partial
    over a given source set. Matches the reference's un-halved undirected
    convention (Betweenness.cpp; bc[2]=15 golden)."""
    if sources is None:
        sources = g.vertices.select(F.col("id").alias("s"))
    sc = Scratch(g.edges.sparkSession, "bw")
    levels, sym = _brandes(g, sources, sc)
    deltas = _accumulate(levels, sym, sc)
    if deltas is None:
        out = g.vertices.select("id", F.lit(0.0).alias("score"))
    else:
        bc = (
            deltas.filter(F.col("s") != F.col("v"))
            .groupBy(F.col("v").alias("id"))
            .agg((F.sum("delta") * F.lit(scale)).alias("score"))
        )
        out = g.vertices.join(bc, "id", "left").select(
            "id", F.coalesce("score", F.lit(0.0)).alias("score"))
    if normalized:
        n = g.vertices.count()
        pairs = (n - 1) * (n - 2)
        if not g.directed:
            pairs //= 2
        out = out.select("id", (F.col("score") / F.lit(float(pairs)))
                         .alias("score"))
    out = out.persist()
    out.count()
    sym.unpersist()
    sc.cleanup()
    return out


def estimate_betweenness(g: Graph, n_samples: int, seed: int = 42,
                         normalized: bool = False) -> DataFrame:
    """EstimateBetweenness: Brandes from ``n_samples`` deterministic
    hash-sampled sources, δ sums scaled by n/#samples
    (EstimateBetweenness.cpp sampling estimator)."""
    n = g.vertices.count()
    k = min(n_samples, n)
    sources = (
        g.vertices.select(F.col("id").alias("s"))
        .orderBy(F.xxhash64("s", F.lit(seed)))
        .limit(k)
    )
    return betweenness(g, normalized=normalized, sources=sources,
                       scale=float(n) / float(k))


def edge_betweenness(g: Graph, sources: DataFrame | None = None) -> DataFrame:
    """(src, dst, score): per-edge betweenness — the DAG-edge
    contribution σ_v/σ_w·(1+δ(w)) summed over sources
    (Betweenness.cpp computeEdgeCentrality).

    On undirected graphs each edge appears in both BFS-DAG orientations;
    the reference accumulates ONE score per undirected edge, so the
    final aggregation groups by (least, greatest) and sums the two
    orientations — one output row per undirected edge, src < dst."""
    if sources is None:
        sources = g.vertices.select(F.col("id").alias("s"))
    sc = Scratch(g.edges.sparkSession, "bw")
    levels, sym = _brandes(g, sources, sc)
    per_edge = None
    delta_above = None
    for l in range(len(levels) - 2, -1, -1):
        above = levels[l + 1]
        if delta_above is not None:
            above = above.join(delta_above, ["s", "v"], "left").select(
                "s", "v", "sigma",
                F.coalesce("delta", F.lit(0.0)).alias("delta"))
        else:
            above = above.select("s", "v", "sigma",
                                 F.lit(0.0).alias("delta"))
        dag = (
            levels[l].join(sym.withColumnRenamed("src", "v"), "v")
            .select("s", "v", "sigma", F.col("dst").alias("w"))
            .join(above.select("s", F.col("v").alias("w"),
                               F.col("sigma").alias("sigma_w"),
                               F.col("delta").alias("delta_w")),
                  ["s", "w"])
            .select("s", "v", "w",
                    (F.col("sigma") / F.col("sigma_w")
                     * (1.0 + F.col("delta_w"))).alias("c"))
        )
        edge_c = sc.cut(dag.groupBy("v", "w").agg(F.sum("c").alias("score")),
                        f"ec{l}")
        per_edge = edge_c if per_edge is None else per_edge.union(edge_c)
        delta_above = sc.cut(
            dag.groupBy("s", "v").agg(F.sum("c").alias("delta")),
            f"ed{l}")
    if per_edge is None:
        out = g.edges.select("src", "dst", F.lit(0.0).alias("score"))
    elif g.directed:
        out = (
            per_edge.groupBy(F.col("v").alias("src"), F.col("w").alias("dst"))
            .agg(F.sum("score").alias("score"))
        )
    else:
        out = (
            per_edge.groupBy(F.least("v", "w").alias("src"),
                             F.greatest("v", "w").alias("dst"))
            .agg(F.sum("score").alias("score"))
        )
    out = out.persist()
    out.count()
    sym.unpersist()
    sc.cleanup()
    return out


def approx_betweenness(g: Graph, epsilon: float = 0.1, delta: float = 0.1,
                       universal_constant: float = 1.0,
                       seed: int = 42) -> DataFrame:
    """(id, score): RK ε/δ-guaranteed betweenness approximation
    (ApproxBetweenness.cpp:30-110, Riondato–Kornaropoulos). Samples

        r = ⌈(c/ε²)·(⌊log2(vd−2)⌋ + 1 − ln δ)⌉

    vertex pairs (vd = vertex-diameter UPPER bound via
    estimatedVertexDiameterPedantic — the RK bound needs an upper bound,
    not the double-sweep lower bound; c = universal constant),
    picks ONE shortest path per pair uniformly at random (backward walk
    choosing each predecessor z of t with probability σ_z/σ_t), and
    adds 1/r to every interior vertex. Scores estimate bc(v)/(n·(n−1))
    within ±ε with probability ≥ 1−δ.

    Distributed shape: all r sampled pairs walk SIMULTANEOUSLY —
    multi-source BFS strata (σ table) once over the distinct sampled
    sources, then one join-per-level backward: predecessor candidates
    via edge join, the σ-weighted choice as a deterministic-hash
    exponential race (min of −ln(U_z)/σ_z picks z w.p. σ_z/Σσ = σ_z/σ_t
    — Σ over DAG-predecessors of t is exactly σ_t), one min_by per walk.
    Rounds = max sampled path length ≤ diameter."""
    import math

    from networkit_spark.operators.graph_tools import ordered_dense_ids
    from networkit_spark.plans.scratch import Scratch

    spark = g.edges.sparkSession
    n = g.num_vertices()
    zeros = g.vertices.select("id", F.lit(0.0).alias("score"))
    if n < 3:
        return zeros

    from networkit_spark.operators.closeness import (
        estimated_vertex_diameter_pedantic)
    vd = estimated_vertex_diameter_pedantic(g)
    if vd <= 2:
        return zeros
    r = int(math.ceil((universal_constant / (epsilon * epsilon))
                      * (math.floor(math.log2(vd - 2)) + 1
                         - math.log(delta))))

    sc = Scratch(spark, "abw")
    dense = sc.cut(ordered_dense_ids(g.vertices.select("id"), ["id"],
                                     "idx"), "dense")
    big = float(1 << 40)
    samples = (
        spark.range(r).select(F.col("id").alias("i"))
        .withColumn("uidx", F.pmod(F.xxhash64("i", F.lit(seed)), F.lit(n)))
        .withColumn("shift", 1 + F.pmod(F.xxhash64("i", F.lit(seed + 1)),
                                        F.lit(n - 1)))
        .withColumn("vidx", F.pmod(F.col("uidx") + F.col("shift"), F.lit(n)))
        .join(dense.select(F.col("idx").alias("uidx"),
                           F.col("id").alias("s")), "uidx")
        .join(dense.select(F.col("idx").alias("vidx"),
                           F.col("id").alias("t")), "vidx")
        .select("i", "s", "t")
    )
    samples = sc.cut(samples, "samples")

    sources = samples.select("s").distinct()
    sig, sym = _sigma_table(g, sources, sc)
    contribs = _sample_path_contribs(sc, samples, sig, sym, seed)

    if contribs is None:
        out = zeros.persist()
    else:
        scores = contribs.groupBy("id").agg(
            (F.count(F.lit(1)) / F.lit(float(r))).alias("score"))
        out = g.vertices.join(scores, "id", "left").select(
            "id", F.coalesce("score", F.lit(0.0)).alias("score")).persist()
    out.count()
    sym.unpersist()
    sc.cleanup()
    return out


def _sigma_table(g: Graph, sources: DataFrame, sc):
    """(sig, sym): sig = the (s, v, d, sigma) BFS-DAG strata table for
    ``sources`` (parquet-cut), sym = the persisted symmetric edge
    relation the strata were built over (caller unpersists)."""
    levels, sym = _brandes(g, sources, sc)
    sig = None
    for l, lv in enumerate(levels):
        rr = lv.select("s", "v", F.lit(l).cast("long").alias("d"), "sigma")
        sig = rr if sig is None else sig.union(rr)
    if sig is None:
        spark = g.edges.sparkSession
        sig = spark.createDataFrame(
            [], "s long, v long, d long, sigma double")
    return sc.cut(sig, "sigma"), sym


def _sample_path_contribs(sc, samples: DataFrame, sig: DataFrame,
                          sym: DataFrame, seed: int) -> DataFrame | None:
    """(i, id): interior vertices of ONE σ-weighted uniformly sampled
    shortest path per reachable (i, s, t) sample row — the RK backward
    walk (ApproxBetweenness.cpp:77-104), all samples simultaneously,
    one join per level; the σ-weighted predecessor choice is a
    deterministic-hash exponential race (min of −ln(U_z)/σ_z picks z
    w.p. σ_z/σ_t). Deterministic in (i, depth, z, seed) — re-walking an
    unchanged DAG reproduces the same path."""
    big = float(1 << 40)
    state, m = sc.cut_observed(
        samples.join(sig.select("s", F.col("v").alias("t"), "d"),
                     ["s", "t"])
        .filter(F.col("d") >= 1).select("i", "s", "t", "d"),
        [F.count(F.lit(1)).alias("rows")], name="walk0")
    contribs = None
    rnd = 0
    while int(m["rows"] or 0) > 0:
        rnd += 1
        cand = (
            state.join(sym.select(F.col("src").alias("z"),
                                  F.col("dst").alias("t")), "t")
            .join(sig.select("s", F.col("v").alias("z"),
                             F.col("d").alias("dz"),
                             F.col("sigma").alias("sz")),
                  ["s", "z"])
            .filter(F.col("dz") == F.col("d") - 1)
        )
        u01 = (F.pmod(F.xxhash64("i", "d", "z", F.lit(seed + 2)),
                      F.lit(1 << 40)).cast("double") + 0.5) / F.lit(big)
        picks = (
            cand.withColumn("rk", -F.log(u01) / F.col("sz"))
            .groupBy("i")
            .agg(F.min(F.struct("rk", "z", "s", "dz")).alias("b"))
            .select("i", F.col("b.s").alias("s"),
                    F.col("b.z").alias("t"), F.col("b.dz").alias("d"))
        )
        state, m = sc.cut_observed(
            picks.filter(F.col("d") >= 1),
            [F.count(F.lit(1)).alias("rows")], name=f"walk{rnd}")
        contribs = state.select("i", F.col("t").alias("id")) if contribs \
            is None else contribs.union(state.select("i", F.col("t").alias("id")))
        if rnd % 8 == 0 and contribs is not None:
            contribs = sc.cut(contribs, f"contrib{rnd}")
    return contribs


def approx_betweenness_state(g: Graph, epsilon: float = 0.1,
                             delta: float = 0.1,
                             universal_constant: float = 1.0,
                             seed: int = 42) -> dict:
    """Run the RK estimator AND return the maintainable state
    DynApproxBetweenness keeps between updates
    (DynApproxBetweenness.cpp:30-117: the r sampled pairs, the per-pair
    SSSP trees, the per-pair sampled paths). Batch shape of the state:

      - ``samples``: (i, s, t) — the fixed sample pairs;
      - ``dist``: (s, v, d) — BFS distances from every sampled source
        (the analogue of the r DynBFS trees, O(r·n) rows like the
        reference's memory);
      - ``contribs``: (i, id) — interior vertices of sample i's path;
      - ``r``, ``seed``, ``scores`` (id, score).

    ``streaming.dyn.update_approx_betweenness`` repairs this state at
    SAMPLE granularity."""
    import math

    from networkit_spark.operators.graph_tools import ordered_dense_ids
    from networkit_spark.plans.scratch import Scratch

    if g.directed:
        raise ValueError("approx_betweenness_state: undirected only "
                         "(DynApproxBetweenness.cpp:31 throws)")
    spark = g.edges.sparkSession
    n = g.num_vertices()
    from networkit_spark.operators.closeness import (
        estimated_vertex_diameter_pedantic)
    vd = estimated_vertex_diameter_pedantic(g) if n >= 3 else 0
    if n < 3 or vd <= 2:
        empty = spark.createDataFrame([], "i long, s long, t long")
        return {"samples": empty,
                "dist": spark.createDataFrame([], "s long, v long, d long"),
                "contribs": spark.createDataFrame([], "i long, id long"),
                "r": 0, "seed": seed,
                "scores": g.vertices.select(
                    "id", F.lit(0.0).alias("score"))}
    r = int(math.ceil((universal_constant / (epsilon * epsilon))
                      * (math.floor(math.log2(vd - 2)) + 1
                         - math.log(delta))))
    sc = Scratch(spark, "abwst")
    dense = sc.cut(ordered_dense_ids(g.vertices.select("id"), ["id"],
                                     "idx"), "dense")
    samples = (
        spark.range(r).select(F.col("id").alias("i"))
        .withColumn("uidx", F.pmod(F.xxhash64("i", F.lit(seed)), F.lit(n)))
        .withColumn("shift", 1 + F.pmod(F.xxhash64("i", F.lit(seed + 1)),
                                        F.lit(n - 1)))
        .withColumn("vidx", F.pmod(F.col("uidx") + F.col("shift"), F.lit(n)))
        .join(dense.select(F.col("idx").alias("uidx"),
                           F.col("id").alias("s")), "uidx")
        .join(dense.select(F.col("idx").alias("vidx"),
                           F.col("id").alias("t")), "vidx")
        .select("i", "s", "t")
    )
    samples = sc.cut(samples, "samples")
    sig, sym = _sigma_table(g, samples.select("s").distinct(), sc)
    contribs = _sample_path_contribs(sc, samples, sig, sym, seed)
    if contribs is None:
        contribs = spark.createDataFrame([], "i long, id long")
    scores = g.vertices.join(
        contribs.groupBy("id").agg(
            (F.count(F.lit(1)) / F.lit(float(r))).alias("score")),
        "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score"))
    out = {"samples": samples.persist(),
           "dist": sig.select("s", "v", "d")
           .filter(F.col("d") >= 1).persist(),
           "contribs": contribs.persist(),
           "r": r, "seed": seed, "scores": scores.persist()}
    for k in ("samples", "dist", "contribs", "scores"):
        out[k].count()
    sym.unpersist()
    sc.cleanup()
    return out


def _wsym_edges(g: Graph) -> DataFrame:
    e = g.edges.filter("src != dst").select(
        "src", "dst", F.col("weight").cast("double").alias("w"))
    if not g.directed:
        e = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst"), "w"))
    # parallel edges: keep the lightest (only it can lie on a shortest path)
    return e.groupBy("src", "dst").agg(F.min("w").alias("w"))


def weighted_betweenness(g: Graph, normalized: bool = False,
                         sources: DataFrame | None = None,
                         scale: float = 1.0,
                         max_rounds: int = 1 << 14) -> DataFrame:
    """(id, score): exact betweenness on WEIGHTED graphs — the reference
    switches to Dijkstra when ``G.isWeighted()``
    (/root/reference/networkit/cpp/centrality/Betweenness.cpp:50-96);
    same un-halved undirected convention (golden bc[2]=bc[5]=23,
    CentralityGTest.cpp:131-168). Positive weights required.

    Distributed shape — all sources simultaneously, keyed by (s, v):
      1. multi-source Bellman-Ford to the distance fixpoint (one edge
         join + min-aggregation per relax round, observed changed
         count riding the lineage cut);
      2. the shortest-path DAG as a relation:
         dag(s, u, v) ⇔ dist(s,u) + w(u,v) = dist(s,v) (the Dijkstra
         predecessor rule, bit-exact since every dist was produced as
         the min over exactly these sums);
      3. forward fixpoint for σ (path counts) and H (longest DAG hop
         depth) jointly — both stabilize in max-hop rounds, change
         count observed;
      4. backward fixpoint for the dependencies
         δ(u) = Σ_{(u,v)∈dag} σ_u/σ_v·(1 + δ(v)) — converges once the
         longest downward chain has propagated (H rounds), detected by
         an observed per-round change count on values rounded to 9
         decimals (σ and H compare exactly: path counts are integers
         below 2^53, so their float sums are order-independent; δ sums
         of ratios are not, and the 1e-9 rounding absorbs the
         partition-order ulp flap — at δ magnitudes ≥ ~1e7 per source,
         switch the stop to a relative tolerance);
      5. bc(v) = Σ_{s≠v} δ_s(v) · scale.
    """
    spark = g.edges.sparkSession
    if sources is None:
        sources = g.vertices.select(F.col("id").alias("s"))
    sym = _wsym_edges(g).repartition("src").persist()
    bad = sym.filter(F.col("w") <= 0).limit(1).count()
    if bad:
        sym.unpersist()
        raise ValueError("weighted_betweenness requires positive edge "
                         "weights (zero/negative weights break the "
                         "shortest-path DAG)")
    sc = Scratch(spark, "wbw")
    count_rows = F.count(F.lit(1)).alias("rows")

    # 1. multi-source Bellman-Ford: (s, v, dist)
    dist = sc.cut(sources.select("s", F.col("s").alias("v"),
                                 F.lit(0.0).alias("dist")), "d0")
    rnd = 0
    while True:
        rnd += 1
        if rnd > max_rounds:
            raise RuntimeError("weighted_betweenness: Bellman-Ford did "
                               f"not converge in {max_rounds} rounds")
        relax = (
            dist.join(sym.withColumnRenamed("src", "v"), "v")
            .groupBy("s", F.col("dst").alias("v"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
        )
        merged = (
            dist.join(relax, ["s", "v"], "full")
            .select("s", "v",
                    F.least(F.coalesce("dist", F.lit(float("inf"))),
                            F.coalesce("cand", F.lit(float("inf"))))
                    .alias("dist"),
                    (F.col("cand") < F.coalesce("dist", F.lit(float("inf"))))
                    .cast("long").alias("_chg"))
        )
        dist, m = sc.cut_observed(
            merged, [F.sum(F.coalesce("_chg", F.lit(0))).alias("chg")],
            keep=["s", "v", "dist"], name=f"d{rnd}")
        if int(m["chg"] or 0) == 0:
            break

    # 2. shortest-path DAG (s, u, v): one edge join per (dist-u, dist-v)
    du = dist.select("s", F.col("v").alias("u"), F.col("dist").alias("du"))
    dv = dist.select("s", F.col("v").alias("v"), F.col("dist").alias("dv"))
    dag = sc.cut(
        du.join(sym.withColumnRenamed("src", "u")
                .withColumnRenamed("dst", "v"), "u")
        .join(dv, ["s", "v"])
        .filter(F.col("du") + F.col("w") == F.col("dv"))
        .select("s", "u", "v"), "dag")

    # 3. forward σ / H fixpoint over the DAG
    state = sc.cut(
        dist.select("s", "v",
                    F.when(F.col("v") == F.col("s"), 1.0)
                    .otherwise(0.0).alias("sigma"),
                    F.lit(0).cast("long").alias("h")), "f0")
    rnd = 0
    while True:
        rnd += 1
        if rnd > max_rounds:
            raise RuntimeError("weighted_betweenness: sigma fixpoint "
                               f"did not converge in {max_rounds} rounds")
        msgs = (
            dag.join(state.select("s", F.col("v").alias("u"),
                                  F.col("sigma").alias("su"),
                                  F.col("h").alias("hu")),
                     ["s", "u"])
            .groupBy("s", "v")
            .agg(F.sum("su").alias("msig"), (F.max("hu") + 1).alias("mh"))
        )
        new = (
            state.join(msgs, ["s", "v"], "left")
            .select(
                "s", "v",
                F.when(F.col("v") == F.col("s"), 1.0)
                .otherwise(F.coalesce("msig", F.lit(0.0))).alias("nsigma"),
                F.when(F.col("v") == F.col("s"), F.lit(0).cast("long"))
                .otherwise(F.coalesce("mh", F.lit(0)).cast("long"))
                .alias("nh"),
                "sigma", "h")
            .select("s", "v", F.col("nsigma").alias("sigma"),
                    F.col("nh").alias("h"),
                    ((F.col("nsigma") != F.col("sigma"))
                     | (F.col("nh") != F.col("h"))).cast("long")
                    .alias("_chg"))
        )
        state, m = sc.cut_observed(
            new, [F.sum("_chg").alias("chg")],
            keep=["s", "v", "sigma", "h"], name=f"f{rnd}")
        if int(m["chg"] or 0) == 0:
            break

    # 4. backward δ fixpoint: δ(u) = Σ_dag σu/σv (1 + δ(v))
    delta = sc.cut(state.select("s", "v", "sigma",
                                F.lit(0.0).alias("delta")), "b0")
    rnd = 0
    while True:
        rnd += 1
        if rnd > max_rounds:
            raise RuntimeError("weighted_betweenness: delta fixpoint "
                               f"did not converge in {max_rounds} rounds")
        msgs = (
            dag.join(delta.select("s", "v", F.col("sigma").alias("sv"),
                                  F.col("delta").alias("dv")), ["s", "v"])
            .join(delta.select("s", F.col("v").alias("u"),
                               F.col("sigma").alias("su")), ["s", "u"])
            .groupBy("s", F.col("u").alias("v"))
            .agg(F.sum(F.col("su") / F.col("sv")
                       * (1.0 + F.col("dv"))).alias("nd"))
        )
        new = (
            delta.join(msgs, ["s", "v"], "left")
            .select("s", "v", "sigma",
                    F.coalesce("nd", F.lit(0.0)).alias("ndelta"), "delta")
            .select("s", "v", "sigma", F.col("ndelta").alias("delta"),
                    # relative tolerance: rounded equality can oscillate
                    # forever when a value straddles a 1e-9 rounding
                    # midpoint under partition-order float jitter
                    (F.abs(F.col("ndelta") - F.col("delta"))
                     > F.lit(1e-9) * F.greatest(F.lit(1.0),
                                                F.abs(F.col("delta"))))
                    .cast("long").alias("_chg"))
        )
        delta, m = sc.cut_observed(
            new, [F.sum("_chg").alias("chg")],
            keep=["s", "v", "sigma", "delta"], name=f"b{rnd}")
        if int(m["chg"] or 0) == 0:
            break

    bc = (
        delta.filter(F.col("s") != F.col("v"))
        .groupBy(F.col("v").alias("id"))
        .agg((F.sum("delta") * F.lit(scale)).alias("score"))
    )
    out = g.vertices.join(bc, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score"))
    if normalized:
        n = g.vertices.count()
        pairs = (n - 1) * (n - 2)
        if not g.directed:
            pairs //= 2
        out = out.select("id", (F.col("score") / F.lit(float(pairs)))
                         .alias("score"))
    out = out.persist()
    out.count()
    sym.unpersist()
    sc.cleanup()
    return out


def estimate_weighted_betweenness(g: Graph, n_samples: int, seed: int = 42,
                                  normalized: bool = False) -> DataFrame:
    """EstimateBetweenness on weighted graphs: weighted Brandes from
    hash-sampled sources, scaled by n/#samples."""
    n = g.vertices.count()
    k = min(n_samples, n)
    sources = (
        g.vertices.select(F.col("id").alias("s"))
        .orderBy(F.xxhash64("s", F.lit(seed)))
        .limit(k)
    )
    return weighted_betweenness(g, normalized=normalized, sources=sources,
                                scale=float(n) / float(k))
