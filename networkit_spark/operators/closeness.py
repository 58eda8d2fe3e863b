"""Closeness family + eccentricity + diameter over multi-source BFS.

Reference semantics:
  - Closeness.cpp:33-66 — closeness(s) = 1/Σ_t dist(s,t) over REACHABLE
    t; normalized multiplies by (n−1); undefined on disconnected graphs
    when checkConnectedness (we mirror the throw).
  - HarmonicCloseness.cpp:20-50 — harmonic(s) = Σ_{t≠s} 1/dist(s,t)
    (unreachable contributes 0 — no connectedness requirement);
    normalized divides by (n−1).
  - ApproxCloseness.cpp — sampled-source estimator: Σdist estimated as
    (n/k)·Σ_{sampled s} dist(s, v). Undirected only — the estimator
    aggregates over the TARGET side and relies on BFS symmetry.
  - TopCloseness.cpp — top-k by (closeness desc, id asc). The
    reference prunes per-node BFS with NBcut bounds; distributed batch
    BFS computes all sources at once, so ranking the full result is the
    natural equivalent (the pruning exists to serialize less work on one
    machine, not to change the answer).
  - Eccentricity.cpp / Diameter.cpp — ecc(v) = max dist; exact diameter
    = max ecc; the estimate mode is the classic double-sweep lower
    bound.

All built on the batched multi-source BFS of operators/betweenness
(levels[l] = vertices first reached at distance l, parquet-cut per
level into the shared NKS_STATE_DIR scratch — cluster-portable):
distances never materialize as an n×n table — per-source aggregates
fold each level as it streams. ``_dist_rows`` returns ``rows=None``
when no vertex is reached beyond distance 0 (edgeless graph); every
caller guards that and returns the all-zero result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.betweenness import _brandes
from networkit_spark.plans.scratch import Scratch


#: all-source exact BFS is inherently O(n·m); above this vertex count the
#: sampled variants (approx_closeness / estimate_* / double-sweep) are the
#: intended path — warn so n BFS sources can't start by accident at scale.
ALL_SOURCE_WARN_N = 100_000


def _dist_rows(g: Graph, sources: DataFrame | None = None):
    """(s, v, d) for all finite distances d ≥ 1, via BFS strata.
    Returns (rows_or_None, scratch) — caller cleans up the scratch."""
    if sources is None:
        sources = g.vertices.select(F.col("id").alias("s"))
        n = g.vertices.count()
        if n > ALL_SOURCE_WARN_N:
            import warnings

            warnings.warn(
                f"all-source exact BFS over n={n} vertices is O(n·m); "
                "use approx_closeness / estimate_betweenness / "
                "diameter(estimate=True) at this scale",
                ResourceWarning, stacklevel=3)
    sc = Scratch(g.edges.sparkSession, "close")
    levels, sym = _brandes(g, sources, sc)
    rows = None
    for l, lv in enumerate(levels):
        if l == 0:
            continue
        r = lv.select("s", "v", F.lit(l).cast("long").alias("d"))
        rows = r if rows is None else rows.union(r)
    sym.unpersist()
    return rows, sc


def _zero_scores(g: Graph) -> DataFrame:
    out = g.vertices.select("id", F.lit(0.0).alias("score")).persist()
    out.count()
    return out


def closeness(g: Graph, normalized: bool = False,
              check_connected: bool = True) -> DataFrame:
    """(id, score): 1/Σdist, reference Closeness.cpp semantics."""
    if check_connected:
        from networkit_spark.operators.components import (
            connected_components, num_components)
        if num_components(connected_components(g)) != 1:
            raise ValueError("Closeness is undefined on disconnected graphs")
    rows, sc = _dist_rows(g)
    if rows is None:
        sc.cleanup()
        return _zero_scores(g)
    n = g.vertices.count()
    agg = rows.groupBy("s").agg((1.0 / F.sum("d")).alias("score"))
    if normalized:
        agg = agg.select("s", (F.col("score") * F.lit(float(n - 1)))
                         .alias("score"))
    out = g.vertices.join(agg.withColumnRenamed("s", "id"), "id", "left") \
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score")) \
        .persist()
    out.count()
    sc.cleanup()
    return out


def harmonic_closeness(g: Graph, normalized: bool = False) -> DataFrame:
    """(id, score): Σ 1/dist — defined on disconnected graphs."""
    rows, sc = _dist_rows(g)
    if rows is None:
        sc.cleanup()
        return _zero_scores(g)
    n = g.vertices.count()
    agg = rows.groupBy("s").agg(F.sum(1.0 / F.col("d")).alias("score"))
    if normalized:
        agg = agg.select("s", (F.col("score") / F.lit(float(n - 1)))
                         .alias("score"))
    out = g.vertices.join(agg.withColumnRenamed("s", "id"), "id", "left") \
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score")) \
        .persist()
    out.count()
    sc.cleanup()
    return out


def approx_closeness(g: Graph, n_samples: int, seed: int = 42,
                     normalized: bool = False) -> DataFrame:
    """ApproxCloseness: closeness from k hash-sampled BFS sources —
    Σdist(v) estimated as (n/k)·Σ_{sampled s} dist(s, v). Exact when
    n_samples ≥ n. Undirected graphs only: the estimator aggregates
    distances over the TARGET side, which equals source-side closeness
    only by BFS symmetry."""
    if g.directed:
        raise ValueError(
            "approx_closeness requires an undirected graph (target-side "
            "aggregation relies on BFS symmetry); use closeness() or "
            "harmonic_closeness() on directed graphs")
    n = g.vertices.count()
    k = min(n_samples, n)
    sources = (
        g.vertices.select(F.col("id").alias("s"))
        .orderBy(F.xxhash64("s", F.lit(seed))).limit(k)
    )
    rows, sc = _dist_rows(g, sources)
    if rows is None:
        sc.cleanup()
        return _zero_scores(g)
    # aggregate over TARGET v: by symmetry of undirected BFS this
    # estimates each v's distance sum from the sampled sources
    agg = rows.groupBy(F.col("v").alias("id")).agg(
        (1.0 / (F.sum("d") * F.lit(float(n) / float(k)))).alias("score"))
    if normalized:
        agg = agg.select("id", (F.col("score") * F.lit(float(n - 1)))
                         .alias("score"))
    out = g.vertices.join(agg, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")).persist()
    out.count()
    sc.cleanup()
    return out


def top_closeness(g: Graph, k: int, normalized: bool = False) -> DataFrame:
    """TopCloseness: the k most-central nodes (closeness desc, id asc)."""
    return (closeness(g, normalized=normalized, check_connected=False)
            .orderBy(F.desc("score"), F.asc("id")).limit(k))


def eccentricity(g: Graph) -> DataFrame:
    """(id, ecc): max finite distance per node (Eccentricity.cpp)."""
    rows, sc = _dist_rows(g)
    if rows is None:
        sc.cleanup()
        out = g.vertices.select(
            "id", F.lit(0).cast("long").alias("ecc")).persist()
        out.count()
        return out
    agg = rows.groupBy(F.col("s").alias("id")).agg(F.max("d").alias("ecc"))
    out = g.vertices.join(agg, "id", "left").select(
        "id", F.coalesce("ecc", F.lit(0)).cast("long").alias("ecc")).persist()
    out.count()
    sc.cleanup()
    return out


def diameter(g: Graph, algo: str = "exact", seed: int = 42) -> int:
    """Exact diameter (max eccentricity over all-source BFS) or the
    double-sweep lower-bound estimate (Diameter.cpp estimate modes):
    BFS from a pivot, then BFS from its farthest node — 2 BFS total."""
    if algo == "exact":
        rows, sc = _dist_rows(g)
        if rows is None:
            sc.cleanup()
            return 0
        d = rows.agg(F.max("d")).collect()[0][0]
        sc.cleanup()
        return int(d or 0)
    if algo != "estimate":
        raise ValueError(f"unknown diameter algo: {algo}")
    pivot = (g.vertices.orderBy(F.xxhash64("id", F.lit(seed)))
             .limit(1).collect()[0]["id"])
    spark = g.edges.sparkSession
    s1 = spark.createDataFrame([(int(pivot),)], "s long")
    rows, sc = _dist_rows(g, s1)
    if rows is None:
        sc.cleanup()
        return 0
    far = rows.orderBy(F.desc("d"), F.asc("v")).limit(1).collect()
    sc.cleanup()
    if not far:
        return 0
    s2 = spark.createDataFrame([(int(far[0]["v"]),)], "s long")
    rows2, sc2 = _dist_rows(g, s2)
    if rows2 is None:
        sc2.cleanup()
        return 0
    d = rows2.agg(F.max("d")).collect()[0][0]
    sc2.cleanup()
    return int(d or 0)


def estimated_vertex_diameter_pedantic(g: Graph) -> int:
    """Upper bound on the VERTEX diameter (#nodes on a longest shortest
    path), reference Diameter.cpp estimatedVertexDiameterPedantic:
    one BFS per connected component from an arbitrary root; any s-t
    shortest path has length ≤ dist(root,s) + dist(root,t) ≤
    maxDist + maxDist2, so vd ≤ maxDist + maxDist2 + 1. On weighted
    graphs the reference returns the largest component size.

    Distributed shape: ONE connected-components run + ONE batched
    multi-source BFS (all component roots simultaneously) + a top-2
    window over the distance rows."""
    from networkit_spark.operators.components import connected_components
    from pyspark.sql import Window

    labels = connected_components(g)
    if g.weighted:
        sizes = labels.groupBy("component").agg(
            F.count(F.lit(1)).alias("n")).agg(F.max("n")).collect()[0][0]
        return int(sizes or 0)
    roots = labels.select(F.col("component").alias("s")).distinct()
    rows, sc = _dist_rows(g, roots)
    if rows is None:
        sc.cleanup()
        return 1 if g.vertices.limit(1).count() else 0
    # include the root itself at d=0 so 1- and 2-node components count
    rows = rows.select("s", "d").union(
        roots.select("s", F.lit(0).cast("long").alias("d")))
    w2 = Window.partitionBy("s").orderBy(F.desc("d"))
    top2 = (rows.withColumn("rn", F.row_number().over(w2))
            .filter("rn <= 2")
            .groupBy("s")
            .agg(F.max("d").alias("d1"),
                 (F.sum("d") - F.max("d")).alias("d2")))
    vd = top2.agg(F.max(F.col("d1") + F.col("d2"))).collect()[0][0]
    sc.cleanup()
    return int(vd or 0) + 1


def estimated_vertex_diameter(g: Graph, n_samples: int,
                              seed: int = 42) -> int:
    """Sampled vertex-diameter estimate (Diameter.cpp
    estimatedVertexDiameter): BFS from ``n_samples`` hash-sampled
    roots, vd = max over roots of (maxDist + maxDist2 + 1) — all
    sampled BFS run in ONE batched multi-source pass."""
    from pyspark.sql import Window

    n = g.vertices.count()
    if n == 0:
        return 0
    k = min(n_samples, n)
    sources = (g.vertices.select(F.col("id").alias("s"))
               .orderBy(F.xxhash64("id", F.lit(seed))).limit(k))
    rows, sc = _dist_rows(g, sources)
    if rows is None:
        sc.cleanup()
        return 1
    rows = rows.select("s", "d").union(
        sources.select("s", F.lit(0).cast("long").alias("d")))
    w2 = Window.partitionBy("s").orderBy(F.desc("d"))
    top2 = (rows.withColumn("rn", F.row_number().over(w2))
            .filter("rn <= 2")
            .groupBy("s")
            .agg(F.max("d").alias("d1"),
                 (F.sum("d") - F.max("d")).alias("d2")))
    vd = top2.agg(F.max(F.col("d1") + F.col("d2"))).collect()[0][0]
    sc.cleanup()
    return int(vd or 0) + 1


def diameter_range(g: Graph, error: float = 0.0,
                   seed: int = 42) -> tuple[int, int]:
    """[lb, ub] diameter bounds by the SumSweep-style bound-tightening of
    Diameter.cpp estimatedDiameterRange (Borassi et al., "Fast diameter
    and radius BFS-based computation…"): per-node eccentricity bounds
    refined by repeated single-BFS-per-component sweeps until
    ub ≤ lb + error·lb. With ``error=0`` this returns the EXACT diameter
    (lb == ub) in typically a handful of BFS rounds — the scalable exact
    path (the all-pairs mode is quadratic).

    Distributed shape: per round ONE batched multi-source BFS (one root
    per component, all simultaneously) + per-node bound updates as pure
    column expressions over a vertex-sized state cut; the driver holds
    only (lb, ub) scalars. Root selection is the reference's even/odd
    alternation (max-upper-bound node / central-but-far node).

    Undirected unweighted only (reference throws likewise)."""
    if g.directed or g.weighted:
        raise ValueError("estimatedDiameterRange: directed or weighted "
                         "graphs are not supported (Diameter.cpp:84)")
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.degrees import out_degrees

    spark = g.edges.sparkSession
    n = g.vertices.count()
    if n == 0:
        return (0, 0)
    sc = Scratch(spark, "diamr")
    labels = sc.cut(connected_components(g), "cc")  # (id, component)
    deg = out_degrees(g).select("id", F.col("degree").alias("deg"))
    # state: per-node eccentricity bounds + last-BFS distance
    state = sc.cut(
        labels.join(deg, "id", "left")
        .select("id", F.col("component").alias("comp"),
                F.coalesce("deg", F.lit(0)).alias("deg"),
                F.lit(0).cast("long").alias("lb"),
                F.lit(n).cast("long").alias("ub"),
                F.lit(0).cast("long").alias("dist")), "st0")

    def run_sweep(state, roots, rnd):
        """One multi-source BFS from ``roots`` (id, comp); returns the
        updated state (same schema, dist = distances from this sweep)."""
        rows, bsc = _dist_rows(g, roots.select(F.col("id").alias("s")))
        src_comp = roots.select(F.col("id").alias("s"),
                                F.col("comp").alias("comp"))
        if rows is None:
            dists = src_comp.select("comp", F.col("s").alias("id"),
                                    F.lit(0).cast("long").alias("d"))
        else:
            dists = rows.join(src_comp, "s").select(
                "comp", F.col("v").alias("id"), "d").union(
                src_comp.select("comp", F.col("s").alias("id"),
                                F.lit(0).cast("long").alias("d")))
        percomp = (dists.join(deg.withColumnRenamed("deg", "dg"), "id")
                   .groupBy("comp")
                   .agg(F.max("d").alias("ecc"),
                        F.min(F.when(F.col("dg") > 1, F.col("d")))
                        .alias("dist_first")))
        new = (
            state.drop("dist", "dist_first")
            .join(dists.select("id", "d"), "id", "left")
            .withColumn("dist", F.coalesce("d", F.lit(0))).drop("d")
            .join(percomp, "comp", "left")
            .withColumn("ecc", F.coalesce("ecc", F.lit(0)))
            .withColumn("dist_first",
                        F.coalesce("dist_first", F.lit(0)))
            .withColumn("eccval",
                        F.greatest(F.col("dist"),
                                   F.col("ecc") - F.col("dist")))
            .select(
                "id", "comp", "deg",
                F.greatest("lb", "eccval").alias("lb"),
                F.when(F.col("dist") <= F.col("dist_first"),
                       F.col("eccval"))
                .otherwise(F.least(
                    F.col("ub"),
                    F.col("dist") + F.col("ecc")
                    - 2 * F.col("dist_first"))).alias("ub"),
                "dist",
                F.col("dist_first").alias("dist_first"))
        )
        out, m = sc.cut_observed(
            new, [F.max("lb").alias("lb"), F.max("ub").alias("ub")],
            keep=["id", "comp", "deg", "lb", "ub", "dist", "dist_first"],
            name=f"st{rnd}")
        bsc.cleanup()
        return out, int(m["lb"] or 0), int(m["ub"] or 0)

    # round 0: max-degree node per component
    roots0 = (state.groupBy("comp")
              .agg(F.max_by(F.col("id"),
                            F.struct(F.col("deg"), F.col("id"))).alias("id"))
              .select("id", "comp"))
    state, lb, ub = run_sweep(state, roots0, 0)
    i = 0
    while ub > lb + error * lb and i < 2 * n:
        if i % 2 == 0:
            # farthest / largest-upper-bound node per component
            roots = (state.groupBy("comp")
                     .agg(F.max_by(F.col("id"),
                                   F.struct(F.col("ub"), F.col("dist"),
                                            -F.col("id"))).alias("id"))
                     .select("id", "comp"))
        else:
            # central node close to the previous far node: minimize
            # lb + dist among nodes beyond dist_first, tie → larger dist
            cand = state.filter(F.col("dist") > F.col("dist_first"))
            picked = (cand.groupBy("comp")
                      .agg(F.min_by(F.col("id"),
                                    F.struct(F.col("lb") + F.col("dist"),
                                             -F.col("dist"),
                                             F.col("id"))).alias("id")))
            fallback = (state.groupBy("comp")
                        .agg(F.min("id").alias("fid")))
            roots = (fallback.join(picked, "comp", "left")
                     .select(F.coalesce("id", "fid").alias("id"), "comp"))
        i += 1
        state, lb, ub = run_sweep(state, roots, i)
    sc.cleanup()
    return (lb, ub)


def group_degree(g: Graph, k: int) -> list[int]:
    """GroupDegree.cpp greedy: repeatedly add the node covering the most
    uncovered neighbors. k driver rounds of one aggregation each —
    driver-bound in k only (each round is one distributed agg + a
    1-row collect), fine for the small group sizes the reference
    targets; not meant for k in the thousands."""
    sym = g.edges.filter("src != dst").select("src", "dst")
    sym = sym.union(sym.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst"))).distinct().persist()
    covered = None
    group: list[int] = []
    for _ in range(k):
        cand = sym
        if group:
            in_group = F.col("src").isin(group)
            cand = cand.filter(~in_group)
        if covered is not None:
            cand = cand.join(covered, cand.dst == covered.c, "left_anti")
        best = (cand.groupBy("src").agg(F.count(F.lit(1)).alias("gain"))
                .orderBy(F.desc("gain"), F.asc("src")).limit(1).collect())
        if not best:
            break
        pick = int(best[0]["src"])
        group.append(pick)
        newly = sym.filter(F.col("src") == pick).select(
            F.col("dst").alias("c"))
        covered = newly if covered is None else covered.union(newly).distinct()
        covered = covered.persist()
    sym.unpersist()
    return group


def group_closeness(g: Graph, k: int) -> list[int]:
    """GroupCloseness.cpp greedy: grow a k-set S maximizing group
    closeness — each round add the node u with the largest improvement
    Σ_v max(0, d(S, v) − d(u, v)) (computeImprovement semantics, exact
    distances; the reference's H-bounded BFS is a serial-work heuristic,
    not a semantic difference). Ties break to the smaller id.

    Distributed shape: ONE batched all-source BFS up front (the dist
    table (u, v, d) — the same strata substrate as closeness), then k
    driver rounds of one join + one aggregation each: d(S, ·) is a
    vertex-sized column updated by least() after each pick. Unreachable
    pairs use the sentinel 2n (> any finite distance)."""
    n = g.vertices.count()
    if k <= 0 or n == 0:
        return []
    rows, sc = _dist_rows(g)
    if rows is None:
        # edgeless: any k nodes are optimal; smallest ids, det.
        ids = [r["id"] for r in
               g.vertices.orderBy("id").limit(k).collect()]
        sc.cleanup()
        return ids
    inf = float(2 * n)
    dist = sc.cut(
        rows.select(F.col("s").alias("u"), "v",
                    F.col("d").cast("double").alias("d"))
        .union(g.vertices.select(F.col("id").alias("u"),
                                 F.col("id").alias("v"),
                                 F.lit(0.0).alias("d"))),
        "gcdist")
    cur = g.vertices.select(F.col("id").alias("v"), F.lit(inf).alias("cd"))
    group: list[int] = []
    for _ in range(min(k, n)):
        gain = (
            dist.join(cur, "v")
            .groupBy("u")
            .agg(F.sum(F.greatest(F.col("cd") - F.col("d"), F.lit(0.0)))
                 .alias("gain"))
        )
        if group:
            gain = gain.filter(~F.col("u").isin(group))
        best = gain.orderBy(F.desc("gain"), F.asc("u")).limit(1).collect()
        if not best:
            break
        pick = int(best[0]["u"])
        group.append(pick)
        newd = dist.filter(F.col("u") == pick).select("v", F.col("d").alias("nd"))
        cur = sc.cut(
            cur.join(newd, "v", "left")
            .select("v", F.least("cd", F.coalesce("nd", F.lit(inf)))
                    .alias("cd")),
            f"gc{len(group)}")
    sc.cleanup()
    return group
