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
