"""All simple paths between two vertices (bounded length).

Reference: /root/reference/networkit/cpp/distance/AllSimplePaths.h
(directed unweighted source→target enumeration with a cutoff) — the
reference prunes with a reverse-reachability pass then DFS-enumerates.

Spark shape: level-synchronous path extension — the frontier is a
DataFrame of partial simple paths (last, path); each round ONE edge
join extends every partial path in parallel, `array_contains` rejects
revisits (simple-path constraint), and paths reaching the target leave
the frontier. Rounds = cutoff, each a single shuffle; the result set is
inherently combinatorial, so ``cutoff`` is mandatory — at 100 TB you
bound the work by path length exactly like the reference's cutoff, and
the per-round parquet cut keeps the plan linear.

Undirected graphs traverse the symmetrized edges (the reference accepts
directed; undirected is the G.toUndirected() composition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.scratch import Scratch


def all_simple_paths(g: Graph, source: int, target: int,
                     cutoff: int = 8) -> DataFrame:
    """(path: array<long>): every simple path source→…→target with at
    most ``cutoff`` edges."""
    if cutoff < 1:
        raise ValueError("cutoff must be >= 1")
    spark = g.edges.sparkSession
    if int(source) == int(target):
        return spark.createDataFrame([([int(source)],)],
                                     "path array<long>")
    e = g.edges.filter("src != dst").select("src", "dst")
    sym = e if g.directed else e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.distinct().repartition("src").persist()

    sc = Scratch(spark, "asp")
    frontier = spark.createDataFrame(
        [(int(source), [int(source)])], "last long, path array<long>")
    done = None
    for level in range(cutoff):
        ext = (
            frontier.join(sym.withColumnRenamed("src", "last"), "last")
            .filter(~F.array_contains("path", F.col("dst")))
            .select(F.col("dst").alias("last"),
                    F.concat("path", F.array("dst")).alias("path"))
        )
        arrived = ext.filter(F.col("last") == target).select("path")
        done = arrived if done is None else done.union(arrived)
        frontier = ext.filter(F.col("last") != target)
        if level < cutoff - 1:
            frontier = sc.cut(frontier, f"f{level}")
            if not frontier.limit(1).count():
                break
    out = done.select("path").persist()
    out.count()
    sym.unpersist()
    sc.cleanup()
    return out


def commute_time_distances(g: Graph, max_n: int = 20_000) -> DataFrame:
    """(u, v, ectd): exact effective-commute-time distance for every
    connected pair, ECTD(u,v) = vol(G) · (L⁺_uu + L⁺_vv − 2·L⁺_uv)
    (reference cpp/distance/CommuteTimeDistance.cpp exact mode — which
    solves one Laplacian system per pair with a sequential CG solver;
    the pseudoinverse here is the same closed form).

    The Laplacian pseudoinverse is inherently a dense linear-algebra
    object — O(n²) output — so this is a DRIVER-SIDE operator with a
    hard ``max_n`` guard, exactly like the reference's exact mode is
    single-machine. For approximate resistance at scale the reference
    uses JLT sketching (approx mode), declared out of scope."""
    import numpy as np

    if g.directed:
        raise ValueError("commute time / effective resistance is an "
                         "undirected-graph notion")
    ids = [r["id"] for r in g.vertices.select("id").orderBy("id").collect()]
    n = len(ids)
    if n > max_n:
        raise ValueError(
            f"commute_time_distances is the reference's exact single-"
            f"machine mode (n² dense pinv); n={n} exceeds max_n={max_n}")
    pos = {v: i for i, v in enumerate(ids)}
    A = np.zeros((n, n))
    for r in g.edges.select("src", "dst", "weight").collect():
        u, v, w = pos[r["src"]], pos[r["dst"]], float(r["weight"])
        if u == v:
            continue
        A[u, v] += w
        A[v, u] += w
    vol = A.sum()
    L = np.diag(A.sum(axis=1)) - A
    Lp = np.linalg.pinv(L)
    rows = []
    for i in range(n):
        for j in range(i + 1, n):
            ectd = vol * (Lp[i, i] + Lp[j, j] - 2 * Lp[i, j])
            rows.append((ids[i], ids[j], float(ectd)))
    return g.edges.sparkSession.createDataFrame(
        rows, "u long, v long, ectd double")
