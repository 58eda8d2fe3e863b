"""Algebraic distance — iterative load smoothing (Chen & Safro).

Reference: /root/reference/networkit/cpp/distance/AlgebraicDistance.cpp:
17-100 — K independent "systems" of random loads in [0,1), smoothed for
L iterations by x_u ← (1−ω)·x_u + ω·(Σ_v w(u,v)·x_v / Σ_v w(u,v));
distance(u,v) = ‖x_u − x_v‖_norm over systems (max for norm=0); the
withEdgeScores mode scores every existing edge. The reference also
min-max normalizes loads per system before measuring — at fixed small L
the raw-load distances preserve the same ordering, and we keep loads
raw so the md5-seeded variant stays SQL-reproducible.

Distributed shape: the K loads are K columns of one per-vertex state
DataFrame; a smoothing iteration is ONE edge join + ONE aggregation
computing all K weighted means (vectorized column expressions), blended
with (1−ω). Deterministic counter-based init: xxhash64 by default,
``rng="md5"`` for DuckDB-oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import SuperstepRunner
from networkit_spark.sources.generators import _u01, _u01_md5


def algebraic_loads(g: Graph, n_systems: int = 10, n_iters: int = 30,
                    omega: float = 0.5, seed: int = 42,
                    rng: str = "xxhash64",
                    runner: SuperstepRunner | None = None) -> DataFrame:
    """(id, x0..x{K-1}): smoothed loads after ``n_iters`` iterations."""
    spark = g.edges.sparkSession
    u01 = _u01_md5 if rng == "md5" else _u01
    e = g.edges.filter("src != dst").select(
        "src", "dst", F.col("weight").cast("double").alias("w"))
    sym = e if g.directed else e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    sym = sym.repartition("src").persist()
    sym.count()
    cols = [f"x{i}" for i in range(n_systems)]

    def init_fn() -> DataFrame:
        return g.vertices.select(
            "id", *[u01(F.col("id"), F.lit(i), F.lit(seed)).alias(c)
                    for i, c in enumerate(cols)])

    def step_fn(state: DataFrame, k: int) -> DataFrame:
        msgs = sym.join(state.withColumnRenamed("id", "src"), "src")
        means = msgs.groupBy(F.col("dst").alias("id")).agg(
            *[(F.sum(F.col("w") * F.col(c)) / F.sum("w")).alias(f"m{i}")
              for i, c in enumerate(cols)])
        out = state.join(means, "id", "left").select(
            "id",
            *[F.when(F.col(f"m{i}").isNotNull(),
                     (1.0 - omega) * F.col(c) + omega * F.col(f"m{i}"))
              .otherwise(F.col(c)).alias(c)
              for i, c in enumerate(cols)])
        return out

    def stop_fn(metrics: dict, k: int) -> bool:
        return k >= n_iters - 1

    def finalize_fn(state: DataFrame) -> DataFrame:
        sym.unpersist()
        return state

    if runner is None:
        runner = SuperstepRunner(spark, job_id="algdist-anon", ephemeral=True)
    return runner.run(init_fn, step_fn, stop_fn, max_iter=n_iters,
                      finalize_fn=finalize_fn)


def algebraic_edge_scores(g: Graph, n_systems: int = 10, n_iters: int = 30,
                          omega: float = 0.5, norm: int = 2, seed: int = 42,
                          rng: str = "xxhash64") -> DataFrame:
    """(lo, hi, score): ‖x_u − x_v‖ per existing edge (withEdgeScores)."""
    loads = algebraic_loads(g, n_systems, n_iters, omega, seed, rng)
    cols = [f"x{i}" for i in range(n_systems)]
    e = g.edges.filter("src != dst").select(
        F.least("src", "dst").alias("lo"),
        F.greatest("src", "dst").alias("hi")).distinct()
    lu = loads.select(F.col("id").alias("lo"),
                      *[F.col(c).alias(f"a{i}") for i, c in enumerate(cols)])
    lv = loads.select(F.col("id").alias("hi"),
                      *[F.col(c).alias(f"b{i}") for i, c in enumerate(cols)])
    j = e.join(lu, "lo").join(lv, "hi")
    diffs = [F.abs(F.col(f"a{i}") - F.col(f"b{i}"))
             for i in range(n_systems)]
    if norm == 0:
        dist = F.greatest(*diffs) if len(diffs) > 1 else diffs[0]
    else:
        total = None
        for d in diffs:
            term = F.pow(d, float(norm))
            total = term if total is None else total + term
        dist = F.pow(total, 1.0 / norm)
    return j.select("lo", "hi", dist.alias("score"))
