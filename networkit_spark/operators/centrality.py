"""Eigenvector and Katz centrality — power iterations on the shared
superstep runner (same gather-scatter skeleton as PageRank).

Reference semantics:
  - EigenvectorCentrality (/root/reference/networkit/cpp/centrality/
    EigenvectorCentrality.cpp): x' = A·x (weighted neighbor sum over the
    symmetric adjacency), L2-normalized each step; stop when
    Σ|x'-x| ≤ n·tol (the reference scales tol by vector length); final
    scores normalized to unit max... (we keep unit L2, matching run()).
  - KatzCentrality (/root/reference/networkit/cpp/centrality/
    KatzCentrality.cpp:19-55): x' = α·Aᵀ·x + β each step, L2-normalized;
    stop when the score-vector change ≤ tol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import SuperstepRunner


def _power_iteration(
    g: Graph,
    transform,  # (gathered_col,) -> new score expression
    pull_in_edges: bool,
    tol: float,
    max_iter: int,
    runner: SuperstepRunner | None,
    job_id: str,
    fixed_iters: int | None = None,
) -> DataFrame:
    spark = g.edges.sparkSession
    n = g.num_vertices()
    vertices = g.vertices
    e = g.symmetrized() if not g.directed else g.edges
    if pull_in_edges:
        msgs_edges = e.select(F.col("src").alias("from"), F.col("dst").alias("to"), "weight")
    else:
        msgs_edges = e.select(F.col("dst").alias("from"), F.col("src").alias("to"), "weight")
    msgs_edges = msgs_edges.persist()

    def init_fn() -> DataFrame:
        return vertices.select("id", F.lit(1.0 / max(n, 1)).alias("score"))

    def step_fn(state: DataFrame, k: int) -> DataFrame:
        s = state.select("id", "score")
        gathered = (
            msgs_edges.join(s.withColumnRenamed("id", "from"), "from")
            .groupBy(F.col("to").alias("id"))
            .agg(F.sum(F.col("weight") * F.col("score")).alias("gath"))
        )
        raw = (
            vertices.join(gathered, "id", "left")
            .select("id", transform(F.coalesce(F.col("gath"), F.lit(0.0))).alias("raw"))
        )
        total = raw.agg(F.sqrt(F.sum(F.col("raw") * F.col("raw")))).collect()[0][0]
        total = float(total or 1.0) or 1.0
        return (
            raw.join(s.select("id", F.col("score").alias("_prev")), "id", "left")
            .select(
                "id",
                (F.col("raw") / F.lit(total)).alias("score"),
                ((F.col("raw") / F.lit(total))
                 - F.coalesce("_prev", F.lit(0.0))).alias("_delta"),
            )
        )

    def stop_fn(metrics: dict, k: int) -> bool:
        if fixed_iters is not None:
            return k >= fixed_iters - 1
        return metrics.get("l2_delta", float("inf")) <= tol

    if runner is None:
        runner = SuperstepRunner(spark, job_id=job_id, ephemeral=True)
    return runner.run(
        init_fn, step_fn, stop_fn,
        max_iter=(fixed_iters if fixed_iters is not None else max_iter))


def eigenvector_centrality(g: Graph, tol: float = 1e-9, max_iter: int = 500,
                           runner: SuperstepRunner | None = None,
                           fixed_iters: int | None = None) -> DataFrame:
    """(id, score), unit L2 norm. ``fixed_iters`` = deterministic
    k-step variant (SQL-oracle parity in the driver gate)."""
    return _power_iteration(
        g, transform=lambda gath: gath, pull_in_edges=True,
        tol=tol, max_iter=max_iter, runner=runner, job_id="eigen-anon",
        fixed_iters=fixed_iters,
    )


def katz_centrality(g: Graph, alpha: float = 5e-4, beta: float = 0.1,
                    tol: float = 1e-8, max_iter: int = 500,
                    runner: SuperstepRunner | None = None,
                    fixed_iters: int | None = None) -> DataFrame:
    """(id, score), unit L2 norm; x' = α·(neighbor sum) + β."""
    return _power_iteration(
        g, transform=lambda gath: F.lit(alpha) * gath + F.lit(beta),
        pull_in_edges=True, tol=tol, max_iter=max_iter, runner=runner,
        job_id="katz-anon", fixed_iters=fixed_iters,
    )
