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

    # LAZY normalization — ONE action per superstep. State holds the RAW
    # (unnormalized) vector; its L2 norm rides the checkpoint write as
    # the ``_norm2`` observation metric, and the NEXT step folds the
    # scalar division into its gather expression (x_k = raw_k/‖raw_k‖ is
    # a plan-time constant divide, not a job). The normalized sequence
    # is identical to eager per-step normalization: x_{k+1} =
    # T(A·x_k)/‖T(A·x_k)‖ either way. Convergence (‖x_k − x_{k-1}‖, both
    # norms known) is therefore checked one superstep LATE — the loop
    # runs at most one extra cheap step instead of one extra full job
    # per step (round-2 "What's wrong" #3).
    init_norm = (1.0 / max(n, 1)) * (max(n, 1) ** 0.5)  # ‖(1/n,…,1/n)‖₂

    def init_fn() -> DataFrame:
        return vertices.select("id", F.lit(1.0 / max(n, 1)).alias("score"),
                               F.lit(0.0).alias("_prevx"))

    def norm_of(k: int) -> float:
        """‖raw_k‖₂ of the state entering step k, from the metrics
        recorded when that state was checkpointed."""
        if runner is not None:
            m = next((m for m in reversed(runner.history)
                      if m.get("iter") == k - 1), None)
            if m is not None and m.get("norm2"):
                return float(m["norm2"]) ** 0.5 or 1.0
        return init_norm or 1.0

    def step_fn(state: DataFrame, k: int) -> DataFrame:
        nrm = norm_of(k)
        x = (F.col("score") / F.lit(nrm))
        s = state.select("id", x.alias("x"),
                         (x - F.col("_prevx")).alias("_delta"))
        gathered = (
            msgs_edges.join(s.select(F.col("id").alias("from"), "x"), "from")
            .groupBy(F.col("to").alias("id"))
            .agg(F.sum(F.col("weight") * F.col("x")).alias("gath"))
        )
        raw = (
            vertices.join(gathered, "id", "left")
            .join(s, "id", "left")
            .select(
                "id",
                transform(F.coalesce(F.col("gath"), F.lit(0.0))).alias("score"),
                F.coalesce("x", F.lit(0.0)).alias("_prevx"),
                F.coalesce("_delta", F.lit(0.0)).alias("_delta"),
            )
        )
        return raw.withColumn("_norm2", F.col("score") * F.col("score"))

    def stop_fn(metrics: dict, k: int) -> bool:
        if fixed_iters is not None:
            return k >= fixed_iters - 1
        return metrics.get("l2_delta", float("inf")) <= tol

    if runner is None:
        runner = SuperstepRunner(spark, job_id=job_id, ephemeral=True)
    out = runner.run(
        init_fn, step_fn, stop_fn,
        max_iter=(fixed_iters if fixed_iters is not None else max_iter))
    # final normalization: the last checkpoint already measured ‖raw‖₂
    last = runner.history[-1] if runner.history else None
    if last is not None and last.get("norm2"):
        total = float(last["norm2"]) ** 0.5 or 1.0
    else:  # zero supersteps ran (resume-complete or max_iter=0)
        total = float(out.agg(
            F.sqrt(F.sum(F.col("score") * F.col("score")))).collect()[0][0]
            or 1.0) or 1.0
    return out.select("id", (F.col("score") / F.lit(total)).alias("score"))


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
