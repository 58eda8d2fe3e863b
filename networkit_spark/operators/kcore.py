"""Core decomposition (k-core numbers) — distributed h-index fixpoint.

Reference semantics: /root/reference/networkit/cpp/centrality/
CoreDecomposition.cpp:46-95 (ParK level-synchronous peeling): a node's
core number is the level at which peeling removes it; isolated nodes get
core 0.

Spark formulation: the h-operator fixpoint (Montresor, De Pellegrini,
Miorandi, "Distributed k-core decomposition", 2011). Start from
c₀(v) = deg(v); each superstep sets

    c_{t+1}(v) = min(c_t(v), H({c_t(u) : u ∈ N(v)}))

where H is the h-index (the largest k such that at least k neighbors
have value ≥ k). The sequence is monotone non-increasing and converges
exactly to the core numbers. Unlike peeling, every vertex keeps explicit
state every round — the round-1 peeling implementation silently dropped
vertices whose residual degree hit 0 mid-level (a K1,3 star center was
assigned core 0 instead of 1); the fixpoint formulation cannot lose
vertices by construction.

Execution per superstep (all built-in, no Python in the loop):
  1. message join: edges ⋈ state on src → (dst, c_src) — one hash join,
     edge-sized;
  2. h-index via HISTOGRAM, not a per-message sort: group by (dst, c)
     → cnt (partial hash agg compresses the shuffle to distinct
     (dst, c) pairs — a hub's 10⁵ messages collapse to its few distinct
     neighbor-core values), then ONE aggregation per dst folds the
     sorted (c, cnt) array to h = max(least(c, cum)) with
     sort_array + aggregate (round 4: this replaced a window pass —
     partitionBy dst + sort — deleting a whole shuffle+sort per
     superstep). Equivalence to the h-index: for the true h*, the
     smallest distinct value c ≥ h* has cum(c) = cnt_ge(h*) ≥ h* so the
     max reaches h*; conversely any min(c, cum(c)) = k satisfies
     cnt_ge(k) ≥ cum(c) ≥ k, so k ≤ h*. (Chaining multiple
     h-applications per checkpoint WITHOUT pinning was measured and
     rejected: each application references its input twice, so the
     un-materialized chain RECOMPUTES state 2^k times — inner=4 was
     2.3× slower despite 3.5× fewer checkpoints. With each intermediate
     persist()-ed the chain is linear; at sf0.1 the state is small
     enough that checkpoint cost is noise and inner=1 vs 3 measure at
     parity — see core_decomposition's docstring.)
  3. new state: vertices left-join h, least(old, h), with `_changed`
     feeding the runner's convergence metric.
Iteration count is bounded by the graph's degeneracy ordering depth —
single digits on power-law graphs (long induced paths are the slow case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import SuperstepRunner


def core_decomposition(g: Graph, max_iter: int = 1000,
                       runner: SuperstepRunner | None = None,
                       inner: int = 1) -> DataFrame:
    """(id, core): k-core number per vertex. Isolated nodes get 0.

    ``inner`` = h-applications per durable superstep, each intermediate
    pinned with persist() (the persist is what makes this safe — the
    UN-persisted chain re-computes its doubly-referenced input 2^k
    times, measured 2.3x slower). Warm-JVM A/B at sf0.1 measured
    inner=1 and inner=3 at parity (~26s both): with a 20k-row state the
    per-superstep parquet write is negligible, so fewer checkpoints buy
    nothing here. The knob exists for the regime where it does pay —
    GB-sized states whose durable write dominates the superstep — at
    the cost of resume replaying up to inner-1 applications."""
    spark = g.edges.sparkSession
    e = g.edges.filter("src != dst").select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).repartition("src").persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))
    vertices = g.vertices.join(deg, "id", "left").select(
        "id", F.coalesce("deg", F.lit(0)).cast("long").alias("deg")).persist()
    vertices.count()

    def init_fn() -> DataFrame:
        return vertices.select("id", F.col("deg").cast("long").alias("core"))

    def h_apply(state: DataFrame) -> DataFrame:
        # Full recompute every application. A dirty-fringe variant
        # (recompute only neighbors of changed vertices) was measured
        # SLOWER on dense co-occurrence graphs: the fringe of even a
        # small changed set covers most of the graph via hubs, and
        # change counts move in non-monotone waves — the two extra
        # semi-joins cost more than the pruning saves.
        msgs = sym.join(
            state.select(F.col("id").alias("src"), F.col("core").alias("c")),
            "src").select("dst", "c")
        hist = msgs.groupBy("dst", "c").agg(F.count(F.lit(1)).alias("cnt"))
        # h-index from the per-dst histogram in ONE aggregation: collect
        # the (c, cnt) pairs, sort descending, fold a running cumsum —
        # h = max over distinct values of least(c, cum). The fold replaces
        # the earlier window pass (partitionBy dst + sort), removing one
        # whole shuffle+sort per superstep; the array holds only the
        # DISTINCT neighbor-core values (≤ min(deg, max_core) entries),
        # so a hub's array stays small even at cluster scale.
        pairs = F.sort_array(F.collect_list(F.struct("c", "cnt")),
                             asc=False)
        fold = F.aggregate(
            pairs,
            F.struct(F.lit(0).cast("long").alias("cum"),
                     F.lit(0).cast("long").alias("best")),
            lambda acc, x: F.struct(
                (acc["cum"] + x["cnt"]).alias("cum"),
                F.greatest(acc["best"],
                           F.least(x["c"], acc["cum"] + x["cnt"]))
                .alias("best")),
            lambda acc: acc["best"])
        h = hist.groupBy("dst").agg(fold.alias("h"))
        new_core = F.least(F.col("core"), F.coalesce("h", F.col("core")))
        return (
            state.select("id", "core")
            .join(h.withColumnRenamed("dst", "id"), "id", "left")
            .select("id", new_core.alias("core"),
                    (new_core != F.col("core")).cast("long").alias("_changed"))
        )

    pinned: list[DataFrame] = []

    def step_fn(state: DataFrame, k: int) -> DataFrame:
        for mid in pinned:
            mid.unpersist()  # intermediates of the PREVIOUS superstep
        pinned.clear()
        cur = state
        for _ in range(max(1, inner) - 1):
            cur = h_apply(cur).persist()
            pinned.append(cur)
        return h_apply(cur)

    def stop_fn(metrics: dict, k: int) -> bool:
        return metrics.get("changed", 1) == 0

    def finalize_fn(state: DataFrame) -> DataFrame:
        for mid in pinned:
            mid.unpersist()
        pinned.clear()
        sym.unpersist()
        vertices.unpersist()
        return state.select("id", F.col("core").cast("long").alias("core"))

    if runner is None:
        runner = SuperstepRunner(spark, job_id="kcore-anon", ephemeral=True)
    return runner.run(init_fn, step_fn, stop_fn, max_iter=max_iter,
                      finalize_fn=finalize_fn)
