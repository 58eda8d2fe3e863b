"""Label-propagation community detection (PLP), synchronous variant.

Reference semantics (/root/reference/networkit/cpp/community/PLP.cpp):
  - init: singleton labels (PLP.cpp:31-35)
  - step, for each node with degree>0: sum incident edge weights per
    neighbor label (PLP.cpp:80-86), adopt the heaviest label, ties →
    SMALLEST label id (ordered std::map + max_element keeps the first
    maximum, PLP.cpp:89-92)
  - isolated nodes keep their singleton label (PLP.cpp:50-61)
  - stop when the number of updated nodes ≤ θ (default n/1e5,
    PLP.cpp:41-43) or maxIterations (PLP.cpp:69)

The reference updates asynchronously in place under OpenMP, which is
nondeterministic run-to-run; we implement the deterministic synchronous
(Jacobi) schedule — SURVEY.md §5.2 documents the divergence and the
matching NumPy oracle. Winner selection is a single ``max_by`` over the
(weight, -label) order — heaviest first, then smallest label — one join +
two hash aggregations per superstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import SuperstepRunner


def label_propagation(
    g: Graph,
    theta: float | None = None,
    max_iter: int = 100,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Returns (id: long, label: long). Labels are community ids;
    canonicalize with :func:`canonicalize_labels` before comparisons."""
    spark = g.edges.sparkSession
    n = g.num_vertices()
    if theta is None:
        theta = n / 1e5
    sym = (
        g.edges.filter("src != dst")
        .select("src", "dst", "weight")
    )
    sym = sym.union(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    ).persist()
    vertices = g.vertices

    def init_fn() -> DataFrame:
        return vertices.select("id", F.col("id").alias("label"))

    def step_fn(state: DataFrame, k: int) -> DataFrame:
        labels = state.select("id", "label")
        # weight mass per (node, neighbor label)
        wsum = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"), F.col("label"))
            .agg(F.sum("weight").alias("w"))
        )
        winner = wsum.groupBy("id").agg(
            F.expr("max_by(label, struct(w, -label))").alias("winner")
        )
        return (
            labels.join(winner, "id", "left")
            .select(
                "id",
                F.coalesce("winner", "label").alias("label"),
                (F.coalesce("winner", "label") != F.col("label")).cast("int").alias("_changed"),
            )
        )

    def stop_fn(metrics: dict, k: int) -> bool:
        return metrics.get("changed", n) <= theta

    def finalize_fn(labels: DataFrame) -> DataFrame:
        sym.unpersist()
        return labels

    if runner is None:
        runner = SuperstepRunner(spark, job_id="plp-anon", ephemeral=True)
    return runner.run(init_fn, step_fn, stop_fn, max_iter=max_iter,
                      finalize_fn=finalize_fn)


def canonicalize_labels(labels: DataFrame, label_col: str = "label") -> DataFrame:
    """Map each label to the min node id of its members (mandate: 'exact
    after canonicalization'; SURVEY.md §5.2)."""
    reps = labels.groupBy(label_col).agg(F.min("id").alias("_rep"))
    return (
        labels.join(reps, label_col)
        .select("id", F.col("_rep").alias(label_col))
    )


def modularity(g: Graph, labels: DataFrame, label_col: str = "label") -> float:
    """Modularity = coverage − Σ_C (vol_C/totalW)²/4, with self-loop weight
    counted twice in volumes and total
    (/root/reference/networkit/cpp/community/Modularity.cpp:28-91,
    Coverage.cpp). Two join+agg passes over the stored edges."""
    lab = labels.select("id", F.col(label_col).alias("_l"))
    e = g.edges  # stored-once edges
    joined = (
        e.join(lab.withColumnRenamed("id", "src").withColumnRenamed("_l", "l_src"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("_l", "l_dst"), "dst")
    )
    row = joined.agg(
        F.sum("weight").alias("total"),
        F.sum(F.when(F.col("l_src") == F.col("l_dst"), F.col("weight"))
              .otherwise(F.lit(0.0))).alias("intra"),
    ).collect()[0]
    total = float(row["total"] or 0.0)
    if total == 0.0:
        return 0.0
    coverage = float(row["intra"] or 0.0) / total
    # volume per community: each edge adds w to both endpoint communities
    # (a self-loop adds 2w to its community — intended, Modularity.cpp:52-60)
    vols = (
        joined.select(F.col("l_src").alias("c"), "weight")
        .union(joined.select(F.col("l_dst").alias("c"), "weight"))
        .groupBy("c").agg(F.sum("weight").alias("vol"))
    )
    expected = vols.agg(
        F.sum(F.pow(F.col("vol") / F.lit(total), 2) / F.lit(4.0)).alias("x")
    ).collect()[0]["x"]
    return coverage - float(expected or 0.0)
