"""Core decomposition (k-core numbers) — level-synchronous peeling.

Reference (/root/reference/networkit/cpp/centrality/
CoreDecomposition.cpp:46-95, ParK-style): repeatedly remove all nodes
whose residual degree equals the current level; a node's core number is
the level at which it is removed.

Spark formulation: iterate within level — delete {v : residual_deg(v) ≤
level} until stable, then level += 1. Each peel round is one degree
aggregation + two anti-joins; the surviving edge set is round-tripped
through parquet every round (the engine's standard lineage cut — chained
anti-joins otherwise grow the plan unboundedly), and peeled nodes append
to a cores table.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def core_decomposition(g: Graph, max_level: int = 1 << 20) -> DataFrame:
    """(id, core): k-core number per vertex. Isolated vertices get 0."""
    spark = g.edges.sparkSession
    workdir = tempfile.mkdtemp(prefix="nks-kcore-")
    cores_dir = os.path.join(workdir, "cores")
    edges_dir = os.path.join(workdir, "edges")

    e = g.edges.filter("src != dst").select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym.write.mode("overwrite").parquet(edges_dir + "-0")
    cur = spark.read.parquet(edges_dir + "-0")
    # seed the cores table (empty) so the final read always succeeds
    spark.createDataFrame([], "id long, core long").write.mode(
        "overwrite").parquet(cores_dir)

    level = 0
    rnd = 0
    while level <= max_level:
        peeled_any = False
        while True:
            deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
            doomed = deg.filter(F.col("deg") <= level).select(
                F.col("src").alias("id"))
            if doomed.isEmpty():
                break
            peeled_any = True
            doomed.select("id", F.lit(level).cast("long").alias("core")) \
                .write.mode("append").parquet(cores_dir)
            doomed_ids = spark.read.parquet(cores_dir).filter(
                F.col("core") == level).select("id")
            rnd += 1
            nxt = (
                cur.join(doomed_ids.withColumnRenamed("id", "src"),
                         "src", "left_anti")
                .join(doomed_ids.withColumnRenamed("id", "dst"),
                      "dst", "left_anti")
                .select("src", "dst")
            )
            nxt.write.mode("overwrite").parquet(f"{edges_dir}-{rnd}")
            cur = spark.read.parquet(f"{edges_dir}-{rnd}")
        if cur.isEmpty():
            break
        level += 1

    assigned = spark.read.parquet(cores_dir)
    result = (
        g.vertices.join(assigned, "id", "left")
        .select("id", F.coalesce("core", F.lit(0)).cast("long").alias("core"))
    ).persist()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result
