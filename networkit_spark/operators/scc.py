"""Strongly connected components — parallel FW-BW coloring.

Reference: /root/reference/networkit/cpp/components/
StronglyConnectedComponents.cpp:33-165 (sequential Tarjan). Tarjan's
stack is inherently sequential, so the distributed formulation is the
FB/coloring algorithm (Orzan; Slota et al.): repeat on the remaining
subgraph
  1. forward max-label propagation to a fixpoint: color(v) = max vertex
     id that reaches v;
  2. every vertex r with color(r) = r is a root — r is the maximum id
     of its own SCC (a higher id reaching r would out-color it);
  3. backward closure from each root r through vertices u with
     color(u) = r: color(u) = r gives r→u, backward reach gives u→r,
     so the closure is exactly SCC(r) — one SCC per root is peeled per
     outer round, all roots in parallel;
  4. remove the peeled vertices and repeat.
Outer rounds are bounded by the longest chain in the condensation DAG;
inner fixpoints by the (remaining) diameter. Every loop iteration is a
join + aggregation with a parquet lineage cut (plans/superstep.py
rationale).

Labels: component = max vertex id in the SCC (the root), mirroring the
engine's min/max-label CC convention. Isolated and acyclic vertices end
as singleton components.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def strongly_connected_components(g: Graph, max_outer: int = 64,
                                  max_inner: int = 256) -> DataFrame:
    """(id, component): SCC label per vertex (max member id)."""
    spark = g.edges.sparkSession
    workdir = tempfile.mkdtemp(prefix="nks-scc-")
    step = [0]

    def cut(df: DataFrame) -> DataFrame:
        step[0] += 1
        path = os.path.join(workdir, f"s{step[0]}")
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    edges = cut(g.edges.filter("src != dst").select("src", "dst").distinct())
    verts = cut(g.vertices.select("id"))
    assigned = None  # (id, component)

    for _ in range(max_outer):
        if verts.isEmpty():
            break
        # 0. TRIM: a vertex with no in-edges or no out-edges in the
        # remaining subgraph is a singleton SCC — peeling these layers
        # first shreds the acyclic bulk (on RMAT-like graphs that is
        # almost everything) so the expensive coloring only ever runs on
        # the cyclic cores (Slota et al.'s standard FB-trim).
        while True:
            has_out = edges.select(F.col("src").alias("id")).distinct()
            has_in = edges.select(F.col("dst").alias("id")).distinct()
            nontrivial = has_out.join(has_in, "id")
            trivial = cut(verts.join(nontrivial, "id", "left_anti"))
            if trivial.isEmpty():
                break
            triv_assigned = trivial.select("id", F.col("id").alias("component"))
            assigned = triv_assigned if assigned is None else cut(
                assigned.union(triv_assigned))
            verts = cut(verts.join(trivial, "id", "left_anti"))
            edges = cut(
                edges.join(trivial.withColumnRenamed("id", "src"),
                           "src", "left_anti")
                .join(trivial.withColumnRenamed("id", "dst"),
                      "dst", "left_anti"))
        if verts.isEmpty():
            break
        # 1. forward max-label propagation to fixpoint
        color = cut(verts.select("id", F.col("id").alias("color")))
        for _ in range(max_inner):
            msgs = (
                edges.join(color.select(F.col("id").alias("src"),
                                        F.col("color").alias("c")), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("c").alias("mc"))
            )
            nxt = cut(
                color.join(msgs, "id", "left")
                .select("id", F.greatest("color", F.coalesce("mc", "color"))
                        .alias("color")))
            changed = (
                nxt.join(color.withColumnRenamed("color", "old"), "id")
                .filter(F.col("color") != F.col("old")).isEmpty()
            )
            color = nxt
            if changed:
                break
        # 2-3. backward closure from roots within their color class
        members = cut(color.filter(F.col("id") == F.col("color"))
                      .select("id", F.col("id").alias("component")))
        while True:
            grown = (
                edges.join(members.select(F.col("id").alias("dst"),
                                          "component"), "dst")
                .select(F.col("src").alias("id"), "component")
                .join(color, "id")
                .filter(F.col("color") == F.col("component"))
                .select("id", "component")
                .join(members.select("id"), "id", "left_anti")
                .distinct()
            )
            grown = cut(grown)
            if grown.isEmpty():
                break
            members = cut(members.union(grown))
        assigned = members if assigned is None else cut(
            assigned.union(members))
        # 4. peel
        verts = cut(verts.join(members.select("id"), "id", "left_anti"))
        edges = cut(
            edges.join(members.select(F.col("id").alias("src")),
                       "src", "left_anti")
            .join(members.select(F.col("id").alias("dst")), "dst", "left_anti"))

    out = g.vertices.join(assigned, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    ).persist()
    out.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return out


def num_strong_components(labels: DataFrame) -> int:
    return labels.select("component").distinct().count()
