"""Dynamic (event-driven) algorithm updates.

Reference: DynConnectedComponents / DynCommunityDetection and friends
update in-memory structures per event. The Spark-native equivalent works
in BATCHES: apply a batch of GraphEvents (streaming.events.apply_events),
then update per-vertex outputs touching only the AFFECTED part of the
graph — the components whose membership an event could change — while
every other vertex keeps its label (no recompute, no shuffle outside the
affected induced subgraph).

For connected components:
  - the affected set = all components containing an endpoint of any
    added/removed edge (an addition can merge two untouched components,
    so both endpoint components count as affected);
  - labels of unaffected components are reused verbatim;
  - the affected induced subgraph is recomputed with the standard
    min-label kernel — warm restarts at component granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.components import connected_components
from networkit_spark.streaming.events import apply_events


def update_connected_components(g: Graph, labels: DataFrame,
                                events: DataFrame) -> tuple[Graph, DataFrame]:
    """Apply ``events`` to ``g`` and incrementally update the component
    labeling. Returns (new_graph, new_labels).

    ``labels``: (id, component) for the CURRENT graph; ``events``: the
    GraphEvent schema of streaming.events (type, u, v, w, t) — edge
    events (apply_events folds exactly those)."""
    new_edges = apply_events(g.edges, events)
    endpoints = (
        events.select(F.explode(F.array("u", "v")).alias("id"))
        .filter(F.col("id").isNotNull())
        .distinct()
    )
    new_vertices = g.vertices.union(endpoints).distinct()
    new_g = Graph(new_edges, directed=False, weighted=g.weighted,
                  vertices=new_vertices)
    affected_comps = (
        labels.join(endpoints, "id", "left_semi")
        .select("component").distinct()
    )
    # brand-new vertices (not in the old labeling) are affected too
    new_ids = new_g.vertices.join(labels.select("id"), "id", "left_anti")

    affected_ids = (
        labels.join(affected_comps, "component", "left_semi").select("id")
        .union(new_ids.select("id"))
        .distinct()
        .persist()
    )
    n_aff = affected_ids.count()
    if n_aff == 0:
        return new_g, labels

    sub_edges = (
        new_g.edges
        .join(affected_ids.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(affected_ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    sub_vertices = new_g.vertices.join(affected_ids, "id", "left_semi")
    sub = Graph(sub_edges, directed=False, weighted=new_g.weighted,
                vertices=sub_vertices)
    sub_labels = connected_components(sub)

    keep = (
        labels.join(affected_comps, "component", "left_anti")
        .join(new_g.vertices, "id", "left_semi")  # drop removed nodes
    )
    out = keep.unionByName(sub_labels)
    affected_ids.unpersist()
    return new_g, out


def update_sssp(g: Graph, dist: DataFrame,
                events: DataFrame) -> tuple[Graph, DataFrame]:
    """DynBFS / DynDijkstra batch update (reference DynBFS.cpp:41-55,
    DynDijkstra.cpp:58-75): apply a batch of EDGE_ADDITION /
    EDGE_WEIGHT_UPDATE events to ``g`` and incrementally repair the
    shortest-path distances ``dist`` (the (id, dist) output of
    ``sssp``/``bfs`` — the source is implicit in it). Returns (new_graph,
    new_dist). Like the reference, distance-increasing updates (EDGE
    removals, weight increases) raise — decremental SSSP needs a
    different algorithm.

    Distributed shape: seed the relaxation frontier by relaxing ONLY
    the touched edges against the old distance vector, then run the
    standard Bellman-Ford supersteps on the new graph — work is
    proportional to the affected region (the cone of improved
    vertices), untouched vertices never enter a frontier."""
    from networkit_spark.operators.distances import relax_supersteps

    bad = events.filter(
        ~F.col("type").isin("EDGE_ADDITION", "EDGE_WEIGHT_UPDATE")).count()
    if bad:
        raise ValueError(
            "update_sssp: only EDGE_ADDITION / EDGE_WEIGHT_UPDATE events "
            "are supported (DynBFS.cpp:47 'Graph update not allowed'); "
            "recompute with sssp() after removals")
    spark = g.edges.sparkSession
    old_edges = g.edges
    new_edges = apply_events(old_edges, events)
    endpoints = (
        events.select(F.explode(F.array("u", "v")).alias("id"))
        .filter(F.col("id").isNotNull()).distinct()
    )
    new_g = Graph(new_edges, directed=g.directed, weighted=g.weighted,
                  vertices=g.vertices.union(endpoints).distinct())

    # weight increases masquerading as EDGE_WEIGHT_UPDATE are also
    # distance-increasing: detect and reject (join on either orientation)
    if g.weighted:
        upd = events.filter(F.col("type") == "EDGE_WEIGHT_UPDATE")
        old_w = old_edges.select(
            F.least("src", "dst").alias("_lo"),
            F.greatest("src", "dst").alias("_hi"),
            F.col("weight").alias("_old_w"))
        grew = (
            upd.select(F.least("u", "v").alias("_lo"),
                       F.greatest("u", "v").alias("_hi"),
                       F.col("w").alias("_new_w"))
            .join(old_w, ["_lo", "_hi"])
            .filter(F.col("_new_w") > F.col("_old_w")).count()
        )
        if grew:
            raise ValueError(
                "update_sssp: weight increases are distance-increasing "
                "(DynDijkstra supports decreases only); recompute with sssp()")

    touched = events.select(
        F.col("u").alias("src"), F.col("v").alias("dst"),
        (F.coalesce("w", F.lit(1.0)) if g.weighted else F.lit(1.0))
        .cast("double").alias("weight"))
    if not g.directed:
        touched = touched.union(touched.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))

    old = new_g.vertices.join(
        dist.select("id", F.col("dist").cast("double").alias("dist")),
        "id", "left")
    seeded = (
        old.join(
            touched.join(old.select(F.col("id").alias("src"),
                                    F.col("dist").alias("sd")), "src")
            .filter(F.col("sd").isNotNull())
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("sd") + F.col("weight")).alias("cand")),
            "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce("cand", F.lit(float("inf")))
                < F.coalesce("dist", F.lit(float("inf"))),
                F.col("cand")).otherwise(F.col("dist")).alias("dist"),
            (F.coalesce("cand", F.lit(float("inf")))
             < F.coalesce("dist", F.lit(float("inf"))))
            .cast("int").alias("_improved"))
    )
    seeded = seeded.persist()
    if seeded.filter(F.col("_improved") == 1).limit(1).count() == 0:
        out = seeded.select("id", "dist")
        return new_g, out

    from networkit_spark.operators.distances import _out_edges
    edges = _out_edges(new_g).persist()
    out = relax_supersteps(edges, lambda: seeded, spark,
                           job_id="dyn-sssp")
    edges.unpersist()
    return new_g, out
