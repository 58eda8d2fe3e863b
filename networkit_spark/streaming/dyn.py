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
