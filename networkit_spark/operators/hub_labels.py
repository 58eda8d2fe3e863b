"""Hub-labeling distance oracle (2-hop labels).

Reference: /root/reference/networkit/cpp/distance/PrunedLabeling.cpp —
pruned landmark labeling (Akiba–Iwata–Yoshida): BFS from vertices in
degree order, pruning each visit whose distance the existing labels
already cover; ``query(u, v) = min over common hubs h of
d(u,h) + d(h,v)``, exact because the pruned hub set still 2-hop-covers
every shortest path.

The PRUNING step is inherently sequential in the hub order (each hub's
BFS consults the index built by all previous hubs), so it has no batch
dataflow form. The distributed trade-off implemented here:

  - ``hub_labeling(g)`` (all vertices as hubs) builds the UNPRUNED
    label set in ONE batched multi-source BFS — queries are EXACT
    (every vertex is its own hub), at the cost of the index size the
    reference's pruning exists to shrink (documented deviation; this is
    an index-size optimization, not a semantic difference).
  - ``hub_labeling(g, n_hubs=k)`` keeps the k highest-degree vertices
    as hubs — the bounded-size index; queries then return an UPPER
    bound that is exact whenever some shortest path meets a hub (the
    regime the degree ordering targets on power-law graphs).

Labels are a (v, hub, d) DataFrame; ``query_distances`` answers a batch
of (u, v) pairs with one self-join on the hub column — the index is
meant to be built once and hit many times, which is exactly the
reference's usage pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def hub_labeling(g: Graph, n_hubs: int | None = None) -> DataFrame:
    """(v, hub, d): distance labels from each hub (finite rows only;
    the d(h,h)=0 diagonal is included). Hubs = the ``n_hubs``
    highest-degree vertices (ties → smaller id), or ALL vertices when
    None (exact oracle)."""
    from networkit_spark.operators.closeness import _dist_rows
    from networkit_spark.operators.degrees import out_degrees

    if g.directed:
        raise ValueError("hub_labeling: undirected graphs only "
                         "(PrunedLabeling.cpp targets undirected; a "
                         "directed oracle needs forward+backward labels)")
    if n_hubs is None:
        hubs = g.vertices.select(F.col("id").alias("s"))
    else:
        hubs = (out_degrees(g)
                .orderBy(F.desc("degree"), F.asc("id"))
                .limit(n_hubs).select(F.col("id").alias("s")))
    rows, sc = _dist_rows(g, hubs)
    diag = hubs.select(F.col("s").alias("v"), F.col("s").alias("hub"),
                       F.lit(0).cast("long").alias("d"))
    if rows is None:
        out = diag.persist()
        out.count()
        sc.cleanup()
        return out
    out = rows.select("v", F.col("s").alias("hub"),
                      F.col("d").cast("long").alias("d")) \
        .union(diag).persist()
    out.count()
    sc.cleanup()
    return out


def query_distances(labels: DataFrame, pairs: DataFrame) -> DataFrame:
    """(u, v, d): hub-label distance for each (u, v) row of ``pairs`` —
    min over common hubs of d(u,h)+d(h,v); rows with NO common hub are
    returned with d = NULL (unreachable, or not covered by a truncated
    hub set). One join per side keyed on the hub column."""
    lu = labels.select(F.col("v").alias("u"), "hub",
                       F.col("d").alias("du"))
    lv = labels.select("v", "hub", F.col("d").alias("dv"))
    best = (pairs.join(lu, "u")
            .join(lv, ["hub", "v"])
            .groupBy("u", "v")
            .agg(F.min(F.col("du") + F.col("dv")).alias("d")))
    return pairs.join(best, ["u", "v"], "left").select("u", "v", "d")


def query_distance(labels: DataFrame, u: int, v: int) -> int | None:
    """Single-pair convenience query (PrunedLabeling::query)."""
    spark = labels.sparkSession
    row = query_distances(
        labels, spark.createDataFrame([(int(u), int(v))],
                                      "u long, v long")).collect()[0]
    return None if row["d"] is None else int(row["d"])
