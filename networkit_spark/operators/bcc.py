"""Biconnected components — cycle-equivalence via tree-path covering.

Reference: /root/reference/networkit/cpp/components/
BiconnectedComponents.cpp:43-110 (iterative Tarjan lowpoint DFS —
inherently sequential: the edge stack and lowpoint updates follow DFS
order). The distributed formulation uses the defining equivalence
instead: two edges are in the same biconnected component iff they lie
on a common simple cycle, and the transitive closure of that relation
over overlapping cycles is exactly the BCC partition of the edges.

  1. BFS forest with per-vertex (parent, depth) — level-synchronous
     frontier from each component's min-id root (the spanning-forest
     substrate), one join + agg + lineage cut per level.
  2. every NON-TREE edge (a, b) closes exactly one tree cycle: the
     tree path a ⇝ lca(a,b) ⇝ b plus (a,b). All walks run
     SIMULTANEOUSLY, one superstep per tree level: the deeper endpoint
     steps to its parent (both step when depths tie), emitting a cover
     row (edge_id, tree_edge) for each tree edge traversed — a tree
     edge is keyed by its child endpoint. Rounds ≤ 2·forest depth.
  3. auxiliary bipartite graph: tree-edge nodes (child ids) ⊕ offset
     non-tree-edge nodes, linked by the cover rows; its connected
     components (the engine's min-label CC) are the BCCs — overlapping
     cycles merge transitively through shared tree edges. Tree edges
     covered by no cycle are bridges: singleton BCCs.

Outputs one row per undirected edge (src < dst, component). A vertex's
components = the distinct labels of its incident edges; articulation
points are vertices incident to ≥ 2 components. Work is
O(Σ cycle path lengths) cover rows — bounded by m·depth; on
small-diameter (power-law) graphs effectively O(m·log n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.scratch import Scratch

def biconnected_components(g: Graph) -> DataFrame:
    """(src, dst, component) per undirected edge, src < dst."""
    if g.directed:
        raise ValueError(
            "BiconnectedComponents.cpp semantics: biconnected components "
            "cannot be computed on directed graphs")
    from networkit_spark.operators.components import connected_components

    spark = g.edges.sparkSession
    sc = Scratch(spark, "bcc")
    count_rows = F.count(F.lit(1)).alias("rows")

    e = g.edges.filter("src != dst").select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst")).distinct()
    e = sc.cut(e, "edges")
    sym = sc.cut(e.union(e.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst"))), "sym")

    # 1. BFS forest with depth: roots = per-component min id
    labels = connected_components(g)
    roots = labels.select(F.col("component").alias("id")).distinct()
    tree = sc.cut(roots.select("id", F.col("id").alias("parent"),
                               F.lit(0).cast("long").alias("depth")), "t0")
    frontier = tree
    depth = 0
    while True:
        depth += 1
        nxt, m = sc.cut_observed(
            sym.join(frontier.select(F.col("id").alias("src")), "src",
                     "left_semi")
            .join(tree.select(F.col("id").alias("dst")), "dst", "left_anti")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("src").alias("parent"))
            .select("id", "parent", F.lit(depth).cast("long").alias("depth")),
            [count_rows], name=f"t{depth}")
        if int(m["rows"] or 0) == 0:
            break
        tree = sc.cut(tree.union(nxt))
        frontier = nxt

    parent = tree.select("id", "parent", "depth")

    # 2. non-tree edges close cycles; walk both endpoints to the LCA
    tree_edges = parent.filter(F.col("depth") > 0).select(
        F.least("id", "parent").alias("src"),
        F.greatest("id", "parent").alias("dst"))
    # walk state / cover rows are keyed by the natural (esrc, edst) pair —
    # a hash key (xxhash64) would silently merge two cycles on a collision
    nontree = sc.cut(
        e.join(tree_edges, ["src", "dst"], "left_anti"), "nontree")

    state, m = sc.cut_observed(
        nontree
        .join(parent.select(F.col("id").alias("src"),
                            F.col("depth").alias("da")), "src")
        .join(parent.select(F.col("id").alias("dst"),
                            F.col("depth").alias("db")), "dst")
        .select(F.col("src").alias("esrc"), F.col("dst").alias("edst"),
                F.col("src").alias("a"), "da",
                F.col("dst").alias("b"), "db"),
        [count_rows], name="walk0")
    covers = None
    rnd = 0
    while int(m["rows"] or 0) > 0:
        rnd += 1
        step_a = F.col("da") >= F.col("db")   # deeper (or tied) a climbs
        step_b = F.col("db") >= F.col("da")
        stepped = (
            state
            .join(parent.select(F.col("id").alias("a"),
                                F.col("parent").alias("pa")), "a")
            .join(parent.select(F.col("id").alias("b"),
                                F.col("parent").alias("pb")), "b")
            .select(
                "esrc", "edst",
                F.when(step_a, F.col("pa")).otherwise(F.col("a")).alias("na"),
                F.when(step_a, F.col("da") - 1).otherwise(F.col("da")).alias("nda"),
                F.when(step_b, F.col("pb")).otherwise(F.col("b")).alias("nb"),
                F.when(step_b, F.col("db") - 1).otherwise(F.col("db")).alias("ndb"),
                F.when(step_a, F.col("a")).alias("cov_a"),
                F.when(step_b, F.col("b")).alias("cov_b"),
            )
        )
        stepped = sc.cut(stepped, f"step{rnd}")
        cov = (stepped.select("esrc", "edst", F.col("cov_a").alias("child"))
               .union(stepped.select("esrc", "edst",
                                     F.col("cov_b").alias("child")))
               .filter(F.col("child").isNotNull()))
        covers = cov if covers is None else covers.union(cov)
        if rnd % 6 == 0:
            covers = sc.cut(covers, f"cov{rnd}")
        state, m = sc.cut_observed(
            stepped.filter(F.col("na") != F.col("nb"))
            .select("esrc", "edst",
                    F.col("na").alias("a"), F.col("nda").alias("da"),
                    F.col("nb").alias("b"), F.col("ndb").alias("db")),
            [count_rows], name=f"walk{rnd}")

    # 3. auxiliary graph: tree-edge node = child id; non-tree-edge node
    # = OFFSET + dense index (disjoint id spaces); CC = BCC labels
    max_id = int(parent.agg(F.max("id")).collect()[0][0] or 0)
    off = max_id + 1
    from networkit_spark.operators.graph_tools import ordered_dense_ids
    nt_ids = sc.cut(
        ordered_dense_ids(nontree.select("src", "dst"),
                          ["src", "dst"], "ntidx")
        .withColumn("aux", F.col("ntidx") + off), "ntids")

    if covers is None:
        aux_edges = spark.createDataFrame([], "src long, dst long")
    else:
        aux_edges = (
            covers.join(nt_ids.select(F.col("src").alias("esrc"),
                                      F.col("dst").alias("edst"), "aux"),
                        ["esrc", "edst"])
            .select(F.col("child").alias("src"), F.col("aux").alias("dst"))
            .distinct()
        )
    aux_verts = (parent.filter(F.col("depth") > 0).select("id")
                 .union(nt_ids.select(F.col("aux").alias("id"))))
    aux_g = Graph(aux_edges.withColumn("weight", F.lit(1.0)),
                  directed=False, weighted=False,
                  vertices=sc.cut(aux_verts, "auxv"))
    aux_cc = connected_components(aux_g)

    tree_out = (
        parent.filter(F.col("depth") > 0)
        .join(aux_cc, "id")
        .select(F.least("id", "parent").alias("src"),
                F.greatest("id", "parent").alias("dst"), "component")
    )
    nt_out = (
        nt_ids.select("src", "dst", F.col("aux").alias("id"))
        .join(aux_cc, "id")
        .select("src", "dst", "component")
    )
    out = tree_out.union(nt_out).persist()
    out.count()
    sc.cleanup()
    return out


def num_biconnected_components(edge_labels: DataFrame) -> int:
    return edge_labels.select("component").distinct().count()


def articulation_points(edge_labels: DataFrame) -> DataFrame:
    """(id): vertices whose incident edges span ≥ 2 biconnected
    components (BiconnectedComponents componentsOfNode derivation)."""
    incid = (
        edge_labels.select(F.col("src").alias("id"), "component")
        .union(edge_labels.select(F.col("dst").alias("id"), "component"))
        .distinct()
    )
    return (incid.groupBy("id")
            .agg(F.countDistinct("component").alias("nc"))
            .filter("nc >= 2").select("id"))
