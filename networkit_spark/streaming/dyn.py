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


def update_apsp(dist: DataFrame, inserts: DataFrame,
                directed: bool = False, max_rounds: int = 64) -> DataFrame:
    """DynAPSP batch-insert update (DynAPSP.cpp:93-150): an inserted or
    weight-decreased edge (u, v, w) improves d(s, t) to
    d(s,u) + w + d(v,t) — the Ramalingam–Reps rule the reference applies
    via affected-vertex BFS queues; here it is ONE relational join per
    round, iterated to a fixpoint so multi-insert batches compose (one
    insert's improvement feeding another's).

    ``dist``: all-pairs finite distances (s, v, d) — the
    closeness._dist_rows shape; the d(s,s)=0 diagonal is added
    internally if absent. ``inserts``: (u, v, w) rows; both
    orientations are considered when ``directed`` is False. Previously
    unreachable pairs appear as new rows. Distance-increasing events
    must recompute, like the reference (DynAPSP.cpp:99 throws).

    Distributed shape: the insert set is broadcast (event batches are
    small); each round shuffles only candidate improvements keyed by
    (s, t) — the affected-pair region — never the full n² table."""
    from networkit_spark.plans.scratch import Scratch

    spark = dist.sparkSession
    with Scratch(spark, "dynapsp") as sc:
        ins = inserts.select(F.col("u").cast("long"),
                             F.col("v").cast("long"),
                             F.col("w").cast("double"))
        if not directed:
            ins = ins.union(ins.select(F.col("v").alias("u"),
                                       F.col("u").alias("v"), "w"))
        ins = ins.groupBy("u", "v").agg(F.min("w").alias("w"))
        nodes = (dist.select(F.col("s").alias("id"))
                 .union(dist.select(F.col("v").alias("id")))
                 .union(ins.select(F.col("u").alias("id")))
                 .union(ins.select(F.col("v").alias("id")))
                 .distinct())
        diag = nodes.select(F.col("id").alias("s"),
                            F.col("id").alias("v"), F.lit(0.0).alias("d"))
        cur = sc.cut(
            dist.select("s", "v", F.col("d").cast("double").alias("d"))
            .union(diag).groupBy("s", "v").agg(F.min("d").alias("d")))
        for _ in range(max_rounds):
            left = cur.select("s", F.col("v").alias("u"),
                              F.col("d").alias("dsu"))
            right = cur.select(F.col("s").alias("v2"),
                               F.col("v").alias("t"),
                               F.col("d").alias("dvt"))
            cand = (
                left.join(F.broadcast(ins), "u")
                .join(right, F.col("v") == F.col("v2"))
                .groupBy("s", F.col("t").alias("v"))
                .agg(F.min(F.col("dsu") + F.col("w") + F.col("dvt"))
                     .alias("dn"))
            )
            nxt = (
                cur.join(cand, ["s", "v"], "full_outer")
                .select(
                    "s", "v",
                    F.least(F.coalesce("d", F.lit(float("inf"))),
                            F.coalesce("dn", F.lit(float("inf"))))
                    .alias("d"),
                    ((F.col("d").isNull())
                     | (F.coalesce("dn", F.lit(float("inf"))) < F.col("d")))
                    .cast("int").alias("_chg"))
            )
            nxt, m = sc.cut_observed(
                nxt, [F.sum("_chg").alias("chg")], keep=["s", "v", "d"])
            cur = nxt
            if not int(m["chg"] or 0):
                break
        else:
            raise RuntimeError("update_apsp: no fixpoint in %d rounds"
                               % max_rounds)
        out = cur.persist()
        out.count()
    return out


def update_betweenness(g: Graph, bc: DataFrame, dist: DataFrame,
                       events: DataFrame
                       ) -> tuple[Graph, DataFrame, DataFrame]:
    """DynBetweenness batch-insert update
    (/root/reference/networkit/cpp/centrality/DynBetweenness.cpp:163-240:
    edge insertions / weight decreases only; maintains all-pairs
    (distances, sigma) and repairs only the affected region).

    The reference repairs per-PAIR dependency sweeps from each affected
    target; the batch-native granularity is the affected SOURCE — the
    exact analogue of update_connected_components' affected-component
    warm restart:

      1. affected sources A = {s : some inserted edge (u,v,w) gives
         dist(s,u) + w ≤ dist(s,v)} (≤, not <: an equal-length path
         changes σ and therefore the dependencies) ∪ brand-new vertices
         — one broadcast join against the maintained APSP table;
      2. bc_new = bc − partial_bc_old(A) + partial_bc_new(A), each
         partial a batched Brandes restricted to A (sources= argument
         of the static operator — weighted graphs take the
         weighted_betweenness path, mirroring the reference's Dijkstra
         switch);
      3. the APSP table itself repairs via update_apsp (Ramalingam–Reps).

    Work ∝ |A|·(BFS over reachable) + affected-pair repair — untouched
    sources never enter a frontier. Returns (new_g, new_bc, new_dist).

    ``bc``: (id, score) from betweenness()/weighted_betweenness();
    ``dist``: all-pairs finite distances (s, v, d) — closeness._dist_rows
    shape, also what update_apsp maintains."""
    from networkit_spark.operators.betweenness import (
        betweenness, weighted_betweenness)
    from networkit_spark.streaming.events import apply_events

    bad = events.filter(
        ~F.col("type").isin("EDGE_ADDITION", "EDGE_WEIGHT_UPDATE")).count()
    if bad:
        raise ValueError(
            "update_betweenness: edge insertions / weight decreases only "
            "(DynBetweenness.cpp:171 throws on anything else); recompute "
            "after removals")

    if g.weighted:
        upd = events.filter(F.col("type") == "EDGE_WEIGHT_UPDATE")
        old_w = g.edges.select(
            F.least("src", "dst").alias("_lo"),
            F.greatest("src", "dst").alias("_hi"),
            F.col("weight").alias("_old_w"))
        grew = (upd.select(F.least("u", "v").alias("_lo"),
                           F.greatest("u", "v").alias("_hi"),
                           F.col("w").alias("_new_w"))
                .join(old_w, ["_lo", "_hi"])
                .filter(F.col("_new_w") > F.col("_old_w")).count())
        if grew:
            raise ValueError(
                "update_betweenness: weight increases are "
                "distance-increasing; recompute (reference accepts "
                "decreases only, DynBetweenness.cpp:171)")

    spark = g.edges.sparkSession
    new_edges = apply_events(g.edges, events)
    endpoints = (events.select(F.explode(F.array("u", "v")).alias("id"))
                 .filter(F.col("id").isNotNull()).distinct())
    new_vertices = g.vertices.union(endpoints).distinct()
    new_g = Graph(new_edges, directed=g.directed, weighted=g.weighted,
                  vertices=new_vertices)

    ins = events.select(
        F.col("u").cast("long"), F.col("v").cast("long"),
        (F.coalesce("w", F.lit(1.0)) if g.weighted else F.lit(1.0))
        .cast("double").alias("w"))
    ins_dir = ins if g.directed else ins.union(
        ins.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))

    # 1. affected sources: dist(s,u) + w <= dist(s,v), unreachable = inf.
    # The maintained dist table (closeness._dist_rows shape) carries
    # d >= 1 rows only — without the d(s,s)=0 diagonal, a source that is
    # itself an inserted-edge endpoint u would never fire the rule
    # dist(s,u) + w <= dist(s,v) for s = u (and on undirected graphs a
    # component-joining insert has neither dist(u,u) nor dist(u,v)), so
    # its dependencies would silently never be repaired. Normalize the
    # diagonal in over every known vertex before building du/dv.
    diag = g.vertices.select(F.col("id").alias("s"),
                             F.col("id").alias("v"),
                             F.lit(0.0).alias("d"))
    dist_n = (dist.select("s", "v", F.col("d").cast("double").alias("d"))
              .union(diag).groupBy("s", "v").agg(F.min("d").alias("d")))
    du = dist_n.select("s", F.col("v").alias("u"), F.col("d").alias("du"))
    dv = dist_n.select("s", F.col("v").alias("v"), F.col("d").alias("dv"))
    aff = (
        du.join(F.broadcast(ins_dir), "u")
        .join(dv, ["s", "v"], "left")
        .filter(F.col("du") + F.col("w")
                <= F.coalesce("dv", F.lit(float("inf"))))
        .select("s").distinct()
    )
    new_ids = new_vertices.join(
        dist.select(F.col("s").alias("id")).distinct(), "id", "left_anti")
    affected = aff.union(new_ids.select(F.col("id").alias("s"))) \
        .distinct().persist()
    n_aff = affected.count()
    if n_aff == 0:
        return new_g, bc, dist

    # 2. subtract old contributions, add new ones (source-partial Brandes)
    part = weighted_betweenness if g.weighted else betweenness
    old_part = part(g, sources=affected)
    new_part = part(new_g, sources=affected)
    new_bc = (
        new_vertices
        .join(bc.withColumnRenamed("score", "b0"), "id", "left")
        .join(old_part.withColumnRenamed("score", "b_old"), "id", "left")
        .join(new_part.withColumnRenamed("score", "b_new"), "id", "left")
        .select(
            "id",
            (F.coalesce("b0", F.lit(0.0)) - F.coalesce("b_old", F.lit(0.0))
             + F.coalesce("b_new", F.lit(0.0))).alias("score"))
    )

    # 3. repair the APSP table (new sources enter via their diagonal)
    dist_all = dist.union(
        new_ids.select(F.col("id").alias("s"), F.col("id").alias("v"),
                       F.lit(0.0).alias("d")))
    new_dist = update_apsp(dist_all, ins, directed=g.directed)
    new_bc = new_bc.persist()
    new_bc.count()
    affected.unpersist()
    return new_g, new_bc, new_dist


def update_approx_betweenness(g: Graph, state: dict,
                              events: DataFrame) -> tuple[Graph, dict]:
    """DynApproxBetweenness batch update
    (/root/reference/networkit/cpp/centrality/DynApproxBetweenness.cpp:
    126-176: per sample, update its SSSP; if modified, subtract the old
    sampled path's contributions and draw a new path). The batch-native
    granularity is the affected SAMPLE — the analogue of
    update_betweenness's affected-source repair, at the state the RK
    estimator actually keeps:

      1. affected sources A = {s sampled : some inserted edge (u,v,w)
         gives d(s,u)+w <= d(s,v)} over the maintained per-source
         distance table (diagonal normalized in, both orientations —
         exactly the condition under which DynBFS flags modified());
      2. the sigma strata are recomputed ONLY for A on the new graph
         (one batched multi-source BFS over |A| sources);
      3. ONLY the samples whose source is in A re-walk their path (the
         deterministic sigma-weighted hash race — an unchanged DAG
         reproduces the identical path, a changed one yields a valid
         sigma-weighted draw, the reference's re-sample);
      4. contribs = (old minus affected-sample rows) union new walks;
         scores = counts / r (r and the sample pairs stay fixed, like
         the reference).

    Work is |A|·(BFS over reachable) + the affected walks — untouched
    samples never enter a frontier. Edge insertions / weight decreases
    only (the reference's DynBFS/DynDijkstra restriction). Returns
    (new_g, new_state).

    Recompute-vs-repair break-even: a full rerun costs r-source strata
    + r walks; the repair costs |A|-source strata + |A| walks + two
    broadcast joins for detection, so it wins whenever |A| < r — for a
    single inserted edge on a diameter-D graph, A is the set of sampled
    sources whose BFS cone reaches the edge with slack <= 0, typically
    a small fraction unless the insert is central."""
    from networkit_spark.operators.betweenness import (
        _sample_path_contribs, _sigma_table)
    from networkit_spark.plans.scratch import Scratch

    if g.directed:
        raise ValueError("update_approx_betweenness: undirected only "
                         "(DynApproxBetweenness.cpp:31)")
    bad = events.filter(
        ~F.col("type").isin("EDGE_ADDITION", "EDGE_WEIGHT_UPDATE")).count()
    if bad:
        raise ValueError(
            "update_approx_betweenness: edge insertions / weight "
            "decreases only (DynBFS rejects removals); recompute with "
            "approx_betweenness_state after removals")

    spark = g.edges.sparkSession
    new_edges = apply_events(g.edges, events)
    endpoints = (events.select(F.explode(F.array("u", "v")).alias("id"))
                 .filter(F.col("id").isNotNull()).distinct())
    new_g = Graph(new_edges, directed=False, weighted=g.weighted,
                  vertices=g.vertices.union(endpoints).distinct())

    samples, dist, contribs = (state["samples"], state["dist"],
                               state["contribs"])
    r, seed = state["r"], state["seed"]
    if r == 0:
        return new_g, state

    ins = events.select(
        F.col("u").cast("long"), F.col("v").cast("long"),
        (F.coalesce("w", F.lit(1.0)) if g.weighted else F.lit(1.0))
        .cast("double").alias("w"))
    ins_dir = ins.union(ins.select(F.col("v").alias("u"),
                                   F.col("u").alias("v"), "w"))
    # diagonal-normalized affected-source rule (see update_betweenness).
    # Diagonals come from SAMPLES, not dist: a sampled source that
    # reached nothing has no d>=1 rows, yet an insert at that source
    # must still flag it (its d(s,s)=0 row fires d(s,u)+w <= d(s,v)).
    srcs = samples.select("s").distinct()
    diag = srcs.select("s", F.col("s").alias("v"), F.lit(0.0).alias("d"))
    dist_n = (dist.select("s", "v", F.col("d").cast("double").alias("d"))
              .union(diag).groupBy("s", "v").agg(F.min("d").alias("d")))
    du = dist_n.select("s", F.col("v").alias("u"), F.col("d").alias("du"))
    dv = dist_n.select("s", F.col("v").alias("v"), F.col("d").alias("dv"))
    aff = (du.join(F.broadcast(ins_dir), "u")
           .join(dv, ["s", "v"], "left")
           .filter(F.col("du") + F.col("w")
                   <= F.coalesce("dv", F.lit(float("inf"))))
           .select("s").distinct().persist())
    if aff.count() == 0:
        return new_g, state

    aff_samples = samples.join(aff, "s", "left_semi")
    sc = Scratch(spark, "dynabw")
    try:
        sig, sym = _sigma_table(new_g, aff.select("s"), sc)
        new_walks = _sample_path_contribs(sc, aff_samples, sig, sym, seed)
        if new_walks is None:
            new_walks = spark.createDataFrame([], "i long, id long")
        kept = contribs.join(aff_samples.select("i"), "i", "left_anti")
        new_contribs = kept.unionByName(new_walks)
        kept_dist = dist.join(aff, "s", "left_anti")
        new_dist = kept_dist.unionByName(
            sig.select("s", "v", "d").filter(F.col("d") >= 1))
        scores = new_g.vertices.join(
            new_contribs.groupBy("id").agg(
                (F.count(F.lit(1)) / F.lit(float(r))).alias("score")),
            "id", "left").select(
            "id", F.coalesce("score", F.lit(0.0)).alias("score"))
        out = {"samples": samples, "dist": new_dist.persist(),
               "contribs": new_contribs.persist(), "r": r, "seed": seed,
               "scores": scores.persist()}
        for k in ("dist", "contribs", "scores"):
            out[k].count()
        sym.unpersist()
    finally:
        sc.cleanup()
    aff.unpersist()
    return new_g, out
