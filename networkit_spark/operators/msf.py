"""Weighted spanning-forest variants: maximum, random-maximum, union-
of-maximum, and uniformly-random spanning forests.

Reference counterparts (/root/reference/networkit/cpp/graph/):
  - UnionMaximumSpanningForest.cpp:42-79 — Kruskal descending by
    weight, merging each weight CLASS as a batch: an edge (u,v,w) is in
    the union of ALL maximum-weight spanning forests iff u and v lie in
    different components of the strictly-heavier subgraph {e: w(e)>w}.
  - RandomMaximumSpanningForest.cpp:37-90 — the same descending sweep
    over a randomly shuffled tie order: ONE maximum-weight spanning
    forest with uniformly random tie-breaking.
  - RandomSpanningForest.cpp — a uniformly random spanning tree per
    component via Wilson's loop-erased random walk.

Spark formulations (not ports — Kruskal's sequential scan has no
dataflow meaning):
  - maximum/random_maximum: distributed Borůvka. Each round every
    component picks its best incident inter-component edge by a STRICT
    total key (weight, tie, canonical id) via one `max_by` aggregation,
    and the picked pair graph is contracted by pointer-doubling hash-min
    label propagation — O(log n) outer rounds, O(log n) inner jumps,
    every shuffle keyed and component-sized. With a strict key order
    Borůvka and Kruskal select the SAME unique forest, so the random
    tie component reproduces RandomMaximumSpanningForest's semantics
    (deterministically, from the seed).
  - union MSF: the weight-class sweep itself, but with components
    maintained INCREMENTALLY — per class (descending) one join marks
    the member edges, then only that class's contracted pair graph is
    label-propagated. The driver loops once per distinct weight class:
    the intended regime is quantized weights (classes ≪ m); a guard
    raises above `max_classes` rather than iterating unbounded.
  - random_spanning_forest: Wilson's walk is inherently sequential
    (each step depends on the previous erased state), exactly like the
    reference — DRIVER-SIDE with a hard `max_edges` guard, the
    flow.max_flow convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.scratch import Scratch


def _canon_edges(g: Graph) -> DataFrame:
    """One row per undirected edge, canonical a < b (self-loops never
    belong to a forest; the reference's forEdges sees each edge once)."""
    e = g.edges.filter("src != dst")
    return (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("weight").cast("double").alias("w"),
        )
        # parallel edges: the sweep would keep only the heaviest copy
        .groupBy("a", "b").agg(F.max("w").alias("w"))
    )


def _merge_pairs(comp: DataFrame, pairs: DataFrame, sc: Scratch) -> DataFrame:
    """Union the component pairs into `comp` (id, comp) and return the
    re-rooted labelling. Pointer-doubling hash-min on the CONTRACTED
    pair graph only — components untouched by `pairs` never shuffle."""
    nodes = (
        pairs.select(F.col("ca").alias("c"))
        .union(pairs.select(F.col("cb").alias("c")))
        .distinct()
    )
    lab = sc.cut(nodes.select("c", F.col("c").alias("lab")))
    sym = sc.cut(
        pairs.select("ca", "cb")
        .union(pairs.select(F.col("cb").alias("ca"), F.col("ca").alias("cb")))
        .distinct()
    )
    changed = 1
    while changed:
        nbr_min = (
            sym.join(lab.withColumnRenamed("c", "ca"), "ca")
            .groupBy(F.col("cb").alias("c"))
            .agg(F.min("lab").alias("nmin"))
        )
        # hash-min + pointer doubling: lab' = min(lab, nbr min, lab(lab))
        hop = lab.select(F.col("c").alias("lab"), F.col("lab").alias("lab2"))
        nxt = (
            lab.join(nbr_min, "c", "left")
            .join(hop, "lab", "left")
            .select(
                "c",
                F.least(
                    "lab",
                    F.coalesce("nmin", "lab"),
                    F.coalesce("lab2", "lab"),
                ).alias("lab"),
                (F.least("lab", F.coalesce("nmin", "lab"),
                         F.coalesce("lab2", "lab")) != F.col("lab"))
                .cast("int").alias("_chg"),
            )
        )
        nxt, m = sc.cut_observed(
            nxt, [F.sum("_chg").alias("chg")], keep=["c", "lab"])
        changed = int(m["chg"] or 0)
        lab = nxt
    return sc.cut(
        comp.join(lab.withColumnRenamed("c", "comp"), "comp", "left")
        .select("id", F.coalesce("lab", "comp").alias("comp"))
    )


def _boruvka(g: Graph, tie_col, max_rounds: int = 64) -> DataFrame:
    """(a, b, weight) of the unique max-weight spanning forest under the
    strict key (w desc, tie desc, a desc, b desc)."""
    spark = g.edges.sparkSession
    with Scratch(spark, "msf") as sc:
        edges = sc.cut(
            _canon_edges(g).withColumn("tie", tie_col)
        )
        comp = sc.cut(g.vertices.select("id", F.col("id").alias("comp")))
        forest = None
        for _ in range(max_rounds):
            lab_a = comp.select(F.col("id").alias("a"),
                                F.col("comp").alias("ca"))
            lab_b = comp.select(F.col("id").alias("b"),
                                F.col("comp").alias("cb"))
            live = (
                edges.join(lab_a, "a").join(lab_b, "b")
                .filter("ca != cb")
            )
            live = sc.cut(live)
            if live.isEmpty():
                break
            key = F.struct("w", "tie", "a", "b")
            ends = live.select(F.col("ca").alias("c"), "a", "b", "w",
                               "tie", "ca", "cb").union(
                live.select(F.col("cb").alias("c"), "a", "b", "w",
                            "tie", "ca", "cb"))
            best = (
                ends.groupBy("c")
                .agg(F.max_by(F.struct("a", "b", "w", "ca", "cb"), key)
                     .alias("e"))
                .select("e.a", "e.b", "e.w", "e.ca", "e.cb")
            )
            picked = sc.cut(best.select("a", "b", "w").distinct())
            forest = picked if forest is None else sc.cut(
                forest.union(picked))
            comp = _merge_pairs(
                comp, best.select("ca", "cb").distinct(), sc)
        else:
            raise RuntimeError(
                "boruvka: not converged in %d rounds" % max_rounds)
        if forest is None:
            out = spark.createDataFrame(
                [], "a long, b long, weight double").persist()
        else:
            out = forest.select("a", "b",
                                F.col("w").alias("weight")).persist()
        out.count()
    return out


def maximum_spanning_forest(g: Graph) -> DataFrame:
    """(a, b, weight): THE max-weight spanning forest under the
    deterministic tie-break (larger canonical id wins)."""
    return _boruvka(g, F.lit(0).cast("long"))


def random_maximum_spanning_forest(g: Graph, seed: int = 42) -> DataFrame:
    """(a, b, weight): a max-weight spanning forest with seeded-random
    tie-breaking among equal weights
    (RandomMaximumSpanningForest.cpp:37-90 semantics)."""
    return _boruvka(g, F.xxhash64("a", "b", F.lit(seed)))


def union_maximum_spanning_forest(g: Graph,
                                  max_classes: int = 4096) -> DataFrame:
    """(a, b, weight): every edge that belongs to at least one
    maximum-weight spanning forest (UnionMaximumSpanningForest.cpp:42-79:
    member iff endpoints disconnected in the strictly-heavier subgraph)."""
    spark = g.edges.sparkSession
    with Scratch(spark, "umsf") as sc:
        edges = sc.cut(_canon_edges(g))
        # count BEFORE collecting: a continuous-weight graph must hit the
        # guard, not the driver's memory
        distinct_w = edges.select("w").distinct()
        n_classes = distinct_w.count()
        if n_classes > max_classes:
            raise ValueError(
                "union_maximum_spanning_forest sweeps one round per "
                f"distinct weight ({n_classes} > max_classes="
                f"{max_classes}); quantize weights or raise the guard")
        classes = [r["w"] for r in distinct_w.orderBy(F.desc("w")).collect()]
        comp = sc.cut(g.vertices.select("id", F.col("id").alias("comp")))
        members = None
        for w in classes:
            lab_a = comp.select(F.col("id").alias("a"),
                                F.col("comp").alias("ca"))
            lab_b = comp.select(F.col("id").alias("b"),
                                F.col("comp").alias("cb"))
            cls = (
                edges.filter(F.col("w") == F.lit(w))
                .join(lab_a, "a").join(lab_b, "b")
                .filter("ca != cb")
            )
            cls = sc.cut(cls)
            if cls.isEmpty():
                continue
            picked = cls.select("a", "b", "w")
            members = picked if members is None else sc.cut(
                members.union(picked))
            comp = _merge_pairs(
                comp, cls.select("ca", "cb").distinct(), sc)
        if members is None:
            out = spark.createDataFrame(
                [], "a long, b long, weight double").persist()
        else:
            out = members.select("a", "b",
                                 F.col("w").alias("weight")).persist()
        out.count()
    return out


def random_spanning_forest(g: Graph, seed: int = 42,
                           max_edges: int = 500_000) -> list[tuple[int, int]]:
    """Uniformly random spanning tree per component — Wilson's
    loop-erased random walks from each component's root
    (RandomSpanningForest.cpp semantics). Sequential like the
    reference; driver-side with a hard guard (flow.max_flow
    convention). Returns canonical (min, max) tree edges."""
    import random as _random
    from collections import defaultdict

    rows = g.edges.filter("src != dst").select("src", "dst").collect()
    if len(rows) > max_edges:
        raise ValueError(
            f"random_spanning_forest is the reference's sequential "
            f"walk; m={len(rows)} exceeds max_edges={max_edges}")
    adj: dict[int, list[int]] = defaultdict(list)
    nodes: set[int] = set()
    seen_e = set()
    for r in rows:
        u, v = int(r["src"]), int(r["dst"])
        nodes.update((u, v))
        if (min(u, v), max(u, v)) in seen_e:
            continue
        seen_e.add((min(u, v), max(u, v)))
        adj[u].append(v)
        adj[v].append(u)
    for r in g.vertices.select("id").collect():
        nodes.add(int(r["id"]))
    for u in adj:
        adj[u].sort()
    rng = _random.Random(seed)
    in_tree: set[int] = set()
    parent: dict[int, int] = {}
    # Wilson: root each component at its min id, then loop-erased walks
    comp_of: dict[int, int] = {}
    for start in sorted(nodes):
        if start in comp_of:
            continue
        stack, root = [start], start
        comp_of[start] = root
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in comp_of:
                    comp_of[v] = root
                    stack.append(v)
        in_tree.add(root)
    for u in sorted(nodes):
        if u in in_tree:
            continue
        path = [u]
        pos = {u: 0}
        cur = u
        while cur not in in_tree:
            nxt = adj[cur][rng.randrange(len(adj[cur]))]
            if nxt in pos:  # loop erasure
                del_from = pos[nxt] + 1
                for x in path[del_from:]:
                    del pos[x]
                path = path[:del_from]
                cur = nxt
            else:
                path.append(nxt)
                pos[nxt] = len(path) - 1
                cur = nxt
        for i in range(len(path) - 1):
            parent[path[i]] = path[i + 1]
            in_tree.add(path[i])
    return sorted((min(u, v), max(u, v)) for u, v in parent.items())
