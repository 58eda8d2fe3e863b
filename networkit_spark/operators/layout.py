"""Graph layout: PivotMDS (Brandes & Pich), the viz/ module's
distributed-friendly member.

Reference: /root/reference/networkit/cpp/viz/PivotMDS.cpp:23-106 and
viz/GraphLayoutAlgorithm.h. The reference picks `numPivots` random
nodes, runs Dijkstra from each, double-centers the n×k pivot-distance
matrix C (NOTE: the reference centers the RAW distances, not squared,
and only over EXPLICIT (node, pivot) entries — unreached pairs stay
implicit zeros; we mirror both exactly, deviations from the paper
included), then power-iterates C^T C for the top `dim` eigenvectors
and maps coordinates as C·v.

Spark formulation:
  - pivot distances: ONE batched multi-source BFS keyed by pivot
    (closeness._dist_rows — the betweenness strata machinery), or a
    per-pivot Bellman-Ford sweep for weighted graphs (k is small —
    k sequential SSSPs, each fully distributed).
  - centering: two keyed aggregations (row means per node, col means
    per pivot) + one scalar agg — joined back, never an n×k collect.
  - C^T C: k×k — accumulated per Arrow batch as a partial outer
    product in mapInPandas (k² doubles per partition cross the wire,
    not n×k), eigensolved on the driver with numpy (k×k is tiny; the
    reference's power method computes the same top-dim eigenvectors).
  - coordinates: C·v as a zip_with/aggregate over the per-node dense
    pivot vector — one narrow projection, no shuffle.

The viz/ rest (FruchtermanReingold's all-pairs repulsion sweeps,
MaxentStress, MultilevelLayouter) is declared out of scope: their
inner loops are n² force models with no aggregation structure that
survives 100×; PivotMDS is the member built FOR large graphs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def choose_pivots(g: Graph, num_pivots: int, seed: int = 42) -> list[int]:
    """Seeded deterministic pivot sample: the k smallest xxhash64(id)
    (PivotMDS.cpp:computePivots draws without replacement; a hash
    order IS a seeded uniform permutation, and it distributes)."""
    rows = (
        g.vertices.select("id")
        .orderBy(F.xxhash64("id", F.lit(seed)), F.col("id"))
        .limit(num_pivots)
        .collect()
    )
    return [int(r["id"]) for r in rows]


def _pivot_distances(g: Graph, pivots: list[int]) -> DataFrame:
    """(s, v, d) explicit finite distances, INCLUDING the d(s,s)=0
    diagonal (the reference emits an explicit 0 triplet for the pivot
    itself, which then gets centered — PivotMDS.cpp:36)."""
    spark = g.edges.sparkSession
    piv_df = spark.createDataFrame([(p,) for p in pivots], "s long")
    if g.weighted:
        from networkit_spark.operators.distances import sssp

        parts = []
        for p in pivots:
            d = sssp(g, p)
            parts.append(
                d.filter(F.col("dist").isNotNull())
                .select(F.lit(p).alias("s"), F.col("id").alias("v"),
                        F.col("dist").cast("double").alias("d")))
        rows = parts[0]
        for p in parts[1:]:
            rows = rows.union(p)
        return rows
    from networkit_spark.operators.closeness import _dist_rows

    rows, scratch = _dist_rows(g, sources=piv_df)
    diag = piv_df.select("s", F.col("s").alias("v"),
                         F.lit(0.0).alias("d"))
    if rows is None:
        out = diag.persist()
    else:
        out = rows.select("s", "v", F.col("d").cast("double").alias("d")) \
                  .union(diag).persist()
    out.count()
    scratch.cleanup()
    return out


def pivot_mds(g: Graph, dim: int = 2, num_pivots: int = 30,
              seed: int = 42) -> DataFrame:
    """(id, x0 .. x{dim-1}): PivotMDS coordinates.

    Mirrors PivotMDS.cpp:23-106 — raw-distance double centering over
    explicit entries, top-`dim` eigenvectors of C^T C, coords = C·v.
    Deterministic for a given seed (numpy eigh on the driver replaces
    the reference's power iteration; same eigenspace, sign fixed by
    the largest-magnitude component)."""
    n = g.vertices.count()
    k = min(num_pivots, n)
    if k == 0:
        return g.vertices.select("id", *[
            F.lit(0.0).alias(f"x{d}") for d in range(dim)])
    pivots = choose_pivots(g, k, seed)
    pidx = {p: j for j, p in enumerate(pivots)}
    spark = g.edges.sparkSession
    rows = _pivot_distances(g, pivots)
    jmap = spark.createDataFrame(
        [(p, j) for p, j in pidx.items()], "s long, j int")
    rows = rows.join(jmap, "s").select("v", "j", "d")

    # double centering over explicit entries (PivotMDS.cpp:47-69)
    row_mean = rows.groupBy("v").agg(
        (F.sum("d") / F.lit(float(k))).alias("rm"))
    col_mean = rows.groupBy("j").agg(
        (F.sum("d") / F.lit(float(n))).alias("cm"))
    grand = (
        row_mean.agg((F.sum("rm") / F.lit(2.0 * n)).alias("g1"))
        .crossJoin(col_mean.agg((F.sum("cm") / F.lit(2.0 * k)).alias("g2")))
        .select((F.col("g1") + F.col("g2")).alias("g"))
        .collect()[0]["g"]
    )
    centered = (
        rows.join(row_mean, "v").join(F.broadcast(col_mean), "j")
        .select("v", "j",
                (F.col("d") - F.col("rm") - F.col("cm")
                 + F.lit(float(grand))).alias("c"))
    )
    # dense per-node pivot vector (missing = implicit 0, uncentered —
    # the reference's CSR keeps only explicit triplets)
    vecs = (
        centered.groupBy("v")
        .agg(F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("j", "c")))).alias("m"))
        .select("v", F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda jj: F.coalesce(F.element_at("m", jj), F.lit(0.0)),
        ).alias("vec"))
    )
    vecs = vecs.persist()
    vecs.count()

    # C^T C as per-batch partial outer products (k x k per partition)
    def _partial_ctc(batches):
        acc = np.zeros((k, k), dtype=np.float64)
        any_rows = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_rows = True
            C = np.asarray(list(pdf["vec"]), dtype=np.float64)
            acc += C.T @ C
        if any_rows:
            yield pd.DataFrame({"m": [acc.ravel().tolist()]})

    partials = vecs.select("vec").mapInPandas(
        _partial_ctc, "m array<double>").collect()
    M = np.zeros((k, k), dtype=np.float64)
    for r in partials:
        M += np.asarray(r["m"], dtype=np.float64).reshape(k, k)
    evals, evecs = np.linalg.eigh(M)
    order = np.argsort(evals)[::-1][:dim]
    cols = [F.col("v").alias("id")]
    for d_i, idx in enumerate(order):
        v = evecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:  # fix the sign convention
            v = -v
        lit = F.array(*[F.lit(float(x)) for x in v])
        cols.append(
            F.aggregate(
                F.zip_with("vec", lit, lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x,
            ).alias(f"x{d_i}"))
    out = vecs.select(*cols)
    # vertices with no explicit entry (isolated from every pivot) sit
    # at the origin, like the reference's untouched coordinate vector
    missing = g.vertices.select("id").join(
        out.select("id"), "id", "left_anti").select(
        "id", *[F.lit(0.0).alias(f"x{d_i}") for d_i in range(dim)])
    res = out.unionByName(missing).persist()
    res.count()
    vecs.unpersist()
    return res


def fruchterman_reingold(g: Graph, max_iter: int = 30, prec: float = 1e-3,
                         seed: int = 42,
                         grid_cells: int | None = None) -> DataFrame:
    """(id, x, y): force-directed layout on the unit square — the
    grid-bucketed batch formulation of FruchtermanReingold
    (/root/reference/networkit/cpp/viz/FruchtermanReingold.cpp:23-160).

    Reference semantics mirrored exactly where batchable:
      - optPairSqrDist = 0.3 · area / n (unit frame → 0.3/n);
      - repulsion between a pair at squared distance s²:
        (p1−p2) · optPairSqrDist/s² (zero when coincident, :51-58);
      - attraction along each edge: (p1−p2) · dist/optPairDist (:39-47);
      - move: every node steps EXACTLY ``step`` in its net-force
        direction, then clamps to the frame (:65-77) — the per-round
        displacement bound is structural;
      - cooling: step_t = 1/(1 + 0.1·t) (:84-88), convergence when
        Σ‖move‖ < prec or ``max_iter`` rounds (:92-101).

    The ONE deviation (the reason the reference's n² loop doesn't
    scale): repulsion is restricted to grid-neighbor cells — the unit
    square is cut into m×m cells with 1/m ≥ 2·optPairDist, each node
    joins the 9 cells around it (the pub_web_edges candidate-join
    shape, no torus wrap), so every pair closer than 1/m ≥ 2·optPairDist
    repels exactly and far-field terms (magnitude ≤ optPairSqrDist/
    (1/m) ≈ optPairDist/2 per pair, decaying as 1/dist) are dropped.
    This is the classic grid variant from Fruchterman & Reingold's own
    paper (§4.1 "grid variant"). Candidate volume is Σ_cell 9·B² with
    B ≈ n/m² = O(0.3·…) nodes per cell under the near-uniform layouts
    the clamp+repulsion drive toward — linear in n, and the join keys
    (cx, cy) shuffle-partition it.

    Initial positions are hash-uniform in [0,1]² (reference
    initialize() draws uniformly; a seeded hash IS that draw,
    order-free). Deterministic up to float summation order (the
    per-node force sum is a partition-order float reduction), hence
    gated rows-only. Per-round lineage is cut through a Scratch with
    the Σ‖move‖ metric observed on the write — one action per round."""
    import math

    from networkit_spark.plans.scratch import Scratch

    n = g.num_vertices()
    spark = g.edges.sparkSession
    if n == 0:
        return spark.createDataFrame([], "id long, x double, y double")
    opt2 = 0.3 / n
    opt = math.sqrt(opt2)
    if grid_cells is None:
        grid_cells = max(1, min(int(1.0 / (2.0 * opt)), 256))
    m = grid_cells

    def _u01(col, salt):
        return (F.pmod(F.xxhash64(col, F.lit(seed), F.lit(salt)),
                       F.lit(1 << 30)).cast("double") / F.lit(float(1 << 30)))

    pos = g.vertices.select(
        "id", _u01(F.col("id"), 0).alias("x"), _u01(F.col("id"), 1).alias("y"))
    # each edge pulls BOTH endpoints (reference :133-137 applies ±attr
    # to u and v per edge) — one orientation-doubled table serves
    # directed and undirected alike
    sym = g.edges.select("src", "dst")
    sym = sym.union(sym.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst"))).distinct()
    sym = sym.persist()
    sym.count()

    sc = Scratch(spark, "frlayout")
    try:
        cur = sc.cut(pos, name="init")
        step = 1.0
        cool = 1.0
        for it in range(max_iter):
            cellx = F.floor(F.col("x") * m).cast("long")
            celly = F.floor(F.col("y") * m).cast("long")
            probe = (cur.select(
                "id", "x", "y",
                F.explode(F.array(*[
                    F.struct((cellx + i).alias("cx"), (celly + j).alias("cy"))
                    for i in (-1, 0, 1) for j in (-1, 0, 1)])).alias("c"))
                .select("id", "x", "y", "c.cx", "c.cy")
                .filter((F.col("cx") >= 0) & (F.col("cx") < m)
                        & (F.col("cy") >= 0) & (F.col("cy") < m)))
            home = cur.select(F.col("id").alias("id2"),
                              F.col("x").alias("x2"), F.col("y").alias("y2"),
                              F.least(F.floor(F.col("x") * m).cast("long"),
                                      F.lit(m - 1)).alias("cx"),
                              F.least(F.floor(F.col("y") * m).cast("long"),
                                      F.lit(m - 1)).alias("cy"))
            dx, dy = F.col("x") - F.col("x2"), F.col("y") - F.col("y2")
            d2 = dx * dx + dy * dy
            rep = (probe.join(home, ["cx", "cy"])
                   .filter(F.col("id") != F.col("id2"))
                   .select("id",
                           F.when(d2 > 0, dx * F.lit(opt2) / d2)
                           .otherwise(F.lit(0.0)).alias("fx"),
                           F.when(d2 > 0, dy * F.lit(opt2) / d2)
                           .otherwise(F.lit(0.0)).alias("fy")))
            # attraction: forces[u] -= (pu−pv)·dist/opt  (both directions
            # via the symmetrized edge table)
            pu = cur.select(F.col("id").alias("src"),
                            F.col("x").alias("ux"), F.col("y").alias("uy"))
            pv = cur.select(F.col("id").alias("dst"),
                            F.col("x").alias("vx"), F.col("y").alias("vy"))
            adx, ady = F.col("ux") - F.col("vx"), F.col("uy") - F.col("vy")
            adist = F.sqrt(adx * adx + ady * ady)
            attr = (sym.join(pu, "src").join(pv, "dst")
                    .select(F.col("src").alias("id"),
                            (-adx * adist / F.lit(opt)).alias("fx"),
                            (-ady * adist / F.lit(opt)).alias("fy")))
            force = (rep.unionByName(attr).groupBy("id")
                     .agg(F.sum("fx").alias("fx"), F.sum("fy").alias("fy")))
            flen = F.sqrt(F.col("fx") * F.col("fx") + F.col("fy") * F.col("fy"))
            moved = (cur.join(force, "id", "left")
                     .select(
                         "id", "x", "y",
                         F.when(F.coalesce(flen, F.lit(0.0)) > 0,
                                F.greatest(F.lit(0.0), F.least(
                                    F.lit(1.0),
                                    F.col("x") + F.lit(step) * F.col("fx")
                                    / flen))).otherwise(F.col("x"))
                         .alias("nx"),
                         F.when(F.coalesce(flen, F.lit(0.0)) > 0,
                                F.greatest(F.lit(0.0), F.least(
                                    F.lit(1.0),
                                    F.col("y") + F.lit(step) * F.col("fy")
                                    / flen))).otherwise(F.col("y"))
                         .alias("ny")))
            ddx, ddy = F.col("nx") - F.col("x"), F.col("ny") - F.col("y")
            nxt = moved.select(
                "id", F.col("nx").alias("x"), F.col("ny").alias("y"),
                F.sqrt(ddx * ddx + ddy * ddy).alias("_move"))
            cur, met = sc.cut_observed(
                nxt, [F.sum("_move").alias("change")],
                keep=["id", "x", "y"], name=f"it{it}")
            cool += 0.1
            step = 1.0 / cool
            if float(met["change"] or 0.0) < prec:
                break
        out = cur.persist()
        out.count()
    finally:
        sym.unpersist()
        sc.cleanup()
    return out
