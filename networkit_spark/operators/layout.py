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

Also here (round 5): ``fruchterman_reingold`` — the reference's force
model with repulsion grid-bucketed to neighbor cells (the FR paper's
own grid variant, linear candidate volume instead of the n² sweep) —
``multilevel_layout`` (MultilevelLayouter.cpp: PLP-cluster →
contract → recurse → prolong → FR refine), and ``maxent_stress``
(MaxentStress.cpp: k-hop stress + entropy anneal, CG Laplacian solves,
grid Barnes–Hut repulsion). The full viz/ surface is covered.
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
                         grid_cells: int | None = None,
                         init_pos: DataFrame | None = None) -> DataFrame:
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

    if init_pos is not None:
        # useGivenCoordinates mode (reference Layouter ctor flag):
        # refine a supplied layout; missing ids fall back to hash init
        pos = (g.vertices.join(
            init_pos.select("id", F.col("x").alias("_ix"),
                            F.col("y").alias("_iy")), "id", "left")
            .select(
                "id",
                F.greatest(F.lit(0.0), F.least(F.lit(1.0), F.coalesce(
                    "_ix", _u01(F.col("id"), 0)))).alias("x"),
                F.greatest(F.lit(0.0), F.least(F.lit(1.0), F.coalesce(
                    "_iy", _u01(F.col("id"), 1)))).alias("y")))
    else:
        pos = g.vertices.select(
            "id", _u01(F.col("id"), 0).alias("x"),
            _u01(F.col("id"), 1).alias("y"))
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


def multilevel_layout(g: Graph, n_thresh: int = 15, seed: int = 42,
                      fr_iter: int = 30, max_levels: int = 12) -> DataFrame:
    """(id, x, y): MultilevelLayouter
    (/root/reference/networkit/cpp/viz/MultilevelLayouter.cpp:33-80):
    cluster with PLP, contract by the clustering
    (ParallelPartitionCoarsening), lay out the coarse graph recursively,
    prolong each fine node to its coarse cluster's coordinate, refine
    with FruchtermanReingold in useGivenCoordinates mode. The coarsest
    graph (n <= ``n_thresh``, the reference's N_THRSH = 15) gets a cold
    FR layout.

    Every level's pieces are the repo's distributed operators
    (label_propagation / coarsen / fruchterman_reingold); the recursion
    depth is O(log n) when PLP contracts geometrically, bounded by
    ``max_levels`` (PLP can stall on cluster-free graphs — a level that
    fails to shrink the graph stops the recursion, the reference would
    recurse forever there)."""
    from networkit_spark.operators.coarsening import coarsen
    from networkit_spark.operators.lpa import label_propagation

    n = g.num_vertices()
    if n <= n_thresh or max_levels == 0:
        return fruchterman_reingold(g, max_iter=fr_iter, seed=seed)
    labels = label_propagation(g)
    labels = labels.persist()
    n_coarse = labels.select("label").distinct().count()
    if n_coarse >= n:  # no contraction — recursion would not terminate
        labels.unpersist()
        return fruchterman_reingold(g, max_iter=fr_iter, seed=seed)
    gc = coarsen(g, labels)
    coarse_pos = multilevel_layout(gc, n_thresh=n_thresh, seed=seed,
                                   fr_iter=fr_iter,
                                   max_levels=max_levels - 1)
    # prolong: each fine node starts at its cluster's coarse coordinate
    init = (labels.join(coarse_pos.withColumnRenamed("id", "label"),
                        "label")
            .select("id", "x", "y"))
    out = fruchterman_reingold(g, max_iter=fr_iter, seed=seed,
                               init_pos=init)
    labels.unpersist()
    return out


def maxent_stress(g: Graph, k: int = 2, q: float | None = None,
                  dim: int = 2, alpha: float = 1.0,
                  alpha_reduction: float = 0.3, final_alpha: float = 0.008,
                  max_solves_per_alpha: int = 5,
                  conv_threshold: float = 1e-6, cg_tol: float = 1e-6,
                  cg_iter: int = 60, grid_cells: int = 16,
                  seed: int = 42) -> DataFrame:
    """(id, x, y): MaxentStress layout
    (/root/reference/networkit/cpp/viz/MaxentStress.cpp:56-183, Gansner
    et al. maxent-stress model): minimize stress over the KNOWN distance
    set S (k-hop neighborhoods, w_uv = 1/d_uv², MaxentStress.h:308) plus
    an entropy term over unknown pairs, by repeatedly solving the
    weighted-Laplacian system  L x_d = rhs_d  per dimension and
    annealing the entropy weight α (×0.3 per round until < 0.008).

    Faithful pieces (same formulas, file:line):
      - rhs = Σ_{(u,v)∈S} w·d/max(‖x_u−x_v‖,1e-5)·(x_u−x_v)  (:377-392,
        including the reference's /dist correction to the paper);
      - first ⌈solves/5⌉ solves normalize the stress rhs per-dim before
        adding α·repulsion (:119-124); rhs made zero-sum (:129-142);
      - repulsion magnitude sign(q)/max(‖Δ‖²,ε)^((q+2)/2), per-dim
        2-norm normalized (:404-447); q defaults to 0, or 0.8 when >30%
        of vertices have degree 1 (:480-489);
      - convergence: Σ‖x_new−x_old‖²/Σ‖x_old‖² < threshold (:322-335);
      - connected graphs only (:58-62 throws).

    Batch deviations (documented): the octree far-field approximation
    becomes a ONE-LEVEL grid Barnes–Hut — exact pairwise repulsion
    inside the 3×3 neighbor-cell ring, per-cell center-of-mass beyond
    it (n·m² candidate rows, m = ``grid_cells``); repulsive forces are
    recomputed every solve (the reference's floor(5·ln s) staleness
    schedule is a CPU-cache trick, recomputing is strictly more
    accurate); Gauss–Seidel-free: the solver is the repo's distributed
    CG with Jacobi preconditioning (the reference offers the same CG
    option, :30-46); unweighted graphs only (hop distances; the
    reference's Dijkstra k-neighborhood needs per-node heaps).
    maxSolvesPerAlpha defaults to 5 instead of 50 — each solve is a CG
    job chain, and the anneal converges in far fewer on the sizes the
    fixtures cover; raise it for print-quality layouts."""
    import math

    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.degrees import out_degrees
    from networkit_spark.operators.distances import k_hop_pairs
    from networkit_spark.operators.numerics import conjugate_gradient
    from networkit_spark.plans.scratch import Scratch

    if dim != 2:
        raise ValueError("maxent_stress: dim=2 only in this build")
    if g.weighted:
        raise ValueError("maxent_stress: unweighted graphs only "
                         "(k-hop distances are hop counts)")
    n = g.num_vertices()
    spark = g.edges.sparkSession
    if n == 0:
        return spark.createDataFrame([], "id long, x double, y double")
    ncomp = connected_components(g).select("component").distinct().count()
    if ncomp != 1:
        raise ValueError("maxent_stress: graph must be connected "
                         "(MaxentStress.cpp:58-62)")
    if q is None:
        deg1 = out_degrees(g).filter(F.col("degree") == 1).count()
        q = 0.8 if deg1 / n > 0.3 else 0.0
    qsign = 1.0 if q >= 0 else -1.0
    q2 = (q + 2.0) / 2.0
    m = grid_cells

    sc = Scratch(spark, "maxent")
    try:
        S = sc.cut(
            k_hop_pairs(g, k, scratch=sc).filter(F.col("dist") >= 1)
            .select(F.col("id").alias("u"), F.col("other").alias("v"),
                    F.col("dist").cast("double").alias("d"))
            # try_divide: the d=0 self-pair union branch is filtered
            # out, but ANSI constant folding would still evaluate the
            # literal division at plan time and throw
            .withColumn("w", F.try_divide(F.lit(1.0),
                                          F.col("d") * F.col("d"))), "S")
        # weighted Laplacian triplets (MaxentStress.cpp:338-373)
        lap = S.select(F.col("u").alias("row"), F.col("v").alias("col"),
                       (-F.col("w")).alias("val")).union(
            S.groupBy(F.col("u").alias("row"))
            .agg(F.sum("w").alias("val"))
            .select("row", F.col("row").alias("col"), "val"))
        lap = sc.cut(lap, "lap")

        def _u01(col, salt):
            return (F.pmod(F.xxhash64(col, F.lit(seed), F.lit(salt)),
                           F.lit(1 << 30)).cast("double")
                    / F.lit(float(1 << 30)))

        # randomSphereCoordinates: points on the unit circle
        theta = _u01(F.col("id"), 0) * (2.0 * math.pi)
        cur = sc.cut(g.vertices.select(
            "id", F.cos(theta).alias("x"), F.sin(theta).alias("y")), "x0")

        def repulsion(coords):
            bb = coords.agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
                            F.min("y").alias("y0"), F.max("y").alias("y1")
                            ).collect()[0]
            span = max(bb["x1"] - bb["x0"], bb["y1"] - bb["y0"], 1e-9)
            cellx = F.least(F.floor((F.col("x") - bb["x0"]) / span * m),
                            F.lit(m - 1)).cast("long")
            celly = F.least(F.floor((F.col("y") - bb["y0"]) / span * m),
                            F.lit(m - 1)).cast("long")
            pts = coords.select("id", "x", "y", cellx.alias("cx"),
                                celly.alias("cy"))
            cells = (pts.groupBy("cx", "cy")
                     .agg(F.count(F.lit(1)).alias("cnt"),
                          F.avg("x").alias("comx"),
                          F.avg("y").alias("comy")))
            # near field: exact pairs within the 3x3 neighbor ring
            probe = pts.select(
                "id", "x", "y",
                F.explode(F.array(*[
                    F.struct((F.col("cx") + i).alias("ncx"),
                             (F.col("cy") + j).alias("ncy"))
                    for i in (-1, 0, 1) for j in (-1, 0, 1)])).alias("c")
            ).select("id", "x", "y", "c.ncx", "c.ncy")
            other = pts.select(F.col("id").alias("id2"),
                               F.col("x").alias("x2"),
                               F.col("y").alias("y2"),
                               F.col("cx").alias("ncx"),
                               F.col("cy").alias("ncy"))
            ndx, ndy = F.col("x") - F.col("x2"), F.col("y") - F.col("y2")
            nsq = ndx * ndx + ndy * ndy
            near = (probe.join(other, ["ncx", "ncy"])
                    .filter((F.col("id") != F.col("id2")) & (nsq >= 1e-5))
                    .select("id",
                            (F.lit(qsign) * ndx
                             / F.pow(F.greatest(nsq, F.lit(1e-3)),
                                     F.lit(q2))).alias("fx"),
                            (F.lit(qsign) * ndy
                             / F.pow(F.greatest(nsq, F.lit(1e-3)),
                                     F.lit(q2))).alias("fy")))
            # far field: per-cell center of mass beyond the ring
            fdx = F.col("x") - F.col("comx")
            fdy = F.col("y") - F.col("comy")
            fsq = fdx * fdx + fdy * fdy
            far = (pts.join(
                F.broadcast(cells.select(F.col("cx").alias("fcx"),
                                         F.col("cy").alias("fcy"),
                                         "cnt", "comx", "comy")),
                (F.abs(F.col("cx") - F.col("fcx")) > 1)
                | (F.abs(F.col("cy") - F.col("fcy")) > 1))
                .filter(fsq >= 1e-5)
                .select("id",
                        (F.lit(qsign) * F.col("cnt") * fdx
                         / F.pow(F.greatest(fsq, F.lit(1e-3)),
                                 F.lit(q2))).alias("fx"),
                        (F.lit(qsign) * F.col("cnt") * fdy
                         / F.pow(F.greatest(fsq, F.lit(1e-3)),
                                 F.lit(q2))).alias("fy")))
            b = (near.unionByName(far).groupBy("id")
                 .agg(F.sum("fx").alias("fx"), F.sum("fy").alias("fy")))
            b = coords.select("id").join(b, "id", "left").select(
                "id", F.coalesce("fx", F.lit(0.0)).alias("fx"),
                F.coalesce("fy", F.lit(0.0)).alias("fy"))
            b = sc.cut(b)
            norms = b.agg(
                F.sqrt(F.sum(F.col("fx") * F.col("fx"))).alias("nx"),
                F.sqrt(F.sum(F.col("fy") * F.col("fy"))).alias("ny")
            ).collect()[0]
            return b.select(
                "id",
                (F.col("fx") / F.lit(max(norms["nx"] or 0.0, 1e-12)))
                .alias("fx"),
                (F.col("fy") / F.lit(max(norms["ny"] or 0.0, 1e-12)))
                .alias("fy"))

        cur_alpha = alpha
        converged = False
        norm_solves = max(1, max_solves_per_alpha // 5)
        while not converged:
            for s_i in range(max_solves_per_alpha):
                rep = repulsion(cur)
                xu = cur.select(F.col("id").alias("u"),
                                F.col("x").alias("xu"),
                                F.col("y").alias("yu"))
                xv = cur.select(F.col("id").alias("v"),
                                F.col("x").alias("xv"),
                                F.col("y").alias("yv"))
                sdx, sdy = F.col("xu") - F.col("xv"), F.col("yu") - F.col("yv")
                sdist = F.greatest(F.sqrt(sdx * sdx + sdy * sdy),
                                   F.lit(1e-5))
                w2 = F.col("w") * F.col("d") / sdist
                rhs = (S.join(xu, "u").join(xv, "v")
                       .groupBy(F.col("u").alias("id"))
                       .agg(F.sum(w2 * sdx).alias("rx"),
                            F.sum(w2 * sdy).alias("ry")))
                rhs = cur.select("id").join(rhs, "id", "left").select(
                    "id", F.coalesce("rx", F.lit(0.0)).alias("rx"),
                    F.coalesce("ry", F.lit(0.0)).alias("ry"))
                rhs = sc.cut(rhs)
                if s_i < norm_solves:
                    nn = rhs.agg(
                        F.sqrt(F.sum(F.col("rx") * F.col("rx"))).alias("nx"),
                        F.sqrt(F.sum(F.col("ry") * F.col("ry"))).alias("ny")
                    ).collect()[0]
                    rhs = rhs.select(
                        "id",
                        (F.col("rx") / F.lit(max(nn["nx"] or 0.0, 1e-12)))
                        .alias("rx"),
                        (F.col("ry") / F.lit(max(nn["ny"] or 0.0, 1e-12)))
                        .alias("ry"))
                full = (rhs.join(rep, "id")
                        .select("id",
                                (F.col("rx") + F.lit(cur_alpha)
                                 * F.col("fx")).alias("rx"),
                                (F.col("ry") + F.lit(cur_alpha)
                                 * F.col("fy")).alias("ry")))
                means = full.agg(F.avg("rx").alias("mx"),
                                 F.avg("ry").alias("my")).collect()[0]
                full = sc.cut(full.select(
                    "id", (F.col("rx") - F.lit(means["mx"])).alias("rx"),
                    (F.col("ry") - F.lit(means["my"])).alias("ry")))
                nx = conjugate_gradient(
                    lap, full.select("id", F.col("rx").alias("val")),
                    tol=cg_tol, max_iter=cg_iter)
                ny = conjugate_gradient(
                    lap, full.select("id", F.col("ry").alias("val")),
                    tol=cg_tol, max_iter=cg_iter)
                new = (nx.select("id", F.col("val").alias("x"))
                       .join(ny.select("id", F.col("val").alias("y")), "id"))
                chg = (cur.select("id", F.col("x").alias("ox"),
                                  F.col("y").alias("oy"))
                       .join(new, "id")
                       .agg(F.sum((F.col("x") - F.col("ox"))
                                  * (F.col("x") - F.col("ox"))
                                  + (F.col("y") - F.col("oy"))
                                  * (F.col("y") - F.col("oy"))).alias("rc"),
                            F.sum(F.col("ox") * F.col("ox")
                                  + F.col("oy") * F.col("oy")).alias("sq"))
                       .collect()[0])
                cur = sc.cut(new.select("id", "x", "y"))
                if (float(chg["rc"] or 0.0)
                        / max(float(chg["sq"] or 0.0), 1e-12)
                        < conv_threshold):
                    converged = True
                    break
            cur_alpha *= alpha_reduction
            converged = converged or cur_alpha < final_alpha
        out = cur.persist()
        out.count()
    finally:
        sc.cleanup()
    return out
