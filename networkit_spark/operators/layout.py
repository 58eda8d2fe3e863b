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
