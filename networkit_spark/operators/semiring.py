"""Semiring (GraphBLAS-ish) backend: SpMV over the edge DataFrame, and
the algorithms the reference's algebraic/ module expresses through it.
(AlgebraicDistance — a distance heuristic, not part of this backend —
lives in operators/algebraic.py.)

Reference counterparts (/root/reference/networkit/cpp/algebraic/):
  - CSRMatrix.h/.cpp — the sparse-matrix container. A DataFrame of
    (row, col, val) IS that container in relational form; Catalyst
    plans the products, so no CSR layout is re-implemented.
  - algorithms/AlgebraicBFS.h — BFS as min-plus matrix-vector products
    to a fixpoint.
  - algorithms/AlgebraicBellmanFord.h — same semiring with real
    weights.
  - algorithms/AlgebraicPageRank.h — plus-times SpMV iteration.
  - algorithms/AlgebraicTriangleCounting.h:63-70 — per-node counts as
    diag(A³)/2.

SpMV y = A^T ⊗ x (message to `col` from `row`) is one join + one keyed
aggregation — the exact dataflow every iterative kernel in this engine
already uses; this module just names the algebra. Each algorithm here
is verified in tests against its non-algebraic twin (bfs, sssp,
pagerank, triangle counts) — same fixpoints by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.scratch import Scratch

#: semiring table: name -> (aggregate fn, combine expression)
_ADD = {"sum": F.sum, "min": F.min, "max": F.max}
_MUL = {
    "times": lambda a, v: a * v,
    "plus": lambda a, v: a + v,
}


def spmv(matrix: DataFrame, vec: DataFrame, add: str = "sum",
         mul: str = "times") -> DataFrame:
    """y[col] = ADD_{row} MUL(A[row,col], x[row]).

    `matrix`: (row, col, val); `vec`: (id, val). One shuffle, keyed by
    `col`; map-side partial aggregation applies for sum/min/max."""
    agg = _ADD[add]
    combine = _MUL[mul]
    return (
        matrix.join(vec.select(F.col("id").alias("row"),
                               F.col("val").alias("x")), "row")
        .select(F.col("col").alias("id"),
                combine(F.col("val"), F.col("x")).alias("t"))
        .groupBy("id").agg(agg("t").alias("val"))
    )


def _adjacency(g: Graph, weighted: bool) -> DataFrame:
    e = g.edges.select(F.col("src").alias("row"),
                       F.col("dst").alias("col"),
                       (F.col("weight") if weighted
                        else F.lit(1.0)).alias("val"))
    if g.directed:
        return e
    back = e.select(F.col("col").alias("row"), F.col("row").alias("col"),
                    "val")
    return e.union(back)


def algebraic_bfs(g: Graph, source: int, max_iter: int = 1 << 20) -> DataFrame:
    """(id, dist): BFS as a (min, plus) SpMV fixpoint over the 0/1
    adjacency (AlgebraicBFS.h semantics). Matches operators.distances.bfs."""
    spark = g.edges.sparkSession
    with Scratch(spark, "abfs") as sc:
        A = sc.cut(_adjacency(g, weighted=False))
        x = sc.cut(g.vertices.select(
            "id",
            F.when(F.col("id") == source, F.lit(0.0)).alias("val")))
        for _ in range(max_iter):
            relaxed = spmv(A, x.filter(F.col("val").isNotNull()),
                           add="min", mul="plus")
            old = F.coalesce("val", F.lit(float("inf")))
            v2 = F.least(old, F.coalesce("nv", F.lit(float("inf"))))
            nxt = (
                x.join(relaxed.withColumnRenamed("val", "nv"), "id", "left")
                .select("id",
                        F.when(v2 != float("inf"), v2).alias("val"),
                        (v2 < old).cast("int").alias("_chg"))
            )
            nxt, m = sc.cut_observed(
                nxt, [F.sum("_chg").alias("chg")], keep=["id", "val"])
            x = nxt
            if not int(m["chg"] or 0):
                break
        else:
            raise RuntimeError("algebraic_bfs: not converged")
        out = x.select("id", F.col("val").cast("long").alias("dist")) \
               .persist()
        out.count()
    return out


def algebraic_bellman_ford(g: Graph, source: int,
                           max_iter: int = 200) -> DataFrame:
    """(id, dist): weighted SSSP as (min, plus) SpMV over real weights
    (AlgebraicBellmanFord.h). Matches operators.distances.sssp."""
    spark = g.edges.sparkSession
    with Scratch(spark, "abf") as sc:
        A = sc.cut(_adjacency(g, weighted=True))
        x = sc.cut(g.vertices.select(
            "id",
            F.when(F.col("id") == source, F.lit(0.0)).alias("val")))
        for _ in range(max_iter):
            relaxed = spmv(A, x.filter(F.col("val").isNotNull()),
                           add="min", mul="plus")
            nxt = (
                x.join(relaxed.withColumnRenamed("val", "nv"), "id", "left")
                .select(
                    "id",
                    F.when(
                        F.col("val").isNull() | (F.col("nv") < F.col("val")),
                        F.col("nv")).otherwise(F.col("val")).alias("nval"),
                    ((F.col("nv").isNotNull()
                      & (F.col("val").isNull()
                         | (F.col("nv") < F.col("val"))))
                     .cast("int")).alias("_chg"))
                .withColumnRenamed("nval", "val")
            )
            nxt, m = sc.cut_observed(
                nxt, [F.sum("_chg").alias("chg")], keep=["id", "val"])
            x = nxt
            if not int(m["chg"] or 0):
                break
        else:
            raise RuntimeError(
                "algebraic_bellman_ford: no fixpoint in %d iterations "
                "(negative cycle?)" % max_iter)
        out = x.select("id", F.col("val").alias("dist")).persist()
        out.count()
    return out


def algebraic_triangle_counting(g: Graph) -> DataFrame:
    """(id, triangles): diag(A³)/2 per node for the undirected 0/1
    adjacency (AlgebraicTriangleCounting.h:63-70). The closed-wedge
    join below IS diag(A³) — paths i→j→k joined back to the i–k edge —
    expressed relationally so the k-path blowup never materializes past
    the semi-join."""
    A = _adjacency(g, weighted=False).filter("row != col") \
        .select("row", "col").distinct()
    wedges = (
        A.select(F.col("row").alias("i"), F.col("col").alias("j"))
        .join(A.select(F.col("row").alias("j"), F.col("col").alias("k")),
              "j")
        .filter("i != k")
    )
    closed = wedges.join(
        A.select(F.col("row").alias("i"), F.col("col").alias("k")),
        ["i", "k"], "left_semi")
    per_node = closed.groupBy(F.col("i").alias("id")).agg(
        (F.count("*") / 2).cast("long").alias("triangles"))
    return g.vertices.select("id").join(per_node, "id", "left") \
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))


def algebraic_pagerank(g: Graph, damp: float = 0.85,
                       iters: int = 20) -> DataFrame:
    """(id, rank): PageRank as a plus-times SpMV iteration over the
    damp·w/wdeg coefficient matrix (AlgebraicPageRank.h semantics),
    final sum-normalization like the reference. The fixed-iteration
    twin of operators.pagerank(fixed_iters=iters) — equality is the
    pytest contract."""
    from networkit_spark.operators.pagerank import _coef_edges

    spark = g.edges.sparkSession
    n = g.num_vertices()
    if n == 0:
        return spark.createDataFrame([], "id long, rank double")
    teleport = (1.0 - damp) / n
    with Scratch(spark, "apr") as sc:
        A = sc.cut(_coef_edges(g, damp).select(
            F.col("src").alias("row"), F.col("dst").alias("col"),
            F.col("coef").alias("val")))
        x = sc.cut(g.vertices.select(
            "id", F.lit(1.0 / n).alias("val")))
        for _ in range(iters):
            gathered = spmv(A, x)
            x = sc.cut(
                x.select("id").join(gathered.withColumnRenamed("val", "g"),
                                    "id", "left")
                .select("id", (F.lit(teleport)
                               + F.coalesce("g", F.lit(0.0))).alias("val")))
        total = x.agg(F.sum("val")).collect()[0][0]
        out = x.select("id", (F.col("val") / F.lit(float(total)))
                       .alias("rank")).persist()
        out.count()
    return out
