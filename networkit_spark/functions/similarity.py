"""Similarity search over an embedding column (array<float>).

  - ``cosine_topk``: brute-force exact top-k — the baseline. The dot
    product / norms are ``F.aggregate``/``F.zip_with`` reductions (JVM,
    no Python); the pairing is a join of the (small) query set against
    the corpus, i.e. a broadcast join at any scale where the query set
    fits on an executor.
  - ``ivf_topk``: the scale path — an IVF-style index that restricts the
    search to the query's partition (here the precomputed ``label``
    cell; :func:`assign_cells` builds cells from scratch with
    deterministic hash-plane LSH when no cell column exists). Search
    cost drops from |corpus| to |cell| per query.
  - ``lsh_bucket_pairs``: random-hyperplane LSH bucketing for all-pairs
    candidate generation (sign sketches from deterministic md5-derived
    ±1 plane weights — reproducible in SQL, swap for real Gaussian
    planes off-sandbox).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: (x * x).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos, rnk): exact top-k cosine neighbors for
    each query vector (self excluded). ``queries`` is broadcast — at
    cluster scale the corpus streams once per query batch."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("nvec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qvec"), F.col("nvec")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: search only within the query's cell (inverted-list
    partition). Exact within the cell; recall vs brute force depends on
    the cell assignment."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"),
                       F.col(cell_col).alias("cell"))
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("nvec"),
                   F.col(cell_col).alias("cell"))
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qvec"), F.col("nvec")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def _plane_sign(vec, plane: int) -> Column:
    """Deterministic hyperplane side: sign(Σ_d w_{plane,d}·v_d) with
    w = ±1 derived from md5(plane:dim) parity — SQL-reproducible."""
    signed = F.transform(
        vec,
        lambda v, i: v.cast("double") * F.when(
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{plane}:"),
                                              i.cast("string"))), 1, 15),
                   16, 10).cast("long") % 2 == 0,
            F.lit(1.0)).otherwise(F.lit(-1.0)),
    )
    s = F.aggregate(signed, F.lit(0.0), lambda acc, v: acc + v)
    return (s > 0).cast("int")


def assign_cells(emb: DataFrame, planes: int = 4, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """(id, cell): 2^planes LSH cells from deterministic hyperplane signs."""
    cell = None
    for p in range(planes):
        bit = _plane_sign(F.col(vec_col), p) * (1 << p)
        cell = bit if cell is None else cell + bit
    return emb.select(F.col(id_col).alias("id"), cell.alias("cell"))


def lsh_bucket_pairs(emb: DataFrame, planes: int = 8, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(a, b): candidate similar pairs — vectors sharing an LSH cell."""
    cells = assign_cells(emb, planes, id_col, vec_col)
    x, y = cells.alias("x"), cells.alias("y")
    return (
        x.join(y, (F.col("x.cell") == F.col("y.cell"))
               & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
    )
