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


def lsh_hot_cells(emb: DataFrame, planes: int = 8, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  max_bucket: int = 4096) -> DataFrame:
    """(cell, csz): the cells a guarded :func:`lsh_bucket_pairs` call with
    the same ``max_bucket`` excludes — the drop set surfaced as data."""
    return (assign_cells(emb, planes, id_col, vec_col)
            .groupBy("cell").agg(F.count(F.lit(1)).alias("csz"))
            .filter(F.col("csz") > max_bucket))


def lsh_bucket_pairs(emb: DataFrame, planes: int = 8, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     max_bucket: int | None = None) -> DataFrame:
    """(a, b): candidate similar pairs — vectors sharing an LSH cell.

    Hot-bucket guard (opt-in; same rationale and shape as
    dedup.lsh_candidate_pairs): a cell of B near-identical vectors yields
    B² pairs; with ``max_bucket=N`` set, cells larger than N are excluded
    via a plan-level semi-join against the small-cell set — no extra
    Spark job, no eager stats collect. The excluded set is surfaced as
    data by :func:`lsh_hot_cells`; collapse exact-duplicate vectors
    first. Default ``None`` keeps exact LSH semantics."""
    cells = assign_cells(emb, planes, id_col, vec_col)
    if max_bucket is not None:
        cold = (cells.groupBy("cell")
                .agg(F.count(F.lit(1)).alias("csz"))
                .filter(F.col("csz") <= max_bucket))
        cells = cells.join(cold.select("cell"), "cell", "left_semi")
    x, y = cells.alias("x"), cells.alias("y")
    return (
        x.join(y, (F.col("x.cell") == F.col("y.cell"))
               & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
    )


def cosine_dup_pairs(emb: DataFrame, threshold: float = 0.9,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     pairs: DataFrame | None = None) -> DataFrame:
    """(a, b, cos): embedding-cosine near-duplicate pairs (a < b) with
    cosine ≥ threshold — the embedding flavor of near-dup detection.
    ``pairs`` restricts verification to a candidate set (the
    lsh_bucket_pairs fast path — cost linear in candidates); without it
    the join is the exact all-pairs baseline (quadratic — fine for
    validation scale, use the LSH path on a real corpus)."""
    x = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    y = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    if pairs is not None:
        cand = pairs.select("a", "b").join(x, "a").join(y, "b")
    else:
        cand = x.join(y, F.col("a") < F.col("b"))
    return (cand
            .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("cos"))
            .filter(F.col("cos") >= threshold))


def train_centroids(emb: DataFrame, n_cells: int = 16, iters: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 42) -> list[list[float]]:
    """Lloyd k-means centroids trained on DataFrames (spherical: assign
    by max cosine). Deterministic: init = the ``n_cells`` vectors with
    the smallest xxhash64(id, seed).

    Distributed shape per iteration: one broadcast join corpus ×
    centroids (centroids are k×d — tiny) + min_by assignment, then a
    posexplode + (cell, dim) aggregation for the new means; only the
    k×d centroid table ever reaches the driver."""
    init = (emb.orderBy(F.xxhash64(id_col, F.lit(seed)))
            .limit(n_cells).select(vec_col).collect())
    cents = [list(map(float, r[vec_col])) for r in init]
    spark = emb.sparkSession
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)],
            "cell int, cvec array<double>")
        assigned = (
            emb.select(F.col(id_col).alias("id"),
                       F.col(vec_col).alias("v"))
            .join(F.broadcast(cdf))
            .select("id", "v", "cell", cosine(F.col("v"),
                                              F.col("cvec")).alias("cos"))
            .groupBy("id")
            .agg(F.max_by("cell", F.struct(F.col("cos"),
                                           -F.col("cell"))).alias("cell"),
                 F.first("v").alias("v"))
        )
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos").agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                 .alias("pm"))
            .select("cell", F.transform("pm", lambda s: s["m"]).alias("c"))
            .collect()
        )
        new = {r["cell"]: list(map(float, r["c"])) for r in means}
        cents = [new.get(i, cents[i]) for i in range(n_cells)]
    return cents


def ivf_topk_trained(emb: DataFrame, queries: DataFrame,
                     centroids: list[list[float]], k: int = 5,
                     nprobe: int = 1, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(query_id, neighbor_id, cos, rnk): IVF search over TRAINED
    centroids with multi-probe — each query scans its ``nprobe``
    closest cells instead of one, trading scan fraction (≈ nprobe/
    n_cells of the corpus) for recall. The corpus-side assignment is
    one broadcast join; the probe lists are computed the same way on
    the (small) query side."""
    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cell int, cvec array<double>")

    def assign(df, idname, n):
        scored = (df.select(F.col(id_col).alias(idname),
                            F.col(vec_col).alias("v"))
                  .join(F.broadcast(cdf))
                  .select(idname, "v", "cell",
                          cosine(F.col("v"), F.col("cvec")).alias("cos")))
        w = Window.partitionBy(idname).orderBy(F.desc("cos"), F.asc("cell"))
        return (scored.withColumn("_cr", F.row_number().over(w))
                .filter(F.col("_cr") <= n)
                .select(idname, "v", "cell"))

    corpus = assign(emb, "neighbor_id", 1).withColumnRenamed("v", "nvec")
    probes = assign(queries, "query_id", nprobe).withColumnRenamed("v", "qvec")
    scored = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qvec"), F.col("nvec")).alias("cos"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> float:
    """recall@k of an ANN result against the brute-force ground truth:
    |approx∩exact| / |exact| over the top-k (query_id, neighbor_id)
    pairs. Both inputs are cosine_topk/ivf_topk-shaped (rnk column)."""
    ap = approx.filter(F.col("rnk") <= k).select("query_id", "neighbor_id")
    ex = exact.filter(F.col("rnk") <= k).select("query_id", "neighbor_id")
    denom = ex.count()
    if denom == 0:
        return 1.0
    hits = ap.join(ex, ["query_id", "neighbor_id"], "left_semi").count()
    return hits / denom
