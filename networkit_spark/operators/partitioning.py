"""Spectral graph partitioning.

Reference: /root/reference/networkit/partitioning.py
(SpectralPartitioner + computeImbalance): Laplacian eigenvectors in
ascending-eigenvalue order ("SA" — eigenvector[1] is the Fiedler
vector), then recursive quantile bisection (median split when
``balanced``, mean split otherwise; a trisection handles odd counts).

Like the reference, the spectrum is dense-driver-side work — guarded by
``max_n`` (the flow.max_flow convention); the returned partition is a
DataFrame. The distributed route to the same Fiedler split at scale is
`numerics.conjugate_gradient` + inverse power iteration; this mirror
exists for reference parity on fixture-sized graphs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from networkit_spark.graph import Graph


def compute_imbalance(partition: DataFrame, n: int | None = None) -> float:
    """max subset size / ceil(n / #subsets)
    (partitioning.py:computeImbalance)."""
    from pyspark.sql import functions as F

    sizes = [r["c"] for r in partition.groupBy(
        partition.columns[1]).agg(F.count(F.lit(1)).alias("c")).collect()]
    if not sizes:
        return 0.0
    total = n if n is not None else sum(sizes)
    desired = math.ceil(total / float(len(sizes)))
    return max(sizes) / float(desired)


def spectral_partitioner(g: Graph, count: int, balanced: bool = True,
                         max_n: int = 4096) -> DataFrame:
    """(id, subset): recursive spectral bisection into ``count`` parts
    (partitioning.py:SpectralPartitioner.run — quantile conventions,
    trisection for odd counts, and per-level eigenvector index all
    mirrored). Deterministic: numpy eigh with a fixed sign convention."""
    import numpy as np

    ids = [int(r["id"]) for r in
           g.vertices.select("id").orderBy("id").collect()]
    n = len(ids)
    if n > max_n:
        raise ValueError(
            f"spectral_partitioner eigendecomposes a dense n×n "
            f"Laplacian; n={n} exceeds max_n={max_n}")
    spark = g.edges.sparkSession
    if n == 0:
        return spark.createDataFrame([], "id long, subset long")
    pos = {v: i for i, v in enumerate(ids)}
    L = np.zeros((n, n))
    for r in g.edges.select("src", "dst", "weight").collect():
        u, v = pos[int(r["src"])], pos[int(r["dst"])]
        if u == v:
            continue
        w = float(r["weight"])
        L[u, v] -= w
        L[v, u] -= w
        L[u, u] += w
        L[v, v] += w
    _evals, evecs = np.linalg.eigh(L)  # ascending = the "SA" order
    for j in range(n):
        col = evecs[:, j]
        if col[int(np.argmax(np.abs(col)))] < 0:
            evecs[:, j] = -col

    partitions: dict[int, list[int]] = {}
    next_part = [0]

    def quantiles(eigv, vertices, q_count=1):
        values = sorted(eigv[v] for v in vertices)
        sections = q_count + 1
        return [values[math.floor(len(values) * i / sections)]
                for i in range(1, sections)]

    def trisect(part, iteration=1):
        vertices = list(range(n)) if part is None else partitions[part]
        eigv = evecs[:, iteration]
        q = quantiles(eigv, vertices, q_count=2)
        a, b, c = next_part[0], next_part[0] + 1, next_part[0] + 2
        next_part[0] += 3
        partitions[a] = [v for v in vertices if eigv[v] < q[0]]
        partitions[b] = [v for v in vertices
                         if q[0] <= eigv[v] < q[1]]
        partitions[c] = [v for v in vertices if eigv[v] >= q[1]]
        if part is not None:
            del partitions[part]

    def bisect(cnt, part=None, iteration=1):
        if cnt == 1:
            if part is None:
                partitions[next_part[0]] = list(range(n))
                next_part[0] += 1
            return
        if cnt == 3:
            # the reference's count==3 branch does NOT forward the
            # iteration (partitioning.py:138 — default 1); mirrored
            trisect(part, 1)
            return
        vertices = list(range(n)) if part is None else partitions[part]
        eigv = evecs[:, iteration]
        if balanced:
            split = quantiles(eigv, vertices)[0]
        else:
            split = float(np.mean([eigv[v] for v in vertices]))
        a, b = next_part[0], next_part[0] + 1
        next_part[0] += 2
        partitions[a] = [v for v in vertices if eigv[v] < split]
        partitions[b] = [v for v in vertices if eigv[v] >= split]
        if part is not None:
            del partitions[part]
        if cnt > 2:
            if cnt % 2 == 0:
                bisect(cnt // 2, a, iteration + 1)
                bisect(cnt // 2, b, iteration + 1)
            else:
                nxt = (cnt - 1) // 2
                if nxt > 2:
                    bisect(nxt, a, iteration + 1)
                    bisect(nxt + 1, b, iteration + 1)
                else:
                    bisect(nxt, a, iteration + 1)
                    trisect(b, iteration + 1)

    bisect(count)
    rows = [(ids[v], p) for p, vs in partitions.items() for v in vs]
    return spark.createDataFrame(rows, "id long, subset long")
