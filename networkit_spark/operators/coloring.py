"""Spectral graph coloring.

Reference: /root/reference/networkit/coloring.py (SpectralColoring) —
eigendecompose the adjacency matrix, then recursively split every
color class by the SIGN of successive eigenvectors until each class is
an independent set. The reference is pure driver-side Python over the
dense spectrum (`algebraic.adjacencyEigenvectors`), inherently
O(n²)–O(n³) — so this mirror is DRIVER-SIDE with a hard ``max_n``
guard, the flow.max_flow convention; validity checks and the final
label table stay DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def spectral_coloring(g: Graph, max_n: int = 4096) -> DataFrame:
    """(id, color): a valid (proper) coloring via recursive spectral
    sign splits (coloring.py:SpectralColoring.run). Deterministic —
    numpy eigh spectrum in descending-eigenvalue order (the reference's
    adjacencyEigenvectors "LA" default) with a fixed sign convention."""
    import numpy as np

    ids = [int(r["id"]) for r in
           g.vertices.select("id").orderBy("id").collect()]
    n = len(ids)
    if n > max_n:
        raise ValueError(
            f"spectral_coloring eigendecomposes a dense n×n adjacency; "
            f"n={n} exceeds max_n={max_n}")
    spark = g.edges.sparkSession
    if n == 0:
        return spark.createDataFrame([], "id long, color long")
    pos = {v: i for i, v in enumerate(ids)}
    A = np.zeros((n, n))
    adj: list[set[int]] = [set() for _ in range(n)]
    for r in g.edges.select("src", "dst").collect():
        u, v = pos[int(r["src"])], pos[int(r["dst"])]
        if u == v:
            continue
        A[u, v] = A[v, u] = 1.0
        adj[u].add(v)
        adj[v].add(u)
    _evals, evecs = np.linalg.eigh(A)
    evecs = evecs[:, ::-1]  # descending eigenvalues — the reference's
    # symmetricEigenvectors default is "LA" (largest algebraic first);
    # eigensolver sign is arbitrary, so fix it deterministically
    for j in range(n):
        col = evecs[:, j]
        if col[int(np.argmax(np.abs(col)))] < 0:
            evecs[:, j] = -col

    colors: dict[int, set[int]] = {0: set(range(n))}
    next_color = [1]

    def valid(c: int) -> bool:
        s = colors[c]
        return all(not (adj[v] & s) for v in s)

    def split(c: int, depth: int = 0) -> None:
        if depth >= n:
            # fall back: peel one independent set greedily (degenerate
            # spectra can stop separating; the reference would recurse
            # forever here)
            s = sorted(colors[c])
            keep: set[int] = set()
            for v in s:
                if not (adj[v] & keep):
                    keep.add(v)
            other = next_color[0]
            next_color[0] += 1
            colors[c] = keep
            colors[other] = set(s) - keep
            if not valid(other):
                split(other, depth)
            return
        vs = colors[c]
        other = next_color[0]
        next_color[0] += 1
        colors[c] = {v for v in vs if evecs[v, depth] >= 0}
        colors[other] = {v for v in vs if evecs[v, depth] < 0}
        if not valid(c):
            split(c, depth + 1)
        if not valid(other):
            split(other, depth + 1)

    split(0)
    rows = [(ids[v], c) for c, vs in colors.items() for v in vs]
    return spark.createDataFrame(rows, "id long, color long")
