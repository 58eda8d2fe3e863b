"""Maximal clique enumeration / maximum clique.

Reference: /root/reference/networkit/cpp/clique/MaximalCliques.cpp
(degeneracy-ordered Bron–Kerbosch with pivoting, Eppstein–Löffler–
Strash) and MaxClique.cpp (maximumOnly variant). Test:
cpp/clique/test/.

Spark-first shape (the standard distributed BK decomposition): fix a
total vertex order; every maximal clique is enumerated exactly once, at
its minimum vertex v, as {v} ∪ (a maximal clique of the subgraph
induced on v's LATER neighbors, rejected if extendable by an EARLIER
neighbor). The per-vertex work needs only v's neighborhood-induced
subgraph — built with ONE triangle-style wedge join (v, a, b) over the
symmetrized edges (the same cost class as triangle counting) — and the
local Bron–Kerbosch runs inside an Arrow-batched ``applyInPandas``
group, candidate set bounded by |N(v)|.

The order is (degree, id) ascending — any total order is correct; the
degree order keeps later-neighbor candidate sets near the degeneracy
bound without first running a core decomposition (pass
``order="core"`` to spend one k-core run for the exact degeneracy
bound on skewed graphs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def _bk_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One group = one anchor vertex v. Rows with b == -1 carry a
    neighbor (a, later flag); rows with b >= 0 carry an edge (a, b)
    among v's neighbors. Emits every maximal clique whose minimum
    vertex is v, as a sorted id list."""
    v = int(pdf["v"].iloc[0])
    nbr_rows = pdf[pdf["b"] < 0]
    later = {int(a) for a, lt in zip(nbr_rows["a"], nbr_rows["later"]) if lt}
    earlier = {int(a) for a, lt in zip(nbr_rows["a"], nbr_rows["later"])
               if not lt}
    adj: dict[int, set[int]] = {int(a): set() for a in nbr_rows["a"]}
    for a, b in zip(pdf.loc[pdf["b"] >= 0, "a"], pdf.loc[pdf["b"] >= 0, "b"]):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))

    out: list[list[int]] = []

    def bk(r: set[int], p: set[int], x: set[int]) -> None:
        if not p and not x:
            out.append(sorted(r | {v}))
            return
        pivot = max(p | x, key=lambda u: len(adj[u] & p))
        for u in sorted(p - adj[pivot]):
            bk(r | {u}, p & adj[u], x & adj[u])
            p = p - {u}
            x = x | {u}

    bk(set(), later, earlier)
    return pd.DataFrame({"clique": out}) if out else pd.DataFrame(
        {"clique": pd.Series([], dtype=object)})


def maximal_cliques(g: Graph, order: str = "degree") -> DataFrame:
    """(clique: array<long>): every maximal clique, each exactly once,
    sorted ascending within the row. Isolated vertices are the
    singleton maximal cliques."""
    e = g.edges.filter("src != dst").select("src", "dst")
    sym = e.union(e.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst"))).distinct().persist()

    if order == "core":
        from networkit_spark.operators.kcore import core_decomposition
        key = core_decomposition(g).select(
            "id", F.col("core").cast("long").alias("k"))
    else:
        key = sym.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("k"))
    pos = key  # order = (k, id) lexicographic; no global rank needed

    nbr = (
        sym.select(F.col("src").alias("v"), F.col("dst").alias("a"))
        .join(pos.select(F.col("id").alias("v"), F.col("k").alias("kv")), "v")
        .join(pos.select(F.col("id").alias("a"), F.col("k").alias("ka")), "a")
        .select("v", "a",
                ((F.col("ka") > F.col("kv"))
                 | ((F.col("ka") == F.col("kv"))
                    & (F.col("a") > F.col("v")))).alias("later"))
        .persist()
    )
    # edges among v's neighbors: one wedge join checked against the
    # edge set (a < b halves the pairs)
    tri = (
        nbr.select("v", "a")
        .join(nbr.select(F.col("v").alias("v2"), F.col("a").alias("b")),
              F.col("v") == F.col("v2"))
        .filter(F.col("a") < F.col("b"))
        .join(sym.select(F.col("src").alias("a"), F.col("dst").alias("b")),
              ["a", "b"], "left_semi")
        .select("v", "a", "b", F.lit(False).alias("later"))
    )
    groups = nbr.select("v", "a", F.lit(-1).cast("long").alias("b"),
                        "later").union(tri.select("v", "a", "b", "later"))

    cliques = groups.groupBy("v").applyInPandas(
        _bk_group, schema="clique array<long>")

    isolated = (
        g.vertices.join(sym.select(F.col("src").alias("id")).distinct(),
                        "id", "left_anti")
        .select(F.array(F.col("id").cast("long")).alias("clique"))
    )
    out = cliques.union(isolated)
    return out


def max_clique(g: Graph) -> int:
    """Clique number ω(G) (reference MaxClique.cpp maximumOnly run)."""
    row = (maximal_cliques(g)
           .agg(F.max(F.size("clique")).alias("w")).collect())
    return int(row[0]["w"] or 0)
