"""Wedge-sampling approximate clustering coefficients."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.triangles import (
    approx_avg_local_cc, approx_global_cc, global_clustering_coefficient,
    local_clustering_coefficients,
)
from pyspark.sql import functions as F


def test_approx_avg_local_converges(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    lcc = local_clustering_coefficients(g)
    # exact average over deg>=2 nodes (the estimator's population)
    deg2 = {r["id"] for r in g.symmetrized().groupBy(
        F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
        .filter("d >= 2").collect()}
    rows = {r["id"]: r["lcc"] for r in lcc.collect()}
    exact = sum(rows[v] for v in deg2) / len(deg2)
    est = approx_avg_local_cc(g, trials=3000, seed=1)
    assert est == pytest.approx(exact, abs=0.05)
    # determinism
    assert approx_avg_local_cc(g, trials=500, seed=7) == \
        approx_avg_local_cc(g, trials=500, seed=7)


def test_approx_global_converges(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    exact = global_clustering_coefficient(g)
    est = approx_global_cc(g, trials=3000, seed=2)
    assert est == pytest.approx(exact, abs=0.05)


def test_approx_on_triangle_free(spark):
    # star graph: no triangles anywhere
    g = Graph.from_rows(spark, [(0, i) for i in range(1, 8)],
                        directed=False)
    assert approx_avg_local_cc(g, trials=200) == 0.0
    assert approx_global_cc(g, trials=200) == 0.0


def test_approx_on_clique(spark):
    # K5: every wedge closes
    edges = [(u, v) for u in range(5) for v in range(u + 1, 5)]
    g = Graph.from_rows(spark, edges, directed=False)
    assert approx_avg_local_cc(g, trials=200) == 1.0
    assert approx_global_cc(g, trials=200) == 1.0
