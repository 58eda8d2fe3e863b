import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.pagerank import pagerank, ranking
from tests.conftest import DIR_DANGLING_EDGES, DIR_DANGLING_N, PR8_EDGES, PR8_EXPECTED
from tests.oracles import pagerank_ref


def _scores(df, n):
    rows = {r["id"]: r["rank"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


@pytest.mark.parametrize("mode", ["dataframe", "blocks"])
def test_pagerank_pr8_golden(spark, mode):
    g = Graph.from_rows(spark, PR8_EDGES, directed=False)
    out = pagerank(g, damp=0.85, tol=1e-5, mode=mode)
    scores = _scores(out, 8)
    assert np.allclose(scores, PR8_EXPECTED, atol=1e-4)
    assert np.allclose(scores, pagerank_ref(PR8_EDGES, 8, tol=1e-5), atol=1e-6)
    assert abs(scores.sum() - 1.0) < 1e-9


@pytest.mark.parametrize("mode", ["dataframe", "blocks"])
def test_pagerank_directed_dangling(spark, mode):
    """Pins the reference's dangling semantics: no in-iteration
    redistribution, final normalize only (PageRank.cpp:35-68)."""
    g = Graph.from_rows(spark, DIR_DANGLING_EDGES, directed=True, n=DIR_DANGLING_N)
    out = pagerank(g, damp=0.85, tol=1e-5, mode=mode)
    oracle = pagerank_ref(DIR_DANGLING_EDGES, DIR_DANGLING_N, tol=1e-5, directed=True)
    assert np.allclose(_scores(out, DIR_DANGLING_N), oracle, atol=1e-6)


def test_pagerank_karate_vs_oracle(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    out = pagerank(g, damp=0.85, tol=1e-6)
    oracle = pagerank_ref(edges, n, tol=1e-6)
    assert np.allclose(_scores(out, n), oracle, atol=1e-6)


def test_pagerank_blocks_with_salting(spark, karate):
    """hub_threshold=5 forces most karate hubs through the salted
    (dst-partitioned + broadcast-rank) path; result must be identical."""
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    out = pagerank(g, damp=0.85, tol=1e-4, mode="blocks", hub_threshold=5,
                   num_blocks=4)
    oracle = pagerank_ref(edges, n, tol=1e-4)
    assert np.allclose(_scores(out, n), oracle, atol=1e-6)


def test_ranking_tiebreak(spark):
    from pyspark.sql import functions as F
    g = Graph.from_rows(spark, PR8_EDGES, directed=False)
    # round to 9 decimals so symmetric nodes (exactly-equal scores up to
    # float summation order) tie deterministically
    scores = pagerank(g, tol=1e-5).select("id", F.round("rank", 9).alias("rank"))
    out = ranking(scores)
    ids = [r["id"] for r in out.collect()]
    # scores: node 2 and 5 tie at top (0.2552): asc id tie-break -> 2 first
    assert ids[0] == 2 and ids[1] == 5
    # 0 and 6 tie, then 1 and 7
    assert ids[-4:] == [0, 6, 1, 7]


def test_pagerank_fixed_iters_matches_oracle(spark):
    g = Graph.from_rows(spark, PR8_EDGES, directed=False)
    out = pagerank(g, fixed_iters=10)
    oracle = pagerank_ref(PR8_EDGES, 8, fixed_iters=10)
    assert np.allclose(_scores(out, 8), oracle, atol=1e-12)
