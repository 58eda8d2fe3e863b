"""Stage-0 pipeline tests: RMAT generator, corpus rendering, ingestion,
edge derivation, sha256 invariant (FIXTURES.md §1)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.sources.generators import (
    erdos_renyi_edges, planted_partition_edges, render_repos, rmat_edges,
)
from networkit_spark.sources.repos import (
    derive_edges, file_id_col, graph_from_repos, ingest, verify_sha,
)
from tests.conftest import PR8_EDGES
from tests.oracles import pagerank_ref


def test_rmat_deterministic_and_skewed(spark):
    e1 = rmat_edges(spark, scale=8, edge_factor=4, seed=7)
    e2 = rmat_edges(spark, scale=8, edge_factor=4, seed=7)
    assert e1.exceptAll(e2).count() == 0 and e2.exceptAll(e1).count() == 0
    n = 1 << 8
    rows = e1.collect()
    assert all(0 <= r["src"] < n and 0 <= r["dst"] < n for r in rows)
    # power-law-ish: max degree should far exceed mean degree
    deg = e1.groupBy("src").count().agg(F.max("count"), F.avg("count")).collect()[0]
    assert deg[0] > 4 * deg[1]


def test_render_and_derive_roundtrip(spark):
    """Edges derived from the rendered corpus == the skeleton, exactly."""
    skel = rmat_edges(spark, scale=6, edge_factor=4, seed=11).filter("src != dst")
    n = 1 << 6
    repos = render_repos(skel, n, seed=11)
    assert repos.count() == n
    # map file ids back through the deterministic id function
    fid = {
        r["m"]: r["fid"]
        for r in repos.select(
            F.regexp_extract("path", r"mod_(\d+)", 1).cast("long").alias("m"),
            file_id_col().alias("fid"),
        ).collect()
    }
    want = {(fid[r["src"]], fid[r["dst"]]) for r in skel.distinct().collect()}
    got = {(r["src"], r["dst"]) for r in derive_edges(repos).collect()}
    assert got == want


def test_all_langs_rendered_and_parsed(spark):
    skel = rmat_edges(spark, scale=6, edge_factor=6, seed=3).filter("src != dst")
    repos = render_repos(skel, 1 << 6, seed=3)
    langs = {r["lang"] for r in repos.select("lang").distinct().collect()}
    assert langs == {"py", "js", "java", "go", "c"}
    # every out-neighbor list survives the per-lang regex round trip
    assert derive_edges(repos).count() == skel.distinct().count()


def test_sha256_invariant(spark):
    """Mandate: per-row sha256(content) equality between ingested table and
    lineage rows."""
    repos = render_repos(rmat_edges(spark, 5, 4, seed=1), 1 << 5, seed=1)
    files = ingest(repos)
    assert verify_sha(files, repos) == 0
    # and it actually detects corruption
    corrupted = repos.withColumn(
        "content", F.when(F.col("path").endswith("0.py"),
                          F.concat(F.col("content"), F.lit("x")))
        .otherwise(F.col("content"))
    )
    n_bad = repos.filter(F.col("path").endswith("0.py")).count()
    assert verify_sha(files, corrupted) == n_bad


def test_end_to_end_pr8_as_corpus(spark):
    """The 8-node PageRank golden expressed as a corpus table: pipeline
    from (repo,path,commit,lang,content) to scores (SURVEY.md §7.1
    'minimum slice'). Unweighted variant (imports carry no weights)."""
    skel = spark.createDataFrame(
        [(u, v) for u, v, _ in PR8_EDGES] + [(v, u) for u, v, _ in PR8_EDGES],
        "src long, dst long",
    )
    repos = render_repos(skel, 8)
    g = graph_from_repos(repos, directed=True)  # symmetric by construction
    out = pagerank(g, tol=1e-6)
    # oracle on the same unweighted symmetric graph, via the id mapping
    fid = {
        r["m"]: r["fid"]
        for r in repos.select(
            F.regexp_extract("path", r"mod_(\d+)", 1).cast("long").alias("m"),
            file_id_col().alias("fid"),
        ).collect()
    }
    oracle = pagerank_ref([(u, v) for u, v, _ in PR8_EDGES], 8, tol=1e-6)
    got = {r["id"]: r["rank"] for r in out.collect()}
    for i in range(8):
        assert got[fid[i]] == pytest.approx(oracle[i], abs=1e-6)


def test_fixture_generators_deterministic():
    assert erdos_renyi_edges(50, 0.1, seed=5) == erdos_renyi_edges(50, 0.1, seed=5)
    e1, l1 = planted_partition_edges(60, 3, 0.4, 0.01, seed=5)
    e2, l2 = planted_partition_edges(60, 3, 0.4, 0.01, seed=5)
    assert e1 == e2 and np.array_equal(l1, l2)
    assert len({tuple(sorted(p)) for p in e1}) == len(e1)
