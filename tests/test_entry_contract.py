"""Driver-contract sanity: entry() smoke + a representative subset of
queries() vs oracle_sql() through the same comparison the gate harness
uses (full sweep: scripts/check_gate.py)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from scripts.check_gate import TABLES, normalize

SF = "/root/testdata/sf0.001"

SUBSET = [
    "edges_cs", "pagerank_cs_k10", "triangles_pp", "lpa_pp_k4",
    "docs_minhash", "docs_simhash", "ann_cosine_top5", "events_hourly",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


# rows-only checks, each with the reason it cannot have a value oracle
ORACLE_LESS: set[str] = {
    # reproducing the RK estimator in SQL would need a full unrolled
    # Brandes PLUS the per-level sigma-weighted hash race that picks one
    # shortest path per sampled pair — far beyond a reviewable oracle;
    # the estimator is error-bound-checked against exact betweenness in
    # tests/test_betweenness.py instead
    "approx_betweenness_pps1",
    # the k×k eigensolve (numpy eigh on the driver) is not
    # SQL-expressible; the full pipeline is verified against a
    # pure-numpy replication in tests/test_layout.py
    "pivot_mds_pps1",
    # PLM's greedy max-gain trajectory cannot be bit-reproduced in
    # DuckDB; modularity quality + LFR ground-truth behavior are
    # verified in tests/test_plm.py / tests/test_lfr.py
    "plm_pp",
    # per-node force sums are partition-order float reductions (not
    # bit-reproducible in SQL); frame bounds / displacement cap /
    # clique-separation structure are verified in tests/test_layout.py
    "fr_layout_pps1",
    # same float-reduction rationale, composed with PLP label races
    "multilevel_fr_pps1",
}


def test_queries_and_oracles_consistent():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs)
    # every oracle-less query is documented (rows-only check)
    assert set(qs) - set(os_) == ORACLE_LESS


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = normalize(entry.queries()[name](spark, SF).toPandas())
    odf = normalize(duck.execute(entry.oracle_sql()[name]).df())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf)
    assert sdf.equals(odf)


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns == ["id", "rank"]
    assert len(rows) > 0
