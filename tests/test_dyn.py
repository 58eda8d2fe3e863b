"""Dynamic connected-components updates vs full recompute."""

from networkit_spark.graph import Graph
from networkit_spark.operators.components import connected_components
from networkit_spark.streaming.dyn import update_connected_components


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def _canon(labels: dict) -> dict:
    """component -> frozenset members, keyed by min member."""
    groups: dict = {}
    for v, c in labels.items():
        groups.setdefault(c, set()).add(v)
    return {min(g): frozenset(g) for g in groups.values()}


def test_dyn_cc_addition_merges(spark):
    g = Graph.from_rows(spark, [(0, 1), (2, 3), (4, 5)], directed=False)
    labels = connected_components(g)
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 1, 2, 1.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, l2 = update_connected_components(g, labels, ev)
    got = _canon(_labels(l2))
    want = _canon(_labels(connected_components(g2)))
    assert got == want
    assert got[0] == frozenset({0, 1, 2, 3})
    assert got[4] == frozenset({4, 5})


def test_dyn_cc_removal_splits(spark):
    g = Graph.from_rows(spark, [(0, 1), (1, 2), (3, 4)], directed=False)
    labels = connected_components(g)
    ev = spark.createDataFrame(
        [("EDGE_REMOVAL", 1, 2, 0.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, l2 = update_connected_components(g, labels, ev)
    got = _canon(_labels(l2))
    assert got[0] == frozenset({0, 1})
    assert got[2] == frozenset({2})
    assert got[3] == frozenset({3, 4})


def test_dyn_cc_new_vertex(spark):
    g = Graph.from_rows(spark, [(0, 1)], directed=False)
    labels = connected_components(g)
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 7, 8, 1.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, l2 = update_connected_components(g, labels, ev)
    got = _canon(_labels(l2))
    assert got[0] == frozenset({0, 1})
    assert got[7] == frozenset({7, 8})
