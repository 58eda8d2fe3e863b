"""Edmonds–Karp goldens + dynamic generator replay."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.flow import max_flow


def test_max_flow_diamond_directed(spark):
    """s=0 → {1,2} → t=3, unit capacities: flow 2, cut {0}."""
    g = Graph.from_rows(spark, [(0, 1), (0, 2), (1, 3), (2, 3)],
                        directed=True)
    f, cut = max_flow(g, 0, 3)
    assert f == pytest.approx(2.0)
    assert 0 in cut and 3 not in cut


def test_max_flow_bottleneck_weighted(spark):
    """0→1 cap 3, 1→2 cap 1, 0→2 cap 1: flow(0→2) = 2."""
    rows = [(0, 1, 3.0), (1, 2, 1.0), (0, 2, 1.0)]
    import pyspark.sql.functions as F
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    g = Graph(e, directed=True, weighted=True)
    f, cut = max_flow(g, 0, 2)
    assert f == pytest.approx(2.0)
    assert cut == {0, 1}


def test_max_flow_undirected_triangle(spark):
    """K3 undirected unit: two edge-disjoint paths 0-2 → flow 2."""
    g = Graph.from_rows(spark, [(0, 1), (1, 2), (0, 2)], directed=False)
    f, _ = max_flow(g, 0, 2)
    assert f == pytest.approx(2.0)


def test_dynamic_generators_replay(spark):
    from networkit_spark.sources.generators import (
        dorogovtsev_mendes_edges, dynamic_dorogovtsev_mendes_events,
        dynamic_path_events,
    )
    from networkit_spark.streaming.events import EVENT_SCHEMA, apply_events

    ev = spark.createDataFrame(
        dynamic_dorogovtsev_mendes_events(50, seed=9), EVENT_SCHEMA)
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    snap = {(r["src"], r["dst"]) for r in apply_events(empty, ev).collect()}
    assert snap == set(dorogovtsev_mendes_edges(50, seed=9))

    pe = dynamic_path_events(5)
    assert pe == [("EDGE_ADDITION", 0, 1, 1.0, 0), ("EDGE_ADDITION", 1, 2, 1.0, 1),
                  ("EDGE_ADDITION", 2, 3, 1.0, 2), ("EDGE_ADDITION", 3, 4, 1.0, 3)]


def test_dynamic_barabasi_albert_replay(spark):
    from networkit_spark.sources.generators import (
        barabasi_albert_edges, dynamic_barabasi_albert_events,
    )
    from networkit_spark.streaming.events import EVENT_SCHEMA, apply_events

    ev = dynamic_barabasi_albert_events(30, k=2, seed=11)
    # each new node's k attachments share its tick (DynamicBarabasiAlbert
    # advances time once per node)
    ticks = {}
    for _t, u, v, _w, t in ev:
        ticks.setdefault(t, []).append((u, v))
    assert all(len(es) <= 2 for es in ticks.values())
    evdf = spark.createDataFrame(ev, EVENT_SCHEMA)
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    snap = {(r["src"], r["dst"]) for r in apply_events(empty, evdf).collect()}
    assert snap == set(barabasi_albert_edges(30, k=2, seed=11))


def test_dynamic_forest_fire_growth(spark):
    from networkit_spark.sources.generators import (
        dynamic_forest_fire_events,
    )
    from networkit_spark.streaming.events import EVENT_SCHEMA, apply_events

    ev = dynamic_forest_fire_events(40, p=0.4, seed=3)
    assert ev == dynamic_forest_fire_events(40, p=0.4, seed=3)
    # every new node attaches only to OLDER nodes, at least one each
    by_node = {}
    for _t, u, v, _w, _tick in ev:
        assert v < u
        by_node.setdefault(u, set()).add(v)
    assert set(by_node) == set(range(1, 40))
    evdf = spark.createDataFrame(ev, EVENT_SCHEMA)
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    snap = apply_events(empty, evdf)
    assert snap.count() == len(ev)
    # the undirected forest-fire graph is connected by construction
    from networkit_spark.graph import Graph
    from networkit_spark.operators.components import num_components
    from networkit_spark.operators.components import connected_components
    g = Graph(snap, directed=False)
    assert num_components(connected_components(g)) == 1
    # denser fire with higher p (same seed)
    ev_hot = dynamic_forest_fire_events(40, p=0.7, seed=3)
    assert len(ev_hot) > len(ev)
