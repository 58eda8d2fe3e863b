"""Gephi streaming adapter + networkx bridge."""

import json

import pytest

from networkit_spark.graph import Graph
from networkit_spark.sources.gephi import (
    GephiStreamingClient, edge_events, node_events, node_value_events,
)


def test_gephi_node_events_grid(spark):
    # 4 nodes -> 2x2 grid, step 1000, offset 1000 (streaming.py:62-76)
    g = Graph.from_rows(spark, [(0, 1), (2, 3)], directed=False, n=4)
    evs = [json.loads(r["json"]) for r in node_events(g).collect()]
    assert len(evs) == 4
    coords = {}
    for e in evs:
        (nid, attrs), = e["an"].items()
        assert attrs["size"] == 2.0 and attrs["r"] == 0.6
        coords[nid] = (attrs["x"], attrs["y"])
    assert coords["0"] == (-1000.0, -1000.0)
    assert coords["1"] == (0.0, -1000.0)
    assert coords["2"] == (-1000.0, 0.0)
    assert coords["3"] == (0.0, 0.0)
    assert len(set(coords.values())) == 4  # Gephi 0.9: no duplicates


def test_gephi_edge_events_ids(spark):
    gu = Graph.from_rows(spark, [(1, 0)], directed=False)
    (e,) = [json.loads(r["json"]) for r in edge_events(gu).collect()]
    assert "0-1" in e["ae"]  # canonical min-max id
    assert e["ae"]["0-1"]["directed"] is False
    gd = Graph.from_rows(spark, [(1, 0)], directed=True)
    (e,) = [json.loads(r["json"]) for r in edge_events(gd).collect()]
    assert "1->0" in e["ae"]
    assert e["ae"]["1->0"] == {"source": "1", "target": "0",
                               "directed": True}


def test_gephi_client_file_sink(spark, tmp_path):
    g = Graph.from_rows(spark, [(0, 1), (1, 2)], directed=False, n=3)
    sink = tmp_path / "events.jsonl"
    cli = GephiStreamingClient(sink_path=str(sink))
    n = cli.export_graph(g)
    assert n == 3 + 2  # nodes + edges
    scores = spark.createDataFrame(
        [(0, 0.5), (1, 1.5)], "id long, score double")
    cli.export_node_values(scores, "pagerank")
    cli.clear_graph()
    lines = [json.loads(x) for x in sink.read_text().splitlines()]
    assert sum("an" in x for x in lines) == 3
    assert sum("ae" in x for x in lines) == 2
    cn = [x for x in lines if "cn" in x]
    assert {"pagerank": 0.5} in [list(x["cn"].values())[0] for x in cn]
    assert lines[-1] == {"dn": {"filter": "ALL"}}


def test_nxadapter_roundtrip_or_skip(spark):
    nx = pytest.importorskip("networkx")
    from networkit_spark.sources.nxadapter import from_networkx, to_networkx

    nxg = nx.Graph()
    nxg.add_weighted_edges_from([("a", "b", 2.0), ("b", "c", 3.0)])
    g = from_networkx(spark, nxg, weight_attr="weight")
    assert g.edges.count() == 2
    back = to_networkx(g)
    assert back.number_of_edges() == 2


def test_nxadapter_importerror_is_lazy(spark):
    # module import must not require networkx
    import networkit_spark.sources.nxadapter as na
    try:
        import networkx  # noqa: F401
        pytest.skip("networkx installed; lazy-error path not reachable")
    except ImportError:
        pass
    g = Graph.from_rows(spark, [(0, 1)], directed=False)
    with pytest.raises(ImportError, match="networkx"):
        na.to_networkx(g)


def test_profile_battery_karate(spark, karate):
    """profile() — the reference's profiling battery reduced to scalars
    (profiling/profiling.py:202-260): exact known facts on karate."""
    from networkit_spark.operators.graph_tools import profile

    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    p = profile(g)
    assert p["n"] == 34 and p["m"] == 78
    assert p["components"] == 1 and p["self_loops"] == 0
    assert p["min_degree"] == 1 and p["max_degree"] == 17
    assert p["avg_degree"] == pytest.approx(2 * 78 / 34)
    assert p["triangles"] == 45
    assert p["density"] == pytest.approx(78 / (34 * 33 / 2))


def test_gephi_csv_export(spark, tmp_path):
    from networkit_spark.sources.gephi import export_node_values_csv

    vals = spark.createDataFrame([(0, 0.5), (1, 1.25)],
                                 "id long, score double")
    p = str(tmp_path / "vals")
    export_node_values_csv(vals, p, "pagerank")
    back = spark.read.option("header", True).csv(p)
    assert back.columns == ["id", "pagerank"]
    got = {r["id"]: r["pagerank"] for r in back.collect()}
    assert got == {"0": "0.5", "1": "1.25"}


def test_plot_data_mirrors(spark, karate):
    """plot.py mirrors: the data halves, exact on karate."""
    from networkit_spark import plots

    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    dd = {r["degree"]: r["count"]
          for r in plots.degree_distribution(g).collect()}
    assert sum(dd.values()) == n
    assert sum(d * c for d, c in dd.items()) == 2 * 78
    assert dd[17] == 1  # node 33
    ccs = {r["size"]: r["count"]
           for r in plots.connected_components_sizes(g).collect()}
    assert ccs == {n: 1}
    core = {r["core"]: r["count"]
            for r in plots.core_decomposition_sequence(g).collect()}
    assert sum(core.values()) == n and max(core) == 4  # karate degeneracy
    cpd = {r["degree"]: r["avg_cc"]
           for r in plots.clustering_per_degree(g).collect()}
    assert set(cpd) == set(dd)
    assert cpd[1] == pytest.approx(0.0)  # degree-1 nodes have cc 0
    hp = {r["h"]: r["fraction"] for r in plots.hop_plot_data(g, 6).collect()}
    assert hp[max(hp)] == pytest.approx(1.0)
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="matplotlib"):
            plots.render(plots.degree_distribution(g), "degree", "count")
