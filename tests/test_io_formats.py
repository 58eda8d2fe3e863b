from networkit_spark.graph import Graph
from networkit_spark.sources.io_formats import (
    read_edgelist, read_metis, read_snap, write_edgelist,
)


def test_read_metis_karate_matches_reference_fixture(spark, karate):
    edges, n = karate
    g = read_metis(spark, "/root/reference/input/karate.graph")
    assert g.num_vertices() == n == 34
    assert g.num_edges() == len(edges) == 78
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == {(u, v) for u, v in edges}


def test_read_metis_comments(spark, tmp_path):
    # leading AND interior % comments must not shift node numbering
    # (round-1 bug: zipWithIndex ran before the comment filter)
    p = tmp_path / "c.graph"
    p.write_text("% header comment\n4 3\n2\n% interior comment\n1 3 4\n2\n2\n")
    g = read_metis(spark, str(p))
    assert g.num_vertices() == 4
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == {(0, 1), (1, 2), (1, 3)}


def test_edgelist_roundtrip(spark, tmp_path):
    g = Graph.from_rows(spark, [(0, 1, 2.5), (1, 2, 1.0), (5, 3, 4.0)],
                        directed=True)
    path = str(tmp_path / "el")
    write_edgelist(g, path)
    g2 = read_edgelist(spark, path, sep=r"\t", directed=True)
    want = {(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()}
    got = {(r["src"], r["dst"], r["weight"]) for r in g2.edges.collect()}
    assert got == want


def test_read_edgelist_options(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("# comment\n1 2\n2 3 9.0\n\n")
    g = read_edgelist(spark, str(p), first_node=1)
    rows = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert rows == {(0, 1): 1.0, (1, 2): 9.0}


def test_read_snap_comments(spark, tmp_path):
    p = tmp_path / "s.txt"
    p.write_text("# FromNodeId\tToNodeId\n0\t1\n1\t2\n")
    g = read_snap(spark, str(p))
    assert g.num_edges() == 2 and g.directed
