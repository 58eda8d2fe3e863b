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


def test_gml_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io_formats import read_gml, write_gml
    g = Graph.from_rows(spark, [(0, 1, 2.0), (1, 2, 1.0)], directed=False)
    p = str(tmp_path / "g.gml")
    write_gml(g, p)
    g2 = read_gml(spark, p)
    assert not g2.directed
    assert {(r["src"], r["dst"]) for r in g2.edges.collect()} == {(0, 1), (1, 2)}
    assert g2.num_vertices() == 3


def test_graphml_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io_formats import read_graphml, write_graphml
    g = Graph.from_rows(spark, [(0, 1), (1, 2), (0, 2)], directed=True)
    p = str(tmp_path / "g.graphml")
    write_graphml(g, p)
    g2 = read_graphml(spark, p)
    assert g2.directed
    assert {(r["src"], r["dst"]) for r in g2.edges.collect()} == \
        {(0, 1), (1, 2), (0, 2)}


def test_dot_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io_formats import read_dot, write_dot
    g = Graph.from_rows(spark, [(0, 1), (1, 2)], directed=True)
    p = str(tmp_path / "g.dot")
    write_dot(g, p)
    g2 = read_dot(spark, p)
    assert g2.directed
    assert {(r["src"], r["dst"]) for r in g2.edges.collect()} == {(0, 1), (1, 2)}


def test_metis_writer_roundtrip(spark, karate):
    import tempfile, os
    from networkit_spark.sources.io_formats import write_metis
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    d = tempfile.mkdtemp()
    p = os.path.join(d, "k.graph")
    write_metis(g, p)
    g2 = read_metis(spark, p)
    assert g2.num_vertices() == n and g2.num_edges() == len(edges)
    assert {(r["src"], r["dst"]) for r in g2.edges.collect()} == \
        {(min(u, v), max(u, v)) for u, v in edges}


def test_snap_writer_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io_formats import write_snap
    g = Graph.from_rows(spark, [(0, 1), (2, 3)], directed=True)
    p = str(tmp_path / "snap_out")
    write_snap(g, p)
    g2 = read_snap(spark, p)
    assert {(r["src"], r["dst"]) for r in g2.edges.collect()} == {(0, 1), (2, 3)}


def test_konect_reader(spark, tmp_path):
    from networkit_spark.sources.io_formats import read_konect
    p = tmp_path / "k.konect"
    p.write_text("% asym\n% meta\n1 2\n2 3 2.5\n")
    g = read_konect(spark, str(p))
    assert g.directed
    rows = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert rows == {(0, 1): 1.0, (1, 2): 2.5}


def test_cover_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io_formats import read_cover, write_cover
    p = str(tmp_path / "c.cover")
    cov = spark.createDataFrame(
        [(0, 0), (1, 0), (1, 1), (2, 1)], "id long, subset long")
    write_cover(cov, p)
    got = {(r["id"], r["subset"]) for r in read_cover(spark, p).collect()}
    assert got == {(0, 0), (1, 0), (1, 1), (2, 1)}


def test_partition_writer(spark, tmp_path):
    from networkit_spark.sources.io_formats import (
        read_partition, write_partition)
    p = str(tmp_path / "p.part")
    labels = spark.createDataFrame(
        [(0, 5), (1, 5), (2, 7)], "id long, label long")
    write_partition(labels, p)
    got = {r["id"]: r["label"] for r in read_partition(spark, p).collect()}
    assert got == {0: 5, 1: 5, 2: 7}


def test_registry_facade(spark, tmp_path):
    from networkit_spark.sources.io_formats import read_graph, write_graph
    g = Graph.from_rows(spark, [(0, 1), (1, 2)], directed=False)
    p = str(tmp_path / "r.gml")
    write_graph(g, p)  # inferred from extension
    g2 = read_graph(spark, p)
    assert g2.num_edges() == 2
    import pytest as _pt
    with _pt.raises(ValueError):
        read_graph(spark, str(tmp_path / "x.unknownext"))


def test_gexf_static_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io_formats import read_gexf, write_gexf
    g = Graph.from_rows(spark, [(0, 1, 2.0), (1, 2, 1.0)], directed=True)
    p = str(tmp_path / "g.gexf")
    write_gexf(g, p)
    g2, ev = read_gexf(spark, p)
    assert ev is None and g2.directed
    assert {(r["src"], r["dst"]) for r in g2.edges.collect()} == {(0, 1), (1, 2)}


def test_gexf_dynamic_reference_fixture(spark):
    from networkit_spark.sources.io_formats import read_gexf
    g, ev = read_gexf(spark, "/root/reference/input/dynamicTest3.gexf")
    assert g.directed and g.num_vertices() == 2
    rows = [(r["type"], r["u"], r["v"]) for r in ev.orderBy("t").collect()]
    assert ("EDGE_ADDITION", 0, 1) in rows
    assert ("EDGE_REMOVAL", 0, 1) in rows
    kinds = {r[0] for r in rows}
    assert "NODE_ADDITION" in kinds and "NODE_REMOVAL" in kinds


def test_registry_roundtrip_every_format(spark, tmp_path):
    # contract: every extension in _EXT whose format has BOTH a reader
    # and a writer must round-trip through the read_graph/write_graph
    # facade (round-2 bug: .gexf mapped in _EXT but unreadable)
    import pytest as _pytest
    from networkit_spark.sources.io_formats import (
        _EXT, _READERS, _WRITERS, read_graph, write_graph,
    )
    g = Graph.from_rows(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)],
                        directed=False)
    want = {(0, 1), (1, 2), (2, 3)}
    seen = set()
    for ext, fmt in _EXT.items():
        assert fmt in _READERS or fmt in _WRITERS, f"dead _EXT entry {ext}"
        if fmt in seen or fmt not in _READERS or fmt not in _WRITERS:
            continue
        seen.add(fmt)
        path = str(tmp_path / f"g{ext}")
        write_graph(g, path)
        g2 = read_graph(spark, path)
        got = {(min(r["src"], r["dst"]), max(r["src"], r["dst"]))
               for r in g2.edges.collect()}
        assert got == want, f"format {fmt} via {ext} did not round-trip"
    assert {"gexf", "metis", "gml", "graphml", "dot", "edgelist"} <= seen


def test_read_dgs_reference_example(spark):
    """DGSReader.cpp replay parity on the reference's example.dgs: edge
    aa-bb is weight-updated then removed and both nodes deleted; the
    final snapshot is the cc/dd/ee triangle fragment."""
    from networkit_spark.sources.io_formats import read_dgs, read_graph

    ev, names = read_dgs(spark, "/root/reference/input/example.dgs")
    assert names == {"aa": 0, "bb": 1, "cc": 2, "dd": 3, "ee": 4}
    assert ev.count() == 12
    g = read_graph(spark, "/root/reference/input/example.dgs")
    assert sorted(r["id"] for r in g.vertices.collect()) == [2, 3, 4]
    assert sorted((r["src"], r["dst"], r["weight"])
                  for r in g.edges.collect()) == [(2, 3, 5.0), (4, 2, 2.0)]


def test_dgs_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io_formats import read_dgs, write_dgs

    ev, _ = read_dgs(spark, "/root/reference/input/example.dgs")
    p = str(tmp_path / "rt.dgs")
    write_dgs(ev, p)
    ev2, _ = read_dgs(spark, p)
    def canon(df):
        return sorted((r["type"], r["u"], r["v"], r["w"], r["t"] // (1 << 20))
                      for r in df.collect())
    assert canon(ev) == canon(ev2)


def test_graph_tool_binary_roundtrip(spark, tmp_path):
    """GraphToolBinaryReader/Writer.cpp byte-format round-trip, both
    orientations, through the format registry facade."""
    from networkit_spark.sources.io_formats import read_graph, write_graph

    for directed in (False, True):
        g = Graph.from_rows(
            spark, [(0, 1), (1, 2), (2, 3), (0, 3), (3, 4)],
            directed=directed)
        p = str(tmp_path / f"g{int(directed)}.gt")
        write_graph(g, p)
        g2 = read_graph(spark, p)
        assert g2.directed == directed
        assert sorted(r["id"] for r in g2.vertices.collect()) == [0, 1, 2, 3, 4]
        def canon(gg):
            if gg.directed:
                return sorted((r["src"], r["dst"]) for r in gg.edges.collect())
            return sorted((min(r["src"], r["dst"]), max(r["src"], r["dst"]))
                          for r in gg.edges.collect())
        assert canon(g2) == canon(g)


def test_read_mat_requires_scipy_or_works(spark, tmp_path):
    """read_mat: full parity when scipy exists; a clear ImportError
    (not an AttributeError deep inside) when it doesn't."""
    import pytest

    from networkit_spark.sources.io_formats import read_mat
    try:
        import scipy.io  # noqa: F401
        have_scipy = True
    except ImportError:
        have_scipy = False
    if not have_scipy:
        with pytest.raises(ImportError, match="scipy"):
            read_mat(spark, str(tmp_path / "x.mat"))
    else:  # pragma: no cover - scipy absent in this sandbox
        import numpy as _np
        import scipy.io as sio
        import scipy.sparse as sp
        m = sp.coo_matrix(_np.array([[0, 1, 0], [1, 0, 2], [0, 2, 0]]))
        p = str(tmp_path / "g.mat")
        sio.savemat(p, {"G": m})
        g = read_mat(spark, p)
        assert sorted((r["src"], r["dst"], r["weight"])
                      for r in g.edges.collect()) == [(0, 1, 1.0), (1, 2, 2.0)]


def test_dibap_reader(spark, tmp_path):
    """Synthesized DibaP 'GI' binary (DibapGraphReader.cpp layout):
    path graph 0-1-2-3 with symmetric int weights; v <= to[e] rule."""
    import struct
    from networkit_spark.sources.io_formats import read_dibap, read_graph

    of = [0, 1, 3, 5, 6]
    to = [1, 0, 2, 1, 3, 2]
    ew = [5, 5, 7, 7, 9, 9]
    blob = struct.pack(">H", (ord("G") << 8) | ord("I"))
    blob += struct.pack(">i", 4)          # V
    blob += struct.pack(">i", 0)          # dvw
    blob += struct.pack(f">{len(of)}i", *of)
    blob += struct.pack(f">{len(to)}i", *to)
    blob += struct.pack(">i", 1)          # dew
    blob += struct.pack(f">{len(ew)}i", *ew)
    blob += struct.pack(">i", 0)          # dxy
    p = tmp_path / "g.dibap"
    p.write_bytes(blob)
    g = read_dibap(spark, str(p))
    got = {(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()}
    assert got == {(0, 1, 5.0), (1, 2, 7.0), (2, 3, 9.0)}
    assert g.num_vertices() == 4 and g.weighted and not g.directed
    # facade dispatch by extension
    assert read_graph(spark, str(p)).num_edges() == 3


def test_dibap_bad_magic(spark, tmp_path):
    import pytest
    from networkit_spark.sources.io_formats import read_dibap

    p = tmp_path / "bad.dibap"
    p.write_bytes(b"XX\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="magic"):
        read_dibap(spark, str(p))


def test_raster_points(spark, tmp_path):
    """ESRI ASCII raster -> deterministic jittered points
    (RasterReader.cpp:21-100): counts per cell, coords inside the cell."""
    from networkit_spark.sources.io_formats import read_raster_points

    txt = (
        f"{'ncols':<14}3\n"
        f"{'nrows':<14}2\n"
        f"{'xllcorner':<14}0.0\n"
        f"{'yllcorner':<14}0.0\n"
        f"{'cellsize':<14}1.0\n"
        f"{'NODATA_value':<14}-9999\n"
        "1 0 2\n"
        "0 3 0\n"
    )
    p = tmp_path / "pop.asc"
    p.write_text(txt)
    pts = read_raster_points(spark, str(p), normalization_factor=1.0)
    rows = [(r["x"], r["y"]) for r in pts.collect()]
    assert len(rows) == 1 + 2 + 3
    in_cell = lambda x, y, c, r: c <= x < c + 1 and -r <= y < -r + 1  # noqa: E731
    assert sum(in_cell(x, y, 0, 0) for x, y in rows) == 1
    assert sum(in_cell(x, y, 2, 0) for x, y in rows) == 2
    assert sum(in_cell(x, y, 1, 1) for x, y in rows) == 3
    # deterministic per seed
    again = [(r["x"], r["y"]) for r in
             read_raster_points(spark, str(p), 1.0).collect()]
    assert sorted(rows) == sorted(again)
