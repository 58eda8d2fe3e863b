"""Graph file-format readers/writers (SURVEY.md §2.1).

Reference readers (/root/reference/networkit/cpp/io/):
  - EdgeListReader (EdgeListReader.cpp:17-244): ``u<sep>v[<sep>w]`` lines,
    configurable separator / first node id / comment prefix; weightedness
    inferred from token count.
  - METISGraphReader (METISGraphReader.cpp, METISParser.cpp): header
    ``n m [fmt]``; line i holds the (1-based) neighbors of node i-1.
  - SNAPGraphReader (SNAPGraphReader.cpp): whitespace edge lists with
    ``#`` comments, non-continuous ids.

All readers return edge DataFrames; parsing is column expressions over
``spark.read.text``. METIS needs line numbers — the one legitimate RDD use
(zipWithIndex), since text sources expose no stable row order.
Parquet is the engine's native format; these exist for interop parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from networkit_spark.graph import Graph


def read_edgelist(
    spark: SparkSession,
    path: str,
    sep: str = r"\s+",
    comment: str = "#",
    first_node: int = 0,
    directed: bool = False,
) -> Graph:
    """EdgeListReader: ids shifted to 0-based by ``first_node``; third
    column (if present) is the weight."""
    lines = spark.read.text(path).filter(
        (F.length(F.trim("value")) > 0)
        & ~F.col("value").startswith(comment)
    )
    toks = F.split(F.trim("value"), sep)
    e = lines.select(
        (F.element_at(toks, 1).cast("long") - first_node).alias("src"),
        (F.element_at(toks, 2).cast("long") - first_node).alias("dst"),
        F.coalesce(F.try_element_at(toks, F.lit(3)).cast("double"),
                   F.lit(1.0)).alias("weight"),
    )
    return Graph(e, directed=directed)


def read_snap(spark: SparkSession, path: str, directed: bool = True) -> Graph:
    """SNAP edge lists (# comments, tab/space separated)."""
    return read_edgelist(spark, path, sep=r"\s+", comment="#",
                         first_node=0, directed=directed)


def read_metis(spark: SparkSession, path: str) -> Graph:
    """METIS adjacency format. Weighted variants (fmt != 0) unsupported.

    '%' comment lines are dropped BEFORE line numbering (matching the
    reference METISParser): non-comment line i (0-based after the header)
    holds the adjacency of node i — numbering before filtering would
    shift every node id after an interior comment."""
    rows = (
        spark.read.text(path).rdd
        .filter(lambda r: not r["value"].lstrip().startswith("%"))
        .zipWithIndex()
        .map(lambda t: (t[1], t[0]["value"]))
    )
    df = spark.createDataFrame(rows, "line long, value string")
    header = df.filter("line = 0").collect()[0]["value"].split()
    n = int(header[0])
    toks = F.split(F.trim("value"), r"\s+")
    e = (
        df.filter("line > 0")
        .select((F.col("line") - 1).alias("src"),
                F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
        .select("src", (F.col("tok").cast("long") - 1).alias("dst"))
        .filter(F.col("src") < F.col("dst"))  # stored once; file lists both
        .withColumn("weight", F.lit(1.0))
    )
    vertices = spark.range(n)
    return Graph(e, directed=False, weighted=False, vertices=vertices)


def write_edgelist(g: Graph, path: str, sep: str = "\t") -> None:
    """EdgeListWriter: one ``u<sep>v<sep>w`` line per stored edge."""
    (
        g.edges.select(
            F.concat_ws(sep, F.col("src").cast("string"),
                        F.col("dst").cast("string"),
                        F.col("weight").cast("string")).alias("value"))
        .write.mode("overwrite").text(path)
    )


def read_partition(spark: SparkSession, path: str) -> DataFrame:
    """PartitionReader: line i = label of node i → (id, label)."""
    rows = (
        spark.read.text(path).rdd.zipWithIndex()
        .map(lambda t: (t[1], t[0]["value"]))
    )
    return (
        spark.createDataFrame(rows, "id long, value string")
        .select("id", F.trim("value").cast("long").alias("label"))
    )


def read_konect(spark: SparkSession, path: str) -> Graph:
    """KONECTGraphReader (KONECTGraphReader.cpp): whitespace edge lists
    with '%' meta/comment lines; first '%' line may declare
    (un)directedness ('asym' => directed); optional third column is the
    weight; ids are 1-based."""
    first = spark.read.text(path).limit(1).collect()
    directed = False
    if first and first[0]["value"].startswith("%"):
        directed = "asym" in first[0]["value"]
    g = read_edgelist(spark, path, sep=r"\s+", comment="%", first_node=1,
                      directed=directed)
    return g


def read_dot(spark: SparkSession, path: str) -> Graph:
    """DOT reader: numeric-id edge statements ``u -- v`` / ``u -> v``
    extracted per line (distributed regex; attributes ignored)."""
    lines = spark.read.text(path)
    pat = r"(\d+)\s*(--|->)\s*(\d+)"
    e = (
        lines.select(
            F.regexp_extract("value", pat, 1).alias("s"),
            F.regexp_extract("value", pat, 2).alias("op"),
            F.regexp_extract("value", pat, 3).alias("d"))
        .filter("s != ''")
        .select(F.col("s").cast("long").alias("src"),
                F.col("d").cast("long").alias("dst"),
                F.lit(1.0).alias("weight"), "op")
    )
    directed = bool(e.filter("op = '->'").limit(1).collect())
    return Graph(e.drop("op"), directed=directed)


def read_gml(spark: SparkSession, path: str) -> Graph:
    """GMLGraphReader: node [ id k ] / edge [ source u target v ] blocks.
    GML is an interop fixture format (one small nested-text file), so it
    is parsed on the driver; parquet / edge lists are the scale paths."""
    import re

    with open(path) as f:
        text = f.read()
    directed = bool(re.search(r"directed\s+1", text))
    nodes = [int(m) for m in re.findall(r"node\s*\[\s*id\s+(\d+)", text)]
    edges = re.findall(r"edge\s*\[\s*source\s+(\d+)\s+target\s+(\d+)"
                       r"(?:\s+(?:weight|value)\s+([0-9.eE+-]+))?", text)
    rows = [(int(u), int(v), float(w) if w else 1.0) for u, v, w in edges]
    e = spark.createDataFrame(rows or [(0, 0, 0.0)][:0],
                              "src long, dst long, weight double")
    verts = spark.createDataFrame([(n,) for n in nodes] or [(0,)][:0],
                                  "id long")
    return Graph(e, directed=directed, vertices=verts if nodes else None)


def write_gml(g: Graph, path: str) -> None:
    """GMLGraphWriter: driver-side single-file write (interop fixture)."""
    nodes = sorted(r["id"] for r in g.vertices.collect())
    edges = g.edges.collect()
    with open(path, "w") as f:
        f.write("graph [\n")
        f.write(f"  directed {1 if g.directed else 0}\n")
        for n in nodes:
            f.write(f"  node [ id {n} ]\n")
        for r in edges:
            f.write(f"  edge [ source {r['src']} target {r['dst']}"
                    f" weight {float(r['weight'])} ]\n")
        f.write("]\n")


def read_graphml(spark: SparkSession, path: str) -> Graph:
    """GraphMLReader: XML interop fixture — driver-side parse."""
    import xml.etree.ElementTree as ET

    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    root = ET.parse(path).getroot()
    graph = root.find("g:graph", ns) or root.find("graph")
    directed = (graph.get("edgedefault") == "directed")

    def nid(x: str) -> int:
        return int(x[1:]) if x and not x.isdigit() else int(x)

    nodes = [nid(n.get("id")) for n in graph.findall("g:node", ns)
             or graph.findall("node")]
    rows = [(nid(e.get("source")), nid(e.get("target")), 1.0)
            for e in graph.findall("g:edge", ns) or graph.findall("edge")]
    e = spark.createDataFrame(rows or [(0, 0, 0.0)][:0],
                              "src long, dst long, weight double")
    verts = spark.createDataFrame([(n,) for n in nodes] or [(0,)][:0],
                                  "id long")
    return Graph(e, directed=directed, vertices=verts if nodes else None)


def write_graphml(g: Graph, path: str) -> None:
    """GraphMLWriter: driver-side single-file write (interop fixture)."""
    nodes = sorted(r["id"] for r in g.vertices.collect())
    edges = g.edges.collect()
    dflt = "directed" if g.directed else "undirected"
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n')
        f.write(f'  <graph id="G" edgedefault="{dflt}">\n')
        for n in nodes:
            f.write(f'    <node id="n{n}"/>\n')
        for r in edges:
            f.write(f'    <edge source="n{r["src"]}" target="n{r["dst"]}"/>\n')
        f.write("  </graph>\n</graphml>\n")


def write_dot(g: Graph, path: str) -> None:
    """DotGraphWriter: driver-side single-file write."""
    op = "->" if g.directed else "--"
    kind = "digraph" if g.directed else "graph"
    edges = g.edges.collect()
    with open(path, "w") as f:
        f.write(kind + " G {\n")
        for r in edges:
            f.write(f"  {r['src']} {op} {r['dst']};\n")
        f.write("}\n")


def write_metis(g: Graph, path: str) -> None:
    """METISGraphWriter: header ``n m``, line i = 1-based neighbors of
    node i-1. METIS is one ordered file by construction — driver-side
    write; ids must be 0..n-1."""
    n = g.num_vertices()
    e = g.edges.filter("src != dst").select(
        F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
    ).distinct()
    m = e.count()
    sym = e.select(F.col("lo").alias("u"), F.col("hi").alias("v")).union(
        e.select(F.col("hi").alias("u"), F.col("lo").alias("v")))
    adj = {r["u"]: r["nbrs"] for r in
           sym.groupBy("u").agg(F.sort_array(F.collect_list("v"))
                                .alias("nbrs")).collect()}
    with open(path, "w") as f:
        f.write(f"{n} {m}\n")
        for i in range(n):
            f.write(" ".join(str(int(x) + 1) for x in adj.get(i, [])) + "\n")


def write_snap(g: Graph, path: str) -> None:
    """SNAPGraphWriter: '#'-header + tab edge list, distributed text
    write (directory of parts — SNAP files are plain edge lists)."""
    (
        g.edges.select(F.concat_ws("\t", F.col("src").cast("string"),
                                   F.col("dst").cast("string")).alias("value"))
        .write.mode("overwrite").text(path)
    )


def write_partition(labels: DataFrame, path: str) -> None:
    """PartitionWriter: line i = label of node i (one ordered file —
    driver-side; ids must be 0..n-1)."""
    rows = {r["id"]: r["label"] for r in labels.collect()}
    with open(path, "w") as f:
        for i in range(len(rows)):
            f.write(f"{rows[i]}\n")


def read_cover(spark: SparkSession, path: str) -> DataFrame:
    """CoverReader: line k lists the node ids of subset k → (id, subset)
    rows (a node may appear in several subsets)."""
    rows = (
        spark.read.text(path).rdd.zipWithIndex()
        .map(lambda t: (t[1], t[0]["value"]))
    )
    df = spark.createDataFrame(rows, "subset long, value string")
    return (
        df.filter(F.length(F.trim("value")) > 0)
        .select("subset", F.explode(F.split(F.trim("value"), r"\s+")).alias("tok"))
        .select(F.col("tok").cast("long").alias("id"), "subset")
    )


def write_cover(cover: DataFrame, path: str) -> None:
    """CoverWriter: one line per subset listing its member ids."""
    rows = {r["subset"]: r["ids"] for r in
            cover.groupBy("subset").agg(F.sort_array(F.collect_list("id"))
                                        .alias("ids")).collect()}
    with open(path, "w") as f:
        for k in sorted(rows):
            f.write(" ".join(str(int(i)) for i in rows[k]) + "\n")


# -- format registry facade (networkit.graphio.readGraph/writeGraph) --------

_READERS = {
    "edgelist": read_edgelist,
    "metis": read_metis,
    "snap": read_snap,
    "konect": read_konect,
    "gml": read_gml,
    "graphml": read_graphml,
    "dot": read_dot,
}

_WRITERS = {
    "edgelist": write_edgelist,
    "metis": write_metis,
    "snap": write_snap,
    "gml": write_gml,
    "graphml": write_graphml,
    "dot": write_dot,
}

_EXT = {".graph": "metis", ".metis": "metis", ".txt": "snap",
        ".edgelist": "edgelist", ".konect": "konect", ".gml": "gml",
        ".graphml": "graphml", ".xml": "graphml", ".dot": "dot",
        ".gv": "dot", ".gexf": "gexf"}


def read_graph(spark: SparkSession, path: str, fmt: str | None = None,
               **kwargs) -> Graph:
    """graphio.readGraph facade: dispatch on explicit format or file
    extension (networkit/graphio.py Format registry)."""
    import os

    if fmt is None:
        fmt = _EXT.get(os.path.splitext(path)[1].lower())
    if fmt not in _READERS:
        raise ValueError(f"unknown graph format: {fmt!r} for {path}")
    return _READERS[fmt](spark, path, **kwargs)


def write_graph(g: Graph, path: str, fmt: str | None = None,
                **kwargs) -> None:
    """graphio.writeGraph facade."""
    import os

    if fmt is None:
        fmt = _EXT.get(os.path.splitext(path)[1].lower())
    if fmt not in _WRITERS:
        raise ValueError(f"unknown graph format: {fmt!r} for {path}")
    _WRITERS[fmt](g, path, **kwargs)


def read_gexf(spark: SparkSession, path: str):
    """GEXF reader (static + dynamic) — returns (Graph, events | None).

    Static mode: nodes/edges → Graph, events = None. Dynamic mode
    (GEXFReader.cpp semantics): node/edge spells become
    NODE/EDGE_ADDITION events at spell start (default 0) and
    NODE/EDGE_REMOVAL at spell end (when present), timestamped into the
    streaming event schema — replayable via streaming.events.
    XML interop fixture format — driver-side parse."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()

    def loc(tag):  # namespace-insensitive find
        return "{*}" + tag

    graph = root.find(loc("graph"))
    directed = (graph.get("defaultedgetype") == "directed")
    dynamic = (graph.get("mode") == "dynamic")

    nodes, edges, events = [], [], []
    nodes_el = graph.find(loc("nodes"))
    for nd in (nodes_el.findall(loc("node")) if nodes_el is not None else []):
        nid = int(nd.get("id"))
        nodes.append(nid)
        spells = nd.find(loc("spells"))
        if dynamic and spells is not None:
            for sp in spells.findall(loc("spell")):
                start = sp.get("start")
                end = sp.get("end")
                events.append(("NODE_ADDITION", nid, None, 0.0,
                               float(start) if start else 0.0))
                if end is not None:
                    events.append(("NODE_REMOVAL", nid, None, 0.0,
                                   float(end)))
    edges_el = graph.find(loc("edges"))
    for ed in (edges_el.findall(loc("edge")) if edges_el is not None else []):
        u, v = int(ed.get("source")), int(ed.get("target"))
        w = float(ed.get("weight") or 1.0)
        edges.append((u, v, w))
        if dynamic:
            start = ed.get("start")
            end = ed.get("end")
            events.append(("EDGE_ADDITION", u, v, w,
                           float(start) if start else 0.0))
            if end is not None:
                events.append(("EDGE_REMOVAL", u, v, 0.0, float(end)))

    e = spark.createDataFrame(edges or [(0, 0, 0.0)][:0],
                              "src long, dst long, weight double")
    verts = spark.createDataFrame([(n,) for n in nodes] or [(0,)][:0],
                                  "id long")
    g = Graph(e, directed=directed, vertices=verts if nodes else None)
    ev = None
    if dynamic:
        # integer-ize times preserving order (event schema uses long t)
        events.sort(key=lambda r: r[4])
        rows = [(t, u, v, w, i) for i, (t, u, v, w, _) in enumerate(events)]
        ev = spark.createDataFrame(
            rows, "type string, u long, v long, w double, t long")
    return g, ev


def write_gexf(g: Graph, path: str) -> None:
    """GEXF writer (static) — driver-side single-file write."""
    nodes = sorted(r["id"] for r in g.vertices.collect())
    edges = g.edges.collect()
    et = "directed" if g.directed else "undirected"
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">\n')
        f.write(f'  <graph mode="static" defaultedgetype="{et}">\n')
        f.write("    <nodes>\n")
        for n in nodes:
            f.write(f'      <node id="{n}"/>\n')
        f.write("    </nodes>\n    <edges>\n")
        for i, r in enumerate(edges):
            f.write(f'      <edge id="{i}" source="{r["src"]}"'
                    f' target="{r["dst"]}" weight="{float(r["weight"])}"/>\n')
        f.write("    </edges>\n  </graph>\n</gexf>\n")


def _read_gexf_graph(spark: SparkSession, path: str, **kwargs) -> Graph:
    """Facade-compatible GEXF reader: Graph only (the facade contract is
    one Graph per read). Dynamic GEXF event streams need read_gexf
    directly, which returns (Graph, events)."""
    g, _events = read_gexf(spark, path, **kwargs)
    return g


# GEXF registered after its definitions (the registry dicts above are
# evaluated at module load, before this point in the file)
_READERS["gexf"] = _read_gexf_graph
_WRITERS["gexf"] = write_gexf
_EXT[".gexf"] = "gexf"
