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
``spark.read.text``. Line-positional formats (METIS, partition, cover)
get JVM-side line numbers via ``_numbered_lines`` — row_number over
monotonically_increasing_id, whose (partition-index, in-partition
counter) encoding is monotone in file offset for a text source — no
per-row Python anywhere.
Parquet is the engine's native format; these exist for interop parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from networkit_spark.graph import Graph


def _numbered_lines(spark: SparkSession, path: str,
                    drop_comment: str | None = None) -> DataFrame:
    """(line, value): 0-based line numbers, fully JVM-side.

    ``monotonically_increasing_id`` packs (partition index, in-partition
    row counter); for a single text file Spark creates splits in offset
    order, so the id is monotone in file position and a row_number
    window over it recovers exact line numbers. ``drop_comment`` filters
    comment lines BEFORE numbering (METIS semantics). The global window
    is a single-partition sort over the file's lines — these are
    fixture-interop readers, not the 100 TB path (that's parquet)."""
    df = spark.read.text(path).withColumn(
        "_mid", F.monotonically_increasing_id())
    if drop_comment is not None:
        df = df.filter(~F.ltrim("value").startswith(drop_comment))
    return df.select(
        (F.row_number().over(Window.orderBy("_mid")) - 1).alias("line"),
        "value")


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
    df = _numbered_lines(spark, path, drop_comment="%")
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
    return (
        _numbered_lines(spark, path)
        .select(F.col("line").alias("id"),
                F.trim("value").cast("long").alias("label"))
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
    df = _numbered_lines(spark, path).withColumnRenamed("line", "subset")
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


# -- DGS (GraphStream dynamic-graph text format) ----------------------------

DGS_TICK = 1 << 20  # events per clock tick; t = tick * DGS_TICK + seq


def read_dgs(spark: SparkSession, path: str):
    """DGS004 text event log → (events DataFrame in the
    streaming.events EVENT_SCHEMA, name→id mapping dict).

    Reference /root/reference/networkit/cpp/io/DGSReader.cpp:15-130:
    magic 'DGS004', then one event per line — ``st`` (clock tick),
    ``an <name> [attrs]`` (add node, names mapped to dense ids in
    arrival order), ``ae <edge> <from> <to> [weight=<w>]`` (add edge;
    the reference hardcodes weight 1.0 — we honor the attribute when
    present, default 1.0), ``ce <from>-<to> weight=<w>`` (set edge
    weight), ``dn <name>`` (remove node if isolated). Parsing is
    driver-side like the other text interop fixtures (the replay over
    the event stream is the distributed part —
    streaming.events.apply_events).

    Event times: DGS clock ticks are coarse — many events share one
    tick, but apply_events needs a strict order per edge. So
    t = tick * DGS_TICK + line-sequence-within-tick; recover the DGS
    clock as t // DGS_TICK."""
    from networkit_spark.streaming.events import EVENT_SCHEMA

    names: dict[str, int] = {}
    rows = []
    tick = 0
    seq = 0

    def t():
        return tick * DGS_TICK + seq
    with open(path) as f:
        magic = f.readline().strip()
        if magic != "DGS004":
            raise ValueError(
                f"not a DGS file (expected magic 'DGS004', got {magic!r})")
        f.readline()  # header: name, clock ticks, event count — ignored
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            tag = parts[0]
            if tag == "st":
                tick += 1
                seq = 0
                continue
            if tag == "an" and len(parts) >= 2:
                names.setdefault(parts[1], len(names))
                rows.append(("NODE_ADDITION", names[parts[1]], None, None,
                             t()))
            elif tag == "ae" and len(parts) >= 4:
                u, v = names[parts[2]], names[parts[3]]
                w = 1.0
                if len(parts) >= 5 and parts[4].startswith("weight="):
                    w = float(parts[4].split("=", 1)[1])
                rows.append(("EDGE_ADDITION", u, v, w, t()))
            elif tag == "ce" and len(parts) == 3:
                a, b = parts[1].split("-", 1)
                w = float(parts[2].split("=", 1)[1])
                rows.append(("EDGE_WEIGHT_UPDATE", names[a], names[b], w,
                             t()))
            elif tag == "de" and len(parts) >= 2:
                a, b = parts[1].split("-", 1)
                rows.append(("EDGE_REMOVAL", names[a], names[b], None, t()))
            elif tag == "dn" and len(parts) == 2:
                rows.append(("NODE_REMOVAL", names[parts[1]], None, None,
                             t()))
            seq += 1
    ev = spark.createDataFrame(rows, EVENT_SCHEMA)
    return ev, names


def write_dgs(events, path: str, name: str = "nks") -> None:
    """Serialize an EVENT_SCHEMA DataFrame as a DGS004 text log (node
    names = stringified ids; one ``st`` per distinct t gap)."""
    rows = events.orderBy("t", "type", "u", "v").collect()
    with open(path, "w") as f:
        f.write("DGS004\n")
        f.write(f"{name} 0 {len(rows)}\n")
        tick = 0
        seen: set[int] = set()
        for r in rows:
            while tick < (r["t"] or 0) // DGS_TICK:
                tick += 1
                f.write(f"st {tick}\n")
            typ = r["type"]
            if typ == "NODE_ADDITION":
                f.write(f"an {r['u']}\n")
                seen.add(r["u"])
            elif typ == "NODE_REMOVAL":
                f.write(f"dn {r['u']}\n")
            elif typ == "EDGE_ADDITION":
                for x in (r["u"], r["v"]):
                    if x not in seen:
                        f.write(f"an {x}\n")
                        seen.add(x)
                f.write(f"ae {r['u']}-{r['v']} {r['u']} {r['v']}"
                        f" weight={r['w'] if r['w'] is not None else 1.0}\n")
            elif typ == "EDGE_WEIGHT_UPDATE":
                f.write(f"ce {r['u']}-{r['v']} weight={r['w']}\n")
            elif typ == "EDGE_REMOVAL":
                f.write(f"de {r['u']}-{r['v']}\n")


def _read_dgs_graph(spark: SparkSession, path: str, **kwargs) -> Graph:
    """Facade-compatible DGS reader: replay the event log to the FINAL
    graph snapshot (weighted, undirected — DGSReader feeds an undirected
    GraphEventProxy)."""
    from networkit_spark.streaming.events import apply_events

    ev, names = read_dgs(spark, path)
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    edges = apply_events(empty, ev)
    removed = ev.filter(F.col("type") == "NODE_REMOVAL").select(
        F.col("u").alias("id"))
    verts = (ev.filter(F.col("type") == "NODE_ADDITION")
             .select(F.col("u").alias("id")).distinct()
             .join(removed, "id", "left_anti"))
    return Graph(edges, directed=False, weighted=True, vertices=verts)


_READERS["dgs"] = _read_dgs_graph
_EXT[".dgs"] = "dgs"


# -- graph-tool binary (gt) format ------------------------------------------

_GT_MAGIC = bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])  # "⛾ gt"


def _gt_width(n: int) -> int:
    if n < 1 << 8:
        return 1
    if n < 1 << 16:
        return 2
    if n < 1 << 32:
        return 4
    return 8


def read_graph_tool_binary(spark: SparkSession, path: str) -> Graph:
    """graph-tool .gt binary reader (reference
    GraphToolBinaryReader.cpp:18-134): 6-byte magic + version 0x01 +
    endianness byte, uint64-length comment, directed byte, uint64 n,
    then per vertex a uint64 out-neighbor count followed by neighbor
    ids in the narrowest width that fits n (1/2/4/8 bytes). Undirected
    graphs store each edge once, at the larger endpoint (writer's
    ``v <= u`` convention). Dense ids 0..n-1; property maps are not
    read (the reference reader skips them too). Driver-side parse —
    binary interop fixture, same tier as GML/GraphML."""
    import struct

    with open(path, "rb") as f:
        header = f.read(8)
        if header[:6] != _GT_MAGIC or header[6] != 0x01:
            raise ValueError("broken gt header (magic/version)")
        if header[7] not in (0x00, 0x01):
            raise ValueError("broken gt header (endianness byte)")
        bo = "<" if header[7] == 0x00 else ">"
        (clen,) = struct.unpack(bo + "Q", f.read(8))
        f.read(clen)  # comment — skipped like the reference
        directed = f.read(1) != b"\x00"
        (n,) = struct.unpack(bo + "Q", f.read(8))
        width = _gt_width(n)
        fmt = {1: "B", 2: "H", 4: "I", 8: "Q"}[width]
        rows = []
        for u in range(n):
            (cnt,) = struct.unpack(bo + "Q", f.read(8))
            if cnt:
                nbrs = struct.unpack(bo + str(cnt) + fmt, f.read(cnt * width))
                rows.extend((u, int(v), 1.0) for v in nbrs)
    e = spark.createDataFrame(rows or [(0, 0, 0.0)][:0],
                              "src long, dst long, weight double")
    verts = spark.range(n).select(F.col("id"))
    return Graph(e, directed=directed, vertices=verts)


def write_graph_tool_binary(g: Graph, path: str,
                            comment: str = "written by networkit_spark"
                            ) -> None:
    """graph-tool .gt binary writer (GraphToolBinaryWriter.cpp:20-110;
    little-endian). Vertex ids are compacted to 0..n-1 in ascending id
    order; undirected edges stored once at the larger endpoint."""
    import struct

    verts = sorted(r["id"] for r in g.vertices.collect())
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    adj: list[list[int]] = [[] for _ in range(n)]
    for r in g.edges.select("src", "dst").collect():
        u, v = idx[r["src"]], idx[r["dst"]]
        if g.directed:
            adj[u].append(v)
        else:
            # store once, at the larger endpoint (v <= u convention)
            a, b = max(u, v), min(u, v)
            adj[a].append(b)
    width = _gt_width(n)
    fmt = {1: "B", 2: "H", 4: "I", 8: "Q"}[width]
    cb = comment.encode()
    with open(path, "wb") as f:
        f.write(_GT_MAGIC + bytes([0x01, 0x00]))
        f.write(struct.pack("<Q", len(cb)) + cb)
        f.write(b"\x01" if g.directed else b"\x00")
        f.write(struct.pack("<Q", n))
        for u in range(n):
            f.write(struct.pack("<Q", len(adj[u])))
            for v in sorted(adj[u]):
                f.write(struct.pack("<" + fmt, v))


_READERS["gt"] = read_graph_tool_binary
_WRITERS["gt"] = lambda g, path, **kw: write_graph_tool_binary(g, path, **kw)
_EXT[".gt"] = "gt"


# -- MATLAB .mat adjacency matrix -------------------------------------------

def read_mat(spark: SparkSession, path: str, key: str = "G") -> Graph:
    """MATLAB adjacency-matrix reader (reference
    networkit/graphio.py:177-199 readMat): loads the sparse matrix under
    ``key`` and emits one edge per stored nonzero (weight = value,
    undirected). Requires scipy, which this sandbox does not ship — the
    Spark-side construction below is exercised the moment scipy is
    importable; without it the call fails with a clear ImportError."""
    try:
        import scipy.io
        import scipy.sparse
    except ImportError as exc:  # pragma: no cover - scipy absent here
        raise ImportError(
            "read_mat requires scipy (scipy.io.loadmat); install scipy "
            "or convert the .mat adjacency to an edge list / parquet"
        ) from exc
    obj = scipy.io.loadmat(path)
    if key not in obj:
        raise KeyError(f"key {key!r} not found in the matlab object file")
    a = scipy.sparse.coo_matrix(obj[key])
    n, n2 = a.shape
    if n != n2:
        raise ValueError(f"this ({n}x{n2}) matrix is not square")
    rows = [(int(u), int(v), float(w))
            for u, v, w in zip(a.row, a.col, a.data) if u <= v]
    e = spark.createDataFrame(rows or [(0, 0, 0.0)][:0],
                              "src long, dst long, weight double")
    return Graph(e, directed=False,
                 vertices=spark.range(n).select(F.col("id")))


_READERS["mat"] = read_mat
_EXT[".mat"] = "mat"


def read_dibap(spark: SparkSession, path: str) -> Graph:
    """DibaP binary graph reader (io/DibapGraphReader.cpp:20-166):
    magic 'GI' short, then network-byte-order int sections — V, vertex
    weight dim + weights, CSR offsets of[V+1], targets to[2m], edge
    weight dim + weights, coordinate dim + float coords. Undirected:
    an edge materializes once, at v <= to[e] (DibapGraphReader.cpp:149).
    The header is inherently sequential (driver-parsed, like the
    reference); edges land in a distributed DataFrame. Floats are read
    unswapped, mirroring the reference's fread (little-endian on x86)."""
    import struct

    with open(path, "rb") as f:
        data = f.read()
    off = 0

    def ints(k):
        nonlocal off
        vals = struct.unpack_from(f">{k}i", data, off)
        off += 4 * k
        return list(vals)

    (magic,) = struct.unpack_from(">H", data, off)
    off += 2
    if magic != (ord("G") << 8 | ord("I")):
        raise ValueError(f"not a DibaP GI file: magic={magic:#x}")
    (v_count,) = ints(1)
    (dvw,) = ints(1)
    if dvw > 0:
        ints(v_count * dvw)  # vertex weights: parsed, unused (reference FIXME)
    of = ints(v_count + 1)
    num_e2 = of[v_count]
    to = ints(num_e2)
    (dew,) = ints(1)
    ew = ints(num_e2 * dew) if dew > 0 else None
    (dxy,) = ints(1)
    if dxy > 0:
        struct.unpack_from(f"<{v_count * dxy}f", data, off)
        off += 4 * v_count * dxy
    rows = []
    for v in range(v_count):
        for e in range(of[v], of[v + 1]):
            if v <= to[e]:
                rows.append((v, to[e], float(ew[e]) if ew else 1.0))
    edges = spark.createDataFrame(
        rows or [(0, 0, 1.0)], "src long, dst long, weight double")
    if not rows:
        edges = edges.limit(0)
    return Graph(edges, directed=False, weighted=dew > 0,
                 vertices=spark.range(v_count).select(F.col("id")))


_READERS["dibap"] = read_dibap
_EXT[".dibap"] = "dibap"


def read_raster_points(spark: SparkSession, path: str,
                       normalization_factor: float = 1.0,
                       seed: int = 42) -> DataFrame:
    """(x, y): ESRI ASCII raster → population points
    (io/RasterReader.cpp:21-100): header gives ncols/nrows (value after
    a 14-char prefix), 4 ignored header lines, then nrows data lines;
    each cell spawns round(value · factor) points uniformly inside its
    unit cell. The reference draws Aux::Random reals; here the jitter
    is counter-based (xxhash64 of (row, col, i, seed) → [0,1)), so the
    point cloud is deterministic AND the expansion runs distributed —
    one posexplode over cells, one sequence explode over counts; a
    continental raster never touches the driver."""
    with open(path) as f:
        header = [f.readline() for _ in range(6)]
        data_start = 6
    ncols = int(float(header[0][14:].strip()))
    nrows = int(float(header[1][14:].strip()))
    lines = spark.read.text(path)
    from networkit_spark.operators.graph_tools import ordered_dense_ids

    # deterministic line index; drop the 6 header lines
    idx = ordered_dense_ids(
        lines.select(F.monotonically_increasing_id().alias("k"), "value"),
        ["k"], out_col="ln")
    cells = (
        idx.filter(F.col("ln") >= data_start)
        .select((F.col("ln") - data_start).alias("row"),
                F.posexplode(F.split(F.trim("value"), r"\s+"))
                .alias("col", "val"))
        .select("row", "col",
                F.round(F.col("val").cast("double")
                        * F.lit(normalization_factor)).cast("long")
                .alias("npts"))
        .filter(F.col("npts") > 0)
    )
    u = lambda salt: (  # noqa: E731
        (F.pmod(F.xxhash64("row", "col", "i", F.lit(salt), F.lit(seed)),
                F.lit(1 << 40))) / float(1 << 40))
    return (
        cells.select("row", "col",
                     F.explode(F.sequence(F.lit(0), F.col("npts") - 1))
                     .alias("i"))
        .select((F.col("col") + u(0)).alias("x"),
                (F.lit(1.0) - F.col("row") - F.lit(1.0) + u(1)).alias("y"))
    )
