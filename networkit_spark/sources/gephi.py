"""Gephi graph-streaming adapter.

Reference: /root/reference/networkit/gephi/streaming.py (+ pyclient.py)
— exports a graph / per-node attributes / graph events to the Gephi
Streaming-plugin master as the JSON event protocol: one JSON object per
line, keyed ``an`` (add node), ``ae`` (add edge), ``cn`` (change node),
``dn``/``de`` (delete). Nodes get deterministic grid coordinates so
Gephi 0.9+ never sees two identical positions (streaming.py:62-76).

Spark formulation: the event stream is a DataFrame of JSON lines built
with to_json — fully distributed, written with the text writer (or any
sink). The reference's HTTP client becomes `GephiStreamingClient` with
a pluggable `post` callable: by default it appends to a local file
(this sandbox has no network); handing it a real urllib poster
reproduces the plugin protocol byte-for-byte. The node-numbering grid
needs a dense 0-based index — `ordered_dense_ids`, the same two-pass
rank every other global ordering in this engine uses (no
single-partition window).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.graph_tools import ordered_dense_ids

#: default node attributes (streaming.py:_exportNodes)
_NODE_SIZE = 2.0
_NODE_RGB = 0.6
_AREA = 2000.0


def node_events(g: Graph) -> DataFrame:
    """(json): one ``{"an": {id: {...}}}`` line per node, with the
    reference's deterministic grid coordinates (streaming.py:62-76)."""
    n = g.vertices.count()
    side = 0 if n == 0 else math.ceil(math.sqrt(n))
    step = _AREA / side if side else 0.0
    off = _AREA / 2
    dense = ordered_dense_ids(g.vertices.select("id"), ["id"],
                              out_col="k")
    attrs = F.struct(
        F.lit(_NODE_SIZE).alias("size"),
        F.lit(_NODE_RGB).alias("r"),
        F.lit(_NODE_RGB).alias("g"),
        F.lit(_NODE_RGB).alias("b"),
        ((F.col("k") % side) * step - off).alias("x"),
        (F.floor(F.col("k") / side) * step - off).alias("y"),
    )
    return dense.select(
        F.to_json(F.map_from_arrays(
            F.array(F.lit("an")),
            F.array(F.map_from_arrays(
                F.array(F.col("id").cast("string")), F.array(attrs)))))
        .alias("json"),
        F.col("k").alias("_order"),
    ).orderBy("_order").drop("_order")


def edge_events(g: Graph) -> DataFrame:
    """(json): one ``{"ae": {eid: {source, target, directed}}}`` line
    per edge; edge ids are the reference's "u->v" / "min-max" strings
    (streaming.py:46-51)."""
    if g.directed:
        e = g.edges.select("src", "dst").distinct()
        eid = F.concat(F.col("src").cast("string"), F.lit("->"),
                       F.col("dst").cast("string"))
        s, d = F.col("src"), F.col("dst")
    else:
        e = g.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst")).distinct()
        eid = F.concat(F.col("src").cast("string"), F.lit("-"),
                       F.col("dst").cast("string"))
        s, d = F.col("src"), F.col("dst")
    body = F.struct(
        s.cast("string").alias("source"),
        d.cast("string").alias("target"),
        F.lit(g.directed).alias("directed"),
    )
    return e.select(
        F.to_json(F.map_from_arrays(
            F.array(F.lit("ae")),
            F.array(F.map_from_arrays(F.array(eid), F.array(body)))))
        .alias("json"))


def node_value_events(values: DataFrame, attr_name: str) -> DataFrame:
    """(json): ``{"cn": {id: {attr_name: value}}}`` per row of
    ``values`` (id, value) — exportNodeValues (streaming.py:90-103)."""
    return values.select(
        F.to_json(F.map_from_arrays(
            F.array(F.lit("cn")),
            F.array(F.map_from_arrays(
                F.array(F.col(values.columns[0]).cast("string")),
                F.array(F.struct(
                    F.col(values.columns[1]).alias(attr_name)))))))
        .alias("json"))


def export_graph_events(g: Graph, path: str) -> None:
    """Write the full add-node + add-edge event stream as text lines —
    the distributed equivalent of exportGraph (pipe the files to the
    Gephi master to replay)."""
    node_events(g).union(edge_events(g)).coalesce(1) \
        .write.mode("overwrite").text(path)


class GephiStreamingClient:
    """Driver-side client mirroring streaming.py's API surface against
    a pluggable `post(line: str)` sink (default: append to a file;
    pass an HTTP poster to talk to a live Gephi master)."""

    def __init__(self, sink_path: str | None = None, post=None):
        if post is not None:
            self._post = post
        elif sink_path is not None:
            self._fh = open(sink_path, "a")
            self._post = lambda line: self._fh.write(line + "\n")
        else:
            raise ValueError("need sink_path or post")

    def export_graph(self, g: Graph, max_events: int = 1_000_000) -> int:
        events = node_events(g).union(edge_events(g))
        n = 0
        for row in events.toLocalIterator():
            self._post(row["json"])
            n += 1
            if n > max_events:
                raise ValueError(
                    f"export exceeds max_events={max_events}; stream "
                    "export_graph_events(path) output instead")
        self.flush()
        return n

    def export_node_values(self, values: DataFrame, attr_name: str) -> int:
        n = 0
        for row in node_value_events(values, attr_name).toLocalIterator():
            self._post(row["json"])
            n += 1
        self.flush()
        return n

    def clear_graph(self) -> None:
        self._post('{"dn": {"filter": "ALL"}}')
        self.flush()

    def flush(self) -> None:
        fh = getattr(self, "_fh", None)
        if fh is not None:
            fh.flush()


def export_node_values_csv(values: DataFrame, path: str,
                           column_name: str) -> None:
    """Write per-node values as a Gephi data-laboratory CSV with an
    ``id,<column_name>`` header (gephi/csv.py:exportNodeValues) —
    distributed csv writer, one header per part file."""
    values.select(
        F.col(values.columns[0]).cast("string").alias("id"),
        F.col(values.columns[1]).cast("string").alias(column_name),
    ).write.mode("overwrite").option("header", True).csv(path)
