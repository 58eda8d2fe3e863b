"""Graph event replay + streaming aggregation tests."""

import os

from networkit_spark.graph import Graph
from networkit_spark.operators.coarsening import graph_difference
from networkit_spark.streaming.events import (
    EVENT_SCHEMA, apply_events, events_from_difference, stream_edge_updates,
    windowed_event_counts,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def test_apply_events_addition_removal_update(spark):
    edges = _edges(spark, [(0, 1, 1.0), (1, 2, 2.0)])
    events = spark.createDataFrame(
        [
            ("EDGE_ADDITION", 2, 3, 5.0, 1),
            ("EDGE_REMOVAL", 0, 1, 0.0, 2),
            ("EDGE_WEIGHT_UPDATE", 1, 2, 7.0, 3),
            ("NODE_ADDITION", 9, 0, 0.0, 4),  # non-edge events ignored
        ],
        EVENT_SCHEMA,
    )
    out = {(r["src"], r["dst"]): r["weight"]
           for r in apply_events(edges, events).collect()}
    assert out == {(1, 2): 7.0, (2, 3): 5.0}


def test_apply_events_increment_semantics(spark):
    edges = _edges(spark, [(0, 1, 1.0)])
    events = spark.createDataFrame(
        [
            ("EDGE_WEIGHT_INCREMENT", 0, 1, 2.0, 1),   # before base: ignored
            ("EDGE_WEIGHT_UPDATE", 0, 1, 10.0, 2),     # base
            ("EDGE_WEIGHT_INCREMENT", 0, 1, 0.5, 3),   # after base: applies
            ("EDGE_WEIGHT_INCREMENT", 0, 1, 0.25, 4),
            ("EDGE_WEIGHT_INCREMENT", 5, 6, 3.0, 5),   # increment creates
        ],
        EVENT_SCHEMA,
    )
    out = {(r["src"], r["dst"]): r["weight"]
           for r in apply_events(edges, events).collect()}
    assert out == {(0, 1): 10.75, (5, 6): 3.0}


def test_difference_roundtrip(spark):
    """GraphDifference edit script replayed onto g1 reproduces g2."""
    g1 = Graph(_edges(spark, [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0)]))
    g2 = Graph(_edges(spark, [(1, 2, 5.0), (2, 3, 1.0), (3, 4, 1.0)]))
    script = events_from_difference(graph_difference(g1, g2))
    replayed = apply_events(g1.edges, script)
    want = {(r["src"], r["dst"]): r["weight"] for r in g2.edges.collect()}
    got = {(r["src"], r["dst"]): r["weight"] for r in replayed.collect()}
    assert got == want


def test_stream_edge_updates_foreachbatch(spark, tmp_path):
    """Structured Streaming end-to-end: event files -> snapshot merge."""
    events_dir = str(tmp_path / "events")
    spark.createDataFrame(
        [("EDGE_ADDITION", 0, 1, 1.0, 1), ("EDGE_ADDITION", 1, 2, 2.0, 2)],
        EVENT_SCHEMA,
    ).write.json(events_dir)

    stream = spark.readStream.schema(EVENT_SCHEMA).json(events_dir)
    snap = str(tmp_path / "snapshot")
    q = stream_edge_updates(spark, stream, snap, str(tmp_path / "ckpt"))
    q.awaitTermination(60)
    out = {(r["src"], r["dst"]): r["weight"]
           for r in spark.read.parquet(snap).collect()}
    assert out == {(0, 1): 1.0, (1, 2): 2.0}

    # second batch of events updates the snapshot incrementally
    spark.createDataFrame(
        [("EDGE_REMOVAL", 0, 1, 0.0, 3), ("EDGE_WEIGHT_INCREMENT", 1, 2, 1.5, 4)],
        EVENT_SCHEMA,
    ).write.mode("append").json(events_dir)
    q2 = stream_edge_updates(
        spark, spark.readStream.schema(EVENT_SCHEMA).json(events_dir),
        snap, str(tmp_path / "ckpt"))
    q2.awaitTermination(60)
    out = {(r["src"], r["dst"]): r["weight"]
           for r in spark.read.parquet(snap).collect()}
    assert out == {(1, 2): 3.5}


def test_windowed_event_counts_batch(spark):
    import datetime as dt
    rows = [
        (1, dt.datetime(2026, 1, 1, 10, 5), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2026, 1, 1, 10, 55), 2, "click", 2.0, "{}"),
        (3, dt.datetime(2026, 1, 1, 11, 5), 1, "view", 3.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    out = {(r["window_start"].hour, r["event_type"]): (r["n"], r["sum_value"])
           for r in windowed_event_counts(ev).collect()}
    assert out == {(10, "click"): (2, 3.0), (11, "view"): (1, 3.0)}


def test_stateful_vertex_degrees_across_restarts(spark, tmp_path):
    """applyInPandasWithState end-to-end: per-vertex counters persist
    across micro-batches AND across query restarts (checkpointed
    GroupState), accumulating as new event files land."""
    from networkit_spark.streaming.events import stateful_vertex_degrees

    events_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("EDGE_ADDITION", 0, 1, 2.0, 1), ("EDGE_ADDITION", 1, 2, 3.0, 2)],
        EVENT_SCHEMA,
    ).write.json(events_dir)

    out_dir = str(tmp_path / "out")

    def run_once():
        import pyspark.sql.functions as SF

        stream = spark.readStream.schema(EVENT_SCHEMA).json(events_dir)

        def sink(batch, batch_id):
            batch.withColumn("b", SF.lit(batch_id)).write.mode(
                "append").parquet(out_dir)

        q = (stateful_vertex_degrees(stream).writeStream
             .foreachBatch(sink).outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = sorted(spark.read.parquet(out_dir).collect(),
                      key=lambda r: r["b"])
        return {r["id"]: (r["degree"], r["strength"]) for r in rows}

    got = run_once()
    assert got == {0: (1, 2.0), 1: (2, 5.0), 2: (1, 3.0)}

    # second file: removal + weight increment; RESTARTED query resumes
    # the per-vertex GroupState from the checkpoint
    spark.createDataFrame(
        [("EDGE_REMOVAL", 0, 1, 0.0, 3),
         ("EDGE_WEIGHT_INCREMENT", 1, 2, 1.5, 4)],
        EVENT_SCHEMA,
    ).write.mode("append").json(events_dir)
    got2 = run_once()
    assert got2[0] == (0, 2.0)
    assert got2[1] == (1, 6.5)
    assert got2[2] == (1, 4.5)
