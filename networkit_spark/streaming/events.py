"""Graph event streams — the reference's dynamics model on Structured
Streaming.

The reference replays typed events into a mutable graph
(/root/reference/networkit/cpp/dynamics/GraphEvent.h:24-39 — NODE_ADDITION,
NODE_REMOVAL, EDGE_ADDITION, EDGE_REMOVAL, EDGE_WEIGHT_UPDATE,
EDGE_WEIGHT_INCREMENT, TIME_STEP — applied by GraphUpdater.cpp:65). It has
no watermarks or windows; TIME_STEP markers are the only temporal
structure (SURVEY.md §2.11).

Spark mapping:
  - an event stream is rows of EVENT_SCHEMA (a file/kafka readStream or a
    batch DataFrame for replay);
  - ``apply_events`` folds a batch of events into an edge-snapshot
    DataFrame (the immutable-snapshot equivalent of GraphUpdater.update):
    last-writer-wins per edge by event order, then removals dropped;
  - ``stream_edge_updates`` wires that into ``foreachBatch`` — each
    micro-batch merges into a parquet snapshot directory (Iceberg MERGE on
    a cluster), from which iterative kernels warm-start via their
    checkpointed state (resume machinery doubles as warm-start).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

EVENT_SCHEMA = ("type string, u long, v long, w double, t long")

_EDGE_EVENTS = ("EDGE_ADDITION", "EDGE_REMOVAL", "EDGE_WEIGHT_UPDATE",
                "EDGE_WEIGHT_INCREMENT")


def apply_events(edges: DataFrame, events: DataFrame) -> DataFrame:
    """Fold a batch of graph events into a new edge snapshot.

    Semantics per GraphUpdater.cpp: events apply in ``t`` order (ties by
    input order are not meaningful — the reference replays sequentially;
    we require distinct t per edge-touching event for determinism).
    EDGE_WEIGHT_INCREMENT adds to the current weight; REMOVAL deletes.
    """
    ev = events.filter(F.col("type").isin(*_EDGE_EVENTS))
    is_inc = F.col("type") == "EDGE_WEIGHT_INCREMENT"
    # per edge: the last non-increment event sets the base (ADDITION/UPDATE
    # -> its weight, REMOVAL -> gone); increments AFTER that base add to it
    # (increments on a non-existent edge start from 0 — they create it).
    base = (
        ev.filter(~is_inc)
        .groupBy("u", "v")
        .agg(F.max("t").alias("t_base"),
             F.expr("max_by(type, t)").alias("base_type"),
             F.expr("max_by(w, t)").alias("base_w"))
    )
    incs = (
        ev.filter(is_inc)
        .join(base.select("u", "v", "t_base"), ["u", "v"], "left")
        .filter(F.col("t") > F.coalesce(F.col("t_base"), F.lit(-(1 << 62))))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("inc_sum"))
    )
    cur = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"),
                       F.col("weight").alias("cur_w"))
    merged = (
        cur.join(base, ["u", "v"], "full_outer")
        .join(incs, ["u", "v"], "full_outer")
    )
    base_val = (
        F.when(F.col("base_type") == "EDGE_REMOVAL", F.lit(None).cast("double"))
        .when(F.col("base_type").isNotNull(), F.col("base_w"))
        .otherwise(F.col("cur_w"))
    )
    new_w = (
        F.when(F.col("inc_sum").isNotNull(),
               F.coalesce(base_val, F.lit(0.0)) + F.col("inc_sum"))
        .otherwise(base_val)
    )
    return (
        merged.select(F.col("u").alias("src"), F.col("v").alias("dst"),
                      new_w.alias("weight"))
        .filter(F.col("weight").isNotNull())
    )


def events_from_difference(diff: DataFrame, t0: int = 0) -> DataFrame:
    """Turn a GraphDifference edit script (operators.coarsening
    .graph_difference) into replayable event rows."""
    w = Window.orderBy("type", "u", "v")
    return diff.select(
        "type", "u", "v", "w",
        (F.lit(t0) + F.row_number().over(w)).alias("t"),
    )


def stream_edge_updates(spark, events_stream: DataFrame, snapshot_dir: str,
                        checkpoint_dir: str):
    """foreachBatch pipeline: merge each micro-batch of events into the
    parquet edge snapshot (Iceberg MERGE INTO on a cluster). Returns the
    StreamingQuery; caller awaits/stops it."""

    def merge(batch: DataFrame, batch_id: int) -> None:
        try:
            cur = batch.sparkSession.read.parquet(snapshot_dir)
        except Exception:
            cur = batch.sparkSession.createDataFrame(
                [], "src long, dst long, weight double")
        out = apply_events(cur, batch)
        # stage-then-swap write (Iceberg gives this atomically)
        staged = snapshot_dir.rstrip("/") + ".staged"
        out.write.mode("overwrite").parquet(staged)
        final = batch.sparkSession.read.parquet(staged)
        final.write.mode("overwrite").parquet(snapshot_dir)

    return (
        events_stream.writeStream
        .foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming windowed aggregation with late-data handling (beyond the
    reference — its event model has no windows; this is the Structured
    Streaming-native view of the events table). Works on both batch and
    streaming inputs (watermark applied only when streaming)."""
    ev = events
    if ev.isStreaming:
        ev = ev.withWatermark("ts", watermark)
    return (
        ev.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("win.start").alias("window_start"), "event_type",
                "n", "sum_value")
    )


def stateful_vertex_degrees(events: DataFrame) -> DataFrame:
    """(id, degree, strength): RUNNING per-vertex degree and weighted
    strength over a GraphEvent stream — the engine's custom stateful
    streaming operator, built on ``applyInPandasWithState`` (one
    GroupState per vertex, Arrow-batched updates).

    Semantics per event (both endpoints): EDGE_ADDITION degree+1 and
    strength+w; EDGE_WEIGHT_INCREMENT strength+w; EDGE_REMOVAL
    degree−1 (strength untouched — the event doesn't carry the removed
    weight; reconstructing it needs per-EDGE state, which the snapshot
    path `stream_edge_updates` covers). State survives micro-batches
    AND query restarts via the checkpoint, so an availableNow query can
    be re-run as new event files land and counters keep accumulating —
    the Structured Streaming form of the reference's DynAlgorithm
    update loop. Streaming-only (Spark rejects applyInPandasWithState
    in batch queries — use degrees.out_degrees on a snapshot there)."""
    import pandas as pd  # noqa: F401 (executor-side)
    from pyspark.sql.streaming.state import GroupStateTimeout

    deltas = (
        events.select(F.explode(F.array("u", "v")).alias("id"),
                      F.col("type"), F.col("w"))
        .filter(F.col("id").isNotNull())
        .select(
            "id",
            F.when(F.col("type") == "EDGE_ADDITION", F.lit(1))
            .when(F.col("type") == "EDGE_REMOVAL", F.lit(-1))
            .otherwise(F.lit(0)).alias("ddeg"),
            F.when(F.col("type").isin("EDGE_ADDITION",
                                      "EDGE_WEIGHT_INCREMENT"),
                   F.coalesce(F.col("w"), F.lit(0.0)))
            .otherwise(F.lit(0.0)).alias("dstr"),
        )
    )

    def update(key, pdfs, state):
        import pandas as pd

        deg, strength = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            deg += int(pdf["ddeg"].sum())
            strength += float(pdf["dstr"].sum())
        state.update((deg, strength))
        yield pd.DataFrame({"id": [key[0]], "degree": [deg],
                            "strength": [strength]})

    return deltas.groupBy("id").applyInPandasWithState(
        update,
        outputStructType="id long, degree long, strength double",
        stateStructType="degree long, strength double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
