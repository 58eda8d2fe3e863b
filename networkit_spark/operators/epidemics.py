"""Epidemic simulation (SEIR) as synchronous supersteps.

Reference: /root/reference/networkit/cpp/simulation/
EpidemicSimulationSEIR.cpp:16-100 — per tick every Infectious node
contacts its neighbors (each contact exposes a Susceptible target with
probability ``trans_p``), Exposed nodes turn Infectious after
``e_time`` ticks, Infectious nodes turn Removed after ``i_time`` ticks,
and an (S, E, I, R) census is recorded per tick.

The reference's sequential per-node sweep is MOSTLY order-insensitive
within a tick, but with ``e_time=0`` a just-contacted node can flip
E→I inside the same sweep depending on the parallelForNodes visit
order — i.e. the reference is racy/order-dependent in that corner.
The synchronous batch below pins the deterministic ordering "contacted
nodes transition on the NEXT tick" (one of the reference's admissible
orderings, the only order-free one): one join from the I-front to its
neighbors + one column-expression state transition per tick, census
fused into the tick's action. Randomness is counter-based
(xxhash64(dst, src, t, seed) per CONTACT, mirroring the reference's
per-contact draw — a node with k infectious neighbors gets k draws).

Scale: state is one vertex-sized DataFrame; the contact join touches
only edges incident to the CURRENT infectious front — the epidemic
analogue of a BFS frontier. This is the engine's cascade/diffusion
primitive (viral propagation over a 100 TB link graph is the same
dataflow)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.scratch import Scratch

S, E, I, R = 0, 1, 2, 3  # reference State enum order (census order)


def epidemic_simulation_seir(g: Graph, zero: int, t_max: int = 32,
                             trans_p: float = 0.5, e_time: int = 2,
                             i_time: int = 7, seed: int = 42,
                             return_states: bool = False):
    """Census DataFrame (t, state, count) for t in [0, t_max) and state
    in {0:S, 1:E, 2:I, 3:R} (EpidemicSimulationSEIR.cpp getData
    layout, minus the constant zero column). ``zero`` is the index
    patient (the reference picks a random node when absent — pass one
    explicitly; determinism is a feature here). With
    ``return_states=True`` returns (census, final (id, state, ts))."""
    from networkit_spark.sources.generators import _u01

    spark = g.edges.sparkSession
    e = g.edges.filter("src != dst").select("src", "dst")
    sym = e if g.directed else e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.distinct()

    census_rows = []
    with Scratch(spark, "seir") as sc:
        sym = sc.cut(sym)
        state = sc.cut(g.vertices.select(
            "id",
            F.when(F.col("id") == zero, F.lit(I)).otherwise(F.lit(S))
            .alias("st"),
            F.lit(0).alias("ts")))
        for t in range(t_max):
            infectious = state.filter(F.col("st") == I).select("id")
            contacted = (
                sym.join(infectious.withColumnRenamed("id", "src"),
                         "src", "left_semi")
                .withColumn("hit", (_u01(F.col("dst"), F.col("src"),
                                         F.lit(t), F.lit(seed))
                                    <= F.lit(trans_p)).cast("int"))
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("hit").alias("hit"))
                .filter(F.col("hit") == 1).select("id")
                .withColumn("_c", F.lit(1))
            )
            nxt = (
                state.join(contacted, "id", "left")
                .select(
                    "id",
                    F.when((F.col("st") == S) & F.col("_c").isNotNull(),
                           F.lit(E))
                    .when((F.col("st") == E)
                          & (F.lit(t) - F.col("ts") >= e_time), F.lit(I))
                    .when((F.col("st") == I)
                          & (F.lit(t) - F.col("ts") >= i_time), F.lit(R))
                    .otherwise(F.col("st")).alias("st2"),
                    "st", "ts")
                .select("id", F.col("st2").alias("st"),
                        F.when(F.col("st2") != F.col("st"), F.lit(t))
                        .otherwise(F.col("ts")).alias("ts"))
            )
            nxt, m = sc.cut_observed(
                nxt,
                [F.sum((F.col("st") == s).cast("long")).alias(f"c{s}")
                 for s in (S, E, I, R)],
                keep=["id", "st", "ts"])
            state = nxt
            for s in (S, E, I, R):
                census_rows.append((t, s, int(m[f"c{s}"] or 0)))
        census = spark.createDataFrame(
            census_rows, "t long, state long, count long")
        if return_states:
            out = state.persist()
            out.count()
            return census, out
    return census
