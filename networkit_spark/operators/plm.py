"""PLM (Louvain) — parallel local moves + multilevel coarsening.

Reference: /root/reference/networkit/cpp/community/PLM.cpp:28-260 — the
default of community.detectCommunities (networkit/community.py:36).
Semantics replicated:
  - node volume = weightedDegree + self-loop weight again (PLM.cpp:47-50)
  - gain for moving u from C to D (PLM.cpp:140-146):
        ΔQ = (aff_D − aff_C)/ω(G)
             + γ·(vol(C\\u) − vol(D\\u))·vol(u) / (2·ω(G)²)
    with affinities excluding self-loops; move only on positive gain,
    smallest target community id on ties (the reference's OpenMP
    schedule makes its tie order nondeterministic; smallest-id is our
    deterministic choice).
  - multilevel: when local moves stabilize, contract communities to one
    node each (ParallelPartitionCoarsening — operators/coarsening.py)
    and recurse; prolong the coarse partition back (PLM::prolong);
    ``refine=True`` runs one more warm-started local-move pass on the
    fine graph (PLM.cpp refine).

Distributed execution — one synchronous local-move round is
  1. community volumes: labels ⋈ node volumes, one aggregation;
  2. affinities: sym-edges ⋈ labels(dst) grouped by (src, community) —
     the only edge-sized shuffle;
  3. best positive-gain move per node: one max-by-struct aggregation;
  4. apply moves to HALF the nodes (deterministic xxhash parity,
     alternating with the round index).

Sequential Louvain is monotone because moves are applied one at a time;
ANY synchronous scheme (even parity-restricted — parity classes are not
independent sets) can livelock on symmetric configurations. So rounds
are QUALITY-GUARDED: modularity is evaluated every round (one edge-scan
aggregation, the same cost class as the move step), the best partition
seen is retained, and the loop stops at a true fixpoint (zero moves on
both parities) or when modularity hasn't improved for ``patience``
rounds — returning the best, not the last, state. Per-round lineage is
cut by a cluster-portable parquet round-trip (plans/scratch.py; see
plans/superstep.py on why not localCheckpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.coarsening import coarsen
from networkit_spark.operators.lpa import modularity
from networkit_spark.plans.scratch import Scratch


def _local_move(g: Graph, gamma: float, max_rounds: int,
                init_labels: DataFrame | None = None,
                patience: int = 4) -> DataFrame:
    """One Louvain level: quality-guarded synchronous local moves.
    Returns (id, label) — the best-modularity labeling seen."""
    spark = g.edges.sparkSession
    e = g.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    loops = e.filter("src = dst")
    nonloop = e.filter("src != dst")
    sym = nonloop.union(
        nonloop.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                       "w")
    ).repartition("src").persist()

    total = float(e.agg(F.sum("w")).collect()[0][0] or 0.0)
    if total == 0.0:
        return g.vertices.select("id", F.col("id").alias("label"))
    divisor = 2.0 * total * total

    # node volume: weighted degree + self-loop weight counted twice
    wdeg = sym.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("_wd"))
    loopw = loops.groupBy(F.col("src").alias("id")).agg(
        (F.sum("w") * 2).alias("_lw"))
    vols = (
        g.vertices.join(wdeg, "id", "left").join(loopw, "id", "left")
        .select("id", (F.coalesce("_wd", F.lit(0.0))
                       + F.coalesce("_lw", F.lit(0.0))).alias("vol"))
        .persist()
    )
    vols.count()

    scratch = Scratch(spark, "plm")

    def cut(df: DataFrame, rnd: int) -> DataFrame:
        return scratch.cut(df, f"r{rnd}")

    if init_labels is not None:
        labels = cut(init_labels.select("id", "label"), 0)
    else:
        labels = cut(g.vertices.select("id", F.col("id").alias("label")), 0)

    def step(labels: DataFrame, k: int) -> DataFrame:
        comvol = labels.join(vols, "id").groupBy("label").agg(
            F.sum("vol").alias("cvol"), F.count(F.lit(1)).alias("csize"))
        aff = (
            sym.join(labels.select(F.col("id").alias("dst"),
                                   F.col("label").alias("cand")), "dst")
            .groupBy(F.col("src").alias("id"), "cand")
            .agg(F.sum("w").alias("aff"))
        )
        cur = (
            labels.join(vols, "id")
            .join(comvol, "label")
            .join(aff.select("id", F.col("cand").alias("label"),
                             F.col("aff").alias("aff_c")),
                  ["id", "label"], "left")
            .select("id", "label", "vol",
                    (F.col("cvol") - F.col("vol")).alias("vol_cu"),
                    F.col("csize").alias("own_size"),
                    F.coalesce("aff_c", F.lit(0.0)).alias("aff_c"))
        )
        # Grappolo-style swap guard: two singletons simultaneously
        # adopting each other's label swap forever (k never drops, gains
        # stay positive) — allow a singleton→singleton move only toward
        # the SMALLER label, so exactly one side of the pair moves.
        swap_ok = ~((F.col("own_size") == 1) & (F.col("dsize") == 1)
                    & (F.col("cand") > F.col("label")))
        scored = (
            cur.join(aff, "id")
            .filter(F.col("cand") != F.col("label"))
            .join(comvol.select(F.col("label").alias("cand"),
                                F.col("cvol").alias("dvol"),
                                F.col("csize").alias("dsize")), "cand")
            .filter(swap_ok)
            .select(
                "id", "label", "cand",
                ((F.col("aff") - F.col("aff_c")) / F.lit(total)
                 + F.lit(gamma) * (F.col("vol_cu") - F.col("dvol"))
                 * F.col("vol") / F.lit(divisor)).alias("gain"),
            )
        )
        best_move = (
            scored.filter(F.col("gain") > 1e-12)
            .groupBy("id")
            .agg(F.max(F.struct(F.col("gain"),
                                (-F.col("cand")).alias("_neg"),
                                F.col("cand"))).alias("b"))
            .select("id", F.col("b.cand").alias("new_label"))
        )
        parity = F.pmod(F.xxhash64("id"), F.lit(2)) == (k % 2)
        move = parity & F.col("new_label").isNotNull() \
            & (F.col("new_label") != F.col("label"))
        return (
            labels.join(best_move, "id", "left")
            .select("id",
                    F.when(move, F.col("new_label")).otherwise(F.col("label"))
                    .alias("label"),
                    move.cast("long").alias("_moved"))
        )

    best_labels, best_q = labels, modularity(g, labels)
    since_best, zero_streak = 0, 0
    for k in range(max_rounds):
        nxt = cut(step(labels, k), k + 1)
        moved = int(nxt.agg(F.sum("_moved")).collect()[0][0] or 0)
        labels = nxt.select("id", "label")
        q = modularity(g, labels)
        if q > best_q + 1e-12:
            best_labels, best_q, since_best = labels, q, 0
        else:
            since_best += 1
        zero_streak = zero_streak + 1 if moved == 0 else 0
        if zero_streak >= 2 or since_best >= patience:
            break

    out = best_labels.select("id", "label").persist()
    out.count()
    sym.unpersist()
    vols.unpersist()
    scratch.cleanup()
    return out


def plm(g: Graph, gamma: float = 1.0, max_rounds: int = 32,
        max_levels: int = 8, refine: bool = False) -> DataFrame:
    """(id, label): Louvain communities of the undirected view of ``g``.
    Labels are (arbitrary) original vertex ids — canonicalize with
    lpa.canonicalize_labels / graph_tools.compact_partition as needed."""
    und = Graph(g.edges, directed=False, weighted=g.weighted,
                vertices=g.vertices)

    level = 0
    mapping = _local_move(und, gamma, max_rounds)
    n = und.vertices.count()
    k = mapping.select("label").distinct().count()

    cur_g, cur_part = und, mapping
    while k < n and level < max_levels:
        level += 1
        coarse = coarsen(cur_g, cur_part)
        coarse_part = _local_move(coarse, gamma, max_rounds)
        # prolong: fine id -> community of its coarse node
        new_mapping = (
            mapping.join(coarse_part.withColumnRenamed("label", "_new")
                         .withColumnRenamed("id", "label"), "label")
            .select("id", F.col("_new").alias("label"))
        ).persist()
        new_k = new_mapping.select("label").distinct().count()
        if new_k >= k:
            break
        mapping, cur_g, cur_part = new_mapping, coarse, coarse_part
        n, k = k, new_k

    if refine:
        refined = _local_move(und, gamma, max_rounds, init_labels=mapping)
        if modularity(und, refined) >= modularity(und, mapping):
            mapping = refined
    return mapping.select("id", "label")
