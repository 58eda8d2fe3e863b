"""Selective community detection: seed-set expansion (SCD).

Reference: /root/reference/networkit/cpp/scd/PageRankNibble.cpp:20-100
(best-conductance sweep over an approximate personalized PageRank) and
cpp/scd/ApproximatePageRank.cpp:20-62 (Andersen–Chung–Lang push on the
LAZY random walk: push(u) moves alpha*r(u) into p(u), halves the rest
onto u, and spreads the other half over the neighbors proportionally to
edge weight / volume).

The reference processes pushes one at a time from a FIFO queue — a
driver-side loop that cannot scale. The Spark-first formulation is the
SYNCHRONOUS BATCHED push: every superstep, ALL vertices with
r(u) >= eps*vol(u) push simultaneously (one edge join + one aggregation
per round). The terminal invariant is identical (r(v) < eps*vol(v)
everywhere) and the ACL error bound still holds push-order-free:
0 <= lazy-ppr(v) - p(v) < eps*vol(v)  (tested against a dense
numpy lazy-PPR in tests/test_scd.py). Exact p values differ from the
queue order — any push order yields a valid APR, and the batched order
is the deterministic, distributable one.

The conductance sweep (PageRankNibble.cpp:20-81) is two window passes
instead of a sequential set-walk: rank support vertices by p/vol desc,
then  cut_k = cumvol_k - 2*cuminternal_k  where an edge becomes internal
at max(rank_u, rank_v) — one join of the support ranks onto the edges
plus cumulative-sum windows, no driver iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import SuperstepRunner


def _sym_weighted(g: Graph) -> DataFrame:
    """(src, dst, w) with both orientations for undirected graphs;
    self-loops kept (they receive push mass like any neighbor)."""
    e = g.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    if g.directed:
        raise ValueError("PageRankNibble/APR is defined on undirected "
                         "graphs (reference expandSeed uses G.volume / "
                         "forNeighborsOf symmetric semantics)")
    return e.filter("src != dst").union(
        e.filter("src != dst").select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst"), "w")
    ).union(e.filter("src = dst"))


def _volumes(sym: DataFrame) -> DataFrame:
    """(id, vol): weighted degree with self-loop weight counted twice
    (reference Graph::volume)."""
    non = sym.filter("src != dst").select(F.col("src").alias("id"), "w")
    loop = sym.filter("src = dst").select(
        F.col("src").alias("id"), (2.0 * F.col("w")).alias("w"))
    return non.union(loop).groupBy("id").agg(F.sum("w").alias("vol"))


def approximate_pagerank(g: Graph, seed: int, alpha: float = 0.15,
                         epsilon: float = 1e-4, max_iter: int = 200,
                         runner: SuperstepRunner | None = None) -> DataFrame:
    """(id, p, r): batched ACL push until r(v) < eps*vol(v) everywhere.

    Raises on hitting ``max_iter`` without convergence rather than
    returning a silently-truncated estimate (same policy as scc.py)."""
    spark = g.edges.sparkSession
    sym = _sym_weighted(g).repartition("src").persist()
    vol = _volumes(sym).persist()
    vol.count()

    def init_fn() -> DataFrame:
        return vol.select(
            "id", "vol",
            F.lit(0.0).alias("p"),
            F.when(F.col("id") == seed, 1.0).otherwise(0.0).alias("r"),
        ).withColumn("_changed",
                     (F.col("r") >= epsilon * F.col("vol")).cast("int"))

    def step_fn(state: DataFrame, k: int) -> DataFrame:
        # the reference enqueues the seed unconditionally
        # (ApproximatePageRank.cpp:43-44), so round 0 pushes it even if
        # its residual is already under the threshold
        is_active = (F.col("r") >= epsilon * F.col("vol")) | (
            F.lit(k == 0) & (F.col("id") == seed))
        active = state.filter(is_active)
        # mass arriving at dst from every active src in one aggregation
        inbox = (
            sym.join(active.select(F.col("id").alias("src"),
                                   F.col("r").alias("_r"),
                                   F.col("vol").alias("_v")), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum((1.0 - alpha) * F.col("_r") * F.col("w")
                       / (2.0 * F.col("_v"))).alias("m"))
        )
        out = (
            state.join(inbox, "id", "left")
            .select(
                "id", "vol",
                F.when(is_active, F.col("p") + alpha * F.col("r"))
                .otherwise(F.col("p")).alias("p"),
                (F.when(is_active, (1.0 - alpha) * F.col("r") / 2.0)
                 .otherwise(F.col("r"))
                 + F.coalesce(F.col("m"), F.lit(0.0))).alias("r"),
            )
        )
        return out.withColumn(
            "_changed", (F.col("r") >= epsilon * F.col("vol")).cast("int"))

    def stop_fn(metrics: dict, k: int) -> bool:
        return metrics.get("changed", 1) == 0

    def finalize_fn(state: DataFrame) -> DataFrame:
        sym.unpersist()
        return state.select("id", "vol", "p", "r")

    if runner is None:
        runner = SuperstepRunner(spark, job_id="apr-anon", ephemeral=True)
    out = runner.run(init_fn, step_fn, stop_fn, max_iter=max_iter,
                     finalize_fn=finalize_fn)
    if runner.history and runner.history[-1].get("changed", 0) != 0:
        raise RuntimeError(
            f"approximate_pagerank did not satisfy r < eps*vol within "
            f"{max_iter} batched pushes; raise max_iter or epsilon")
    vol.unpersist()
    return out


def sweep_table(g: Graph, pr: DataFrame,
                tie_digits: int | None = None) -> DataFrame:
    """(id, rank, cond): conductance of every prefix of the support
    ordered by p/vol desc (ties: id asc — the reference's std::sort
    order on equal keys is unspecified; id asc makes ours
    deterministic). PageRankNibble.cpp:20-81 semantics:
    cond_k = cut_k / min(vol_k, totalVol - vol_k).

    ``tie_digits`` rounds the ordering key p/vol to that many decimals
    first — the cross-engine-stable ordering the DuckDB gate needs
    (float sums from different reduction orders can flip unrounded
    near-ties).

    The global-order windows here run over the APR SUPPORT only — the
    push touches O(1/(eps·alpha)) volume independent of graph size
    (Andersen–Chung–Lang locality), so the single-partition sort is
    bounded by the eps parameter, not by n; this is the deliberate
    exception to docs/PLANS.md rule 3."""
    sym = _sym_weighted(g)
    vol = _volumes(sym)
    # total volume = sum of reference Graph::volume over all vertices
    # (= 2*totalEdgeWeight with self-loop weight counted twice, matching
    # _volumes — summing sym rows would count self-loops only once)
    total = vol.agg(F.sum("vol")).collect()[0][0] or 0.0

    score = F.col("p") / F.col("vol")
    if tie_digits is not None:
        score = F.round(score, tie_digits)
    touched = pr.filter((F.col("p") > 0) | (F.col("r") > 0))
    if "vol" not in pr.columns:
        touched = touched.join(vol, "id")
    support = touched.select("id", "vol", score.alias("score"))
    w_rank = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    ranked = support.select(
        "id", "vol", F.row_number().over(w_rank).alias("rank")).persist()

    # an edge turns internal at the max of its endpoint ranks; self-loops
    # are internal from their own rank (their vol contribution is 2w)
    und = sym.filter("src < dst").select(
        F.col("src").alias("u"), F.col("dst").alias("v"), "w").union(
        sym.filter("src = dst").select(
            F.col("src").alias("u"), F.col("dst").alias("v"), "w"))
    internal = (
        und.join(ranked.select(F.col("id").alias("u"),
                               F.col("rank").alias("ru")), "u")
        .join(ranked.select(F.col("id").alias("v"),
                            F.col("rank").alias("rv")), "v")
        .select(F.greatest("ru", "rv").alias("rank"), "w")
        .groupBy("rank").agg(F.sum("w").alias("int_w"))
    )
    w_cum = Window.orderBy("rank").rangeBetween(Window.unboundedPreceding, 0)
    out = (
        ranked.join(internal, "rank", "left")
        .withColumn("cumvol", F.sum("vol").over(w_cum))
        .withColumn("cumint",
                    F.sum(F.coalesce("int_w", F.lit(0.0))).over(w_cum))
        .select(
            "id", "rank",
            ((F.col("cumvol") - 2.0 * F.col("cumint"))
             / F.least(F.col("cumvol"),
                       F.greatest(F.lit(total) - F.col("cumvol"),
                                  F.lit(1e-300)))).alias("cond"))
    )
    ranked.unpersist()
    return out


def page_rank_nibble(g: Graph, seed: int, alpha: float = 0.15,
                     epsilon: float = 1e-4,
                     runner: SuperstepRunner | None = None) -> DataFrame:
    """(id,): the best-conductance sweep community around ``seed``.

    Reference keeps the FIRST prefix achieving the minimum conductance
    (strict < improvement) and requires |S| < n."""
    n = g.vertices.count()
    pr = approximate_pagerank(g, seed, alpha, epsilon, runner=runner)
    sw = sweep_table(g, pr).filter(F.col("rank") < n).persist()
    best = (sw.orderBy(F.col("cond").asc(), F.col("rank").asc())
            .select("rank").limit(1).collect())
    if not best:
        sw.unpersist()
        return g.vertices.sparkSession.createDataFrame([(seed,)], "id long")
    k = best[0]["rank"]
    # executor-side lineage cut detaching the result from the
    # to-be-unpersisted sweep table (no driver round-trip)
    from networkit_spark.plans.scratch import Scratch

    sc = Scratch(g.vertices.sparkSession, "nibble")
    out = sc.cut(sw.filter(F.col("rank") <= k).select("id")).persist()
    out.count()
    sc.cleanup()
    sw.unpersist()
    return out


def gce_expand(g: Graph, seed: int, max_rounds: int = 200) -> list[int]:
    """Greedy Community Expansion, objective M = intWeight/extWeight
    (reference cpp/scd/GCE.cpp:190-196 deltaM, greedy loop :245-280):
    grow {seed} one node at a time by the shell node with the largest
    deltaM = (int+degInt)/(ext-degInt+degExt) - Q, while any dQ >= 0.

    The greedy is inherently one-node-per-round (the reference's loop is
    too); each round here is ONE broadcast-join aggregation computing
    degInt/degExt for every shell node at once, so a round costs one
    linear scan regardless of community size — the driver only holds the
    (small, local by construction) community itself. The reference's
    unordered_map iteration makes its tie-break nondeterministic; ours is
    (max dQ, then min id). The L objective (boundary-size tracking) is
    not implemented.

    Returns the community as a sorted list of node ids."""
    if g.edges.filter("src = dst").limit(1).count():
        raise ValueError("Graphs with self-loops are not supported in GCE "
                         "(reference GCE.cpp:38-40)")
    sym = _sym_weighted(g).persist()
    deg = _volumes(sym)  # == weighted degree (no self-loops)
    community = {int(seed)}
    seed_deg = deg.filter(F.col("id") == seed).collect()
    int_w = 0.0
    ext_w = float(seed_deg[0]["vol"]) if seed_deg else 0.0
    q = 0.0
    for _ in range(max_rounds):
        comm_df = F.broadcast(
            sym.sparkSession.createDataFrame(
                [(v,) for v in sorted(community)], "id long"))
        cand = (
            sym.join(comm_df.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("w").alias("deg_int"))
            .join(comm_df, "id", "left_anti")
            .join(deg, "id")
            .select("id", "deg_int",
                    (F.col("vol") - F.col("deg_int")).alias("deg_ext"))
        )
        rows = cand.collect()
        best, best_dq = None, None
        for r in rows:
            den = ext_w - r["deg_int"] + r["deg_ext"]
            dq = (float("inf") if den <= 0
                  else (int_w + r["deg_int"]) / den) - q
            if dq >= 0 and (best is None or dq > best_dq
                            or (dq == best_dq and r["id"] < best["id"])):
                best, best_dq = r, dq
        if best is None:
            break
        community.add(int(best["id"]))
        int_w += float(best["deg_int"])
        ext_w += float(best["deg_ext"]) - float(best["deg_int"])
        q += best_dq
    sym.unpersist()
    return sorted(community)
