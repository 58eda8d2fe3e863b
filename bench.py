#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

The north metric (BASELINE.json) — edges/sec per PageRank superstep — is
reported in the extra key ``edges_per_sec_per_superstep`` (the reference's
edges/s convention, /root/reference/benchmark/Benchmark.py:261-266, times
supersteps). Scaling-efficiency evidence across two parallelism levels is
produced by scripts/bench_scaling.py (BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RMAT_SCALE = int(os.environ.get("NKS_BENCH_RMAT_SCALE", "16"))
PR_ITERS = int(os.environ.get("NKS_BENCH_PR_ITERS", "10"))
#: repetitions per query — the recorded number is the MEDIAN, with
#: [min, max] spread emitted under "spread" so a regression claim is
#: falsifiable against run-to-run variance (round-3 lesson). Set 1 for
#: a quick pass.
REPS = int(os.environ.get("NKS_BENCH_REPS", "3"))


def main() -> None:
    from pyspark.sql import functions as F

    from networkit_spark.session import get_spark
    from networkit_spark.graph import Graph
    from networkit_spark.functions.dedup import jaccard_pairs, lsh_candidate_pairs
    from networkit_spark.functions.similarity import cosine_topk
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.lpa import label_propagation
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.operators.triangles import triangle_list
    from networkit_spark.sources.generators import rmat_repos
    from networkit_spark.sources.repos import graph_from_repos
    from networkit_spark.sources import tpch_graph as TG

    spark = get_spark(app_name="nks-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn, reps: int | None = None):
        """Median-of-``reps`` timing (first rep includes codegen/lineage
        warmup, so the median reflects steady state); spread records
        [min, max] across reps."""
        samples: list[float] = []
        out = None
        for _ in range(max(1, REPS if reps is None else reps)):
            t0 = time.monotonic()
            out = fn()
            samples.append(round(time.monotonic() - t0, 3))
        samples.sort()
        timings[name] = samples[len(samples) // 2]
        spread[name] = [samples[0], samples[-1]]
        return out

    # -- north-rule pipeline: synthetic corpus -> edges -> PageRank --------
    repos = rmat_repos(spark, scale=RMAT_SCALE, edge_factor=8, seed=42)

    def ingest():
        gr = graph_from_repos(repos, directed=True)
        gr.edges.unpersist()  # reps must re-materialize, not hit the cache
        gr.edges.persist().count()
        return gr

    g_corpus = timed("ingest_rmat_corpus", ingest)
    m_corpus = g_corpus.num_edges()

    timed(f"pagerank_rmat{RMAT_SCALE}_k{PR_ITERS}",
          lambda: pagerank(g_corpus, fixed_iters=PR_ITERS).count())
    pr_t = timings[f"pagerank_rmat{RMAT_SCALE}_k{PR_ITERS}"]
    extras["edges_per_sec_per_superstep"] = round(m_corpus * PR_ITERS / pr_t, 1)
    extras["rmat_edges"] = m_corpus

    timed(f"cc_star_rmat{RMAT_SCALE}",
          lambda: connected_components(g_corpus, algorithm="star").count())
    extras["cc_edges_per_sec"] = round(
        m_corpus / timings[f"cc_star_rmat{RMAT_SCALE}"], 1)

    # -- TPC-H-derived graphs ---------------------------------------------
    g_cs = TG.graph_customer_supplier(spark, SF_DIR)
    m_cs = g_cs.num_edges()
    timed("pagerank_cs_k10", lambda: pagerank(g_cs, fixed_iters=10).count())
    extras["cs_edges"] = m_cs

    g_pp = TG.graph_part_part(spark, SF_DIR)
    g_pp.edges.persist().count()
    m_pp = g_pp.num_edges()
    extras["pp_edges"] = m_pp
    timed("triangles_pp", lambda: triangle_list(g_pp).count())
    extras["tri_edges_per_sec"] = round(m_pp / timings["triangles_pp"], 1)
    timed("lpa_pp_k4", lambda: label_propagation(g_pp, theta=-1, max_iter=4).count())
    timed("cc_pp_star", lambda: connected_components(g_pp, algorithm="star").count())

    # -- round-2 kernels ---------------------------------------------------
    from networkit_spark.operators.betweenness import estimate_betweenness
    from networkit_spark.operators.kcore import core_decomposition
    from networkit_spark.operators.scc import strongly_connected_components
    from networkit_spark.sources.generators import rmat_edges

    timed("kcore_pp", lambda: core_decomposition(g_pp).count())
    extras["kcore_edges_per_sec"] = round(m_pp / timings["kcore_pp"], 1)
    timed("betweenness_est_pp_s8",
          lambda: estimate_betweenness(g_pp, n_samples=8).count())
    e14 = rmat_edges(spark, 14, 8).filter("src != dst")
    g14 = Graph(e14.withColumn("weight", F.lit(1.0)), directed=True)
    m14 = g14.edges.persist().count()
    timed("scc_rmat14", lambda: strongly_connected_components(g14).count())
    extras["scc_edges_per_sec"] = round(m14 / timings["scc_rmat14"], 1)

    # -- data-pipeline ops -------------------------------------------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed("dedup_lsh_jaccard", lambda: jaccard_pairs(
        docs, shingle=2,
        pairs=lsh_candidate_pairs(docs, k=16, bands=4, shingle=2)).count())
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        "label")
    timed("ann_cosine_top5", lambda: cosine_topk(
        emb, emb.filter("vec_id < 32"), k=5).count())

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "headline suite wall time, median-of-%d per query "
                  "(north: edges/sec/superstep in extras)" % REPS,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(CPUS),
        "reps": REPS,
        "spread": spread,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
