#!/usr/bin/env python
"""spark-submit entry point (the north rule's deployment form):

    python -m zipfile -c /tmp/networkit_spark.zip networkit_spark/
    spark-submit --master <cluster> --py-files /tmp/networkit_spark.zip \\
        scripts/submit_job.py --job pagerank \\
        --edges hdfs://…/edges.parquet --out hdfs://…/ranks \\
        [--corpus hdfs://…/repos.parquet] [--state-dir hdfs://…/state]

Jobs: pagerank | components | lpa | triangles — the north-rule kernel
set, each reading an edge table (src, dst[, weight]) or deriving one
from a corpus table (repo, path, commit, lang, content) via the
import-reference extractor, and writing the per-vertex result as
parquet. The session comes from SparkSession.builder.getOrCreate() so
the master/executor topology is owned by spark-submit, not the library;
NKS_STATE_DIR (or --state-dir) must point at shared storage on a real
cluster (superstep checkpoints + lineage cuts live there).
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--job", required=True,
                    choices=["pagerank", "components", "lpa", "triangles"])
    ap.add_argument("--edges", help="parquet edge table (src, dst[, weight])")
    ap.add_argument("--corpus",
                    help="parquet corpus table (repo, path, commit, lang, "
                         "content) — edges derived via import references")
    ap.add_argument("--out", required=True, help="output parquet path")
    ap.add_argument("--state-dir", help="shared checkpoint root "
                                        "(sets NKS_STATE_DIR)")
    ap.add_argument("--directed", action="store_true")
    ap.add_argument("--damp", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=250)
    args = ap.parse_args()
    if bool(args.edges) == bool(args.corpus):
        ap.error("exactly one of --edges / --corpus is required")
    if args.state_dir:
        os.environ["NKS_STATE_DIR"] = args.state_dir

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        f"networkit-spark-{args.job}").getOrCreate()

    from networkit_spark.graph import Graph

    if args.corpus:
        from networkit_spark.sources.repos import graph_from_repos

        g = graph_from_repos(spark.read.parquet(args.corpus),
                             directed=args.directed)
    else:
        g = Graph(spark.read.parquet(args.edges), directed=args.directed)

    if args.job == "pagerank":
        from networkit_spark.operators.pagerank import pagerank

        out = pagerank(g, damp=args.damp, tol=args.tol,
                       max_iter=args.max_iter)
    elif args.job == "components":
        from networkit_spark.operators.components import connected_components

        out = connected_components(g, algorithm="star")
    elif args.job == "lpa":
        from networkit_spark.operators.lpa import label_propagation

        out = label_propagation(g, max_iter=args.max_iter)
    else:
        from networkit_spark.operators.triangles import triangle_counts

        out = triangle_counts(g)

    out.write.mode("overwrite").parquet(args.out)
    spark.stop()


if __name__ == "__main__":
    main()
