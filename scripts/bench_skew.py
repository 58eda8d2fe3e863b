#!/usr/bin/env python
"""Skewed-graph PageRank evidence: dataframe mode vs blocks mode vs
blocks+hub-salting, same graph, separate JVMs.

The graph is RMAT (power-law skewed by construction) PLUS one injected
mega-hub source whose out-edges dwarf every natural hub — the regime
hub salting exists for: in blocks mode a hub's coefficient rows live in
ONE src block, so its rank lookup is a broadcast of O(hubs) ranks and
its messages repartition by dst instead of funnelling through the hub's
block. Reports steady-state superstep walls for the three configs and
writes BENCH/SKEW.md.

Usage: python scripts/bench_skew.py [--scale 22] [--iters 8]
                                    [--cpus 16] [--hub-edges 500000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
load0 = os.getloadavg()
from pyspark.sql import functions as F
from networkit_spark.session import get_spark
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.plans.superstep import SuperstepRunner
from networkit_spark.sources.generators import rmat_edges
from networkit_spark.graph import Graph

spark = get_spark(app_name="skew-{tag}", master="local[{cpus}]",
                  shuffle_partitions={parts})
spark.sparkContext.setLogLevel("ERROR")
base = rmat_edges(spark, scale={scale}, edge_factor=8, seed=42,
                  deduplicate=False).filter("src != dst")
# one synthetic mega-hub: node 1 -> {hub_edges} distinct targets
hub = spark.range({hub_edges}).select(
    F.lit(1).cast("long").alias("src"),
    (F.col("id") % ((1 << {scale}) - 2) + 2).cast("long").alias("dst"))
g = Graph(base.select("src", "dst").union(hub), directed=True)
m = g.edges.persist().count()
n = g.num_vertices()

r = SuperstepRunner(spark, "skew-{tag}", ephemeral=True)
t0 = time.monotonic()
pagerank(g, fixed_iters={iters}, runner=r, mode={mode!r},
         hub_threshold={hub_threshold}).count()
t_pr = time.monotonic() - t0
walls = [x["wall_ms"] / 1000.0 for x in r.history]
print("RESULT " + json.dumps(dict(tag="{tag}", m=m, n=n, t_pr=t_pr,
                                  walls=walls, load_before=load0,
                                  load_after=os.getloadavg())))
spark.stop()
"""


def run_cfg(tag: str, mode: str, hub_threshold: int, args) -> dict:
    code = CHILD.format(repo=REPO, tag=tag, cpus=args.cpus,
                        parts=max(args.cpus * 2, 16), scale=args.scale,
                        hub_edges=args.hub_edges, iters=args.iters,
                        mode=mode, hub_threshold=hub_threshold)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600,
                         env=dict(os.environ, NKS_DRIVER_MEM="48g"))
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from {tag}:\n{out.stdout[-2000:]}"
                       f"\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=22)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--hub-edges", type=int, default=500_000)
    args = ap.parse_args()

    leftovers = subprocess.run(
        ["pgrep", "-f", "SparkSubmit"], capture_output=True, text=True
    ).stdout.split()
    if leftovers:
        print(f"WARNING: {len(leftovers)} SparkSubmit JVM(s) running — "
              "results will be contaminated", file=sys.stderr)

    cfgs = [
        ("dataframe", "dataframe", 1 << 20),
        ("blocks_nosalt", "blocks", 1 << 20),
        ("blocks_salted", "blocks", 100_000),
    ]
    results = {tag: run_cfg(tag, mode, thr, args) for tag, mode, thr in cfgs}

    lines = [
        "# BENCH/SKEW — PageRank on a skewed graph: mode comparison",
        "",
        f"RMAT scale={args.scale} ef=8 (power-law) + one injected mega-hub",
        f"(node 1 → {args.hub_edges:,} targets), local[{args.cpus}],",
        f"{args.iters} fixed supersteps, separate JVMs. min steady-state",
        "superstep (iters 3+) is the uncontended estimate.",
        "",
        "| config | total wall (s) | min steady-state superstep (s) |",
        "|---|---|---|",
    ]
    for tag, _, _ in cfgs:
        rr = results[tag]
        ss = min(rr["walls"][2:])
        lines.append(f"| {tag} | {rr['t_pr']:.1f} | {ss:.2f} |")
    lines += ["", "Raw JSON:", "", "```json",
              json.dumps(results, indent=2), "```", ""]
    md = "\n".join(lines)
    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
