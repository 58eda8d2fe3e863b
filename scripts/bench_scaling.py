#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.json north_rule: ≥0.8
throughput scaling efficiency from N to 4N executors; sandbox proxy:
local[8] vs local[32] — separate JVMs, same input, same job).

Runs the PageRank superstep workload (fixed iterations over an RMAT corpus
graph) at both levels, computes efficiency = (T8 / T32) / 4, and writes
BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [--scale 19] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from networkit_spark.session import get_spark
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.operators.components import connected_components
from networkit_spark.sources.generators import rmat_edges
from networkit_spark.graph import Graph

spark = get_spark(app_name="scaling-{cpus}", master="local[{cpus}]",
                  shuffle_partitions={parts})
spark.sparkContext.setLogLevel("ERROR")
edges = rmat_edges(spark, scale={scale}, edge_factor=8, seed=42).filter(
    "src != dst")
g = Graph(edges, directed=True)
m = g.edges.persist().count()
n = g.num_vertices()

t0 = time.monotonic()
pagerank(g, fixed_iters={iters}).count()
t_pr = time.monotonic() - t0

t0 = time.monotonic()
connected_components(g, algorithm="star").count()
t_cc = time.monotonic() - t0

print("RESULT " + json.dumps(dict(cpus={cpus}, m=m, n=n, t_pr=t_pr,
                                  t_cc=t_cc, iters={iters})))
spark.stop()
"""


def run_level(cpus: int, scale: int, iters: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, parts=max(cpus * 2, 16),
                        scale=scale, iters=iters)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from local[{cpus}]:\n{out.stdout[-2000:]}"
                       f"\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=19)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    results = {c: run_level(c, args.scale, args.iters) for c in (8, 32)}
    r8, r32 = results[8], results[32]
    m, iters = r8["m"], args.iters

    def eps(t):  # edges/sec/superstep metric, Benchmark.py:261-266 convention
        return m * iters / t

    eff_pr = (r8["t_pr"] / r32["t_pr"]) / 4
    eff_cc = (r8["t_cc"] / r32["t_cc"]) / 4

    md = f"""# BENCH/BASELINE — measured engine numbers

Workload: PageRank ({iters} fixed supersteps) and connected components
(small-star/large-star to fixpoint) over an RMAT scale={args.scale} directed graph
(n={r8['n']:,}, m={m:,} edges), generator seed 42. Same input, same job, two
parallelism levels in separate JVMs (the sandbox proxy for N vs 4N
executors mandated by BASELINE.json).

| metric | local[8] | local[32] | scaling efficiency (T8/T32)/4 |
|---|---|---|---|
| PageRank wall (s, {iters} supersteps) | {r8['t_pr']:.1f} | {r32['t_pr']:.1f} | **{eff_pr:.2f}** |
| PageRank edges/sec/superstep | {eps(r8['t_pr']):,.0f} | {eps(r32['t_pr']):,.0f} | — |
| Connected components wall (s) | {r8['t_cc']:.1f} | {r32['t_cc']:.1f} | **{eff_cc:.2f}** |
| CC edges/sec | {m/r8['t_cc']:,.0f} | {m/r32['t_cc']:,.0f} | — |

Target (north rule): efficiency ≥ 0.8. Raw JSON:

```json
{json.dumps(results, indent=2)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
