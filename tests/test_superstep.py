"""Checkpoint/resume machinery tests (north rule: resumable mid-iteration
with per-partition lineage + metrics)."""

import json
import os

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.plans.superstep import SuperstepRunner
from tests.conftest import PR8_EDGES
from tests.oracles import pagerank_ref


def test_checkpoint_files_written(spark, tmp_path):
    g = Graph.from_rows(spark, PR8_EDGES, directed=False)
    runner = SuperstepRunner(spark, job_id="pr-ckpt", state_dir=str(tmp_path))
    pagerank(g, fixed_iters=3, runner=runner)
    job_dir = tmp_path / "pr-ckpt"
    iters = sorted(p.name for p in job_dir.iterdir() if p.name.startswith("iter="))
    assert iters == ["iter=00000", "iter=00001", "iter=00002"]
    metrics = [json.loads(l) for l in (job_dir / "metrics.jsonl").read_text().splitlines()]
    assert [m["iter"] for m in metrics] == [0, 1, 2]
    assert all(m["rows"] == 8 and "wall_ms" in m for m in metrics)
    parts = [json.loads(l) for l in (job_dir / "partitions.jsonl").read_text().splitlines()]
    assert sum(p["rows"] for p in parts if p["iter"] == 2) == 8
    # manifest-style lineage: one record per written file with rows+bytes
    assert all("file" in p and p["bytes"] > 0 for p in parts)
    # global content fingerprint lives in the per-superstep metrics
    assert all("fingerprint" in m for m in metrics)


def test_resume_mid_iteration_identical(spark, tmp_path):
    """Kill after superstep k, restart, final scores identical to an
    uninterrupted run (SURVEY.md §5.2 item 6)."""
    g = Graph.from_rows(spark, PR8_EDGES, directed=False)

    full = pagerank(g, fixed_iters=12,
                    runner=SuperstepRunner(spark, "pr-full", state_dir=str(tmp_path)))
    full_scores = {r["id"]: r["rank"] for r in full.collect()}

    # run 1: "killed" after 5 supersteps (max_iter caps it)
    pagerank(g, fixed_iters=5,
             runner=SuperstepRunner(spark, "pr-resume", state_dir=str(tmp_path)))
    # verify partial durable state exists
    assert os.path.exists(tmp_path / "pr-resume" / "iter=00004" / "_SUCCESS")

    # run 2: resume the same job to 12 total supersteps
    r2 = SuperstepRunner(spark, "pr-resume", state_dir=str(tmp_path), resume=True)
    resumed = pagerank(g, fixed_iters=12, runner=r2)
    resumed_scores = {r["id"]: r["rank"] for r in resumed.collect()}

    # the resumed run must pick up from iter 4's durable state, not restart
    assert r2.resumed_from == 4
    for i in full_scores:
        assert full_scores[i] == pytest.approx(resumed_scores[i], abs=1e-15)


def test_resume_skips_if_converged(spark, tmp_path):
    g = Graph.from_rows(spark, PR8_EDGES, directed=False)
    r1 = SuperstepRunner(spark, "pr-done", state_dir=str(tmp_path))
    out1 = pagerank(g, tol=1e-4, runner=r1)
    s1 = {r["id"]: r["rank"] for r in out1.collect()}
    # resume: converged metrics already recorded → no new supersteps
    r2 = SuperstepRunner(spark, "pr-done", state_dir=str(tmp_path), resume=True)
    out2 = pagerank(g, tol=1e-4, runner=r2)
    s2 = {r["id"]: r["rank"] for r in out2.collect()}
    assert r2.history and all(m["iter"] <= max(x["iter"] for x in r1.history)
                              for m in r2.history)
    for i in s1:
        assert s1[i] == pytest.approx(s2[i], abs=1e-15)


def test_lineage_fingerprint_deterministic(spark, tmp_path):
    g = Graph.from_rows(spark, PR8_EDGES, directed=False)
    fps = []
    for job in ("fp-a", "fp-b"):
        r = SuperstepRunner(spark, job, state_dir=str(tmp_path))
        pagerank(g, fixed_iters=3, runner=r)
        fps.append([m["fingerprint"] for m in r.history])
    assert fps[0] == fps[1]  # same input + same supersteps → same lineage


def test_power_iteration_one_action_per_superstep(spark):
    # round-2 "What's wrong" #3: eigen/Katz collected the L2 norm on the
    # driver every superstep — an extra full job per iteration. The lazy
    # normalization folds the norm into the next step's expressions via
    # the _norm2 observation metric; assert the job count stays at
    # ~one action per superstep (was ~two).
    from networkit_spark.graph import Graph
    from networkit_spark.operators.centrality import eigenvector_centrality

    g = Graph.from_rows(spark, [(i, i + 1, 1.0) for i in range(8)],
                        directed=False)
    g.num_vertices()  # materialize count outside the measured group
    sc = spark.sparkContext
    from networkit_spark.plans.superstep import SuperstepRunner

    runner = SuperstepRunner(spark, job_id="eigen-jobcount", ephemeral=True)
    sc.setJobGroup("eigen-jobcount", "power-iteration action audit")
    try:
        out = eigenvector_centrality(g, fixed_iters=6, runner=runner)
        rows = {r["id"]: r["score"] for r in out.collect()}
    finally:
        sc.setJobGroup("", "")
    assert len(rows) == 9 and abs(sum(v * v for v in rows.values()) - 1.0) < 1e-9
    # the norm must come from the FUSED observation metric, not a
    # per-superstep collect: every iteration's metrics carry norm2
    assert runner.history and all("norm2" in m for m in runner.history)
    # raw job counts include AQE query-stage and broadcast-exchange jobs
    # (~8/superstep here); the eager-norm version adds one full
    # agg+collect query (~3-4 more jobs) per superstep → ~70+ total
    jobs = sc.statusTracker().getJobIdsForGroup("eigen-jobcount")
    assert len(jobs) <= 55, f"{len(jobs)} jobs for 6 supersteps"
