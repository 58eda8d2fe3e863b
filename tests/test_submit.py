"""spark-submit --py-files deployment form (the north rule's run mode):
package the library as a zip, submit scripts/submit_job.py in a child
spark-submit process, and check the parquet result against the
in-process operator."""

import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit binary not available")
def test_spark_submit_pyfiles_pagerank(spark, tmp_path, karate):
    edges, n = karate
    # stage input parquet with the session we already have
    from networkit_spark.graph import Graph
    from networkit_spark.operators.pagerank import pagerank

    g = Graph.from_rows(spark, edges, directed=False, n=n)
    in_path = str(tmp_path / "edges")
    g.edges.write.mode("overwrite").parquet(in_path)

    zip_path = str(tmp_path / "networkit_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "networkit_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    out_path = str(tmp_path / "ranks")
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    env["NKS_STATE_DIR"] = str(tmp_path / "state")
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_job.py"),
         "--job", "pagerank", "--edges", in_path, "--out", out_path,
         "--tol", "1e-6"],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]

    got = {r["id"]: r["rank"]
           for r in spark.read.parquet(out_path).collect()}
    want = {r["id"]: r["rank"] for r in pagerank(g, tol=1e-6).collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
