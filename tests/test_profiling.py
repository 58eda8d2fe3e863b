"""Profile HTML report (reference profiling/profiling.py artifact)."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.profiling import (
    measure_histogram, measure_stats, profile_report, spearman,
    write_report)


def test_measure_stats_and_histogram(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, score double")
    st = measure_stats(df, "score")
    assert st["n"] == 10 and st["min"] == 0.0 and st["max"] == 9.0
    assert st["mean"] == pytest.approx(4.5)
    assert st["median"] == pytest.approx(4.0, abs=1.0)
    hist = measure_histogram(df, "score", bins=5)
    assert sum(c for _, c in hist) == 10 and len(hist) <= 5

    const = spark.createDataFrame([(0, 1.0), (1, 1.0)],
                                  "id long, score double")
    assert measure_histogram(const, "score") == [(1.0, 2)]


def test_spearman_monotone(spark):
    a = spark.createDataFrame([(i, float(i)) for i in range(8)],
                              "id long, score double")
    b = spark.createDataFrame([(i, float(i * i)) for i in range(8)],
                              "id long, score double")
    c = spark.createDataFrame([(i, float(-i)) for i in range(8)],
                              "id long, score double")
    assert spearman(a, b) == pytest.approx(1.0)
    assert spearman(a, c) == pytest.approx(-1.0)


def test_profile_report_karate(spark, karate, tmp_path):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    html = profile_report(g, name="karate", preset="default")
    # properties, every default measure, a histogram and the matrix
    for needle in ("Network profile", "karate", "Degree",
                   "k-Core Decomposition", "Local Clustering Coefficient",
                   "PageRank", "Spearman rank correlations", "<svg",
                   "<table"):
        assert needle in html, needle
    p = write_report(g, str(tmp_path / "karate.html"), name="karate",
                     preset="minimal")
    text = open(p).read()
    assert "PageRank" not in text and "Degree" in text
    with pytest.raises(ValueError):
        profile_report(g, preset="nope")
