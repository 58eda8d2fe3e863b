"""Plot-data mirrors of the reference's plot.py.

Reference: /root/reference/networkit/plot.py — five matplotlib wrappers
(degreeDistribution, connectedComponentsSizes, coreDecompositionSequence,
clusteringPerDegree, hopPlot). The COMPUTE halves are engine operators;
this module exposes them as tidy DataFrames (the honest artifact at
100 TB — you plot an aggregate, never the raw table) and renders with
matplotlib only when it is importable (it is not in this sandbox)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def degree_distribution(g: Graph) -> DataFrame:
    """(degree, count) ascending (plot.py:degreeDistribution)."""
    from networkit_spark.operators.degrees import out_degrees

    return (out_degrees(g).groupBy("degree")
            .agg(F.count(F.lit(1)).alias("count")).orderBy("degree"))


def connected_components_sizes(g: Graph) -> DataFrame:
    """(size, count): component-size histogram
    (plot.py:connectedComponentsSizes pie data)."""
    from networkit_spark.operators.components import (
        component_sizes, connected_components,
    )

    return (component_sizes(connected_components(g))
            .groupBy(F.col("size"))
            .agg(F.count(F.lit(1)).alias("count")).orderBy("size"))


def core_decomposition_sequence(g: Graph) -> DataFrame:
    """(core, count) ascending (plot.py:coreDecompositionSequence)."""
    from networkit_spark.operators.kcore import core_decomposition

    return (core_decomposition(g).groupBy(F.col("core"))
            .agg(F.count(F.lit(1)).alias("count")).orderBy("core"))


def clustering_per_degree(g: Graph) -> DataFrame:
    """(degree, avg_cc): mean local clustering coefficient per degree
    (plot.py:clusteringPerDegree's seaborn regplot data)."""
    from networkit_spark.operators.degrees import out_degrees
    from networkit_spark.operators.triangles import (
        local_clustering_coefficients,
    )

    return (out_degrees(g)
            .join(local_clustering_coefficients(g), "id")
            .groupBy("degree").agg(F.avg("lcc").alias("avg_cc"))
            .orderBy("degree"))


def hop_plot_data(g: Graph, max_h: int = 16) -> DataFrame:
    """(h, fraction): the hop plot (plot.py:hopPlot)."""
    from networkit_spark.operators.distances import hop_plot

    return hop_plot(g, max_h)


def render(data: DataFrame, x: str, y: str, **kwargs):
    """matplotlib line render of a 2-column plot-data frame; raises a
    clear ImportError where matplotlib is absent (import-try gated,
    like nxadapter)."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as ex:  # pragma: no cover - env-dependent
        raise ImportError(
            "matplotlib is not installed; use the returned DataFrame "
            "directly (pip install matplotlib to render)") from ex
    pdf = data.select(x, y).toPandas()
    fig, ax = plt.subplots()
    ax.plot(pdf[x], pdf[y], **kwargs)
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    return fig
