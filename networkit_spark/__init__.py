"""networkit_spark — a PySpark-native link-graph analytics engine.

A from-scratch distributed reimplementation of the query/data-processing
capabilities of the reference C++/OpenMP engine (berkoecal/networkit), built
on idiomatic Spark: DataFrame/SQL plans optimized by Catalyst, vectorized
pandas/Arrow UDFs where built-ins can't express the semantics, explicit
partitioning and skew handling, and checkpointed resumable supersteps for
iterative kernels.

Core surface (north rule):
  - :mod:`networkit_spark.operators.pagerank`    — power iteration w/ teleport
  - :mod:`networkit_spark.operators.components`  — connected components
  - :mod:`networkit_spark.operators.lpa`         — label-propagation communities
  - :mod:`networkit_spark.operators.triangles`   — degree-ordered triangle count

Data model: an edge DataFrame ``edges(src: long, dst: long, weight: double)``
wrapped by :class:`networkit_spark.graph.Graph`, derived from an
Iceberg-shaped corpus table ``repos(repo, path, commit, lang, content)`` via
:mod:`networkit_spark.sources.repos`.
"""

from networkit_spark.graph import Graph
from networkit_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["Graph", "get_spark", "__version__"]
