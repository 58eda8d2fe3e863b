"""Graph file-format readers/writers (SURVEY.md §2.1).

Reference readers (/root/reference/networkit/cpp/io/):
  - EdgeListReader (EdgeListReader.cpp:17-244): ``u<sep>v[<sep>w]`` lines,
    configurable separator / first node id / comment prefix; weightedness
    inferred from token count.
  - METISGraphReader (METISGraphReader.cpp, METISParser.cpp): header
    ``n m [fmt]``; line i holds the (1-based) neighbors of node i-1.
  - SNAPGraphReader (SNAPGraphReader.cpp): whitespace edge lists with
    ``#`` comments, non-continuous ids.

All readers return edge DataFrames; parsing is column expressions over
``spark.read.text``. METIS needs line numbers — the one legitimate RDD use
(zipWithIndex), since text sources expose no stable row order.
Parquet is the engine's native format; these exist for interop parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from networkit_spark.graph import Graph


def read_edgelist(
    spark: SparkSession,
    path: str,
    sep: str = r"\s+",
    comment: str = "#",
    first_node: int = 0,
    directed: bool = False,
) -> Graph:
    """EdgeListReader: ids shifted to 0-based by ``first_node``; third
    column (if present) is the weight."""
    lines = spark.read.text(path).filter(
        (F.length(F.trim("value")) > 0)
        & ~F.col("value").startswith(comment)
    )
    toks = F.split(F.trim("value"), sep)
    e = lines.select(
        (F.element_at(toks, 1).cast("long") - first_node).alias("src"),
        (F.element_at(toks, 2).cast("long") - first_node).alias("dst"),
        F.coalesce(F.try_element_at(toks, F.lit(3)).cast("double"),
                   F.lit(1.0)).alias("weight"),
    )
    return Graph(e, directed=directed)


def read_snap(spark: SparkSession, path: str, directed: bool = True) -> Graph:
    """SNAP edge lists (# comments, tab/space separated)."""
    return read_edgelist(spark, path, sep=r"\s+", comment="#",
                         first_node=0, directed=directed)


def read_metis(spark: SparkSession, path: str) -> Graph:
    """METIS adjacency format. Weighted variants (fmt != 0) unsupported.

    '%' comment lines are dropped BEFORE line numbering (matching the
    reference METISParser): non-comment line i (0-based after the header)
    holds the adjacency of node i — numbering before filtering would
    shift every node id after an interior comment."""
    rows = (
        spark.read.text(path).rdd
        .filter(lambda r: not r["value"].lstrip().startswith("%"))
        .zipWithIndex()
        .map(lambda t: (t[1], t[0]["value"]))
    )
    df = spark.createDataFrame(rows, "line long, value string")
    header = df.filter("line = 0").collect()[0]["value"].split()
    n = int(header[0])
    toks = F.split(F.trim("value"), r"\s+")
    e = (
        df.filter("line > 0")
        .select((F.col("line") - 1).alias("src"),
                F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
        .select("src", (F.col("tok").cast("long") - 1).alias("dst"))
        .filter(F.col("src") < F.col("dst"))  # stored once; file lists both
        .withColumn("weight", F.lit(1.0))
    )
    vertices = spark.range(n)
    return Graph(e, directed=False, weighted=False, vertices=vertices)


def write_edgelist(g: Graph, path: str, sep: str = "\t") -> None:
    """EdgeListWriter: one ``u<sep>v<sep>w`` line per stored edge."""
    (
        g.edges.select(
            F.concat_ws(sep, F.col("src").cast("string"),
                        F.col("dst").cast("string"),
                        F.col("weight").cast("string")).alias("value"))
        .write.mode("overwrite").text(path)
    )


def read_partition(spark: SparkSession, path: str) -> DataFrame:
    """PartitionReader: line i = label of node i → (id, label)."""
    rows = (
        spark.read.text(path).rdd.zipWithIndex()
        .map(lambda t: (t[1], t[0]["value"]))
    )
    return (
        spark.createDataFrame(rows, "id long, value string")
        .select("id", F.trim("value").cast("long").alias("label"))
    )
