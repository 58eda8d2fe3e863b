"""Deterministic link graphs derived from the driver's TPC-H-ish tables.

These exist so every graph operator has a driver-checkable ``queries()``
entry with a DuckDB SQL oracle over the same parquet (TESTDATA.md): the
derivations below are expressed twice — here as DataFrame plans and in
``__spark_entry__.oracle_sql`` as ANSI SQL — and must agree bit-for-bit.

Graphs:
  - **cs** (customer→supplier, directed, weighted): an order's customer
    links to each supplier that shipped it a lineitem; weight = number of
    such lineitems. Supplier vertex ids are offset by SUPP_OFFSET so the
    two key spaces don't collide.
  - **pp** (part↔part, undirected, unweighted): two parts co-occurring in
    the same order are linked. Sparse, triangle-rich — the substrate for
    triangle counting / clustering / LPA.

Scale note: both derivations are join + distinct (shuffle on the join
key); at 100 TB the same shape holds — lineitem-sized fact tables shuffle
once on orderkey, and AQE handles the skewed popular-part keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from networkit_spark.graph import Graph

SUPP_OFFSET = 10_000_000


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def edges_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, weight): customer -> supplier, weight = lineitem count."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(SUPP_OFFSET)).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def graph_customer_supplier(spark: SparkSession, sf_dir: str) -> Graph:
    customers = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"))
    suppliers = load(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + F.lit(SUPP_OFFSET)).alias("id"))
    return Graph(
        edges_customer_supplier(spark, sf_dir),
        directed=True,
        weighted=True,
        vertices=customers.union(suppliers),
    )


def edges_part_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, weight=1.0): parts co-occurring in an order, src < dst,
    deduplicated."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


def graph_part_part(spark: SparkSession, sf_dir: str) -> Graph:
    parts = load(spark, sf_dir, "part").select(F.col("p_partkey").alias("id"))
    return Graph(edges_part_part(spark, sf_dir), directed=False,
                 weighted=False, vertices=parts)


# The same derivations as ANSI SQL (DuckDB oracle side). Keep in lockstep
# with the DataFrame plans above.
SQL_EDGES_CS = f"""
    SELECT o_custkey AS src,
           l_suppkey + {SUPP_OFFSET} AS dst,
           CAST(COUNT(*) AS DOUBLE) AS weight
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
"""

SQL_VERTICES_CS = f"""
    SELECT c_custkey AS id FROM customer
    UNION
    SELECT s_suppkey + {SUPP_OFFSET} AS id FROM supplier
"""

SQL_EDGES_PP = """
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst, 1.0 AS weight
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""

SQL_VERTICES_PP = "SELECT p_partkey AS id FROM part"


def graph_pps1_weighted(spark: SparkSession, sf_dir: str) -> Graph:
    """pp(p_size=1) with weight = co-occurrence count (join-row count,
    NOT distinct orders) — integral weights with heavy ties, the
    fixture for the spanning-forest-by-weight family (msf.py): few
    weight classes make the union-MSF a strict superset of any one
    MSF, and every class sweep is driver-checkable in SQL."""
    pv = load(spark, sf_dir, "part").filter(F.col("p_size") == 1).select(
        F.col("p_partkey").alias("id"))
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey") \
        .join(pv.withColumnRenamed("id", "l_partkey"), "l_partkey",
              "left_semi")
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("src"),
                 F.col("b.l_partkey").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    return Graph(e, directed=False, weighted=True, vertices=pv)


def graph_pp_size1(spark: SparkSession, sf_dir: str) -> Graph:
    """pp subgraph induced on parts with p_size = 1 (~40 nodes at
    sf0.01, sparse, 2 components, diameter ~9) — the fixture for the
    exact path-based centralities (betweenness / closeness /
    eccentricity), small enough that their quadratic-by-nature exact
    variants get full-value DuckDB oracles."""
    pv = load(spark, sf_dir, "part").filter(F.col("p_size") == 1).select(
        F.col("p_partkey").alias("id"))
    e = edges_part_part(spark, sf_dir)
    e = (e.join(pv.withColumnRenamed("id", "src"), "src", "left_semi")
         .join(pv.withColumnRenamed("id", "dst"), "dst", "left_semi")
         .select("src", "dst", "weight"))
    return Graph(e, directed=False, weighted=False, vertices=pv)
