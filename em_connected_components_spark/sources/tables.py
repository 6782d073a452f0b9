"""Testdata readers + relational->graph edge derivations.

The driver's correctness gate compares Spark queries against DuckDB on the
TPC-H-ish parquet at /root/testdata (TESTDATA.md). Graph operators become
oracle-checkable by deriving edge tables from those relations (FIXTURES.md
§3); the offsets keep the two id spaces disjoint (ids stay >= 1 per the
reference's ZERO_NODE invariant, cpp/defs.hpp:135-142).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OFFSET = 10_000_000

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def edges_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite order<->supplier graph: (l_orderkey, OFFSET + l_suppkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("l_orderkey").alias("src"),
            (F.col("l_suppkey") + OFFSET).alias("dst"),
        )
        .distinct()
    )


def edges_customer_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star graph: customers hang off their nation — 25 star components."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            F.col("c_custkey").alias("src"),
            (F.col("c_nationkey").cast("long") + OFFSET).alias("dst"),
        )
        .distinct()
    )


def edges_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path graphs: consecutive events per user, ordered by (ts, event_id).

    One path per user -> components == users; good recursive-CTE oracle size.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.col("event_id").alias("src"),
            F.lead("event_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .select("src", "dst")
    )


def edges_tripartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle-bearing graph from lineitem: order-part, order-supplier,
    part-supplier co-occurrence edges — every lineitem row closes a triangle.

    Id spaces: orders as-is, parts + OFFSET, suppliers + 2*OFFSET.
    """
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("src"), (F.col("l_partkey") + OFFSET).alias("dst")
    )
    os_ = li.select(
        F.col("l_orderkey").alias("src"),
        (F.col("l_suppkey") + 2 * OFFSET).alias("dst"),
    )
    ps = li.select(
        (F.col("l_partkey") + OFFSET).alias("src"),
        (F.col("l_suppkey") + 2 * OFFSET).alias("dst"),
    )
    return op.unionAll(os_).unionAll(ps).distinct()
