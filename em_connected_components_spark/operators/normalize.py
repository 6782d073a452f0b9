"""Edge canonicalization — the reference's preprocessing invariants.

The reference's algorithms assume oriented (u < v), self-loop-free,
duplicate-free edge lists (reference: cpp/remove-self-loops.cpp:33-47,
cpp/util.hpp:33-52,65-71, cpp/preprocess.cpp:21-45). One declarative pass
gives Catalyst the whole thing: least/greatest orientation, a filter, and a
distinct — all JVM-side, codegen'd, with filter/projection pushed into the
scan when edges come straight from parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orient(edges: DataFrame) -> DataFrame:
    """Normalize orientation to src < dst (cpp/defs.hpp:51-55 orient_smaller_to_larger)."""
    return edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )


def drop_self_loops(edges: DataFrame) -> DataFrame:
    """Remove u == v edges (cpp/remove-self-loops.cpp:33-47)."""
    return edges.filter(F.col("src") != F.col("dst"))


def dedup(edges: DataFrame) -> DataFrame:
    """DISTINCT on (src, dst) (cpp/make_unique_stream.h:9-69; util.hpp:38-50)."""
    return edges.dropDuplicates(["src", "dst"])


def canonicalize(edges: DataFrame) -> DataFrame:
    """Full normalization: orient + drop self-loops + dedup.

    Equivalent of the reference's preprocess pipeline (sort -> orient ->
    unique, cpp/preprocess.cpp:21-45) minus the random id permutation (Spark
    hash partitioning already decorrelates ids from placement).
    """
    return dedup(drop_self_loops(orient(edges)))


def symmetrize(edges: DataFrame) -> DataFrame:
    """Bidirectionalize: emit (u,v) and (v,u) (cpp/BoruvkaContraction.h:114-120)."""
    return edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
