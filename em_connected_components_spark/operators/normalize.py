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


def permute_node_ids(
    edges: DataFrame, seed: int = 42, prefix_len: int = 2
) -> tuple[DataFrame, DataFrame]:
    """Relabel nodes with a seeded random permutation of 1..n.

    The reference's `preprocess` assigns every distinct node a fresh id drawn
    from a random permutation of 1..n, then relabels and re-orients the edge
    list (cpp/preprocess.cpp:21-45; in-RAM twin cpp/preprocess-ram.cpp:44-78).
    Its purpose is to decorrelate node ids from adjacency structure so the
    id-ordered EM scans see uniform load.

    Here the permutation is *rank-by-hash*: new_id(node) = global rank of
    (md5("seed:node"), node). For any fixed node set that is a uniformly
    random permutation, it is a pure function of (seed, node set) — so stage
    retries and checkpoint resumes agree (SURVEY §2.7), unlike the
    reference's `stxxl::random_shuffle` — and it is engine-portable (DuckDB
    computes the identical md5, giving the driver oracle bit-equality).

    The global rank is computed WITHOUT a single-partition window (the
    `Window.orderBy` trap): md5 keys are bucketed by their first
    ``prefix_len`` hex chars — a lexicographic prefix, so every key in
    bucket b sorts before every key in bucket b+1 — ranked per bucket with
    `row_number`, and shifted by per-bucket offsets from a ≤16^prefix_len-row
    count aggregate joined back as a broadcast. Cost at scale: one shuffle of
    the n-row node table + one tiny broadcast join + the two standard
    relabel joins of the m-row edge table. Raise ``prefix_len`` to 4 (65,536
    buckets) at web scale so each bucket's window stays executor-sized.

    Returns ``(edges_relabeled, mapping)`` where mapping is (node, new_id)
    and edges_relabeled is re-oriented src < dst (the reference re-orients
    after relabeling, preprocess.cpp:40-43).
    """
    from pyspark.sql import Window as W

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    keyed = nodes.select(
        "node",
        F.md5(F.concat(F.lit(f"{seed}:"), F.col("node").cast("string"))).alias(
            "__key"
        ),
    ).withColumn("__bucket", F.substring("__key", 1, prefix_len))

    counts = keyed.groupBy("__bucket").count().orderBy("__bucket").collect()
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["__bucket"], acc))
        acc += r["count"]
    off_df = edges.sparkSession.createDataFrame(
        offsets, "`__bucket` string, `__offset` long"
    )

    rn = F.row_number().over(
        W.partitionBy("__bucket").orderBy("__key", "node")
    )
    mapping = (
        keyed.join(F.broadcast(off_df), on="__bucket")
        .select(
            "node", (F.col("__offset") + rn.cast("long")).alias("new_id")
        )
    )

    lab = mapping.select("node", F.col("new_id").alias("comp"))
    from .joins import relabel  # local import: joins imports this module

    out = orient(relabel(relabel(edges, lab, "src"), lab, "dst"))
    return out, mapping
