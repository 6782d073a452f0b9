"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k via a crossJoin + zip_with dot product —
all JVM-side built-ins, exact, O(n*q). Scale path: random-hyperplane LSH
bucketing (SimHash for vectors): 10^12 vectors hash into 2^planes buckets,
queries only scan their own bucket (+ optional multi-probe neighbors) — the
crossJoin shrinks to an equi-join on bucket id. Hyperplanes are deterministic
from (seed, plane, dim) via the same splitmix64 mixer as the generators.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2 norm as a column (sequential left-to-right fold -> deterministic)."""
    return df.withColumn("norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query: (query_id, neighbor_id, rank).

    Ranking key is (round(cos,9) DESC, neighbor_id ASC) — the id tiebreak
    makes the result deterministic under float noise. Queries side is
    broadcast (queries << corpus); corpus never shuffles.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    cos = _dot(F.col("__cv"), F.col("__qv")) / (
        F.sqrt(_dot(F.col("__cv"), F.col("__cv")))
        * F.sqrt(_dot(F.col("__qv"), F.col("__qv")))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, 9).alias("cos9"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos9").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplanes(dim: int, planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes from the splitmix64 mixer
    (sum of 4 uniforms, centered — close enough to Gaussian for LSH)."""
    from ..sources.generators import _mix64

    idx = np.arange(planes * dim * 4, dtype=np.uint64) + np.uint64(
        (seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    )
    u = _mix64(idx).astype(np.float64) / float(2**64)
    g = u.reshape(planes, dim, 4).sum(axis=2) - 2.0
    return [[float(x) for x in row] for row in g]


def lsh_bucket(
    df: DataFrame,
    dim: int,
    planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (0..2^planes-1) per vector.

    sign(v . h_p) per plane packs into an integer bucket; cosine-similar
    vectors collide with high probability. The hyperplane matrix is a tiny
    literal array — no shuffle, no UDF, pure zip_with/aggregate codegen.
    """
    hp = _hyperplanes(dim, planes, seed)
    bucket = F.lit(0).cast("long")
    for p, row in enumerate(hp):
        plane = F.array(*[F.lit(x) for x in row])
        d = _dot(F.col(vec_col), plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return df.withColumn("bucket", bucket)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: only compare query to corpus vectors in the same
    LSH bucket. Recall grows with fewer planes (bigger buckets); the
    bucket equi-join replaces the brute-force crossJoin."""
    c = lsh_bucket(corpus, dim, planes, seed, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "bucket"
    )
    q = lsh_bucket(queries, dim, planes, seed, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"), "bucket"
    )
    cos = _dot(F.col("__cv"), F.col("__qv")) / (
        F.sqrt(_dot(F.col("__cv"), F.col("__cv")))
        * F.sqrt(_dot(F.col("__qv"), F.col("__qv")))
    )
    scored = (
        c.join(q, on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, 9).alias("cos9"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos9").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
