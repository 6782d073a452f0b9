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


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (id_a, id_b, cos9) with
    id_a < id_b and cosine >= threshold.

    The exact O(n^2) baseline of the near-dup family (dedup on semantic
    embeddings rather than text shingles). Feasible for modest n or as the
    within-bucket verifier of the LSH variant below — which is the 100 TB
    path.
    """
    a = with_norm(df, vec_col).select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        F.col("norm").alias("__na"),
    )
    b = with_norm(df, vec_col).select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        F.col("norm").alias("__nb"),
    )
    cos = _dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 9).alias("cos9"))
        .filter(F.col("cos9") >= threshold)
    )


def embedding_near_duplicates_lsh(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate embedding near-dup pairs: candidates = same LSH bucket,
    then the exact cosine filter within the bucket.

    The scale path: the O(n^2) crossJoin becomes an equi-self-join on bucket
    id; each bucket holds ~n/2^planes vectors, so total work is
    n^2/2^planes. High-cosine pairs collide with probability
    (1 - theta/pi)^planes — tune `planes` to the threshold.
    """
    bucketed = lsh_bucket(with_norm(df, vec_col), dim, planes, seed, vec_col)
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        F.col("norm").alias("__na"), "bucket",
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        F.col("norm").alias("__nb"), "bucket",
    )
    cos = _dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 9).alias("cos9"))
        .filter(F.col("cos9") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def _ivf_assign_pandas(
    df: DataFrame,
    rows: list,
    vec_col: str,
    nprobe: int,
) -> DataFrame:
    """Vectorized centroid assignment for LARGE centroid sets: one Arrow
    matmul per batch against the broadcast centroid matrix.

    The >1024-centroid shape: a literal expression tree stops scaling, so the
    per-row argmax becomes numpy ``V @ C.T`` inside mapInPandas — still zero
    shuffle (pure map over the corpus), with the (n_lists x dim) float64
    matrix shipped once per executor via sc.broadcast. Top-``nprobe`` pick is
    a stable argsort on -cos, so ties break by ascending list_id exactly like
    the literal path's comparator. O(sqrt n) centroids at n = 10^9+ vectors
    (n_lists ~ 32k, dim 768 -> ~200 MB matrix) stays executor-resident.
    """
    import numpy as np
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    C = np.array([[float(x) for x in r["centroid"]] for r in rows],
                 dtype=np.float64)
    Cn = np.sqrt((C * C).sum(axis=1))
    list_ids = np.array([int(r["list_id"]) for r in rows], dtype=np.int64)
    bc = df.sparkSession.sparkContext.broadcast((C, Cn, list_ids))
    np_ = min(nprobe, len(rows))

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("norm", DoubleType()),
            StructField("list_id", IntegerType()),
            StructField("probe_rank", IntegerType()),
        ]
    )

    def assign(batches):
        import pandas as pd

        Cm, Cnorm, lids = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vn = np.sqrt((V * V).sum(axis=1))
            cos = (V @ Cm.T) / (vn[:, None] * Cnorm[None, :])
            # stable sort on -cos: equal cos keeps column order = ascending
            # list_id (columns are list_id-sorted), matching the literal
            # path's (cos desc, list_id asc) comparator
            top = np.argsort(-cos, axis=1, kind="stable")[:, :np_]
            out = pdf.loc[pdf.index.repeat(np_)].reset_index(drop=True)
            out["norm"] = np.repeat(vn, np_)
            out["list_id"] = lids[top.ravel()].astype(np.int32)
            out["probe_rank"] = np.tile(
                np.arange(1, np_ + 1, dtype=np.int32), len(pdf)
            )
            yield out

    return df.mapInPandas(assign, schema=out_schema)


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 1,
    literal_max: int = 1024,
) -> DataFrame:
    """Assign each vector to its `nprobe` nearest centroids by cosine.

    Centroids are O(sqrt(n)) rows by construction — small enough to collect.
    Up to ``literal_max`` of them, assignment is a PURE PER-ROW EXPRESSION:
    build the (cos, list_id) struct array, array_sort by (cos desc, list_id
    asc), slice nprobe, posexplode. No corpus shuffle, no window, no join —
    the whole pass stays inside whole-stage codegen and scales as a map over
    the corpus. Above ``literal_max`` the expression tree stops scaling, so
    the same semantics run as an Arrow-batched numpy matmul
    (``_ivf_assign_pandas``) — still a zero-shuffle map, with the centroid
    matrix broadcast once per executor; this is the 10^9-vector path where
    n_lists ~ O(sqrt n) >> 1024.
    Returns the input columns plus norm, (list_id, probe_rank).
    """
    import math

    rows = sorted(
        centroids.select("list_id", "centroid").collect(),
        key=lambda r: r["list_id"],
    )
    if len(rows) > literal_max:
        return _ivf_assign_pandas(df, rows, vec_col, nprobe)
    v = with_norm(df, vec_col)
    entries = []
    for r in rows:
        cvec = [float(x) for x in r["centroid"]]
        cnorm = math.sqrt(sum(x * x for x in cvec))
        carr = F.array(*[F.lit(x) for x in cvec])
        cos = _dot(F.col(vec_col), carr) / (F.col("norm") * F.lit(cnorm))
        entries.append(
            F.struct(cos.alias("c"), F.lit(int(r["list_id"])).alias("list_id"))
        )

    def _desc_cos(a, b):
        return (
            F.when(a["c"] > b["c"], F.lit(-1))
            .when(a["c"] < b["c"], F.lit(1))
            .otherwise((a["list_id"] - b["list_id"]).cast("int"))
        )

    probes = F.slice(F.array_sort(F.array(*entries), _desc_cos), 1, nprobe)
    return (
        v.select("*", F.posexplode(probes).alias("__pos", "__probe"))
        .withColumn("list_id", F.col("__probe.list_id"))
        .withColumn("probe_rank", (F.col("__pos") + 1).cast("int"))
        .drop("__pos", "__probe")
    )


def train_centroids_sample(
    corpus: DataFrame,
    n_lists: int,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic 'training': pick the n_lists corpus vectors with the
    smallest md5(seed:id) digest as centroids (a k-means|| seeding step
    without the Lloyd iterations — adequate as the coarse quantizer for
    IVF-flat, and fully reproducible in any engine with md5).

    Scale shape: orderBy(...).limit(n) is a distributed TakeOrdered — each
    partition keeps its local top-n and only n_partitions*n rows reach the
    final selection; the corpus itself is never globally sorted or funneled
    through one task (the round-1 global row_number Window was exactly that
    anti-pattern). list_id assignment runs on the n_lists surviving rows
    only. Returns (list_id, centroid)."""
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    top = (
        corpus.select(F.col(id_col), F.col(vec_col), key.alias("__k"))
        .orderBy(F.col("__k").asc(), F.col(id_col).asc())
        .limit(n_lists)
    )
    w = Window.orderBy(F.col("__k").asc(), F.col(id_col).asc())  # n_lists rows
    return (
        top.withColumn("__r", F.row_number().over(w))
        .select(
            (F.col("__r") - 1).alias("list_id"), F.col(vec_col).alias("centroid")
        )
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    literal_max: int = 1024,
) -> DataFrame:
    """IVF-flat approximate top-k: corpus is inverted-list-partitioned by
    nearest centroid; each query probes its `nprobe` nearest lists and scans
    only those lists' vectors.

    The 100 TB shape: build once (corpus assignment is a zero-shuffle map —
    literal expressions up to ``literal_max`` centroids, Arrow-batched numpy
    matmul beyond — written out partitioned by list_id so probes are
    partition-pruned scans); query cost is nprobe/n_lists of brute force.
    Recall is tunable via nprobe.
    """
    cents = train_centroids_sample(corpus, n_lists, seed, vec_col, id_col)
    cents = cents.persist()  # read twice (corpus + query assignment collects)
    c = ivf_assign(
        corpus, cents, vec_col, id_col, nprobe=1, literal_max=literal_max
    ).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        F.col("norm").alias("__cn"), "list_id",
    )
    q = ivf_assign(
        queries, cents, vec_col, id_col, nprobe=nprobe,
        literal_max=literal_max,
    ).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        F.col("norm").alias("__qn"), "list_id",
    )
    cos = _dot(F.col("__cv"), F.col("__qv")) / (F.col("__cn") * F.col("__qn"))
    scored = (
        c.join(q, on="list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, 9).alias("cos9"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos9").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


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
