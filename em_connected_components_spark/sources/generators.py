"""Deterministic graph generators (fixtures + benchmark inputs).

Re-expressions of the reference's generator CLIs as seeded, pure-function
DataFrame builders (reference: cpp/gen-path.cpp, cpp/gen-grid.cpp,
cpp/gen-cube.cpp, cpp/gen-cliques.cpp, cpp/gen-er.cpp;
test/TestContractions.cpp:18-20 for the matching fixture). Unlike the
reference's ``gen-er`` (mt19937 geometric skips) and ``StreamRandomNeighbour``
(std::random_device — irreproducible!), every random bit here is a pure
function of (seed, index) via a splitmix64-style mixer, so reruns, stage
retries, and resumed checkpoints all agree.

All generators emit the canonical edge schema (src: long, dst: long) with
1-based ids and src < dst where the family allows it; the random families
(gilbert, rmat) are normalized by the caller via operators.normalize.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import EDGE_SCHEMA

_U64 = np.uint64


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized deterministic 64-bit mixer.

    Public-domain constant set (Steele et al., "Fast splittable pseudorandom
    number generators"). Input/output dtype uint64.
    """
    z = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        z = (z + _U64(0x9E3779B97F4A7C15)).astype(_U64)
        z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)).astype(_U64)
        z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)).astype(_U64)
        z = z ^ (z >> _U64(31))
    return z


def matching(spark: SparkSession, k: int) -> DataFrame:
    """Perfect matching: k edges (2i-1, 2i) — k components of size 2.

    Reference fixture: test/TestContractions.cpp:18-20. One Boruvka round
    contracts it fully.
    """
    return spark.range(1, k + 1).select(
        (2 * F.col("id") - 1).alias("src"), (2 * F.col("id")).alias("dst")
    )


def path(spark: SparkSession, n: int) -> DataFrame:
    """Path graph 1-2-...-n (reference: cpp/gen-path.cpp:30-36). 1 component."""
    return spark.range(1, n).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )


def grid(spark: SparkSession, n: int, m: int) -> DataFrame:
    """n x m grid (reference: cpp/gen-grid.cpp:16-34). 1 component, 0 triangles.

    Node (r, c) has id r*m + c + 1 (1-based).
    """
    cells = spark.range(0, n * m).select(
        (F.col("id") / m).cast("long").alias("r"), (F.col("id") % m).alias("c")
    )
    nid = (F.col("r") * m + F.col("c") + 1).cast("long")
    right = cells.filter(F.col("c") < m - 1).select(
        nid.alias("src"), (nid + 1).alias("dst")
    )
    down = cells.filter(F.col("r") < n - 1).select(
        nid.alias("src"), (nid + m).alias("dst")
    )
    return right.unionAll(down)


def cube(spark: SparkSession, w: int, h: int, layers: int, d: int = 1) -> DataFrame:
    """Disjoint layered grids with distance-d neighbors (cpp/gen-cube.cpp:32-55).

    Each layer is a w x h grid whose cells connect to cells exactly d apart in
    the row or column direction; layers are disjoint -> `layers` components
    when d divides into a single orbit (d=1).
    """
    per_layer = w * h
    cells = spark.range(0, layers * per_layer).select(
        (F.col("id") / per_layer).cast("long").alias("l"),
        ((F.col("id") % per_layer) / h).cast("long").alias("x"),
        (F.col("id") % h).alias("y"),
    )
    nid = (F.col("l") * per_layer + F.col("x") * h + F.col("y") + 1).cast("long")
    right = cells.filter(F.col("x") + d < w).select(
        nid.alias("src"), (nid + d * h).alias("dst")
    )
    up = cells.filter(F.col("y") + d < h).select(
        nid.alias("src"), (nid + d).alias("dst")
    )
    return right.unionAll(up)


def cliques(spark: SparkSession, k: int, count: int) -> DataFrame:
    """`count` disjoint k-cliques (cpp/gen-cliques.cpp:26-37).

    count components; count * C(k,3) triangles. Clique c owns ids
    c*k+1 .. (c+1)*k.
    """
    members = spark.range(0, count * k).select(
        (F.col("id") / k).cast("long").alias("c"), (F.col("id") + 1).alias("u")
    )
    a, b = members.alias("a"), members.alias("b")
    return (
        a.join(b, on=(F.col("a.c") == F.col("b.c")) & (F.col("a.u") < F.col("b.u")))
        .select(F.col("a.u").alias("src"), F.col("b.u").alias("dst"))
    )


def gilbert(spark: SparkSession, n: int, avg_degree: float, seed: int) -> DataFrame:
    """Erdos-Renyi-style random graph via deterministic hashed pair sampling.

    The reference's gen-er (cpp/gen-er.cpp:30-60) draws G(n, p) with geometric
    skip sampling, p = 2*ratio/(n-1), i.e. expected degree 2*ratio. We draw the
    equivalent G(n, m) with m = n*avg_degree/2 hashed pairs — same family for
    fixture purposes, but every edge is a pure function of (seed, index), so
    the graph is reproducible across reruns/retries (the reference's generator
    is seeded but its downstream samplers are not; see SURVEY.md §2.7).

    Output may contain self-loops/duplicates — normalize before use.
    """
    m = int(n * avg_degree / 2)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            i = pdf["id"].to_numpy(dtype=np.int64).astype(_U64)
            base = _U64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
            with np.errstate(over="ignore"):
                u = _mix64(i * _U64(2) + base) % _U64(n)
                v = _mix64(i * _U64(2) + _U64(1) + base) % _U64(n)
            yield pd.DataFrame(
                {"src": u.astype(np.int64) + 1, "dst": v.astype(np.int64) + 1}
            )

    return spark.range(0, m).mapInPandas(gen, schema=EDGE_SCHEMA)


def rmat(
    spark: SparkSession,
    scale: int,
    edge_factor: int,
    seed: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
) -> DataFrame:
    """R-MAT power-law graph (Chakrabarti-Zhan-Faloutsos) — hub-skew stress.

    n = 2^scale nodes, m = n*edge_factor edges. Each edge picks one quadrant
    per bit level; the quadrant choice at (edge i, level l) is a pure function
    of (seed, i, l) via the splitmix64 mixer — fully deterministic. No
    reference counterpart; required by BASELINE.json ("rMAT reference graphs")
    to exercise salted joins / AQE skew splitting.

    Output contains self-loops/duplicates — normalize before use.
    """
    n = 1 << scale
    m = n * edge_factor
    t_ab = a + b
    t_abc = a + b + c

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            i = pdf["id"].to_numpy(dtype=np.int64).astype(_U64)
            u = np.zeros(len(i), dtype=_U64)
            v = np.zeros(len(i), dtype=_U64)
            base = _U64((seed * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF)
            for level in range(scale):
                with np.errstate(over="ignore"):
                    r = _mix64(i * _U64(scale) + _U64(level) + base)
                x = r.astype(np.float64) / float(2**64)
                right = (x >= t_ab) & (x < t_abc) | (x >= t_abc)
                down = ((x >= a) & (x < t_ab)) | (x >= t_abc)
                u = (u << _U64(1)) | right.astype(_U64)
                v = (v << _U64(1)) | down.astype(_U64)
            yield pd.DataFrame(
                {"src": u.astype(np.int64) + 1, "dst": v.astype(np.int64) + 1}
            )

    return spark.range(0, m).mapInPandas(gen, schema=EDGE_SCHEMA)
