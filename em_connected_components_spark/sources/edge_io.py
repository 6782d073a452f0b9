"""Edge-list I/O — reference-format compatibility + Spark-native formats.

The reference's on-disk graph format is a headerless flat array of
little-endian (u, v) uint64 pairs (cpp/util.hpp:54-63 write_graph;
read path cpp/util.hpp:12-52), converted from/to "u v" text lines by
ascii2binary/binary2ascii (cpp/ascii2binary.cpp:9-50, binary2ascii.cpp:7-18)
and merged/normalized by merge (cpp/merge.cpp:7-58).

Spark-native storage is parquet (RLE/dictionary gives the reference's
EdgeStream delta-compression for free, SURVEY.md §1.3); these helpers exist
so a user of the reference can move graphs in and out.
"""

from __future__ import annotations

from functools import reduce
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.normalize import canonicalize
from ..schema import EDGE_SCHEMA

_CHUNK_EDGES = 4_000_000  # 64 MB of 16-byte records per read batch


def read_binary_edges(spark: SparkSession, path: str) -> DataFrame:
    """Read the reference's raw binary format (u64 LE pairs, 16 B/edge).

    Scales by chunking: the file is mapped as index ranges and each Spark
    task reads its own byte slice — no driver materialization.
    """
    import os

    n_bytes = os.path.getsize(path)
    if n_bytes % 16 != 0:
        raise ValueError(f"{path}: size {n_bytes} is not a multiple of 16")
    n_edges = n_bytes // 16

    def read_chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in pdf["id"]:
                lo = int(start)
                hi = min(lo + _CHUNK_EDGES, n_edges)
                arr = np.fromfile(
                    path, dtype="<u8", count=(hi - lo) * 2, offset=lo * 16
                ).reshape(-1, 2)
                yield pd.DataFrame(
                    {
                        "src": arr[:, 0].astype(np.int64),
                        "dst": arr[:, 1].astype(np.int64),
                    }
                )

    starts = spark.range(0, max(n_edges, 1), _CHUNK_EDGES)
    return starts.mapInPandas(read_chunk, schema=EDGE_SCHEMA)


def write_binary_edges(edges: DataFrame, path: str) -> int:
    """Write the reference's raw binary format; returns edge count.

    Single-file output is inherently a gather — rows stream to the driver in
    partition batches (toLocalIterator), never all at once.
    """
    n = 0
    with open(path, "wb") as f:
        buf_u: list[int] = []
        buf_v: list[int] = []

        def flush() -> None:
            nonlocal n
            if not buf_u:
                return
            arr = np.empty((len(buf_u), 2), dtype="<u8")
            arr[:, 0] = np.asarray(buf_u, dtype=np.int64).astype(np.uint64)
            arr[:, 1] = np.asarray(buf_v, dtype=np.int64).astype(np.uint64)
            arr.tofile(f)
            n += len(buf_u)
            buf_u.clear()
            buf_v.clear()

        for row in edges.select("src", "dst").toLocalIterator():
            buf_u.append(row[0])
            buf_v.append(row[1])
            if len(buf_u) >= _CHUNK_EDGES:
                flush()
        flush()
    return n


def read_ascii_edges(
    spark: SparkSession, path: str, index_shift: int = 0
) -> DataFrame:
    """"u v" text lines -> edge DataFrame (ascii2binary semantics: optional
    ±shift applied to both endpoints; '%'-prefixed comment lines skipped)."""
    df = (
        spark.read.text(path)
        .filter(~F.col("value").startswith("%"))
        .filter(F.trim("value") != "")
        .select(F.split(F.trim("value"), r"\s+").alias("t"))
        .select(
            (F.col("t")[0].cast("long") + index_shift).alias("src"),
            (F.col("t")[1].cast("long") + index_shift).alias("dst"),
        )
    )
    return df


def write_ascii_edges(edges: DataFrame, path: str) -> None:
    """Edge DataFrame -> "u v" text lines (binary2ascii semantics), one
    directory of part files (Spark-native parallel write)."""
    edges.select(
        F.concat_ws(" ", F.col("src"), F.col("dst")).alias("value")
    ).write.mode("overwrite").text(path)


def merge_edge_lists(frames: list[DataFrame]) -> DataFrame:
    """k-way merge: union all inputs, normalize orientation, dedup —
    cpp/merge.cpp:7-58 exactly (its sort becomes the dedup's shuffle)."""
    if not frames:
        raise ValueError("merge_edge_lists needs at least one input")
    return canonicalize(reduce(DataFrame.unionAll, frames))
