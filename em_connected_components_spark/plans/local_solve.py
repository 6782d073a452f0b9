"""Bundle-local union-find pass — the reference's SibeynWithBundles (G6).

Reference: cpp/streaming/algorithms/SibeynWithBundles.h:23-206 — partition
nodes into contiguous ranges ("bundles", Bundles.h:28-66), solve each
bundle's intra-bundle edges with an in-RAM union-find
(BoundedIntervalKruskal), forward only boundary information, finish with a
backward propagation. SURVEY.md §2.6 calls this "the closest relative of a
Spark plan in the whole repo".

Spark shape: range-bucket nodes by id -> per-bucket union-find inside
``applyInPandas`` (numpy-backed, one Arrow batch per bucket) -> relabel all
edges through the local star maps -> the (much smaller) contracted graph
feeds the main Boruvka loop. For graphs with id-locality (paths, grids, web
crawls ordered by host) one local pass removes most edges without a single
iterative superstep; for hash-random ids it degrades gracefully to a no-op
(few intra-bucket edges), costing one shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unionfind_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized CC solve over one bucket's edges (operators/numpy_cc:
    hook + pointer-doubling on index arrays — no per-edge Python loop).
    Emits (node, comp) for non-root nodes only (min-member roots)."""
    from ..operators.numpy_cc import solve_cc_numpy

    nodes, comp = solve_cc_numpy(
        pdf["src"].to_numpy(dtype=np.int64), pdf["dst"].to_numpy(dtype=np.int64)
    )
    non_root = nodes != comp
    return pd.DataFrame({"node": nodes[non_root], "comp": comp[non_root]})


def local_unionfind_pass(
    edges: DataFrame, bucket_width: int = 1 << 16
) -> tuple[DataFrame, DataFrame]:
    """(contracted_edges, local_labels) after one bundle-local solve.

    Buckets are contiguous id ranges of ``bucket_width`` (the reference's
    EquiRangedBundles, Bundles.h:17-89); intra-bundle means
    floor(src/W) == floor(dst/W). local_labels maps node -> bundle-local
    min-member root for non-root nodes.
    """
    from ..operators.joins import contract

    w = F.lit(bucket_width)
    intra = edges.filter(
        F.floor(F.col("src") / w) == F.floor(F.col("dst") / w)
    ).withColumn("bucket", F.floor(F.col("src") / w))
    labels = intra.groupBy("bucket").applyInPandas(
        _unionfind_pdf, schema="node long, comp long"
    )
    labels = labels.persist()
    contracted = contract(edges, labels)
    return contracted, labels
