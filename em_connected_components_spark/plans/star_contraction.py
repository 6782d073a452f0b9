"""Randomized star contraction — the reference's StarContraction (G3).

Reference: cpp/streaming/contraction/StarContraction.h:31-231 — per round:
(1) coin-flip each source (p=0.5); (2) pick one uniform random out-edge per
sampled source (reservoir k=1, StreamRandomNeighbour); (3) break paths so the
sampled hooks form stars (anti-join, contraction.hpp:28-48); (4) relabel both
endpoints + emit the star map. Expected node ratio <= 0.75 per round
(StarContraction.h:225-227).

Spark shape: the whole round is 1 aggregation + 1 anti-join + the shared
contract() — NO pointer jumping (hooks are stars by construction, depth 1).
Cheaper per round than a Boruvka superstep but contracts slower; the policy
module picks between them by density.

Determinism: the reference's sampler uses std::random_device (irreproducible,
StreamRandomNeighbour.h:40-59); here both the coin and the reservoir pick are
pure functions of (seed, round, node, neighbor) via xxhash64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import break_paths
from ..operators.normalize import symmetrize
from ..operators.sample import bernoulli_coin


def star_contraction_round(
    edges: DataFrame, seed: int = 42, p: float = 0.5
) -> DataFrame:
    """One star-contraction hook map: (node, comp) rows for hooked nodes only.

    comp is the hook target (star center). Nodes not hooked this round are
    absent (identity mapping implied — contract()'s relabel join coalesces).
    """
    sym = symmetrize(edges)
    # (1) coin per source + (2) deterministic reservoir pick of one neighbor
    hooks = (
        sym.filter(bernoulli_coin("src", p=p, seed=seed))
        .groupBy("src")
        .agg(
            F.min_by("dst", F.xxhash64(F.lit(seed + 1), "src", "dst")).alias(
                "dst"
            )
        )
    )
    # (3) paths -> stars: drop hooks whose source is someone's target
    stars = break_paths(hooks)
    return stars.select(F.col("src").alias("node"), F.col("dst").alias("comp"))
