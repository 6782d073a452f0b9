"""Incremental connected components — fold a batch of new edges into an
already-solved star map without recomputing the full graph.

The reference has no online mode (it is a batch EM engine), but its KKT
driver already contains exactly this composition as an internal step:
relabel one edge set through the component map of another
(`relabel_right_edges`, cpp/FunctionalSubproblemManager.h:181-296), solve
the relabeled remainder, then compose the two maps
(`ComponentMerger`, cpp/FunctionalSubproblemManager.h:620-656). Incremental
CC is that same relabel -> solve -> compose pipeline applied to a crawl
delta against the PREVIOUS run's final labels — the natural companion to
the streaming ingest -> bucketed EdgeCatalog handoff
(streaming/events.py `streaming_edge_ingest`), where each micro-batch
appends edges and the labels should follow without an O(m) recompute.

Exactness (not an approximation): `connected_components` labels every
component by its MINIMUM member id. The delta graph's vertices are old
component representatives (each the min of its members) plus never-seen
node ids; solving it with min labels therefore assigns every merged group
min(reps ∪ fresh ids) = the global minimum over all members of the merged
components. Composing that back over the old map yields labels bit-identical
to a full recompute over (old edges ∪ delta) — asserted against the same
recursive-CTE oracle as the batch path.

Scale shape (the reason this exists): cost is ONE pass over the label table
(two shuffled relabel joins keyed on node — or broadcast, when the delta's
label slice fits) plus CC on the RELABELED delta, whose size is bounded by
the batch, not the graph. A 100 TB web graph with a 10 GB nightly crawl
delta touches the 10 GB delta iteratively and the label table linearly;
the full-recompute alternative re-shuffles all 100 TB every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import relabel
from ..operators.normalize import canonicalize
from .connected_components import connected_components


def incremental_connected_components(
    labels: DataFrame,
    new_edges: DataFrame,
    *,
    pre_canonicalized: bool = False,
    broadcast_labels: bool = False,
    **cc_kwargs,
) -> DataFrame:
    """Update a (node, comp) star map with a batch of new edges.

    ``labels``: the final star map of the already-solved graph (comp = min
    member id, as produced by `connected_components`). ``new_edges``: the
    delta batch (src, dst); may reference old nodes, brand-new nodes, or
    both. Returns the star map of the UNION graph, bit-identical to
    `connected_components(old_edges UNION new_edges)`.

    ``broadcast_labels=True`` broadcasts the old label table into the two
    relabel joins — only when it fits the byte-gated bound (small graphs /
    tests); the default shuffled join is the 100 TB path. The compose join's
    build side (the delta's own solution, bounded by batch size) is always
    broadcast-eligible and left to AQE.

    ``cc_kwargs`` pass through to the inner `connected_components` call on
    the relabeled delta (strategy, thresholds, checkpointer, ...).
    """
    delta = new_edges if pre_canonicalized else canonicalize(new_edges)
    lab = labels.select("node", "comp")

    # nodes the old map has never seen enter as their own representatives
    delta_nodes = (
        delta.select(F.col("src").alias("node"))
        .unionAll(delta.select(F.col("dst").alias("node")))
        .distinct()
    )
    fresh = delta_nodes.join(lab.select("node"), on="node", how="left_anti")
    full = lab.unionByName(fresh.select("node", F.col("node").alias("comp")))

    # relabel the delta through the old star map (unknown endpoints keep
    # their own id via the relabel's left-outer coalesce), then re-canonicalize:
    # endpoints that land in the same old component become self-loops and drop
    re = relabel(delta, lab, "src", broadcast_labels=broadcast_labels)
    re = relabel(re, lab, "dst", broadcast_labels=broadcast_labels)
    re = canonicalize(re)

    # solve the (batch-bounded) contracted delta with the full engine
    delta_labels = connected_components(re, pre_canonicalized=True, **cc_kwargs)

    # compose: a node's final comp is its old rep's new label when the rep
    # participated in the delta, else unchanged
    dl = delta_labels.select(
        F.col("node").alias("__rep"), F.col("comp").alias("__newc")
    )
    return full.join(dl, full["comp"] == dl["__rep"], how="left").select(
        "node", F.coalesce("__newc", "comp").alias("comp")
    )
