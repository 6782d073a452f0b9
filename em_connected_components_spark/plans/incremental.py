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

Scale shape (the reason this exists): when the delta node set fits the
byte-gated broadcast bound (every streaming micro-batch), the n-row label
table is never shuffled — one broadcast semi-join carves the delta's label
slice, the slice broadcasts into both relabel joins, and the compose build
side is the delta's own solution — so the cost is scan-only passes over the
labels plus CC on the RELABELED delta, whose size is bounded by the batch,
not the graph. Above the bound (a huge nightly delta) the relabels fall
back to one shuffled pass over the labels. Either way a 100 TB web graph
with a 10 GB crawl delta touches the delta iteratively and the label table
linearly; the full-recompute alternative re-shuffles all 100 TB per round,
for every round of the contraction loop.
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

    Join shape (the n-row label table is NEVER shuffled): relabel is a
    LEFT-OUTER join and Spark can only broadcast the RIGHT side of one, so
    joining the delta directly against the full label table would sort-merge
    — shuffling all n label rows. Instead ONE broadcast semi-join (delta
    node set broadcast, labels scanned) carves the delta's label SLICE
    (≤ 2·|batch| rows); the slice broadcasts into both relabel joins and its
    complement yields the fresh-node set. The slice hint is BYTE-GATED like
    every forced hint in the engine (tuning.broadcast_row_bound): a delta
    whose node set exceeds the participating heap falls back to shuffled
    relabels against the full table — one n-row shuffle, still far cheaper
    than the multi-round recompute this call replaces.
    ``broadcast_labels=True`` keeps the legacy whole-table broadcast for
    tiny graphs/tests. The compose join's
    build side (the delta's own solution, bounded by batch size) is always
    broadcast-eligible and left to AQE.

    ``cc_kwargs`` pass through to the inner `connected_components` call on
    the relabeled delta (strategy, thresholds, checkpointer, ...).

    SCOPE: this fold handles edge INSERTIONS only (the crawl-append case —
    merges can be composed label-locally). Edge deletions can SPLIT a
    component and have no label-local composition; use the companion
    `plans.decremental.decremental_connected_components`, which re-solves
    exactly the affected components.
    """
    delta = new_edges if pre_canonicalized else canonicalize(new_edges)
    lab = labels.select("node", "comp")

    delta_nodes = (
        delta.select(F.col("src").alias("node"))
        .unionAll(delta.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    if broadcast_labels:
        lab_slice = lab  # legacy: whole table is broadcast-sized anyway
        slice_hint = True
    else:
        # byte gate, same contract as the CC loop's forced hints: the slice
        # (and the delta node set it mirrors) may only be broadcast when it
        # fits the participating heap
        from ..tuning import broadcast_row_bound

        if delta_nodes.count() <= broadcast_row_bound(delta.sparkSession):
            # ONE scan-only pass over the big label table (delta node set
            # broadcast into a semi-join) carves the batch-bounded slice
            # that every later join builds on
            lab_slice = lab.join(
                F.broadcast(delta_nodes), on="node", how="leftsemi"
            ).persist()
            slice_hint = True
        else:
            # delta too large to broadcast: fall back to shuffled relabels
            # against the full table (one n-row shuffle — still far cheaper
            # than the multi-round recompute this call replaces)
            lab_slice = lab
            slice_hint = False

    # nodes the old map has never seen enter as their own representatives —
    # the slice's complement within the delta node set (the anti build side
    # inherits the slice's byte-gate clearance, so hint it explicitly)
    slice_nodes = lab_slice.select("node")
    fresh = delta_nodes.join(
        F.broadcast(slice_nodes) if slice_hint else slice_nodes,
        on="node",
        how="left_anti",
    )
    full = lab.unionByName(fresh.select("node", F.col("node").alias("comp")))

    # relabel the delta through the slice (unknown endpoints keep their own
    # id via the relabel's left-outer coalesce), then re-canonicalize:
    # endpoints that land in the same old component become self-loops and drop
    re = relabel(delta, lab_slice, "src", broadcast_labels=slice_hint)
    re = relabel(re, lab_slice, "dst", broadcast_labels=slice_hint)
    re = canonicalize(re)

    # solve the (batch-bounded) contracted delta with the full engine; its
    # result is materialized (localCheckpoint) so the caches can be released
    # — the one later `fresh` recompute is a scan, never a shuffle
    delta_labels = connected_components(re, pre_canonicalized=True, **cc_kwargs)
    if lab_slice is not lab:
        lab_slice.unpersist()
    delta_nodes.unpersist()

    # compose: a node's final comp is its old rep's new label when the rep
    # participated in the delta, else unchanged
    dl = delta_labels.select(
        F.col("node").alias("__rep"), F.col("comp").alias("__newc")
    )
    if slice_hint:
        # dl's vertex set is a subset of the byte-gate-cleared delta nodes
        dl = F.broadcast(dl)
    return full.join(dl, full["comp"] == dl["__rep"], how="left").select(
        "node", F.coalesce("__newc", "comp").alias("comp")
    )
