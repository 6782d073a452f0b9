"""Decremental connected components — fold a batch of edge DELETIONS into an
already-solved star map via a component-bounded re-solve.

No reference counterpart (the reference is a batch EM engine; its online
composition covers inserts only — see plans/incremental.py, which mirrors
cpp/FunctionalSubproblemManager.h:181-296's relabel/compose). Deletions are
the other half a live crawl pipeline needs: pages removed, spam purged,
links retracted. Unlike inserts, a deletion can SPLIT a component, so no
label-local composition exists — but the damage is bounded: only components
that contained a removed edge can change. The exact plan is therefore:

    1. carve the affected component ids (components owning any removed
       endpoint) — one scan of the label table against the batch-bounded
       removed-endpoint set;
    2. materialize the affected subgraph: one scan-filter of the old edge
       table against the affected node set;
    3. re-solve ONLY that subgraph minus the removed edges with the full
       engine;
    4. untouched labels pass through unchanged; affected labels are replaced
       by the re-solve (nodes left edgeless drop, matching a fresh solve).

Scale shape: below the byte gate every join against the n-row label table
and the m-row edge table is a broadcast semi/anti join — both big tables are
scanned, never shuffled. Above it (a purge touching a giant component) the
semi-joins fall back to one shuffled pass each — still one bounded re-solve
instead of the multi-round full recompute. The worst case IS the giant
component: deleting a bridge inside it re-solves the whole thing, which is
fundamental (the split can only be discovered by re-examining it), not an
artifact of this plan.

Exactness: a component not containing any removed edge endpoint is
untouched by the deletion (its edge set is unchanged and components are
edge-disjoint). The re-solved region gets min-member labels from the same
engine, so the result is bit-identical to
``connected_components(old_edges MINUS removed_edges)`` — asserted against
the full-recompute oracle in tests and the driver's recursive-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.normalize import canonicalize
from .connected_components import connected_components


def decremental_connected_components(
    labels: DataFrame,
    old_edges: DataFrame,
    removed_edges: DataFrame,
    *,
    pre_canonicalized: bool = False,
    **cc_kwargs,
) -> DataFrame:
    """Update a (node, comp) star map after deleting a batch of edges.

    ``labels``: final star map of the already-solved graph (comp = min
    member, as produced by `connected_components`). ``old_edges``: the
    solved graph's edge table. ``removed_edges``: edges to delete; entries
    not present in ``old_edges`` are ignored (the anti-join is a no-op for
    them, and their components are re-solved to an identical result).
    ``pre_canonicalized``: set when old/removed edge tables already carry
    the canonical (src < dst, deduped, no self-loops) form.

    Returns the star map of ``old_edges MINUS removed_edges``, bit-identical
    to a full recompute: nodes whose last edge was removed disappear from
    the labeling, exactly as they would from a fresh solve.

    Join shape (mirrors plans/incremental.py's byte-gate contract): the
    removed-endpoint set is batch-bounded, so the affected-component carve
    always broadcasts; the affected NODE set is data-dependent (sum of
    affected component sizes), so the edge-filter semi-join and the label
    anti-join broadcast only when it fits `tuning.broadcast_row_bound`,
    falling back to shuffled semi/anti joins above it.
    """
    spark = labels.sparkSession
    old = old_edges if pre_canonicalized else canonicalize(old_edges)
    rem = removed_edges if pre_canonicalized else canonicalize(removed_edges)
    lab = labels.select("node", "comp")

    rem_nodes = (
        rem.select(F.col("src").alias("node"))
        .unionAll(rem.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    if rem_nodes.count() == 0:
        rem_nodes.unpersist()
        return lab

    # 1. affected component ids: one scan of the label table, removed
    # endpoints broadcast (batch-bounded by construction)
    aff_comps = (
        lab.join(F.broadcast(rem_nodes), on="node", how="leftsemi")
        .select("comp")
        .distinct()
        .persist()
    )

    # 2. affected node set; byte-gate decides whether later semi/anti joins
    # against the two big tables may broadcast it
    from ..tuning import broadcast_row_bound

    aff_nodes = (
        lab.join(F.broadcast(aff_comps), on="comp", how="leftsemi")
        .select("node")
        .persist()
    )
    fits = aff_nodes.count() <= broadcast_row_bound(spark)
    aff_nodes_b = F.broadcast(aff_nodes) if fits else aff_nodes

    # 3. affected subgraph minus the removed edges, re-solved exactly.
    # Components are node-disjoint, so src ∈ affected ⟺ dst ∈ affected —
    # one endpoint test suffices and the m-row table is scanned once.
    e_aff = old.join(
        aff_nodes_b, on=old["src"] == aff_nodes["node"], how="leftsemi"
    )
    e_new = e_aff.join(F.broadcast(rem) if fits else rem,
                       on=["src", "dst"], how="left_anti")
    new_labels = connected_components(e_new, pre_canonicalized=True,
                                      **cc_kwargs)

    # 4. untouched labels pass through; affected region replaced wholesale
    aff_comps_vals = aff_comps.select(F.col("comp").alias("__ac"))
    untouched = (
        lab.join(F.broadcast(aff_comps_vals), lab["comp"] == F.col("__ac"),
                 how="left_anti")
    )
    out = untouched.unionByName(new_labels)
    rem_nodes.unpersist()
    aff_comps.unpersist()
    aff_nodes.unpersist()
    return out
