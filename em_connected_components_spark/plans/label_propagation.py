"""Synchronous min-label propagation (deterministic label propagation).

Each superstep every node adopts the minimum label among itself and its
neighbors; converges to per-component minimum labels in O(diameter) rounds.
Deterministic by construction (no tie-breaking randomness), so results are
exactly reproducible and — at convergence — equal to connected_components'
min-member labels, which doubles as its oracle (SURVEY.md §5.2.6: "LP on
disjoint cliques" etc.).

The superstep reuses the engine's hooking algebra (symmetrize + groupBy min —
the same aggregation as cpp/streaming/contraction/BoruvkaContraction.h:122-133)
but never contracts edges: the edge table is static, only the label table
iterates. That makes each round exactly 2 shuffles (join + groupBy) over
E ∪ Eᵀ, with early exit on a changed-count of zero.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.normalize import symmetrize


@dataclass
class LPMetrics:
    rounds: list[dict] = field(default_factory=list)

    def add(self, **kw) -> None:
        self.rounds.append(kw)


def label_propagation(
    edges: DataFrame,
    max_rounds: int = 100,
    metrics: LPMetrics | None = None,
    broadcast_threshold_rows: int | None = None,
) -> DataFrame:
    """(node, label) with label = min node id reachable (at convergence).

    Stops when a round changes no label or after ``max_rounds``.
    When the node count fits ``broadcast_threshold_rows`` (default: the
    memory-derived byte gate, tuning.broadcast_row_bound) the label table is
    broadcast each round, so the static edge table is never re-shuffled
    (same semi-external switch as pagerank/connected_components).
    """
    metrics = metrics if metrics is not None else LPMetrics()
    if broadcast_threshold_rows is None:
        from ..tuning import broadcast_row_bound

        broadcast_threshold_rows = broadcast_row_bound(edges.sparkSession)
    sym = symmetrize(edges).persist()
    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    n = labels.count()

    for rnd in range(max_rounds):
        t0 = time.time()
        lab_src = labels.select(F.col("node").alias("src"), "label")
        if n <= broadcast_threshold_rows:
            lab_src = F.broadcast(lab_src)
        nbr_min = (
            sym.join(lab_src, on="src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    "label", F.coalesce("nbr_label", "label")
                ).alias("label"),
                (F.coalesce("nbr_label", "label") < F.col("label")).alias("__chg"),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("__chg")).count()
        labels = new_labels.select("node", "label")
        metrics.add(round=rnd, changed=changed, wall_sec=time.time() - t0)
        if changed == 0:
            break

    sym.unpersist()
    return labels
