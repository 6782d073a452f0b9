"""Exact connected components — iterative Boruvka contraction, Spark-first.

Re-expression of the reference's recursive Boruvka / Sibeyn / KKT drivers
(cpp/streaming/algorithms/Boruvka.h:24-56,
cpp/streaming/contraction/BoruvkaContraction.h:94-331,
cpp/FunctionalSubproblemManager.h:430-757) as one driver-side loop of
DataFrame supersteps. The reference's recursion existed to bound *memory*
(its semi-external switch at Boruvka.h:83-85); Spark manages spill, so the
recursion flattens to iteration and only the superstep algebra survives:

    per round:  hook (min-neighbor agg)  ->  pointer-jump to roots
                ->  contract edges (two relabel joins + normalize + distinct)
                ->  compose the global label map
    finish:     when the contracted graph fits one task, shuffle it into a
                single-partition mapInPandas stage and solve it there with a
                vectorized numpy kernel (the reference's semi-external
                Kruskal base case, cpp/streaming/basecase/BaseKruskal.h:73-111,
                riding an executor — never the driver)

Min-hooking (parent = min(node, min_neighbor), BoruvkaContraction.h:122-133)
guarantees parent <= node, so the hook forest is acyclic and every tree root
is a local minimum; after full pointer jumping, each round maps every node to
a strictly-smaller representative unless it already is one. The global
minimum of a component never hooks, so the fixpoint labels every node with
its component's MINIMUM member — the canonical labeling (the reference's root
choice is algorithm-dependent; only the partition is canonical, SURVEY.md §5.2).

Contraction ratio: >= 2x node reduction per round (each surviving root
absorbed at least one other node — BoruvkaContraction.h:325-327 gives the
same 0.5 bound), so rounds = O(log n); pointer jumping inside a round is
O(log depth) self-joins on a table that is *nodes*, not edges.

Scale design (100 TB / 10^12 edges):
* every step is groupBy/join/distinct on (long, long) rows — all shuffles are
  key-hash over 16-byte tuples, map-side combined where possible;
* the parent table shrinks geometrically; once it fits the broadcast
  threshold, relabel joins flip to broadcast (the semi-external switch);
* per-round checkpointing to parquet truncates lineage (iterative join plans
  otherwise grow exponentially in Catalyst) AND is the resume point;
* AQE skew-join splitting handles giant-component skew in relabel joins.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import compose_labels, contract
from ..operators.normalize import canonicalize, symmetrize
from ..checkpoint import RoundCheckpointer


@dataclass
class CCMetrics:
    """Per-round metrics — the reference's iostats/CSV logging made durable
    (cpp/run-boruvka.cpp:32-59; SURVEY.md §6)."""

    rounds: list[dict] = field(default_factory=list)

    @property
    def n_rounds(self) -> int:
        return len(self.rounds)

    def add(self, **kw) -> None:
        self.rounds.append(kw)


def _hook_parents(edges: DataFrame) -> DataFrame:
    """One hooking pass: parent(u) = min(u, min neighbor of u).

    Reference: the min-incident-neighbor scan of BoruvkaContraction.h:122-133,
    with the 2-cycle root fix (lines 135-163) made unnecessary by taking
    min(u, ...) — parent <= node, so no cycles exist at all.
    """
    return (
        symmetrize(edges)
        .groupBy(F.col("src").alias("node"))
        .agg(F.least(F.min("dst"), F.col("node")).alias("comp"))
    )


def _pointer_jump(parents: DataFrame, max_iters: int = 64) -> DataFrame:
    """Iterate comp <- parent(comp) until fixpoint.

    Replaces the reference's sequential time-forward PQ walk
    (BoruvkaContraction.h:166-294) with O(log depth) self-joins — the only
    scalable equivalent of a pointer chase on a 1000-executor cluster.
    Converges because parent <= node strictly decreases along chains.
    """
    p = parents
    for _ in range(max_iters):
        q = p.select(F.col("node").alias("__qn"), F.col("comp").alias("__qc"))
        joined = p.join(q, on=p["comp"] == q["__qn"], how="left").select(
            "node", "comp", "__qc"
        )
        joined = joined.localCheckpoint(eager=True)
        moved = (
            joined.filter(
                F.col("__qc").isNotNull() & (F.col("__qc") != F.col("comp"))
            )
            .limit(1)
            .count()
        )
        p = joined.select("node", F.coalesce("__qc", "comp").alias("comp"))
        if moved == 0:
            break
    return p


def _single_task_map(df: DataFrame, fn, out_cols: tuple[str, str]) -> DataFrame:
    """Run a whole-table numpy kernel as ONE executor task via mapInPandas.

    The Spark shape of the reference's semi-external switch
    (cpp/streaming/algorithms/Boruvka.h:83-85): once a table fits a single
    task, shuffle it into one partition and solve it with vectorized numpy
    INSIDE that task. Unlike a driver toPandas round-trip this (a) needs no
    driver-local filesystem (cluster-safe: data moves executor->executor via
    the shuffle service), (b) streams through Arrow batches both ways, and
    (c) keeps the serial work on an executor, shrinking the measured serial
    fraction (the round-1 scaling-efficiency gap was exactly this path).

    ``fn(u: np.ndarray, v: np.ndarray) -> (np.ndarray, np.ndarray)`` is the
    kernel; input columns are df's first two columns.
    """
    import pandas as pd  # noqa: F401  (needed inside the closure on executors)

    in_a, in_b = df.columns[0], df.columns[1]
    out_a, out_b = out_cols

    def run(batches):
        import numpy as np
        import pandas as pd

        chunks_a, chunks_b = [], []
        for pdf in batches:
            chunks_a.append(pdf[in_a].to_numpy(dtype=np.int64))
            chunks_b.append(pdf[in_b].to_numpy(dtype=np.int64))
        if not chunks_a:
            return
        a, b = fn(np.concatenate(chunks_a), np.concatenate(chunks_b))
        step = 1 << 20  # yield ~16MB Arrow batches
        for i in range(0, len(a), step):
            yield pd.DataFrame({out_a: a[i : i + step], out_b: b[i : i + step]})

    return df.repartition(1).mapInPandas(
        run, schema=f"{out_a} long, {out_b} long"
    )


def _pointer_jump_local(parents: DataFrame) -> DataFrame:
    """Pointer-jump the parent table to fixpoint in one executor task.

    A distributed jump iteration costs a full self-join + checkpoint + count
    (~seconds of fixed overhead) regardless of size; once the parent table
    fits one task (it shrinks ~2x per round), log2(depth) numpy gathers do
    the same work in milliseconds inside a mapInPandas stage — no driver
    involvement, no driver-local spill files (cluster-safe).
    """
    from ..operators.numpy_cc import jump_to_roots_numpy

    return _single_task_map(
        parents.select("node", "comp"), jump_to_roots_numpy, ("node", "comp")
    )


def _union_find_finish(edges: DataFrame) -> DataFrame:
    """Solve the (small) contracted edge table with the vectorized numpy CC
    kernel in one executor task; returns the (node, comp) star map.

    The reference's semi-external Kruskal base case
    (cpp/streaming/basecase/BaseKruskal.h:73-111) — run as a single
    mapInPandas task (hook + pointer-doubling over arrays, operators/numpy_cc)
    instead of a driver collect + dict union-find: ~100ms for 1M edges vs
    multiple seconds, and no driver round-trip. Roots are min members,
    matching the distributed rounds.
    """
    from ..operators.numpy_cc import solve_cc_numpy

    return _single_task_map(
        edges.select("src", "dst"), solve_cc_numpy, ("node", "comp")
    )


def connected_components(
    edges: DataFrame,
    *,
    small_graph_threshold: int = 1_000_000,
    max_rounds: int = 64,
    broadcast_threshold_rows: int = 8_000_000,
    checkpointer: RoundCheckpointer | None = None,
    metrics: CCMetrics | None = None,
    pre_canonicalized: bool = False,
    policy: "Policy | None" = None,
    local_solve_bucket_width: int = 0,
    jump_local_threshold: int = 5_000_000,
    seed: int = 42,
) -> DataFrame:
    """Exact CC labels (node, comp) with comp = min member of the component.

    ``small_graph_threshold``: edge count at which the remaining contracted
    graph is shuffled into ONE executor task and finished with the vectorized
    numpy CC kernel (operators/numpy_cc, via mapInPandas) — the Spark
    analogue of the reference's semi-external switch (Boruvka.h:32-36). No
    driver collect, no driver-local files: cluster-safe by construction.
    ``broadcast_threshold_rows``: label-table size below which relabel joins
    are forced broadcast. 8M rows of (long, long) ≈ 8M*32B ≈ 256MB of
    broadcast relation — sized for executors with >=4GB heap; lower it (or
    use a Policy) on smaller executors. Above the threshold AQE still
    upgrades joins it measures as small enough.
    ``checkpointer``: if given, per-round edge/label tables are persisted and
    a killed run resumes from the last completed round.
    ``policy``: optional plans.policy.Policy overriding the two thresholds and
    optionally enabling star-contraction rounds by density (variants.hpp).
    ``local_solve_bucket_width``: >0 runs one bundle-local union-find pass
    (SibeynWithBundles, G6) before the iterative loop — wins when node ids
    have locality (paths/grids/crawl order).
    ``jump_local_threshold``: parent tables at or below this row count do
    their pointer jumping as one vectorized mapInPandas task (path doubling
    on numpy index arrays) instead of log(depth) distributed self-joins — the
    jump-phase analogue of the semi-external switch.
    """
    spark = edges.sparkSession
    metrics = metrics if metrics is not None else CCMetrics()
    if policy is not None:
        small_graph_threshold = policy.small_graph_edges
        broadcast_threshold_rows = policy.broadcast_rows

    e = edges if pre_canonicalized else canonicalize(edges)
    labels: DataFrame | None = None
    start_round = 0

    if checkpointer is not None:
        resumed = checkpointer.resume()
        if resumed is not None:
            start_round, e, labels = resumed

    if start_round == 0 and local_solve_bucket_width > 0:
        # --- G6 pre-pass: per-bundle union-find, then contract ---
        from .local_solve import local_unionfind_pass

        t0 = time.time()
        contracted, loc_labels = local_unionfind_pass(
            e, bucket_width=local_solve_bucket_width
        )
        identity = (
            e.select(F.col("src").alias("node"))
            .unionAll(e.select(F.col("dst").alias("node")))
            .distinct()
            .select("node", F.col("node").alias("comp"))
        )
        labels = compose_labels(identity, loc_labels).localCheckpoint(eager=True)
        e = contracted.localCheckpoint(eager=True)
        loc_labels.unpersist()
        metrics.add(round=-1, kind="local_unionfind_pass",
                    wall_sec=time.time() - t0)

    e = e.persist()
    m = e.count()
    n_prev: int | None = None

    for rnd in range(start_round, max_rounds):
        if m == 0:
            break
        t0 = time.time()

        if m <= small_graph_threshold:
            # --- semi-external finish: one-task vectorized CC solve ---
            local_labels = _union_find_finish(e)
            if labels is None:
                labels = local_labels
            else:
                # the local map is small by construction -> broadcast compose
                labels = compose_labels(labels, local_labels, broadcast_inner=True)
            # materialize before dropping the cached edge table the kernel
            # task reads from
            labels = labels.localCheckpoint(eager=True)
            metrics.add(
                round=rnd, kind="unionfind_finish", m=m,
                wall_sec=time.time() - t0,
            )
            e.unpersist()
            m = 0
            break

        # --- one contraction superstep (boruvka or star, per policy) ---
        strategy = "boruvka"
        if policy is not None and n_prev is not None:
            strategy = policy.contraction_strategy(n_prev, m)
        if strategy == "star":
            from .star_contraction import star_contraction_round

            round_labels = star_contraction_round(
                e, seed=seed + rnd
            ).persist()
            n_before = round_labels.count()
        else:
            parents = _hook_parents(e).persist()
            n_before = parents.count()  # jumping preserves the row count
            if n_before <= jump_local_threshold:
                round_labels = _pointer_jump_local(parents).persist()
            else:
                round_labels = _pointer_jump(parents).persist()
            round_labels.count()  # materialize before dropping parents
            parents.unpersist()

        do_broadcast = n_before <= broadcast_threshold_rows
        e_next = contract(e, round_labels, broadcast_labels=do_broadcast)

        if labels is None:
            labels = round_labels
        else:
            labels = compose_labels(
                labels, round_labels, broadcast_inner=do_broadcast
            )

        if checkpointer is not None:
            e_next, labels = checkpointer.save_round(rnd, e_next, labels)
        else:
            e_next = e_next.localCheckpoint(eager=True)
            labels = labels.localCheckpoint(eager=True)

        e.unpersist()
        round_labels.unpersist()
        e = e_next.persist()
        m_next = e.count()
        metrics.add(
            round=rnd, kind=f"{strategy}_superstep", m=m, m_next=m_next,
            n_nodes=n_before, wall_sec=time.time() - t0,
            edges_per_sec=m / max(time.time() - t0, 1e-9),
            broadcast=do_broadcast,
        )
        if strategy == "boruvka":
            n_prev = n_before  # true node count of the contracted graph
        m = m_next

    if labels is None:
        # no edges at all -> empty labeling
        labels = spark.createDataFrame([], schema="node long, comp long")
    if checkpointer is not None:
        labels = checkpointer.save_final(labels)
    return labels


def connected_components_metrics(edges: DataFrame, **kw) -> tuple[DataFrame, CCMetrics]:
    """connected_components + its per-round metrics (rounds-to-convergence,
    edges/sec per superstep — BASELINE.json's headline metrics)."""
    metrics = CCMetrics()
    labels = connected_components(edges, metrics=metrics, **kw)
    return labels, metrics
