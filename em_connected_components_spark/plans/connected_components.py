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
    finish:     when the contracted graph is small, collect it and run an
                in-driver union-find (the reference's semi-external Kruskal
                base case, cpp/streaming/basecase/BaseKruskal.h:73-111)

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


def _pointer_jump_local(parents: DataFrame) -> DataFrame:
    """Collect the parent table and pointer-jump in numpy (path doubling on
    index arrays) — the semi-external analogue for the jump phase.

    A distributed jump iteration costs a full self-join + checkpoint + count
    (~seconds of fixed overhead) regardless of size; once the parent table
    fits the driver (it shrinks ~2x per round), log2(depth) numpy gathers do
    the same work in milliseconds. Transfer: Arrow toPandas down, a pyarrow
    parquet spill + parquet scan back up (measured 8x faster than
    ``spark.createDataFrame(pandas_df)``, whose Arrow path still serializes
    through the driver row-batch by row-batch).
    """
    import numpy as np

    spark = parents.sparkSession
    pdf = parents.select("node", "comp").toPandas()
    nodes = pdf["node"].to_numpy(dtype=np.int64)
    comp = pdf["comp"].to_numpy(dtype=np.int64)
    order = np.argsort(nodes)
    nodes_s = nodes[order]
    comp_s = comp[order]
    # map comp values -> index into nodes_s; every comp is itself a node
    for _ in range(64):
        idx = np.searchsorted(nodes_s, comp_s)
        nxt = comp_s[idx]
        if np.array_equal(nxt, comp_s):
            break
        comp_s = nxt
    return _arrays_to_df(spark, nodes_s, comp_s)


def _arrays_to_df(spark: SparkSession, nodes, comps) -> DataFrame:
    """Driver numpy arrays -> DataFrame via a pyarrow parquet spill (measured
    8x faster than spark.createDataFrame for ~1M rows; also gives the result
    a clean columnar lineage the executors can re-read in parallel).

    Written as multiple files so downstream scans — in particular the
    broadcast-relation build of the relabel join, whose child is this very
    table — read it with parallel tasks instead of one."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = tempfile.mkdtemp(prefix="emccs_spill_")
    n_files = max(1, min(8, len(nodes) // 250_000))
    for i, (nc, cc) in enumerate(
        zip(np.array_split(nodes, n_files), np.array_split(comps, n_files))
    ):
        pq.write_table(
            pa.table({"node": nc, "comp": cc}),
            os.path.join(out_dir, f"part-{i}.parquet"),
        )
    return spark.read.schema("node long, comp long").parquet(out_dir)


def _union_find_local(edge_rows: list[tuple[int, int]]) -> dict[int, int]:
    """In-driver union-find with path compression, min-member roots.

    The reference's semi-external Kruskal base case
    (cpp/streaming/basecase/BaseKruskal.h:73-111) — run on the driver once the
    contracted graph fits (its `is_semi_externally_handleable` switch,
    cpp/streaming/algorithms/Boruvka.h:83-85). Union-by-min (not by rank) so
    every root is its component's minimum, matching the distributed rounds.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    nodes: set[int] = set()
    for u, v in edge_rows:
        nodes.add(u)
        nodes.add(v)
        ru, rv = find(u), find(v)
        if ru == rv:
            continue
        lo, hi = (ru, rv) if ru < rv else (rv, ru)
        parent[hi] = lo
    return {x: find(x) for x in nodes}


def _union_find_finish(edges: DataFrame) -> DataFrame:
    """Collect the (small) contracted edge table via Arrow and solve it with
    the driver union-find; return a parquet-spill-backed (node, comp) table.

    toPandas + pyarrow spill replace .collect() + createDataFrame(list) —
    both row-at-a-time paths that dominated the finish wall-clock."""
    import numpy as np

    spark = edges.sparkSession
    pdf = edges.select("src", "dst").toPandas()
    mapping = _union_find_local(
        list(zip(pdf["src"].to_numpy().tolist(), pdf["dst"].to_numpy().tolist()))
    )
    nodes = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
    comps = np.fromiter(mapping.values(), dtype=np.int64, count=len(mapping))
    order = np.argsort(nodes)
    return _arrays_to_df(spark, nodes[order], comps[order])


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
    graph is collected and finished with in-driver union-find — the Spark
    analogue of the reference's semi-external switch (Boruvka.h:32-36).
    ``broadcast_threshold_rows``: label-table size below which relabel joins
    are forced broadcast.
    ``checkpointer``: if given, per-round edge/label tables are persisted and
    a killed run resumes from the last completed round.
    ``policy``: optional plans.policy.Policy overriding the two thresholds and
    optionally enabling star-contraction rounds by density (variants.hpp).
    ``local_solve_bucket_width``: >0 runs one bundle-local union-find pass
    (SibeynWithBundles, G6) before the iterative loop — wins when node ids
    have locality (paths/grids/crawl order).
    ``jump_local_threshold``: parent tables at or below this row count do
    their pointer jumping in numpy on the driver (one Arrow round-trip)
    instead of log(depth) distributed self-joins — the jump-phase analogue of
    the semi-external switch.
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
            # --- semi-external finish: collect + union-find on the driver ---
            local_labels = _union_find_finish(e)
            if labels is None:
                labels = local_labels
            else:
                # the local map is small by construction -> broadcast compose
                labels = compose_labels(labels, local_labels, broadcast_inner=True)
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
