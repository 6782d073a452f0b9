"""Phase-level timing of one Boruvka superstep (diagnostic, not a benchmark).

Breaks the superstep into its sequential driver actions — hook+count, jump
(via the SAME size-dispatched plan the production loop uses), contract +
checkpoint, next-edge count — so scaling work targets the measured serial
fraction instead of guesses. Run on the scaling-bench input at two levels to
see which phase fails to speed up:

    python tools/profile_superstep.py [cpus] [edges_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    edges_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/emccs_scaling/rmat_s23_ef16"
    )
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from em_connected_components_spark.session import get_spark, warmup
    from em_connected_components_spark.plans.connected_components import (
        _dispatch_jump,
        _hook_parents,
        _release_jump_cache,
    )
    from em_connected_components_spark.operators.joins import contract
    from em_connected_components_spark.tuning import broadcast_row_bound

    spark = get_spark(
        app_name=f"profile-superstep-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    warmup(spark)
    edges = spark.read.parquet(edges_dir).persist()
    m = edges.count()
    bcast_rows = broadcast_row_bound(spark)
    print(f"[profile] cpus={cpus} m={m} broadcast_rows={bcast_rows}",
          file=sys.stderr)

    for rep in range(reps):
        spark.catalog.clearCache()
        edges = edges.persist()
        edges.count()  # untimed input re-stage (matches bench protocol)

        t = {}
        t0 = time.time()
        parents_full = _hook_parents(edges).persist()
        from pyspark.sql import functions as F

        stats = parents_full.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("comp").alias("t"),
        ).collect()[0]
        n, t_est = stats["n"], stats["t"]
        t["hook+count"] = time.time() - t0

        t0 = time.time()
        round_labels = _dispatch_jump(
            parents_full.select("node", "comp"), n, t_est=t_est,
            jump_local_threshold=2_000_000,
            broadcast_threshold_rows=bcast_rows,
        )
        parents_full.unpersist()
        t["jump"] = time.time() - t0

        t0 = time.time()
        e_next = contract(edges, round_labels, broadcast_labels=n <= bcast_rows)
        e_next = e_next.localCheckpoint(eager=True)
        t["contract+checkpoint"] = time.time() - t0

        t0 = time.time()
        m_next = e_next.count()
        t["m_next_count"] = time.time() - t0

        total = sum(t.values())
        print(
            f"[profile] rep{rep} n={n} m_next={m_next} total={total:.2f}s  "
            + "  ".join(f"{k}={v:.2f}s" for k, v in t.items())
        )
        _release_jump_cache(round_labels)

    spark.stop()


if __name__ == "__main__":
    main()
