"""Phase-level timing of one Boruvka superstep (diagnostic, not a benchmark).

Breaks the superstep into its sequential driver actions — hook+count, jump,
contract+checkpoint, next-edge count — so scaling work targets the measured
serial fraction instead of guesses. Run on the scaling-bench input:

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
        _hook_parents,
        _pointer_jump_local,
    )
    from em_connected_components_spark.operators.joins import contract

    spark = get_spark(
        app_name=f"profile-superstep-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    warmup(spark)
    edges = spark.read.parquet(edges_dir).persist()
    m = edges.count()
    print(f"[profile] cpus={cpus} m={m}", file=sys.stderr)

    for rep in range(reps):
        t = {}
        t0 = time.time()
        parents_full = _hook_parents(edges).persist()
        n = parents_full.count()
        t["hook+count"] = time.time() - t0

        t0 = time.time()
        parents = parents_full.select("node", "comp")
        round_labels = _pointer_jump_local(parents).persist()
        round_labels.count()
        parents_full.unpersist()
        t["jump+materialize"] = time.time() - t0

        t0 = time.time()
        e_next = contract(edges, round_labels, broadcast_labels=True)
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
        round_labels.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
