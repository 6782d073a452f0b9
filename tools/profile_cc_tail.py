"""Phase-level timing of full CC to convergence (diagnostic, not a benchmark).

Attributes cc_full's wall across: per-round superstep walls (from CCMetrics),
the union-find finish, and the final n_components count — the fixed-cost
stages VERDICT r3 flagged as the reason cc_full trails superstep in measured
scaling efficiency. Run at two levels to see which phase fails to speed up:

    python tools/profile_cc_tail.py [cpus] [edges_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    edges_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/emccs_scaling/rmat_s23_ef16"
    )
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import functions as F

    from em_connected_components_spark.session import get_spark, warmup
    from em_connected_components_spark.plans.connected_components import (
        CCMetrics,
        connected_components,
    )

    spark = get_spark(
        app_name=f"profile-cc-tail-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    warmup(spark)
    edges = spark.read.parquet(edges_dir).persist()
    m = edges.count()
    print(f"[profile] cpus={cpus} m={m}", file=sys.stderr)

    out = []
    for rep in range(reps + 1):  # rep0 = untimed warmup
        spark.catalog.clearCache()
        edges = edges.persist()
        edges.count()

        metrics = CCMetrics()
        t0 = time.time()
        labels = connected_components(
            edges, pre_canonicalized=True, metrics=metrics
        )
        t_alg = time.time() - t0
        t0 = time.time()
        n_comp = labels.select(F.countDistinct("comp")).collect()[0][0]
        t_count = time.time() - t0
        phases = {
            f"r{r['round']}_{r['kind']}": round(r["wall_sec"], 2)
            for r in metrics.rounds
        }
        rec = {
            "rep": rep,
            "warmup": rep == 0,
            "total": round(t_alg + t_count, 2),
            "alg": round(t_alg, 2),
            "final_count": round(t_count, 2),
            "unattributed": round(
                t_alg - sum(r["wall_sec"] for r in metrics.rounds), 2
            ),
            "n_components": n_comp,
            **phases,
        }
        out.append(rec)
        print(f"[profile] {json.dumps(rec)}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
