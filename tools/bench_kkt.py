"""KKT sample-and-filter vs plain iterative Boruvka on a dense graph.

The KKT level's claim (VERDICT round 1 item 5): on dense graphs the full
m-row edge table should participate in ONE relabel join instead of every
hooking round. This runs both drivers on the same dense Gilbert graph and
records wall-clock + per-phase metrics to BENCH/kkt.json.

    python tools/bench_kkt.py [n] [avg_degree] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    avg_deg = float(sys.argv[2]) if len(sys.argv) > 2 else 32.0
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from pyspark.sql import functions as F

    from em_connected_components_spark.session import get_spark, warmup
    from em_connected_components_spark.operators.normalize import canonicalize
    from em_connected_components_spark.plans.connected_components import (
        CCMetrics,
        connected_components,
    )
    from em_connected_components_spark.plans.policy import Policy
    from em_connected_components_spark.sources import generators as gen

    spark = get_spark(
        app_name="bench-kkt", master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    warmup(spark)
    edges = canonicalize(gen.gilbert(spark, n, avg_deg, seed=11))
    edges = edges.repartition(2 * cpus, "src").persist()
    m = edges.count()
    print(f"[kkt] dense gilbert n={n} m={m}", file=sys.stderr)

    results: dict = {"n": n, "avg_degree": avg_deg, "m": m, "cpus": cpus}
    partitions = {}
    for name, pol in (
        ("iterative", None),
        ("kkt", Policy(strategy="kkt", small_graph_edges=1_000_000)),
    ):
        best = None
        for rep in range(2):
            metrics = CCMetrics()
            t0 = time.time()
            labels = connected_components(
                edges, pre_canonicalized=True, policy=pol, metrics=metrics
            )
            n_comp = labels.select(F.countDistinct("comp")).collect()[0][0]
            dt = round(time.time() - t0, 2)
            print(f"[kkt] {name} rep{rep}: {dt}s comps={n_comp}",
                  file=sys.stderr)
            if best is None or dt < best["wall_sec"]:
                best = {
                    "wall_sec": dt,
                    "n_components": n_comp,
                    "rounds": [
                        {k: v for k, v in r.items() if k != "edges_per_sec"}
                        for r in metrics.rounds
                    ],
                }
        partitions[name] = best["n_components"]
        results[name] = best

    assert partitions["iterative"] == partitions["kkt"], partitions
    results["speedup_kkt_vs_iterative"] = round(
        results["iterative"]["wall_sec"] / results["kkt"]["wall_sec"], 3
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "kkt.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: results[k] for k in
                      ("m", "speedup_kkt_vs_iterative")}))
    spark.stop()


if __name__ == "__main__":
    main()
