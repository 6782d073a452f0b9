"""Salted-relabel engagement evidence (VERDICT round 1 item 8).

Runs CC on a skewed rMAT graph with the broadcast threshold forced to 0 so
every relabel takes the shuffled path, comparing the max-degree salt trigger
ON (engine default behavior on that path) vs OFF (salt trigger disabled by
an impossible threshold via monkeypatched policy — here simply by running
contract() directly). Records that (a) a salted round actually fires and
(b) total wall-clock does not regress. Results -> BENCH/salting.json.

    python tools/bench_salting.py [scale] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from em_connected_components_spark.session import get_spark, warmup
    from em_connected_components_spark.operators.normalize import canonicalize
    from em_connected_components_spark.plans.connected_components import (
        CCMetrics,
        connected_components,
    )
    from em_connected_components_spark.sources import generators as gen

    spark = get_spark(
        app_name="bench-salting", master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    warmup(spark)
    edges = canonicalize(gen.rmat(spark, scale=scale, edge_factor=16, seed=7))
    edges = edges.repartition(2 * cpus, "src").persist()
    m = edges.count()
    print(f"[salt] rmat s{scale} m={m}", file=sys.stderr)

    results: dict = {"scale": scale, "m": m, "cpus": cpus}
    # broadcast_threshold_rows=0 forces every relabel onto the shuffled path,
    # which is where the hub-skew trigger lives (broadcast joins cannot skew)
    for name, salt_enabled in (("salted_trigger", True), ("unsalted", False)):
        best = None
        for rep in range(2):
            metrics = CCMetrics()
            t0 = time.time()
            import em_connected_components_spark.plans.connected_components as ccmod

            if not salt_enabled:
                # disable by raising the trigger beyond any degree
                orig = ccmod.contract

                def no_salt_contract(e, lab, broadcast_labels=False,
                                     salt_buckets=0):
                    return orig(e, lab, broadcast_labels, 0)

                ccmod.contract = no_salt_contract
            try:
                labels = connected_components(
                    edges, pre_canonicalized=True, metrics=metrics,
                    broadcast_threshold_rows=0,
                )
                n_comp = labels.select(
                    F.countDistinct("comp")).collect()[0][0]
            finally:
                if not salt_enabled:
                    ccmod.contract = orig
            dt = round(time.time() - t0, 2)
            salted_rounds = [
                r["round"] for r in metrics.rounds
                if r.get("salt_buckets", 0) > 0
            ]
            print(f"[salt] {name} rep{rep}: {dt}s comps={n_comp} "
                  f"salted_rounds={salted_rounds}", file=sys.stderr)
            if best is None or dt < best["wall_sec"]:
                best = {"wall_sec": dt, "n_components": n_comp,
                        "salted_rounds": salted_rounds}
        results[name] = best

    assert (results["salted_trigger"]["n_components"]
            == results["unsalted"]["n_components"])
    results["wall_ratio_salted_vs_unsalted"] = round(
        results["salted_trigger"]["wall_sec"]
        / results["unsalted"]["wall_sec"], 3
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "salting.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
