"""Relabel-join skew strategy A/B (VERDICT round 1 item 8).

Runs CC on a mega-hub star graph with the broadcast threshold forced to 0 so
every relabel takes the shuffled path, comparing the explicit heavy-hitter
split trigger (`heavy_hitter_split=True`, the default) against the pure
declarative plan (AQE runtime skew-join splitting only). MEASURED RESULT:
neutral at 10M leaves (ratio 1.004), ~7% faster at 30M (0.934) — the
literal-map fast path removes the hub reducer entirely, AQE covers residual
moderate skew. Results -> BENCH/salting.json.

    python tools/bench_salting.py [n_leaves] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_leaves = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
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
    # mega-hub star graph: node 1 connects to every other node — the max
    # possible relabel-join skew (every edge carries the hub's id on one
    # side), plus a sprinkle of leaf-leaf edges so contraction has work.
    # (rMAT hubs at feasible scales stay below the trigger's 4*m/partitions
    # bound; the trigger exists for exactly this pathological-hub shape.)
    hub = spark.range(2, n_leaves + 2).select(
        F.lit(1).alias("src"), F.col("id").alias("dst")
    )
    extra = spark.range(2, n_leaves + 2, 97).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    edges = canonicalize(hub.unionAll(extra))
    edges = edges.repartition(2 * cpus, "src").persist()
    m = edges.count()
    print(f"[salt] star n={n_leaves} m={m}", file=sys.stderr)

    # untimed warmup: JIT/codegen + cache-fill for the CC path, so the
    # first measured arm is not systematically ~50s slower
    connected_components(edges, pre_canonicalized=True,
                         broadcast_threshold_rows=0)

    results: dict = {"n_leaves": n_leaves, "m": m, "cpus": cpus}
    # broadcast_threshold_rows=0 forces every relabel onto the shuffled path,
    # which is where the hub-skew trigger lives (broadcast joins cannot skew)
    for name, salt_enabled in (("heavy_split_trigger", True), ("no_split", False)):
        best = None
        for rep in range(2):
            metrics = CCMetrics()
            t0 = time.time()
            labels = connected_components(
                edges, pre_canonicalized=True, metrics=metrics,
                broadcast_threshold_rows=0,
                heavy_hitter_split=salt_enabled,
            )
            n_comp = labels.select(
                F.countDistinct("comp")).collect()[0][0]
            dt = round(time.time() - t0, 2)
            salted_rounds = [
                r["round"] for r in metrics.rounds
                if r.get("n_heavy_hitters", 0) > 0
            ]
            print(f"[salt] {name} rep{rep}: {dt}s comps={n_comp} "
                  f"salted_rounds={salted_rounds}", file=sys.stderr)
            if best is None or dt < best["wall_sec"]:
                best = {"wall_sec": dt, "n_components": n_comp,
                        "salted_rounds": salted_rounds}
        results[name] = best

    assert (results["heavy_split_trigger"]["n_components"]
            == results["no_split"]["n_components"])
    results["wall_ratio_split_vs_plain"] = round(
        results["heavy_split_trigger"]["wall_sec"]
        / results["no_split"]["wall_sec"], 3
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "salting.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
