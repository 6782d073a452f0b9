"""A/B: pointer-jump strategies ABOVE the broadcast bound (VERDICT r2 #8).

Once the parent table exceeds the forced-broadcast byte gate, the chained
probe (`_pointer_jump_chained(broadcast_parents=False)`) degrades to 8
chained SHUFFLE joins + 1 flag join per pass, while plain path doubling
(`_pointer_jump`) costs one self-join + moved-check per log2(depth) step.
Which wins was asserted, not measured. This bench measures both on

  * the REAL hook-parent table of the 129M-edge rMAT s23 bench graph
    (shallow forest, depth ~<= 8 — the common case), and
  * a synthetic deep-chain forest (depth 64 — the pathological case path
    doubling exists for),

with the broadcast hint forcibly disabled, and records the winner per shape
in BENCH/jump_ab.json. The CC driver picks its non-broadcast jump plan by
this measured rule (plans/connected_components.py).

Usage: python tools/bench_jump.py   (reuses /tmp/emccs_scaling input if present)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = os.environ.get("SPARK_GRAFT_SCALING_DIR", "/tmp/emccs_scaling")
SCALE = int(os.environ.get("SPARK_GRAFT_SCALING_SCALE", "23"))
EDGE_FACTOR = int(os.environ.get("SPARK_GRAFT_SCALING_EF", "16"))
REPS = int(os.environ.get("SPARK_GRAFT_JUMP_REPS", "2"))
DEEP_N = int(os.environ.get("SPARK_GRAFT_JUMP_DEEP_N", str(16_000_000)))
DEEP_DEPTH = 64


def main() -> None:
    from pyspark.sql import functions as F

    from em_connected_components_spark.operators.normalize import canonicalize
    from em_connected_components_spark.plans.connected_components import (
        _hook_parents,
        _pointer_jump,
        _pointer_jump_chained,
        _release_jump_cache,
    )
    from em_connected_components_spark.session import get_spark, warmup
    from em_connected_components_spark.sources import generators as gen

    spark = get_spark(app_name="bench-jump")
    warmup(spark)

    edges_dir = os.path.join(WORK, f"rmat_s{SCALE}_ef{EDGE_FACTOR}")
    if os.path.exists(os.path.join(edges_dir, "_SUCCESS")):
        edges = spark.read.parquet(edges_dir)
    else:
        edges = canonicalize(
            gen.rmat(spark, scale=SCALE, edge_factor=EDGE_FACTOR, seed=42)
        )

    # shape 1: the real hook forest of the bench graph (shallow)
    hook = _hook_parents(edges).select("node", "comp").persist()
    hook_n = hook.count()

    # shape 2: synthetic deep chains — parent(i) = i-1 within blocks of
    # DEEP_DEPTH nodes (depth = DEEP_DEPTH, the worst case chained probing
    # pays `passes` full chains for before falling back)
    deep = (
        spark.range(DEEP_N)
        .select(
            F.col("id").alias("node"),
            F.when(
                F.col("id") % DEEP_DEPTH == 0, F.col("id")
            ).otherwise(F.col("id") - 1).alias("comp"),
        )
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")))
        .persist()
    )
    deep_n = deep.count()

    def run(fn, parents) -> float:
        t0 = time.time()
        out = fn(parents)
        out.count()
        dt = time.time() - t0
        _release_jump_cache(out)
        return round(dt, 2)

    strategies = {
        "chained_shuffle": lambda p: _pointer_jump_chained(
            p, broadcast_parents=False
        ),
        "doubling": lambda p: _pointer_jump(p),
    }
    results: dict = {
        "input": {
            "hook_rows": hook_n,
            "deep_rows": deep_n,
            "deep_depth": DEEP_DEPTH,
            "scale": SCALE,
            "reps": REPS,
        }
    }
    for shape, parents in (("hook_s23", hook), ("deep_chain", deep)):
        results[shape] = {}
        for name, fn in strategies.items():
            times = []
            for rep in range(REPS):
                dt = run(fn, parents)
                times.append(dt)
                print(f"[jump_ab] {shape}/{name} rep{rep}: {dt}s",
                      file=sys.stderr, flush=True)
            results[shape][name] = {"min_sec": min(times), "all_sec": times}
        ranked = sorted(
            results[shape], key=lambda k: results[shape][k]["min_sec"]
        )
        results[shape]["winner"] = ranked[0]

    # reference: broadcast probes on the hook shape (the under-bound plan)
    t = [run(lambda p: _pointer_jump_chained(p, broadcast_parents=True), hook)
         for _ in range(REPS)]
    results["hook_s23"]["chained_broadcast_ref"] = {
        "min_sec": min(t), "all_sec": t,
    }

    results["rule"] = (
        "above the broadcast bound use "
        + ("path doubling"
           if results["hook_s23"]["winner"] == "doubling"
           else "chained shuffle probes")
        + " (hook-shape winner); deep-chain winner: "
        + results["deep_chain"]["winner"]
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "jump_ab.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "input"},
                     default=str))
    spark.stop()


if __name__ == "__main__":
    main()
