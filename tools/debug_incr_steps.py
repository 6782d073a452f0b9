"""Step-level timing of the incremental fold (diagnostic for the local[8]
vs local[2] inversion seen in BENCH/incremental.json run 0).

Replicates incremental_connected_components stage by stage, forcing one
action per stage, so the slow stage is identifiable. Not a benchmark.

    python tools/debug_incr_steps.py <cpus>
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = os.environ.get("SPARK_GRAFT_SCALING_DIR", "/tmp/emccs_scaling")


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from pyspark.sql import functions as F

    from em_connected_components_spark.operators.joins import relabel
    from em_connected_components_spark.operators.normalize import canonicalize
    from em_connected_components_spark.plans.connected_components import (
        CCMetrics,
        connected_components,
    )
    from em_connected_components_spark.session import get_spark, warmup
    from em_connected_components_spark.tuning import broadcast_row_bound

    spark = get_spark(
        app_name=f"debug-incr-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.local.dir": os.path.join(WORK, f"sparktmp_dbg{cpus}")},
    )
    warmup(spark)

    delta = spark.read.parquet(os.path.join(WORK, f"incr_delta_{cpus}")).persist()
    labels = spark.read.parquet(os.path.join(WORK, f"incr_labels_{cpus}"))
    print(f"[dbg {cpus}] delta={delta.count()}", flush=True)

    def t(name, fn):
        t0 = time.time()
        out = fn()
        print(f"[dbg {cpus}] {name}: {time.time()-t0:.2f}s", flush=True)
        return out

    lab = labels.select("node", "comp")
    delta_nodes = (
        delta.select(F.col("src").alias("node"))
        .unionAll(delta.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_delta_nodes = t("delta_nodes distinct+count", delta_nodes.count)
    print(f"[dbg {cpus}] n_delta_nodes={n_delta_nodes} "
          f"bound={broadcast_row_bound(spark)}", flush=True)

    lab_slice = lab.join(F.broadcast(delta_nodes), on="node", how="leftsemi").persist()
    t("slice carve (persist+count)", lab_slice.count)

    slice_nodes = lab_slice.select("node")
    fresh = delta_nodes.join(F.broadcast(slice_nodes), on="node", how="left_anti")
    t("fresh anti count", fresh.count)

    re = relabel(delta, lab_slice, "src", broadcast_labels=True)
    re = relabel(re, lab_slice, "dst", broadcast_labels=True)
    re = canonicalize(re).persist()
    n_re = t("relabel x2 + canonicalize (persist+count)", re.count)
    print(f"[dbg {cpus}] contracted delta edges={n_re}", flush=True)

    metrics = CCMetrics()
    dl = t("inner CC", lambda: connected_components(
        re, pre_canonicalized=True, metrics=metrics))
    print(f"[dbg {cpus}] inner rounds={[(r['round'], r['kind'], round(r['wall_sec'],2)) for r in metrics.rounds]}",
          flush=True)

    full = lab.unionByName(fresh.select("node", F.col("node").alias("comp")))
    dl2 = dl.select(F.col("node").alias("__rep"), F.col("comp").alias("__newc"))
    out = full.join(F.broadcast(dl2), full["comp"] == dl2["__rep"], how="left").select(
        "node", F.coalesce("__newc", "comp").alias("comp")
    )
    t("compose count", out.count)
    spark.stop()


if __name__ == "__main__":
    main()
