"""Incremental CC at bench scale (VERDICT r4 #6): fold a 1% crawl delta into
the solved star map of the 129M-edge rMAT s23 graph, at two parallelism
levels, versus the full recompute — under the same bracketed-probe protocol
as tools/bench_scaling.py.

Produces `BENCH/incremental.json`. Per run, per level (fresh JVM):
  - stage (untimed): deterministic 1% split (xxhash64(src,dst) % 100 == 0),
    base solve, labels written to parquet (the stored-star-map shape the
    streaming fold reads);
  - timed, each bracketed by calibration probes: (a) the incremental fold
    of the delta into the stored labels, materialized via count();
    (b) the full recompute over ALL edges (same-window comparator);
  - recorded: walls, fold speedup, bracket ratios + the 1.25x validity rule,
    result parity (n_components of fold vs full recompute).

Usage:
  worker:        python tools/bench_incremental.py worker <cpus> <out.json>
  orchestrator:  SPARK_GRAFT_INCR_RUNS=3 python tools/bench_incremental.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = os.environ.get("SPARK_GRAFT_SCALING_DIR", "/tmp/emccs_scaling")
EDGES_DIR = os.environ.get(
    "SPARK_GRAFT_INCR_EDGES", os.path.join(WORK, "rmat_s23_ef16")
)
LEVELS = tuple(
    int(x)
    for x in os.environ.get("SPARK_GRAFT_INCR_LEVELS", "2,8").split(",")
)
RUNS = int(os.environ.get("SPARK_GRAFT_INCR_RUNS", "3"))
DELTA_PCT = int(os.environ.get("SPARK_GRAFT_INCR_DELTA_PCT", "1"))
BRACKET_TOL = 1.25  # pre-registered, same rule as bench_scaling


def worker(cpus: int, out_path: str) -> None:
    from pyspark.sql import functions as F

    from em_connected_components_spark.operators.normalize import symmetrize
    from em_connected_components_spark.plans.connected_components import (
        CCMetrics,
        connected_components,
        connected_components_metrics,
    )
    from em_connected_components_spark.plans.incremental import (
        incremental_connected_components,
    )
    from em_connected_components_spark.session import get_spark, warmup

    local_dir = os.path.join(WORK, f"sparktmp_incr{cpus}")
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"incr-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.local.dir": local_dir},
    )
    warmup(spark)
    edges = spark.read.parquet(EDGES_DIR).persist()
    m = edges.count()

    def calibration() -> float:
        t0 = time.time()
        (
            symmetrize(edges)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("dst").alias("mn"), F.count("*").alias("c"))
            .agg(F.sum("mn"), F.sum("c"))
            .collect()
        )
        return round(time.time() - t0, 2)

    # ---- stage (untimed): split, base solve, store labels ---------------
    is_delta = F.pmod(F.xxhash64("src", "dst"), F.lit(100)) < DELTA_PCT
    delta_dir = os.path.join(WORK, f"incr_delta_{cpus}")
    base_dir = os.path.join(WORK, f"incr_base_{cpus}")
    labels_dir = os.path.join(WORK, f"incr_labels_{cpus}")
    edges.filter(is_delta).write.mode("overwrite").parquet(delta_dir)
    edges.filter(~is_delta).write.mode("overwrite").parquet(base_dir)
    base = spark.read.parquet(base_dir).persist()
    base_m = base.count()
    base_labels = connected_components(base, pre_canonicalized=True)
    base_labels.write.mode("overwrite").parquet(labels_dir)
    base.unpersist()
    delta = spark.read.parquet(delta_dir).persist()
    delta_m = delta.count()
    print(f"[incr {cpus}] m={m} base={base_m} delta={delta_m}",
          file=sys.stderr, flush=True)

    def reset() -> None:
        nonlocal edges
        spark.catalog.clearCache()
        edges = edges.persist()
        edges.count()

    recs = []
    for rep in range(2):  # rep 0 = untimed JIT warmup
        # ---- timed: incremental fold --------------------------------
        reset()
        delta_c = delta.persist()
        delta_c.count()
        prior = spark.read.parquet(labels_dir)
        cal_b1 = calibration()
        t0 = time.time()
        folded = incremental_connected_components(
            prior, delta_c, pre_canonicalized=True
        )
        n_rows_folded = folded.count()
        t_incr = time.time() - t0
        cal_a1 = calibration()

        # ---- timed: full recompute (same window) --------------------
        reset()
        mfull = CCMetrics()
        cal_b2 = calibration()
        t0 = time.time()
        full_labels, mfull = connected_components_metrics(
            edges, pre_canonicalized=True
        )
        n_comp_full = mfull.n_components
        if n_comp_full is None:
            n_comp_full = (
                full_labels.select(F.countDistinct("comp")).collect()[0][0]
            )
        t_full = time.time() - t0
        cal_a2 = calibration()

        n_comp_folded = (
            folded.select(F.countDistinct("comp")).collect()[0][0]
        )
        rec = {
            "rep": rep,
            "warmup": rep == 0,
            "cpus": cpus,
            "m": m,
            "delta_m": delta_m,
            "incr_sec": round(t_incr, 2),
            "full_sec": round(t_full, 2),
            "speedup": round(t_full / max(t_incr, 1e-9), 2),
            "n_rows_folded": n_rows_folded,
            "n_comp_folded": n_comp_folded,
            "n_comp_full": n_comp_full,
            "parity": n_comp_folded == n_comp_full,
            "incr_cal": [cal_b1, cal_a1],
            "full_cal": [cal_b2, cal_a2],
            "incr_bracket_ratio": round(
                max(cal_b1, cal_a1) / max(min(cal_b1, cal_a1), 1e-9), 3
            ),
            "full_bracket_ratio": round(
                max(cal_b2, cal_a2) / max(min(cal_b2, cal_a2), 1e-9), 3
            ),
        }
        recs.append(rec)
        print(f"[incr {cpus}] {json.dumps(rec)}", file=sys.stderr, flush=True)

    with open(out_path, "w") as f:
        json.dump(recs, f)
    spark.stop()


def orchestrate() -> None:
    out = {
        "input": EDGES_DIR,
        "delta_pct": DELTA_PCT,
        "bracket_tolerance": BRACKET_TOL,
        "protocol": (
            "per run, per level (fresh JVM): untimed 1% xxhash split + base "
            "solve + labels to parquet; then 1 untimed warmup rep and 1 "
            "timed rep of {incremental fold, full recompute}, each bracketed "
            "by calibration probes (valid iff max/min <= 1.25). Parity: "
            "component count of fold == full recompute every rep."
        ),
        "runs": [],
    }
    path = os.path.join(REPO, "BENCH", "incremental.json")
    if (os.environ.get("SPARK_GRAFT_INCR_APPEND", "") == "1"
            and os.path.exists(path)):
        with open(path) as f:
            out = json.load(f)
    for run in range(RUNS):
        run_rec = {}
        for cpus in LEVELS:
            tmp = os.path.join(WORK, f"incr_{cpus}.json")
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker",
                 str(cpus), tmp],
                check=True,
            )
            with open(tmp) as f:
                run_rec[str(cpus)] = json.load(f)
        out["runs"].append(run_rec)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[incr] run {run} recorded -> {path}", flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), sys.argv[3])
    else:
        orchestrate()


if __name__ == "__main__":
    main()
