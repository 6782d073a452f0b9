"""Phase-level attribution of cc_full's wall at two parallelism levels.

Produces the committed artifact `BENCH/cc_tail.json` (VERDICT r4 #1a): for
each of N runs, at BOTH levels (default local[2] / local[8]), a bracketed
measurement (same calibration probe + 1.25x validity rule as
tools/bench_scaling.py) of one full CC solve with per-phase walls:

  superstep_sec   sum of contraction-round walls (scales with cores)
  kernel_sec      the single-task union-find finish kernel (serial, fixed)
  compose_sec     final broadcast compose + label checkpoint (n-row scan)
  unattributed    driver-side glue (job submit latency, cache mgmt)
  legacy_count_sec what the r4 workload additionally paid for its separate
                  countDistinct job — measured here for attribution but NO
                  LONGER part of the workload (the solve now tracks
                  n_components free; see connected_components docstring)

Phase split inside the finish uses connected_components(profile_finish=True),
which materializes the kernel output before composing (one extra tiny job —
attribution mode only, documented in the engine).

Worker mode (one fresh JVM per level, like bench_scaling):
    python tools/profile_cc_tail.py worker <cpus> <edges_dir> <reps> <out.json>
Orchestrator (default): runs both levels x RUNS runs, writes BENCH/cc_tail.json
    SPARK_GRAFT_CCTAIL_RUNS=3 python tools/profile_cc_tail.py
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
    "SPARK_GRAFT_CCTAIL_EDGES", os.path.join(WORK, "rmat_s23_ef16")
)
LEVELS = tuple(
    int(x)
    for x in os.environ.get("SPARK_GRAFT_CCTAIL_LEVELS", "2,8").split(",")
)
RUNS = int(os.environ.get("SPARK_GRAFT_CCTAIL_RUNS", "3"))
REPS = int(os.environ.get("SPARK_GRAFT_CCTAIL_REPS", "1"))
BRACKET_TOL = 1.25  # same pre-registered rule as bench_scaling


def worker(cpus: int, edges_dir: str, reps: int, out_path: str) -> None:
    from pyspark.sql import functions as F

    from em_connected_components_spark.plans.connected_components import (
        CCMetrics,
        connected_components,
    )
    from em_connected_components_spark.operators.normalize import symmetrize
    from em_connected_components_spark.session import get_spark, warmup

    local_dir = os.path.join(WORK, f"sparktmp_cctail{cpus}")
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"cc-tail-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.local.dir": local_dir},
    )
    warmup(spark)
    edges = spark.read.parquet(edges_dir).persist()
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

    def reset() -> None:
        nonlocal edges
        spark.catalog.clearCache()
        edges = edges.persist()
        edges.count()

    recs = []
    for rep in range(reps + 1):  # rep 0 = untimed JIT warmup
        reset()
        cal_before = calibration()
        reset()
        metrics = CCMetrics()
        t0 = time.time()
        labels = connected_components(
            edges, pre_canonicalized=True, metrics=metrics,
            profile_finish=True,
        )
        total = time.time() - t0
        # what the r4-shaped workload paid on top (attribution only)
        t0 = time.time()
        n_comp_scan = labels.select(F.countDistinct("comp")).collect()[0][0]
        legacy_count = time.time() - t0
        cal_after = calibration()

        superstep = sum(
            r["wall_sec"] for r in metrics.rounds if "superstep" in r["kind"]
        )
        fin = next(
            (r for r in metrics.rounds if r["kind"] == "unionfind_finish"), {}
        )
        rec = {
            "rep": rep,
            "warmup": rep == 0,
            "cpus": cpus,
            "m": m,
            "total_sec": round(total, 2),
            "superstep_sec": round(superstep, 2),
            "kernel_sec": round(fin.get("kernel_wall") or 0.0, 2),
            "compose_sec": round(fin.get("compose_wall") or 0.0, 2),
            "finish_sec": round(fin.get("wall_sec", 0.0), 2),
            "unattributed_sec": round(
                total - sum(r["wall_sec"] for r in metrics.rounds), 2
            ),
            "legacy_count_sec": round(legacy_count, 2),
            "n_components_metric": metrics.n_components,
            "n_components_scan": n_comp_scan,
            "rounds": len(metrics.rounds),
            "cal_before_sec": cal_before,
            "cal_after_sec": cal_after,
            "cal_bracket_ratio": round(
                max(cal_before, cal_after) / max(min(cal_before, cal_after),
                                                 1e-9), 3
            ),
        }
        recs.append(rec)
        print(f"[cc-tail {cpus}] {json.dumps(rec)}", file=sys.stderr,
              flush=True)

    with open(out_path, "w") as f:
        json.dump(recs, f)
    spark.stop()


def orchestrate() -> None:
    out = {
        "input": EDGES_DIR,
        "bracket_tolerance": BRACKET_TOL,
        "protocol": (
            "per run: for each level (fresh JVM), 1 untimed warmup rep then "
            f"{REPS} timed rep(s), each bracketed by calibration probes; a "
            "rep is valid iff max/min probe <= 1.25 (same rule as "
            "bench_scaling). Phases from CCMetrics with profile_finish=True "
            "(kernel materialized before compose — attribution mode; adds "
            "one tiny job vs the production single-job finish). "
            "legacy_count_sec is measured OUTSIDE total_sec: it is the cost "
            "of the countDistinct job the r4 workload included and the r5 "
            "workload no longer runs (n_components now tracked free by the "
            "solve)."
        ),
        "runs": [],
    }
    path = os.path.join(REPO, "BENCH", "cc_tail.json")
    if os.environ.get("SPARK_GRAFT_CCTAIL_APPEND", "") == "1" and os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    for run in range(RUNS):
        run_rec = {}
        for cpus in LEVELS:
            tmp = os.path.join(WORK, f"cctail_{cpus}.json")
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker",
                 str(cpus), EDGES_DIR, str(REPS), tmp],
                check=True,
            )
            with open(tmp) as f:
                run_rec[str(cpus)] = json.load(f)
        out["runs"].append(run_rec)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[cc-tail] run {run} recorded -> {path}", flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]), sys.argv[5])
    else:
        orchestrate()


if __name__ == "__main__":
    main()
