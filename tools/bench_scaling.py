"""Scaling-efficiency evidence: same job, same input, two parallelism levels.

BASELINE.json's north_rule requires >=0.8 throughput scaling efficiency from
N to 4N executors. No real cluster exists in this sandbox, so (per the
measurement protocol in BASELINE.md §C) we run the SAME job on the SAME
parquet input at local[N] and local[4N] — each level in a fresh
subprocess/JVM with its own spark.local.dir — and report

    efficiency = (T_N / T_4N) / 4

per workload. N=2 by default: this 32-core VM throttles per-core throughput
as active-core count rises (a pure-numpy spin test shows ~40% per-task
slowdown at 32 procs; even at 16 busy cores a fully parallel shuffle phase
measures only ~0.73 "efficiency" against 4 cores purely from shared memory
bandwidth + frequency scaling). 2 vs 8 cores is the widest 4x spread where
per-core throughput is stable, so it measures the ENGINE's scaling rather
than the VM's power curve; levels are env-overridable
(SPARK_GRAFT_SCALING_LEVELS).
Each workload runs REPS times per level and we report the MIN (the VM also
has noisy-neighbor steal; min is the standard contention-free estimator).

Workloads mirror the headline metrics: one Boruvka superstep
(hook -> pointer-jump -> contract), full CC to convergence (rounds +
edges/sec), and PageRank power iterations.

Round-4 protocol (VERDICT r3 #1 + ADVICE r3): every workload is BRACKETED by
a calibration probe (one fully parallel hook-shaped map+shuffle+agg pass with
zero iterative or driver-serial structure) run immediately BEFORE and
immediately AFTER its reps, at each level. The probe measures the box's own
scaling ceiling at that moment: in-box cores share DRAM bandwidth, so even a
perfectly parallel pass cannot reach 1.0 here, while on a real N-vs-4N
EXECUTOR cluster (the north_rule's setting) bandwidth scales with executor
count. Each workload's normalization denominator is its OWN matched brackets
(min of before/after per level), so a transient host-slow window during one
workload is absorbed by the probes that surround it — round 3's one-run
collapse happened exactly because the single per-run calibration ran outside
the slow window its superstep ran inside.

PRE-REGISTERED VALIDITY CRITERION (fixed before round-4 data was taken): a
workload measurement in a run is VALID iff at BOTH levels its before/after
calibration probes agree within 25% (max/min <= 1.25); invalid measurements
are stored with their bracket ratios but excluded from the summary medians.
The default protocol is 5 full runs (SPARK_GRAFT_SCALING_RUNS); scaling.json
is rewritten after every completed run so an interrupted protocol still
leaves complete evidence for the runs that finished.

Usage:
    python tools/bench_scaling.py            # orchestrate: prepare + runs
    python tools/bench_scaling.py worker --cpus 4 --input DIR --out FILE

Results land in BENCH/scaling.json; BENCH/BASELINE.md summarizes.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = os.environ.get("SPARK_GRAFT_SCALING_DIR", "/tmp/emccs_scaling")
SCALE = int(os.environ.get("SPARK_GRAFT_SCALING_SCALE", "23"))
EDGE_FACTOR = int(os.environ.get("SPARK_GRAFT_SCALING_EF", "16"))
SEED = 42
REPS = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2"))
LEVELS = tuple(
    int(x)
    for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "2,8").split(",")
)
PR_ITERS = int(os.environ.get("SPARK_GRAFT_SCALING_PR_ITERS", "2"))
RUNS = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "5"))
# APPEND=1 seeds run_payloads from the existing BENCH/scaling.json (same
# protocol, same input) so an interrupted multi-run protocol resumes instead
# of discarding finished runs; RUNS then counts ADDITIONAL runs.
# TARGET_VALID>0 stops early once every workload has that many valid runs —
# the pre-registered validity rule itself is unchanged.
APPEND = os.environ.get("SPARK_GRAFT_SCALING_APPEND", "") == "1"
TARGET_VALID = int(os.environ.get("SPARK_GRAFT_SCALING_TARGET_VALID", "0"))
# output artifact (r5: the cc_full workload shape changed — component count
# now read from the solve's free metric instead of a separate countDistinct
# job — so post-change runs default to a NEW file rather than mixing
# estimands with the r4 record in scaling.json)
OUT_NAME = os.environ.get("SPARK_GRAFT_SCALING_OUT", "scaling_r5.json")
BRACKET_TOL = 1.25  # pre-registered validity bound on before/after probes


def _session(cpus: int, tag: str):
    from em_connected_components_spark.session import get_spark, warmup

    local_dir = os.path.join(WORK, f"sparktmp_{tag}")
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"emccs-scaling-{tag}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.local.dir": local_dir},
    )
    warmup(spark)
    return spark


# ---------------------------------------------------------------------------
# prepare: generate the input ONCE, write parquet (identical bytes for both runs)
# ---------------------------------------------------------------------------

def prepare_worker(edges_dir: str, out_path: str) -> None:
    from em_connected_components_spark.operators.normalize import canonicalize
    from em_connected_components_spark.sources import generators as gen

    spark = _session(24, "prepare")
    t0 = time.time()
    raw = gen.rmat(spark, scale=SCALE, edge_factor=EDGE_FACTOR, seed=SEED)
    canonicalize(raw).repartition(96, "src").write.mode("overwrite").parquet(
        edges_dir
    )
    m = spark.read.parquet(edges_dir).count()
    info = {
        "scale": SCALE,
        "edge_factor": EDGE_FACTOR,
        "seed": SEED,
        "edges_canonical": m,
        "prepare_sec": round(time.time() - t0, 1),
    }
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(info, f)


def prepare(edges_dir: str) -> dict:
    # Run in a SUBPROCESS: spark.stop() stops the SparkContext but the Py4J
    # gateway JVM (sized local[24]/48g here) lives until the owning Python
    # process exits. Running prepare in-process would park that idle JVM —
    # tens of GB of heap plus background GC — alongside every subsequent
    # measurement worker (observed: a leaked prepare JVM at ~40% CPU for the
    # whole protocol). A child process takes the JVM down with it.
    out = os.path.join(WORK, "prepare_info.json")
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "prepare",
         "--input", edges_dir, "--out", out],
        check=True, cwd=REPO,
    )
    with open(out) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# worker: one parallelism level, fresh JVM
# ---------------------------------------------------------------------------

def worker(cpus: int, edges_dir: str, out_path: str) -> None:
    from pyspark.sql import functions as F

    from em_connected_components_spark.plans.connected_components import (
        connected_components_metrics,
    )
    from em_connected_components_spark.plans.pagerank import pagerank

    spark = _session(cpus, f"local{cpus}")
    edges = spark.read.parquet(edges_dir).persist()
    m = edges.count()  # cache fill — input staging, untimed
    res: dict = {"cpus": cpus, "m": m, "reps": REPS}

    def run_superstep() -> dict:
        # in-situ measurement: run the engine's own loop for exactly one
        # round and read its round-0 metrics — identical code path to
        # production (an earlier standalone re-derivation measured the same
        # operators up to 2x slower purely from JIT/page-cache warmup order)
        from em_connected_components_spark.plans.connected_components import (
            CCMetrics,
            connected_components,
        )

        metrics = CCMetrics()
        connected_components(
            edges, pre_canonicalized=True, metrics=metrics, max_rounds=1,
            small_graph_threshold=0,
        )
        r0 = metrics.rounds[0]
        return {"wall_sec": round(r0["wall_sec"], 2),
                "edges_per_sec": round(r0["edges_per_sec"], 1),
                "n_nodes": r0["n_nodes"], "m_next": r0["m_next"]}

    def run_cc() -> dict:
        t0 = time.time()
        lbl, metrics = connected_components_metrics(
            edges, pre_canonicalized=True
        )
        # r5: the solve tracks the exact component count as a free
        # by-product of its own jobs (labels are already materialized by the
        # eager final checkpoint), so the separate n-row countDistinct scan
        # that was part of this workload through round 4 is gone. Runs made
        # with this shape are NOT comparable to BENCH/scaling.json (r4) and
        # go to a separate artifact (SPARK_GRAFT_SCALING_OUT).
        n_comp = metrics.n_components
        src = "metric"
        if n_comp is None:
            n_comp = lbl.select(F.countDistinct("comp")).collect()[0][0]
            src = "count_distinct_fallback"
        dt = time.time() - t0
        return {
            "wall_sec": round(dt, 2),
            "n_components_source": src,
            "edges_per_sec": round(m / dt, 1),
            "rounds_to_convergence": len(metrics.rounds),
            "n_components": n_comp,
            "superstep_edges_per_sec": [
                round(r["edges_per_sec"], 1)
                for r in metrics.rounds
                if "edges_per_sec" in r
            ],
        }

    def run_pagerank() -> dict:
        t0 = time.time()
        pr = pagerank(edges, max_iters=PR_ITERS, tol=0.0)
        pr.select(F.sum("rank")).collect()
        dt = time.time() - t0
        return {"wall_sec": round(dt, 2),
                "edges_per_iter_per_sec": round(PR_ITERS * m / dt, 1)}

    def run_calibration() -> float:
        # hardware-ceiling probe: ONE fully parallel map+shuffle+agg pass
        # over the same input (the hook shape), with zero iterative or
        # driver-serial structure. Brackets every workload (before + after);
        # the workload's normalization denominator and validity check come
        # from these immediately-adjacent probes.
        from em_connected_components_spark.operators.normalize import (
            symmetrize,
        )

        t0 = time.time()
        (
            symmetrize(edges)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("dst").alias("mn"), F.count("*").alias("c"))
            .agg(F.sum("mn"), F.sum("c"))
            .collect()
        )
        return round(time.time() - t0, 2)

    def reset_caches() -> None:
        # HONESTY GUARD (found in round 3): Spark's cache manager matches
        # structurally-identical plans, so any cache a previous rep left
        # behind (e.g. the engine returns its label cache when stopped at
        # max_rounds) gets silently REUSED by the next rep's identical
        # plan — round-2's leaked jump cache made superstep reps ~6s
        # artificially fast. Clear everything between reps and re-stage the
        # input cache untimed.
        spark.catalog.clearCache()
        nonlocal edges
        edges = edges.persist()
        edges.count()

    # untimed warmup passes: JIT-compile the hook/contract code paths AND
    # the calibration query's generated code, touching every cached
    # partition — without the calibration warmup the FIRST bracket probe of
    # every fresh JVM pays whole-stage-codegen+JIT (observed 56s vs 40s
    # steady-state at local[2]), which would trip the 1.25x validity bound
    # on the first workload in every run
    w = run_superstep()
    print(f"[worker {cpus}] warmup superstep: {w['wall_sec']}s",
          file=sys.stderr, flush=True)
    reset_caches()
    wc = run_calibration()
    print(f"[worker {cpus}] warmup calibration: {wc}s",
          file=sys.stderr, flush=True)

    for name, fn in (("superstep", run_superstep), ("cc_full", run_cc),
                     (f"pagerank{PR_ITERS}", run_pagerank)):
        reset_caches()
        cal_before = run_calibration()
        print(f"[worker {cpus}] {name} cal_before: {cal_before}s",
              file=sys.stderr, flush=True)
        runs = []
        for rep in range(REPS):
            reset_caches()
            r = fn()
            runs.append(r)
            print(f"[worker {cpus}] {name} rep{rep}: {r['wall_sec']}s",
                  file=sys.stderr, flush=True)
        reset_caches()
        cal_after = run_calibration()
        print(f"[worker {cpus}] {name} cal_after: {cal_after}s",
              file=sys.stderr, flush=True)
        best = min(runs, key=lambda r: r["wall_sec"])
        best["all_wall_sec"] = [r["wall_sec"] for r in runs]
        best["cal_before_sec"] = cal_before
        best["cal_after_sec"] = cal_after
        best["cal_bracket_ratio"] = round(
            max(cal_before, cal_after) / max(min(cal_before, cal_after), 1e-9),
            3,
        )
        res[name] = best

    edges.unpersist()
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)


# ---------------------------------------------------------------------------
# orchestrate
# ---------------------------------------------------------------------------

def _median(xs: list[float]) -> float:
    s = sorted(xs)
    k = len(s)
    return s[k // 2] if k % 2 else (s[k // 2 - 1] + s[k // 2]) / 2


def _summarize(run_payloads: list[dict], workloads: tuple[str, ...]) -> dict:
    summary = {}
    for wl in workloads:
        raw_all = [r["scaling_efficiency"][wl] for r in run_payloads]
        norm_all = [r["run_matched_normalized"][wl] for r in run_payloads]
        cal_all = [r["matched_calibration_eff"][wl] for r in run_payloads]
        valid_idx = [i for i, r in enumerate(run_payloads)
                     if r["valid"][wl]]
        raw_valid = [raw_all[i] for i in valid_idx]
        norm_valid = [norm_all[i] for i in valid_idx]
        entry = {
            "raw_all": raw_all,
            "norm_all": norm_all,
            "matched_calibration_eff_all": cal_all,
            "n_runs": len(run_payloads),
            "n_valid": len(valid_idx),
            "valid_runs": valid_idx,
        }
        if raw_valid:
            entry["raw_median_valid"] = round(_median(raw_valid), 3)
            entry["norm_median_valid"] = round(_median(norm_valid), 3)
            entry["norm_spread_valid"] = [
                round(min(norm_valid), 3), round(max(norm_valid), 3)
            ]
            entry["raw_spread_valid"] = [
                round(min(raw_valid), 3), round(max(raw_valid), 3)
            ]
        summary[wl] = entry
    return summary


def orchestrate() -> None:
    os.makedirs(WORK, exist_ok=True)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    edges_dir = os.path.join(WORK, f"rmat_s{SCALE}_ef{EDGE_FACTOR}")

    if not os.path.exists(os.path.join(edges_dir, "_SUCCESS")):
        print(f"[scaling] preparing input at {edges_dir}", file=sys.stderr)
        info = prepare(edges_dir)
    else:
        info = {"scale": SCALE, "edge_factor": EDGE_FACTOR, "seed": SEED,
                "reused": True}
    print(f"[scaling] input: {info}", file=sys.stderr)

    if len(LEVELS) < 2:
        raise SystemExit("SPARK_GRAFT_SCALING_LEVELS needs >=2 comma-separated ints")
    lo, hi = min(LEVELS), max(LEVELS)
    factor = hi / lo
    workloads = ("superstep", "cc_full", f"pagerank{PR_ITERS}")

    protocol = (
        f"same parquet input, fresh JVM per level, local[{lo}] vs "
        f"local[{hi}], shuffle_partitions=2*cores, min of {REPS} reps "
        "per workload per run, runs[] holds every completed protocol run "
        "(append-resumable; interrupted protocols keep finished runs), "
        "spark.catalog.clearCache() + untimed input re-stage between "
        "reps and probes (prevents plan-identical cache reuse across reps). "
        "Every workload is bracketed by a calibration probe (one fully "
        "parallel hook-shaped map+shuffle+agg pass) run immediately before "
        "and after its reps at each level; the workload's normalization "
        "denominator is its own matched brackets (min of before/after per "
        "level), unclamped. PRE-REGISTERED VALIDITY (fixed before data was "
        f"taken): a workload measurement is valid iff max/min <= {BRACKET_TOL} "
        "between its before/after probes at BOTH levels; invalid "
        "measurements are stored but excluded from summary medians. "
        "Per-core throughput on this VM degrades with active-core count — "
        "a fully parallel phase measures ~0.73 at 4-vs-16 from "
        "memory-bandwidth/frequency scaling alone — so 2-vs-8 is the widest "
        "4x spread that measures the engine, not the VM power curve"
    )

    run_payloads: list[dict] = []
    scaling_path = os.path.join(REPO, "BENCH", OUT_NAME)
    if APPEND and os.path.exists(scaling_path):
        with open(scaling_path) as f:
            prior = json.load(f)
        if prior.get("input", {}).get("scale", SCALE) != SCALE:
            raise SystemExit("APPEND=1 but existing scaling.json used a "
                             "different input scale — refusing to mix")
        run_payloads = prior["runs"]
        print(f"[scaling] append mode: resuming after {len(run_payloads)} "
              "recorded runs", file=sys.stderr)

    def _valid_counts() -> dict:
        return {
            wl: sum(1 for r in run_payloads if r["valid"].get(wl))
            for wl in workloads
        }

    base = len(run_payloads)
    for run_idx in range(base, base + RUNS):
        if TARGET_VALID and all(
            c >= TARGET_VALID for c in _valid_counts().values()
        ):
            print(f"[scaling] target of {TARGET_VALID} valid runs per "
                  f"workload reached: {_valid_counts()}", file=sys.stderr)
            break
        results = {}
        for cpus in LEVELS:
            out = os.path.join(WORK, f"result_r{run_idx}_local{cpus}.json")
            print(f"[scaling] run {run_idx} local[{cpus}] ...", file=sys.stderr)
            t0 = time.time()
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker",
                 "--cpus", str(cpus), "--input", edges_dir, "--out", out],
                check=True, cwd=REPO,
            )
            with open(out) as f:
                results[cpus] = json.load(f)
            print(f"[scaling] run {run_idx} local[{cpus}] done in "
                  f"{time.time()-t0:.0f}s", file=sys.stderr)

        eff, eff_norm, cal_eff, valid, brackets = {}, {}, {}, {}, {}
        for wl in workloads:
            r_lo, r_hi = results[lo][wl], results[hi][wl]
            eff[wl] = round((r_lo["wall_sec"] / r_hi["wall_sec"]) / factor, 3)
            # workload-matched calibration denominator: the probes that ran
            # immediately around THIS workload at each level (min of the two
            # brackets = contention-free estimate of that moment's ceiling)
            cal_lo = min(r_lo["cal_before_sec"], r_lo["cal_after_sec"])
            cal_hi = min(r_hi["cal_before_sec"], r_hi["cal_after_sec"])
            cal_eff[wl] = round((cal_lo / cal_hi) / factor, 3)
            eff_norm[wl] = (
                round(eff[wl] / cal_eff[wl], 3) if cal_eff[wl] > 0 else 0.0
            )
            brackets[wl] = {
                str(lo): r_lo["cal_bracket_ratio"],
                str(hi): r_hi["cal_bracket_ratio"],
            }
            valid[wl] = bool(
                r_lo["cal_bracket_ratio"] <= BRACKET_TOL
                and r_hi["cal_bracket_ratio"] <= BRACKET_TOL
            )
        run_payloads.append(
            {"levels": {str(k): v for k, v in results.items()},
             "scaling_efficiency": eff,
             "matched_calibration_eff": cal_eff,
             "run_matched_normalized": eff_norm,
             "bracket_ratios": brackets,
             "valid": valid}
        )

        # incremental save: an interrupted protocol still leaves complete
        # evidence for every finished run
        payload = {
            "input": info,
            "bracket_tolerance": BRACKET_TOL,
            "runs": run_payloads,
            "summary": _summarize(run_payloads, workloads),
            "protocol": protocol,
        }
        with open(os.path.join(REPO, "BENCH", OUT_NAME), "w") as f:
            json.dump(payload, f, indent=2)
        print(f"[scaling] run {run_idx} recorded: "
              f"raw={eff} norm={eff_norm} valid={valid}", file=sys.stderr)

    print(json.dumps(_summarize(run_payloads, workloads)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="orchestrate")
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--input", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.mode == "worker":
        worker(args.cpus, args.input, args.out)
    elif args.mode == "prepare":
        prepare_worker(args.input, args.out)
    else:
        orchestrate()


if __name__ == "__main__":
    main()
