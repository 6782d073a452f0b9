"""Mechanically evaluate the pre-registered round-5 decision rules
(BENCH/PREREG_r5.md) against the committed artifacts.

Inputs:  BENCH/cc_tail.json       (tools/profile_cc_tail.py, 3 bracketed runs)
         BENCH/incremental.json   (tools/bench_incremental.py, 3 bracketed runs)
         BENCH/scaling_r5.json    (tools/bench_scaling.py, round-5 record)
Output:  BENCH/analysis_r5.json + a printed markdown block for BASELINE.md.

Every number BASELINE.md quotes for the round-5 floor case / incremental
claims comes from here, so the narrative can't drift from the data
(ADVICE r4 flagged exactly that failure mode).

Rep-selection rules (fixed here, applied uniformly):
- a rep is bracket-valid iff its own before/after probes agree within the
  artifact's tolerance (1.25) — for incremental.json, BOTH the incr and the
  full brackets must pass;
- phase medians use bracket-valid NON-warmup reps (the artifacts' protocol
  marks the first rep per fresh JVM "untimed warmup"); an all-valid-reps
  sensitivity row is reported alongside since local[8] has a single valid
  timed rep in cc_tail.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "BENCH")

PHASES = ("superstep_sec", "kernel_sec", "compose_sec", "unattributed_sec")


def _load(name: str):
    p = os.path.join(BENCH, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _med(xs):
    return round(statistics.median(xs), 3) if xs else None


def cc_tail_analysis(tail: dict) -> dict:
    tol = tail["bracket_tolerance"]
    reps = {"2": [], "8": []}
    for run in tail["runs"]:
        for lvl, lst in run.items():
            for rep in lst:
                rep = dict(rep)
                rep["valid"] = rep["cal_bracket_ratio"] <= tol
                reps[lvl].append(rep)

    def medians(lvl, include_warmup):
        sel = [
            r for r in reps[lvl]
            if r["valid"] and (include_warmup or not r["warmup"])
        ]
        return {
            "n_reps": len(sel),
            **{p: _med([r[p] for r in sel]) for p in PHASES},
            "total_sec": _med(
                [sum(r[p] for p in PHASES) for r in sel]
            ),
        }, sel

    out = {"phase_medians": {}, "phase_medians_with_warmups": {}}
    for lvl in ("2", "8"):
        out["phase_medians"][lvl], _ = medians(lvl, include_warmup=False)
        out["phase_medians_with_warmups"][lvl], _ = medians(
            lvl, include_warmup=True
        )

    # PREREG rule 2a: predicted_eff = sum(phases@2) / (4 * sum(phases@8))
    for key in ("phase_medians", "phase_medians_with_warmups"):
        t2 = out[key]["2"]["total_sec"]
        t8 = out[key]["8"]["total_sec"]
        out[key]["predicted_eff_raw"] = round(t2 / (4 * t8), 3)

    # Normalized the same way as bench_scaling: run-matched — pair run i's
    # valid timed rep at each level, divide raw eff by the matched
    # calibration eff (min of before/after per level).
    matched = []
    for i, run in enumerate(tail["runs"]):
        pair = {}
        for lvl in ("2", "8"):
            timed = [
                r for r in run[lvl]
                if not r["warmup"] and r["cal_bracket_ratio"] <= tol
            ]
            if timed:
                pair[lvl] = timed[0]
        if len(pair) == 2:
            t2 = sum(pair["2"][p] for p in PHASES)
            t8 = sum(pair["8"][p] for p in PHASES)
            cal2 = min(pair["2"]["cal_before_sec"], pair["2"]["cal_after_sec"])
            cal8 = min(pair["8"]["cal_before_sec"], pair["8"]["cal_after_sec"])
            raw = t2 / (4 * t8)
            cal = (cal2 / cal8) / 4
            matched.append(
                {
                    "run": i,
                    "eff_raw": round(raw, 3),
                    "cal_eff": round(cal, 3),
                    "eff_normalized": round(raw / cal, 3),
                }
            )
    out["run_matched"] = matched
    out["predicted_eff_normalized_median"] = _med(
        [m["eff_normalized"] for m in matched]
    )

    # PREREG rule 2b: non-scaling phases level-invariant (ratio l2/l8 < 2)
    pm = out["phase_medians"]
    out["level_invariance"] = {
        "kernel_ratio_2_over_8": round(pm["2"]["kernel_sec"] / pm["8"]["kernel_sec"], 2),
        "unattributed_ratio_2_over_8": round(
            pm["2"]["unattributed_sec"] / pm["8"]["unattributed_sec"], 2
        ),
        "compose_ratio_2_over_8": round(
            pm["2"]["compose_sec"] / pm["8"]["compose_sec"], 2
        ),
        "pass": (
            pm["2"]["kernel_sec"] / pm["8"]["kernel_sec"] < 2
            and pm["2"]["unattributed_sec"] / pm["8"]["unattributed_sec"] < 2
        ),
    }

    # Tail share: what fraction of the wall the non-superstep phases are
    for lvl in ("2", "8"):
        p = pm[lvl]
        tail_sec = p["kernel_sec"] + p["compose_sec"] + p["unattributed_sec"]
        pm[lvl]["tail_sec"] = round(tail_sec, 3)
        pm[lvl]["tail_share"] = round(tail_sec / p["total_sec"], 4)

    # n_components free-metric parity (commit 369139a evidence)
    out["n_components_metric_matches_scan_all_reps"] = all(
        r["n_components_metric"] == r["n_components_scan"]
        for lvl in reps.values()
        for r in lvl
    )
    out["superstep_only_eff_raw"] = round(
        pm["2"]["superstep_sec"] / (4 * pm["8"]["superstep_sec"]), 3
    )
    return out


def incremental_analysis(inc: dict) -> dict:
    tol = inc["bracket_tolerance"]
    reps = {"2": [], "8": []}
    for run in inc["runs"]:
        for lvl, lst in run.items():
            for rep in lst:
                rep = dict(rep)
                rep["valid"] = (
                    rep["incr_bracket_ratio"] <= tol
                    and rep["full_bracket_ratio"] <= tol
                )
                reps[lvl].append(rep)

    out = {"levels": {}}
    all_reps = [r for lst in reps.values() for r in lst]
    out["parity_all_reps"] = all(r["parity"] for r in all_reps)
    out["n_reps_total"] = len(all_reps)
    for lvl in ("2", "8"):
        valid_timed = [r for r in reps[lvl] if r["valid"] and not r["warmup"]]
        out["levels"][lvl] = {
            "n_valid_timed": len(valid_timed),
            "incr_sec_median": _med([r["incr_sec"] for r in valid_timed]),
            "full_sec_median": _med([r["full_sec"] for r in valid_timed]),
            "speedup_median": _med([r["speedup"] for r in valid_timed]),
            "fold_faster_in_every_valid_rep": all(
                r["incr_sec"] < r["full_sec"] for r in valid_timed
            ),
            "fold_faster_in_every_rep_incl_invalid": all(
                r["incr_sec"] < r["full_sec"] for r in reps[lvl]
            ),
        }
    # fold's own N->4N scaling (reported, not gated)
    l2, l8 = out["levels"]["2"], out["levels"]["8"]
    if l2["incr_sec_median"] and l8["incr_sec_median"]:
        out["fold_scaling_eff_raw"] = round(
            l2["incr_sec_median"] / (4 * l8["incr_sec_median"]), 3
        )
    return out


def scaling_r5_analysis(sc: dict, predicted_norm) -> dict:
    summary = sc.get("summary", {})
    out = {"summary": summary, "n_runs": len(sc.get("runs", []))}
    cc = summary.get("cc_full", {})
    norm_med = cc.get("norm_median_valid")
    out["prereg_rule_1_gate_ge_0.8_all_workloads"] = all(
        (w.get("norm_median_valid") or 0) >= 0.8
        for w in summary.values()
    ) if summary else None
    out["prereg_rule_2_cc_full"] = {
        "normalized_median": norm_med,
        "meets_0.9_target": (norm_med or 0) >= 0.9,
        "floor_case_predicted_normalized": predicted_norm,
        "within_0.05_of_prediction": (
            abs((norm_med or 0) - predicted_norm) <= 0.05
            if norm_med is not None and predicted_norm is not None
            else None
        ),
    }
    return out


def main() -> None:
    result = {}
    tail = _load("cc_tail.json")
    inc = _load("incremental.json")
    sc = _load("scaling_r5.json")
    if tail:
        result["cc_tail"] = cc_tail_analysis(tail)
    if inc:
        result["incremental"] = incremental_analysis(inc)
    if sc and sc.get("runs"):
        result["scaling_r5"] = scaling_r5_analysis(
            sc, result.get("cc_tail", {}).get("predicted_eff_normalized_median")
        )
    out_path = os.path.join(BENCH, "analysis_r5.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print(f"\nwrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
