"""Independent memory-bandwidth probe for the scaling protocol.

Runs a STREAM-triad-like numpy kernel (a = b + 2*c over ~400MB of float64)
in K concurrent processes and reports per-process and aggregate throughput.
If aggregate GB/s is ~flat from 2 to 8 processes, the box's DRAM is
saturated by 2 workers — the hardware ceiling that caps any shuffle-bound
Spark workload's measured in-box "scaling efficiency" regardless of engine
quality (a real N-vs-4N EXECUTOR cluster adds bandwidth with executors).

    python tools/probe_bandwidth.py            # probes K in {1, 2, 8}
Appends results to BENCH/bandwidth.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def triad(q, n_iters: int = 8, n: int = 25_000_000):
    import numpy as np

    b = np.random.default_rng(1).random(n)
    c = np.random.default_rng(2).random(n)
    a = np.empty_like(b)
    # warm
    np.add(b, 2.0 * c, out=a)
    t0 = time.time()
    for _ in range(n_iters):
        np.add(b, 2.0 * c, out=a)
    dt = time.time() - t0
    # triad moves 3 arrays of 8 bytes per element per iteration (+temp)
    gbs = n_iters * 3 * 8 * n / dt / 1e9
    q.put(gbs)


def run_level(k: int) -> dict:
    q = mp.Queue()
    procs = [mp.Process(target=triad, args=(q,)) for _ in range(k)]
    t0 = time.time()
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return {
        "procs": k,
        "per_proc_gbs": [round(v, 2) for v in vals],
        "aggregate_gbs": round(sum(vals), 2),
        "wall_sec": round(time.time() - t0, 2),
    }


def main() -> None:
    levels = [int(x) for x in (sys.argv[1:] or ["1", "2", "8"])]
    out = {"levels": [run_level(k) for k in levels]}
    agg = {r["procs"]: r["aggregate_gbs"] for r in out["levels"]}
    if 2 in agg and 8 in agg:
        out["aggregate_scaling_2_to_8"] = round(agg[8] / agg[2], 3)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "bandwidth.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
