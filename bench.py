"""Benchmark harness — headline queries at sf0.1 (driver contract).

Runs on local[$SPARK_GRAFT_CPUS] against $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "detail": {...}}

Headline set mirrors BASELINE.json's metric definition: the Boruvka CC
superstep throughput (edges/sec, reported in "detail") plus the other
algorithm/pipeline heads. Scaling-efficiency evidence (two parallelism
levels) is produced by tools/bench_scaling.py and recorded in
BENCH/BASELINE.md.

Estimator (round-4 hardening, ADVICE r3): 3 timed reps per query with the
cache cleared between reps; the reported figure is the MIN (the standard
contention-free estimator — this VM shows 2-4x noisy-neighbor swings on
identical runs, BENCH/machine_drift.json). Every rep wall is recorded
(rep_walls), per-query detail is captured from the SAME rep the reported
wall came from, queries whose rep spread exceeds 2x are flagged
machine-noise-suspect, and per-rep run totals (sum of rep i across queries)
are emitted so cross-round total comparisons can be like-for-like: "value"
remains the sum of per-query minima — a composite no single run achieved —
and "rep_totals" carries the actual run walls.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
NOISE_SPREAD = 2.0  # max/min rep ratio above which a query is flagged


def main() -> None:
    from pyspark.sql import functions as F

    from em_connected_components_spark.session import get_spark, warmup
    from em_connected_components_spark.functions import dedup_docs as dd
    from em_connected_components_spark.functions import similarity as sim
    from em_connected_components_spark.plans.connected_components import (
        connected_components_metrics,
    )
    from em_connected_components_spark.plans.label_propagation import (
        label_propagation,
    )
    from em_connected_components_spark.plans.pagerank import pagerank
    from em_connected_components_spark.plans.triangles import triangles_count
    from em_connected_components_spark.sources import generators as gen
    from em_connected_components_spark.sources import tables as tbl
    from em_connected_components_spark.operators.normalize import canonicalize

    spark = get_spark(app_name="emccs-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    warmup(spark)

    # Untimed pilots: run the heavy expression pipelines once at toy scale so
    # whole-stage-codegen compilation + JVM JIT of their generated classes
    # happen before the clock starts (round-1 A/B: the first minhash/knn
    # execution in a fresh JVM pays a 2-3x first-touch penalty that no
    # subsequent run pays — the benchmark measures steady-state throughput,
    # not JIT warmup). Also touch each parquet input once for the OS page
    # cache, mirroring any warmed-cache environment.
    t0 = time.time()
    pilot_docs = tbl.load_table(spark, SF_DIR, "documents").limit(200)
    dd.minhash_near_duplicates(pilot_docs, threshold=0.2).count()
    pilot_emb = tbl.load_table(spark, SF_DIR, "embeddings").limit(500)
    sim.cosine_topk_bruteforce(
        pilot_emb, pilot_emb.filter(F.col("vec_id") < 5), k=3
    ).count()
    for t in ("lineitem", "customer", "documents", "embeddings"):
        tbl.load_table(spark, SF_DIR, t).count()
    print(f"[bench] untimed pilots+preload: {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)

    timings: dict[str, float] = {}
    reps_detail: dict[str, list[float]] = {}
    detail: dict[str, object] = {}
    noise_suspect: list[str] = []

    def bench(name: str, fn) -> None:
        """fn() runs the query and returns its detail payload (or None).
        Detail is kept from the rep that produced the reported (min) wall —
        never from a later rep (ADVICE r3: a last-rep detail can disagree
        with the headline seconds it sits next to)."""
        walls: list[float] = []
        details: list[object] = []
        for _ in range(REPS):
            # same honesty guard as tools/bench_scaling.py: drop any cache a
            # previous rep left behind so a structurally-identical plan can't
            # silently ride it (Spark's cache manager matches by plan)
            spark.catalog.clearCache()
            t0 = time.time()
            d = fn()
            walls.append(round(time.time() - t0, 3))
            details.append(d)
        best = min(range(len(walls)), key=lambda i: walls[i])
        timings[name] = walls[best]
        reps_detail[name] = walls
        if details[best] is not None:
            detail[name] = details[best]
        if max(walls) / max(min(walls), 1e-9) > NOISE_SPREAD:
            noise_suspect.append(name)
        print(f"[bench] {name}: {timings[name]}s (reps: {walls})",
              file=sys.stderr, flush=True)

    # 1. connected components on the sf lineitem bipartite graph
    def run_cc():
        edges = tbl.edges_lineitem(spark, SF_DIR)
        # force the distributed superstep path (the default 1M-edge collect
        # threshold would solve sf0.1 on the driver; the headline metric is
        # per-superstep throughput)
        labels, metrics = connected_components_metrics(
            edges, small_graph_threshold=100_000
        )
        # exact count tracked free by the solve (r5); labels themselves are
        # already fully materialized by the solve's eager checkpoint, so no
        # separate consume action is needed — fall back to the scan only if
        # the metric is untracked
        n_comp = metrics.n_components
        if n_comp is None:
            n_comp = labels.select(F.countDistinct("comp")).collect()[0][0]
        supersteps = [
            r for r in metrics.rounds if r["kind"] == "boruvka_superstep"
        ]
        return {
            "n_components": n_comp,
            "rounds_to_convergence": len(metrics.rounds),
            "superstep_edges_per_sec": [
                round(r["edges_per_sec"], 1) for r in supersteps
            ],
            "total_edges": supersteps[0]["m"] if supersteps else 0,
        }

    bench("cc_lineitem", run_cc)

    # 2. connected components on a skewed rMAT graph (hub-skew stress)
    def run_cc_rmat():
        edges = canonicalize(gen.rmat(spark, scale=19, edge_factor=8, seed=42))
        edges = edges.localCheckpoint(eager=True)  # exclude gen cost from alg
        t0 = time.time()
        labels, metrics = connected_components_metrics(
            edges, pre_canonicalized=True, small_graph_threshold=100_000
        )
        n_comp = metrics.n_components
        if n_comp is None:
            n_comp = labels.select(F.countDistinct("comp")).collect()[0][0]
        supersteps = [
            r for r in metrics.rounds if r["kind"] == "boruvka_superstep"
        ]
        return {
            "alg_sec": round(time.time() - t0, 3),
            "n_components": n_comp,
            "rounds_to_convergence": len(metrics.rounds),
            "superstep_edges_per_sec": [
                round(r["edges_per_sec"], 1) for r in supersteps
            ],
        }

    bench("cc_rmat_s19", run_cc_rmat)

    # 3. PageRank, 10 fixed iterations on the lineitem graph
    def run_pr():
        edges = tbl.edges_lineitem(spark, SF_DIR)
        pr = pagerank(edges, max_iters=10, check_every=10, tol=0.0)
        pr.agg(F.sum("rank")).collect()

    bench("pagerank10_lineitem", run_pr)

    # 4. label propagation to convergence on the customer-nation stars
    def run_lp():
        edges = tbl.edges_customer_nation(spark, SF_DIR)
        lp = label_propagation(edges)
        lp.agg(F.countDistinct("label")).collect()

    bench("label_prop_customer", run_lp)

    # 5. triangle counting on the tripartite lineitem graph
    def run_tri():
        return triangles_count(
            tbl.edges_tripartite(spark, SF_DIR)
        ).collect()[0]["n_triangles"]

    bench("triangles_lineitem", run_tri)

    # 6. minhash near-dup pipeline over documents
    def run_dedup():
        docs = tbl.load_table(spark, SF_DIR, "documents")
        return dd.minhash_near_duplicates(docs, threshold=0.2).count()

    bench("minhash_dedup_docs", run_dedup)

    # 7. brute-force cosine top-k over embeddings
    def run_knn():
        emb = tbl.load_table(spark, SF_DIR, "embeddings")
        q = emb.filter(F.col("vec_id") < 20)
        sim.cosine_topk_bruteforce(emb, q, k=10).count()

    bench("knn_bruteforce", run_knn)

    # 8. TPC-H Q1-style aggregation (scan/agg baseline)
    def run_q1():
        li = tbl.load_table(spark, SF_DIR, "lineitem")
        li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.sum("l_extendedprice"), F.count("*")
        ).collect()

    bench("tpch_q1", run_q1)

    total = round(sum(timings.values()), 3)
    rep_totals = [
        round(sum(reps_detail[q][i] for q in timings), 3)
        for i in range(REPS)
    ]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "cpus": CPUS,
                "estimator": f"min of {REPS} timed reps per query "
                             "(cache cleared between reps); 'value' is the "
                             "sum of per-query minima — a composite no "
                             "single run achieved; 'rep_totals' holds the "
                             "actual per-rep run totals for like-for-like "
                             "cross-round comparison",
                "machine_note": "absolute walls are machine-dependent: "
                                "BENCH/machine_drift.json records a "
                                "controlled same-day A/B showing the "
                                "round-3 VM instance ~3x slower and far "
                                "noisier than the one that produced "
                                "BENCH_r02 (round-2 code re-measured "
                                "then: 112s vs 36.8s recorded)",
                "rep_walls": reps_detail,
                "rep_totals": rep_totals,
                "noise_suspect": sorted(noise_suspect),
                "noise_rule": f"rep spread (max/min) > {NOISE_SPREAD}x",
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
