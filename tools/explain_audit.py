"""Physical-plan audit: .explain("formatted") for the engine's key operators,
with automated checks that the plan is the one we want at scale.

Checks per plan (SURVEY.md §4.5, task guidance):
* parquet scans carry PushedFilters / pruned ReadSchema where expected;
* WholeStageCodegen covers the expression pipeline (no row-at-a-time Python
  in the hot path);
* broadcast joins where the small side is bounded; sort-merge joins with AQE
  elsewhere;
* groupBy aggregations show partial aggregation (map-side combine).

Writes EXPLAIN.md at the repo root. Run:  python tools/explain_audit.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    from em_connected_components_spark.session import get_spark
    from em_connected_components_spark.operators.joins import contract
    from em_connected_components_spark.operators.normalize import canonicalize
    from em_connected_components_spark.plans.connected_components import (
        _hook_parents,
    )
    from em_connected_components_spark.plans.triangles import triangles_count
    from em_connected_components_spark.functions import dedup_docs as dd
    from em_connected_components_spark.sources import tables as tbl

    spark = get_spark(app_name="explain-audit", master="local[4]",
                      shuffle_partitions=8)

    sections: list[tuple[str, str, list[str], list[str], str]] = []

    def audit(
        name: str, df, want: list[str], note: str = "",
        forbid: list[str] | None = None,
    ) -> None:
        sections.append((name, plan_text(df), want, forbid or [], note))

    # 1. projection+filter pushdown into the parquet scan
    li = tbl.load_table(spark, SF, "lineitem")
    pushed = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    audit(
        "scan pushdown (filter + column pruning)",
        pushed,
        ["PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,",
         "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"],
        "filter reaches the parquet reader; scan reads exactly 2 of 16 columns",
    )

    # 2. canonicalize: codegen'd project/filter + one exchange for distinct
    edges = tbl.edges_lineitem(spark, SF)
    audit(
        "canonicalize (orient + self-loop filter + distinct)",
        canonicalize(edges),
        ["HashAggregate", "Arguments: hashpartitioning"],
        "orient + self-loop filter pipeline into the scan projection; dedup "
        "is partial HashAggregate -> ONE hash-partitioned exchange -> final "
        "HashAggregate (map-side combine)",
    )

    # 3. hook: symmetrize + groupBy(min) — partial agg before the exchange
    audit(
        "boruvka hook (symmetrize + min-neighbor agg)",
        _hook_parents(canonicalize(edges)),
        ["HashAggregate", "Arguments: hashpartitioning", "Union"],
        "partial HashAggregate on each union branch before the shuffle — "
        "map-side combine bounds shuffle volume by distinct nodes per task",
    )

    # 4. contract with broadcast labels — two BroadcastHashJoins, no edge shuffle
    labels = spark.range(100).select(
        F.col("id").alias("node"), F.col("id").alias("comp")
    )
    audit(
        "contract with broadcast labels (semi-external switch)",
        contract(canonicalize(edges), labels, broadcast_labels=True),
        ["BroadcastHashJoin", "BroadcastExchange"],
        "label side broadcast: the big edge table is never shuffled for the "
        "relabel joins (late rounds / small label maps)",
    )

    # 5. contract without broadcast — AQE sort-merge path. At sf0.01 every
    # label table fits the broadcast threshold (and broadcast IS the right
    # plan there); disable the thresholds to surface the large-label plan
    # that early rounds at 100 TB would take.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    audit(
        "contract with large labels (AQE sort-merge path)",
        contract(canonicalize(edges), canonicalize(edges).select(
            F.col("src").alias("node"), F.col("src").alias("comp")
        ).distinct()),
        ["AdaptiveSparkPlan", "SortMergeJoin"],
        "early rounds: labels ~ nodes ~ edges, so relabel is a shuffled "
        "sort-merge join; AQE re-plans (incl. skew split) at runtime "
        "(broadcast thresholds disabled here to model the at-scale shape). "
        "The driver's forced-broadcast hint is byte-gated "
        "(tuning.broadcast_row_bound), so above the memory-derived bound NO "
        "BroadcastExchange may appear in the relabel plan",
        forbid=["BroadcastExchange"],
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                   str(64 * 1024 * 1024))

    # 6. triangles: degree-ordered wedges + semi-join
    audit(
        "triangle counting (wedge join + left-semi close)",
        triangles_count(tbl.edges_tripartite(spark, SF)),
        ["LeftSemi", "AdaptiveSparkPlan"],
        "the closing-edge check is a LEFT SEMI join (no row multiplication); "
        "degree orientation bounds wedge fanout by sqrt(m)",
    )

    # 7. minhash signatures: shingle explode + groupBy(min...) partial agg
    docs = tbl.load_table(spark, SF, "documents")
    audit(
        "minhash signatures (explode + per-doc min-hash aggs)",
        dd.minhash_signatures(dd.shingles(docs, n=3), num_hashes=4),
        ["Generate", "partial_min"],
        "shingling is Generate (JVM-side explode, no Python); signatures are "
        "4 min() aggregates computed in ONE partial-agg pass before the "
        "exchange (SortAggregate: var-length string buffers), not 4 jobs",
    )

    # 8. IVF build: centroid pick is a distributed TakeOrdered, not a global
    # sort/window funneling the corpus through one task (round-1 finding)
    from em_connected_components_spark.functions import similarity as sim

    emb = tbl.load_table(spark, SF, "embeddings")
    cents = sim.train_centroids_sample(emb, n_lists=16)
    audit(
        "ivf centroid training (distributed TakeOrdered)",
        cents,
        ["TakeOrderedAndProject"],
        "per-partition local top-n + merge of n_lists*n_partitions rows; the "
        "only single-partition step operates on the n_lists survivors, never "
        "the corpus",
    )

    # 9. IVF corpus assignment: pure per-row expression — NO exchange at all
    audit(
        "ivf corpus assignment (expression argmax, zero shuffle)",
        sim.ivf_assign(emb, cents, nprobe=1),
        ["Generate"],
        "centroids inlined as literals; nearest-list pick is array_sort + "
        "posexplode inside the scan projection — the corpus is never "
        "shuffled, joined, or windowed for assignment",
        forbid=["Exchange", "Window"],
    )

    # 10. bucketed catalog read: hook-shaped agg on src starts with ZERO
    # exchange — the on-disk HashPartitioning(src) layout feeds the groupBy
    # directly (the 100 TB entry point for iterative CC/PageRank)
    from em_connected_components_spark.sources.catalog import EdgeCatalog

    btable = "emcc_audit_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {btable}")
    bcat = EdgeCatalog(spark, "/tmp/emcc_audit_bucketed", buckets=4)
    bcat.write_bucketed(canonicalize(edges), btable)
    audit(
        "bucketed catalog scan (exchange-free src aggregation)",
        bcat.read_bucketed(btable).groupBy("src").agg(F.min("dst")),
        ["Bucketed: true"],
        "spark.table() read carries the bucket layout: groupBy(src) plans "
        "partial+final HashAggregate with NO Exchange — streamed appends "
        "(streaming_edge_ingest catalog sink) keep this property",
        forbid=["Exchange"],
    )

    # 11. incremental CC: the n-row label table is scanned, never shuffled —
    # every join against it is an explicit-hint broadcast (semi-join slice,
    # relabels, anti, compose). Auto-broadcast disabled so only the engine's
    # own byte-gated hints can produce a broadcast: any SortMergeJoin here
    # would mean a full label shuffle leaked back in.
    from em_connected_components_spark.plans.incremental import (
        incremental_connected_components,
    )

    lab_dir = "/tmp/emcc_audit_labels"
    spark.range(0, 200_000).select(
        F.col("id").alias("node"),
        (F.col("id") - F.col("id") % 2).alias("comp"),
    ).write.mode("overwrite").parquet(lab_dir)
    big_labels = spark.read.parquet(lab_dir)
    delta = spark.createDataFrame(
        [(4, 11), (200_001, 200_003), (8, 200_001)], "src long, dst long"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # The inner delta solve goes down the single-task kernel path (default
    # small_graph_threshold — a streaming micro-batch always fits), so the
    # kernel contributes NO joins and every join in the composed plan is one
    # of the five label-touching ones: slice carve (LeftSemi), fresh-node
    # complement (LeftAnti), two relabels, compose. Forbidding BOTH shuffle
    # join kinds (the session prefers ShuffledHash over SortMerge, so a
    # leaked label shuffle would surface as either) machine-checks the
    # incremental plan's central claim (incremental.py:64-78): below the
    # byte gate the n-row label table is scanned, never exchanged.
    audit(
        "incremental CC (label table scanned, never shuffled)",
        incremental_connected_components(big_labels, delta),
        ["BroadcastHashJoin", "LeftSemi", "LeftAnti"],
        "a crawl-delta fold touches the n-row star map only through "
        "broadcast-built joins (slice semi-join, fresh-node anti, relabels, "
        "compose); the only exchanges are on the batch-bounded delta side. "
        "Auto-broadcast is disabled here, so every broadcast in the plan is "
        "the engine's own byte-gated hint; with the inner solve on the "
        "kernel path, ANY shuffle join in this plan would be a label-side "
        "leak — both kinds are forbidden",
        forbid=["SortMergeJoin", "ShuffledHashJoin"],
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                   str(64 * 1024 * 1024))

    out = ["# EXPLAIN audit — physical plans of the key operators",
           "",
           "Generated by `python tools/explain_audit.py` "
           f"on `{SF}`. Each section: the plan property we require at 100 TB "
           "scale, the automated check, and the formatted plan.",
           ""]
    failures = 0
    for name, text, want, forbid, note in sections:
        missing = [w for w in want if w not in text]
        present = [w for w in forbid if w in text]
        bad = bool(missing or present)
        status = "PASS" if not bad else (
            f"FAIL (missing: {missing}, forbidden-present: {present})"
        )
        if bad:
            failures += 1
        out.append(f"## {name} — {status}")
        out.append("")
        if note:
            out.append(f"*{note}*")
            out.append("")
        out.append("Required plan fragments: " + ", ".join(f"`{w}`" for w in want))
        if forbid:
            out.append("Forbidden plan fragments: "
                       + ", ".join(f"`{w}`" for w in forbid))
        out.append("")
        out.append("```")
        # The CHECKS above always run on the FULL plan text; only the
        # rendering is capped — a deep composed plan (incremental CC inlines
        # the whole delta solve) emits thousands of per-node detail lines
        # that would drown the other sections. Keep the operator tree plus
        # the first detail lines, and say exactly how much was elided.
        lines = text.rstrip().split("\n")
        cap = 400
        if len(lines) > cap:
            lines = lines[:cap] + [
                f"... [{len(lines) - cap} node-detail lines elided; the "
                "PASS/FAIL fragment checks ran on the full text]"
            ]
        out.append("\n".join(lines))
        out.append("```")
        out.append("")

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "EXPLAIN.md"), "w") as f:
        f.write("\n".join(out))
    print(f"EXPLAIN.md written; {len(sections)} plans, {failures} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
