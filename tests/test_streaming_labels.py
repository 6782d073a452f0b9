"""Streaming label maintenance: component labels follow the edge stream.

`streaming_label_maintenance` folds every edge micro-batch into the label
table via plans/incremental; after each epoch the committed labels must be
bit-identical to a batch solve over all edges seen so far, and at-least-once
replay of a batch must be a no-op.
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from em_connected_components_spark.plans.connected_components import (
    connected_components,
)
from em_connected_components_spark.plans.incremental import (
    incremental_connected_components,
)
from em_connected_components_spark.streaming.events import (
    current_labels,
    streaming_label_maintenance,
)


def _rows(df):
    return sorted((r["node"], r["comp"]) for r in df.collect())


def _write_batches(spark, src_dir, batches):
    for i, pairs in enumerate(batches):
        spark.createDataFrame(
            [(int(u), int(v)) for u, v in pairs], "src long, dst long"
        ).coalesce(1).write.parquet(os.path.join(src_dir, f"b{i}"))


def _run_stream(spark, src_dir, labels_root, ckpt, **kw):
    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    q = streaming_label_maintenance(stream, labels_root, ckpt, **kw).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_labels_equal_batch_solve(spark):
    # batches bridge earlier components AND introduce brand-new nodes —
    # the exact shape of a crawl frontier feeding the engine
    batches = [
        [(1, 2), (3, 4), (10, 11)],
        [(2, 3), (20, 21)],          # merges {1,2}/{3,4}; new comp {20,21}
        [(11, 20), (30, 31), (4, 30)],
    ]
    with tempfile.TemporaryDirectory() as d:
        src_dir = os.path.join(d, "edges")
        os.makedirs(src_dir)
        _write_batches(spark, src_dir, batches)
        labels_root = os.path.join(d, "labels")
        _run_stream(spark, src_dir, labels_root, os.path.join(d, "ckpt"),
                    small_graph_threshold=0)
        got = current_labels(spark, labels_root)
        all_edges = [e for b in batches for e in b]
        want = connected_components(
            spark.createDataFrame(all_edges, "src long, dst long"),
            small_graph_threshold=0,
        )
        assert _rows(got) == _rows(want)
        # >1 epoch committed => the incremental path actually ran
        assert len(glob.glob(os.path.join(labels_root, "v*"))) >= 2


def test_streaming_labels_before_first_epoch_is_none(spark):
    with tempfile.TemporaryDirectory() as d:
        assert current_labels(spark, os.path.join(d, "labels")) is None


def test_streaming_labels_version_pruning(spark):
    batches = [[(i, i + 1)] for i in range(0, 8, 2)]  # 4 micro-batches
    with tempfile.TemporaryDirectory() as d:
        src_dir = os.path.join(d, "edges")
        os.makedirs(src_dir)
        _write_batches(spark, src_dir, batches)
        labels_root = os.path.join(d, "labels")
        _run_stream(spark, src_dir, labels_root, os.path.join(d, "ckpt"),
                    keep_versions=1, small_graph_threshold=0)
        vdirs = glob.glob(os.path.join(labels_root, "v*"))
        assert len(vdirs) <= 2  # latest + keep_versions=1
        got = current_labels(spark, labels_root)
        assert _rows(got) == [(0, 0), (1, 0), (2, 2), (3, 2),
                              (4, 4), (5, 4), (6, 6), (7, 6)]


def test_streaming_labels_replay_is_noop(spark):
    # at-least-once replay safety: folding a batch into labels that already
    # include it leaves them unchanged — replayed edges relabel to self-loops
    # (same comp) and replayed "new" nodes are already in the table, so the
    # delta graph is empty
    old = [(1, 2), (2, 3)]
    batch = [(3, 10), (50, 51)]  # a merge AND brand-new nodes
    union = connected_components(
        spark.createDataFrame(old + batch, "src long, dst long"),
        small_graph_threshold=0,
    )
    replayed = incremental_connected_components(
        union, spark.createDataFrame(batch, "src long, dst long")
    )
    assert _rows(replayed) == _rows(union)


def test_streaming_labels_committed_labels_are_star_maps(spark):
    batches = [[(1, 2)], [(2, 3), (7, 8)]]
    with tempfile.TemporaryDirectory() as d:
        src_dir = os.path.join(d, "edges")
        os.makedirs(src_dir)
        _write_batches(spark, src_dir, batches)
        labels_root = os.path.join(d, "labels")
        _run_stream(spark, src_dir, labels_root, os.path.join(d, "ckpt"),
                    small_graph_threshold=0)
        got = current_labels(spark, labels_root)
        comp_of = {r["node"]: r["comp"] for r in got.collect()}
        for n, c in comp_of.items():
            assert comp_of[c] == c  # comp = min member, roots self-labeled
        assert (
            got.groupBy("node").count().filter(F.col("count") > 1).count() == 0
        )
