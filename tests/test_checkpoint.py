"""Resumability: a killed CC run resumes mid-Boruvka from the checkpoint and
produces the identical labeling (BASELINE.json north_rule: "resumable from
checkpoint with per-partition lineage + metrics")."""

from __future__ import annotations

import pytest

from em_connected_components_spark.checkpoint import RoundCheckpointer
from em_connected_components_spark.operators.normalize import canonicalize
from em_connected_components_spark.plans.connected_components import (
    CCMetrics,
    connected_components,
)
from em_connected_components_spark.sources import generators as gen

from .conftest import labels_to_partition


def _graph(spark):
    # multi-round graph: gilbert needs >1 Boruvka round at this density
    return canonicalize(gen.gilbert(spark, n=3000, avg_degree=1.2, seed=7))


def test_kill_and_resume_identical_labels(spark, tmp_path):
    edges = _graph(spark)

    # reference run: no checkpointing, fully distributed
    ref = connected_components(
        edges, small_graph_threshold=0, jump_local_threshold=0,
        pre_canonicalized=True,
    )
    ref_rows = sorted((r["node"], r["comp"]) for r in ref.collect())

    # "killed" run: stop after the first superstep (max_rounds=1 simulates
    # the job dying mid-Boruvka; round 0 is committed to the manifest)
    root = str(tmp_path / "ckpt")
    ck = RoundCheckpointer(spark, root)
    connected_components(
        edges, small_graph_threshold=0, jump_local_threshold=0,
        pre_canonicalized=True, checkpointer=ck, max_rounds=1,
    )
    assert ck.resume() is not None, "round 0 must be committed"

    # resumed run: fresh checkpointer object on the same root
    ck2 = RoundCheckpointer(spark, root)
    metrics = CCMetrics()
    resumed = connected_components(
        edges, small_graph_threshold=0, jump_local_threshold=0,
        pre_canonicalized=True, checkpointer=ck2, metrics=metrics,
    )
    res_rows = sorted((r["node"], r["comp"]) for r in resumed.collect())

    # identical labels (not just identical partition): min-member labeling is
    # canonical, so resume must reproduce it exactly
    assert res_rows == ref_rows
    # the resumed run actually skipped round 0
    assert metrics.rounds and metrics.rounds[0]["round"] >= 1

    # final() re-reads the persisted result
    final = ck2.final()
    assert final is not None
    assert sorted((r["node"], r["comp"]) for r in final.collect()) == ref_rows


def test_checkpointed_equals_uncheckpointed_partition(spark, tmp_path):
    edges = _graph(spark)
    ck = RoundCheckpointer(spark, str(tmp_path / "ckpt2"))
    with_ck = connected_components(
        edges, pre_canonicalized=True, checkpointer=ck
    )
    without = connected_components(edges, pre_canonicalized=True)
    assert labels_to_partition(with_ck.collect()) == labels_to_partition(
        without.collect()
    )
