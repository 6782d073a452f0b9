"""Decremental CC: deleting edges via component-bounded re-solve must be
bit-identical to a full recompute over (old MINUS removed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from em_connected_components_spark.operators.normalize import canonicalize
from em_connected_components_spark.plans.connected_components import (
    connected_components,
)
from em_connected_components_spark.plans.decremental import (
    decremental_connected_components,
)
from em_connected_components_spark.sources import generators as gen


def _rows(df):
    return sorted((r["node"], r["comp"]) for r in df.collect())


def _solve(spark, edges):
    return connected_components(edges, pre_canonicalized=True,
                                small_graph_threshold=0)


def _check(spark, edges, removed):
    labels = _solve(spark, edges)
    got = decremental_connected_components(labels, edges, removed,
                                           pre_canonicalized=True,
                                           small_graph_threshold=0)
    want = _solve(spark, edges.join(removed, on=["src", "dst"],
                                    how="left_anti"))
    assert _rows(got) == _rows(want)


def test_bridge_removal_splits_component(spark):
    # path 1-2-3-4-5-6: removing (3,4) splits one component into two
    edges = canonicalize(gen.path(spark, 6))
    removed = spark.createDataFrame([(3, 4)], "src long, dst long")
    _check(spark, edges, removed)


def test_removal_isolates_nodes(spark):
    # star 1-{2,3,4}: removing all edges of 1 drops every node from the map
    edges = spark.createDataFrame([(1, 2), (1, 3), (1, 4)],
                                  "src long, dst long")
    removed = edges
    labels = _solve(spark, edges)
    got = decremental_connected_components(labels, edges, removed,
                                           pre_canonicalized=True,
                                           small_graph_threshold=0)
    assert got.count() == 0


def test_untouched_components_pass_through(spark):
    # two components; removal only touches one — the other's labels must be
    # byte-identical (same rows, not merely same partition)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12)], "src long, dst long"
    )
    removed = spark.createDataFrame([(2, 3)], "src long, dst long")
    _check(spark, edges, removed)


def test_removing_nonexistent_edges_is_noop(spark):
    edges = canonicalize(gen.gilbert(spark, n=200, avg_degree=1.5, seed=5))
    removed = spark.createDataFrame([(100001, 100002)], "src long, dst long")
    labels = _solve(spark, edges)
    got = decremental_connected_components(labels, edges, removed,
                                           pre_canonicalized=True,
                                           small_graph_threshold=0)
    assert _rows(got) == _rows(labels)


def test_empty_removal_returns_labels(spark):
    edges = canonicalize(gen.gilbert(spark, n=100, avg_degree=1.5, seed=2))
    labels = _solve(spark, edges)
    empty = spark.createDataFrame([], "src long, dst long")
    got = decremental_connected_components(labels, edges, empty,
                                           pre_canonicalized=True)
    assert _rows(got) == _rows(labels)


@pytest.mark.parametrize("seed", [3, 9])
def test_random_removals_vs_full_recompute(spark, seed):
    edges = canonicalize(gen.gilbert(spark, n=500, avg_degree=2.0, seed=seed))
    # deterministic ~1/5 of edges removed
    removed = edges.filter(F.pmod(F.col("src") + F.col("dst"), F.lit(5)) == 0)
    _check(spark, edges, removed)


def test_shuffled_fallback_path_agrees(spark):
    # force the above-gate path (affected node set "too big" to broadcast)
    # by shrinking the byte gate to zero via the explicit conf pin
    edges = canonicalize(gen.gilbert(spark, n=300, avg_degree=2.0, seed=4))
    removed = edges.limit(20)
    prev = spark.conf.get("spark.emcc.broadcast.maxRows", None)
    spark.conf.set("spark.emcc.broadcast.maxRows", "1")
    try:
        _check(spark, edges, removed)
    finally:
        if prev is None:
            spark.conf.unset("spark.emcc.broadcast.maxRows")
        else:
            spark.conf.set("spark.emcc.broadcast.maxRows", prev)
