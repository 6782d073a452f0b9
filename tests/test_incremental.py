"""Incremental CC: delta-batch update equals full recompute, bit-for-bit.

The exactness claim in plans/incremental.py is stronger than partition
equality — min-member labels compose exactly — so these tests compare the
(node, comp) ROWS against a fresh full solve of the union graph, not just
the partition.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from em_connected_components_spark.plans.connected_components import (
    connected_components,
)
from em_connected_components_spark.plans.incremental import (
    incremental_connected_components,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "src long, dst long"
    )


def _rows(df):
    return sorted((r["node"], r["comp"]) for r in df.collect())


def _full(spark, old, new):
    return connected_components(
        _df(spark, old).unionAll(_df(spark, new)), small_graph_threshold=0
    )


@pytest.mark.parametrize("seed", [1, 7])
def test_incremental_equals_full_random(spark, seed):
    rng = random.Random(seed)
    old = [(rng.randint(1, 120), rng.randint(1, 120)) for _ in range(150)]
    # delta: merges across old comps + a brand-new node range (200..260)
    new = [(rng.randint(1, 260), rng.randint(1, 260)) for _ in range(60)]
    base = connected_components(_df(spark, old), small_graph_threshold=0)
    inc = incremental_connected_components(base, _df(spark, new))
    assert _rows(inc) == _rows(_full(spark, old, new))


def test_incremental_merge_two_old_components(spark):
    old = [(1, 2), (2, 3), (10, 11)]
    new = [(3, 10)]  # bridges comp{1,2,3} and comp{10,11}
    base = connected_components(_df(spark, old), small_graph_threshold=0)
    inc = incremental_connected_components(base, _df(spark, new))
    assert _rows(inc) == [(1, 1), (2, 1), (3, 1), (10, 1), (11, 1)]


def test_incremental_only_new_nodes(spark):
    old = [(1, 2)]
    new = [(100, 101), (101, 102)]
    base = connected_components(_df(spark, old), small_graph_threshold=0)
    inc = incremental_connected_components(base, _df(spark, new))
    assert _rows(inc) == [(1, 1), (2, 1), (100, 100), (101, 100), (102, 100)]


def test_incremental_redundant_delta_is_noop(spark):
    # every delta edge lands inside one old component -> relabeled delta is
    # all self-loops, inner CC sees an empty graph, labels are unchanged
    old = [(1, 2), (2, 3), (3, 4)]
    new = [(1, 4), (2, 3)]
    base = connected_components(_df(spark, old), small_graph_threshold=0)
    inc = incremental_connected_components(base, _df(spark, new))
    assert _rows(inc) == _rows(base)


def test_incremental_chained_batches(spark):
    # three consecutive deltas folded one at a time == one full solve
    rng = random.Random(99)
    batches = [
        [(rng.randint(1, 80 * (i + 1)), rng.randint(1, 80 * (i + 1)))
         for _ in range(40)]
        for i in range(4)
    ]
    labels = connected_components(_df(spark, batches[0]), small_graph_threshold=0)
    for b in batches[1:]:
        labels = incremental_connected_components(labels, _df(spark, b))
    all_edges = [e for b in batches for e in b]
    assert _rows(labels) == _rows(
        connected_components(_df(spark, all_edges), small_graph_threshold=0)
    )


def test_incremental_broadcast_labels_agrees(spark):
    old = [(i, i + 1) for i in range(1, 40, 2)]
    new = [(2, 5), (60, 61), (39, 60)]
    base = connected_components(_df(spark, old), small_graph_threshold=0)
    a = incremental_connected_components(base, _df(spark, new))
    b = incremental_connected_components(
        base, _df(spark, new), broadcast_labels=True
    )
    assert _rows(a) == _rows(b) == _rows(_full(spark, old, new))


def test_incremental_shuffled_fallback_agrees(spark):
    # force the byte gate shut (spark.emcc.broadcast.maxRows=1): the delta
    # node set no longer clears the broadcast bound, so the relabels take
    # the shuffled full-table path — results must be identical
    old = [(1, 2), (2, 3), (10, 11)]
    new = [(3, 10), (50, 51)]
    base = connected_components(_df(spark, old), small_graph_threshold=0)
    spark.conf.set("spark.emcc.broadcast.maxRows", "1")
    try:
        inc = incremental_connected_components(base, _df(spark, new))
        rows = _rows(inc)  # materialize under the forced gate
    finally:
        spark.conf.unset("spark.emcc.broadcast.maxRows")
    assert rows == _rows(_full(spark, old, new))


def test_incremental_result_is_star_map(spark):
    old = [(1, 2), (5, 6)]
    new = [(2, 5), (7, 8)]
    base = connected_components(_df(spark, old), small_graph_threshold=0)
    inc = incremental_connected_components(base, _df(spark, new))
    # contains_stars_only (cpp/vector-checks.hpp:19-46): every comp is a
    # member of itself and comps never appear as non-root nodes
    rows = inc.collect()
    comp_of = {r["node"]: r["comp"] for r in rows}
    for n, c in comp_of.items():
        assert comp_of[c] == c
    assert inc.groupBy("node").count().filter(F.col("count") > 1).count() == 0
