"""Unit tests for the vectorized CC kernel (operators/numpy_cc) — the
executor-side base case (reference: cpp/streaming/basecase/BaseKruskal.h:73-111).
Pure numpy, no SparkSession."""

from __future__ import annotations

import numpy as np

from em_connected_components_spark.operators.numpy_cc import (
    jump_to_roots_numpy,
    solve_cc_numpy,
)

from .conftest import python_union_find


def _partition_from(nodes, comp):
    groups = {}
    for n, c in zip(nodes.tolist(), comp.tolist()):
        groups.setdefault(c, set()).add(n)
    return {frozenset(g) for g in groups.values()}


def test_solve_cc_empty():
    nodes, comp = solve_cc_numpy(np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    assert len(nodes) == 0


def test_solve_cc_path_and_min_labels():
    # path 1-2-3-...-10: one component, min member 1
    u = np.arange(1, 10)
    v = np.arange(2, 11)
    nodes, comp = solve_cc_numpy(u, v)
    assert nodes.tolist() == list(range(1, 11))
    assert set(comp.tolist()) == {1}


def test_solve_cc_self_loops_and_duplicates():
    u = np.array([5, 5, 5, 7, 7, 100])
    v = np.array([5, 6, 6, 8, 8, 100])
    nodes, comp = solve_cc_numpy(u, v)
    got = dict(zip(nodes.tolist(), comp.tolist()))
    assert got == {5: 5, 6: 5, 7: 7, 8: 7, 100: 100}


def test_solve_cc_random_vs_union_find():
    rng = np.random.default_rng(7)
    # sparse random graph over sparse (non-dense) 64-bit-ish ids
    ids = rng.choice(np.arange(1, 10**9, dtype=np.int64), size=2000, replace=False)
    u = ids[rng.integers(0, len(ids), size=3000)]
    v = ids[rng.integers(0, len(ids), size=3000)]
    nodes, comp = solve_cc_numpy(u, v)
    expected = python_union_find(list(zip(u.tolist(), v.tolist())))
    assert _partition_from(nodes, comp) == expected
    # labels are min members
    for n, c in zip(nodes.tolist(), comp.tolist()):
        assert c <= n


def test_jump_to_roots_long_chain():
    # parent chain 100 <- 99 <- ... <- 1 given as (node, parent) pairs
    node = np.arange(2, 101, dtype=np.int64)
    parent = node - 1
    node = np.concatenate([node, [1]])
    parent = np.concatenate([parent, [1]])
    ns, roots = jump_to_roots_numpy(node, parent)
    assert ns.tolist() == sorted(node.tolist())
    assert set(roots.tolist()) == {1}
