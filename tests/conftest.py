"""Shared Spark fixture: one local session for the whole test run."""

from __future__ import annotations

import pytest

from em_connected_components_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="emccs-tests", master="local[4]", shuffle_partitions=8)
    yield s


def labels_to_partition(rows) -> dict[frozenset, None] | set:
    """Normalize (node, comp) rows to a set of frozenset components —
    partition comparison is the canonical equality (SURVEY.md §5.2.3)."""
    by_comp: dict[int, set] = {}
    for r in rows:
        by_comp.setdefault(r["comp"], set()).add(r["node"])
    return {frozenset(v) for v in by_comp.values()}


def python_union_find(edges: list[tuple[int, int]]) -> set:
    """Independent oracle: pure-Python union-find -> partition (the reference's
    own base case is the spec, cpp/streaming/basecase/BaseKruskal.h:73-111)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comps: dict[int, set] = {}
    for x in list(parent):
        comps.setdefault(find(x), set()).add(x)
    return {frozenset(v) for v in comps.values()}
