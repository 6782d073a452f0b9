"""Property-based tests (hypothesis): the CC engine against the union-find
oracle on arbitrary random edge lists, plus operator invariants.

Complements the known-answer families (test_cc.py) with adversarial shapes —
self-loops, duplicates, both orientations, sparse 64-bit ids — the way the
reference's stream-checks assert invariants on every run
(cpp/stream-checks.hpp:23-68)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from em_connected_components_spark.operators.joins import canonical_min_labels
from em_connected_components_spark.operators.normalize import canonicalize
from em_connected_components_spark.plans.connected_components import (
    connected_components,
)

from .conftest import labels_to_partition, python_union_find

node_ids = st.integers(min_value=1, max_value=1 << 40)
edge_lists = st.lists(
    st.tuples(node_ids, node_ids), min_size=1, max_size=120
)

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,  # session is process-wide
    ],
)


@given(edges=edge_lists)
@_settings
def test_cc_partition_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, schema="src long, dst long")
    labels = connected_components(df, small_graph_threshold=0)
    rows = labels.collect()
    real = [(u, v) for u, v in edges if u != v]
    if not real:
        # all self-loops: canonicalize drops every edge -> empty labeling
        assert rows == []
        return
    # nodes incident only to self-loops are dropped by canonicalize —
    # compare over the non-degenerate node set
    want = python_union_find(real)
    assert labels_to_partition(rows) == want
    # canonical labels: every comp is its component's minimum
    for comp, members in (
        (c, ms) for c, ms in _group(rows).items()
    ):
        assert comp == min(members)


def _group(rows):
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r["comp"], set()).add(r["node"])
    return out


@given(edges=edge_lists)
@_settings
def test_canonicalize_idempotent_and_invariant(spark, edges):
    df = spark.createDataFrame(edges, schema="src long, dst long")
    c1 = canonicalize(df)
    rows = c1.collect()
    # invariants: oriented, no self-loops, no duplicates
    assert all(r["src"] < r["dst"] for r in rows)
    assert len(rows) == len({(r["src"], r["dst"]) for r in rows})
    # idempotent
    again = canonicalize(c1).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


@given(edges=edge_lists)
@_settings
def test_canonical_min_labels_preserves_partition(spark, edges):
    df = spark.createDataFrame(edges, schema="src long, dst long")
    labels = connected_components(df, small_graph_threshold=0)
    re_rooted = canonical_min_labels(labels)
    a, b = labels.collect(), re_rooted.collect()
    assert labels_to_partition(a) == labels_to_partition(b)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # already minimal
