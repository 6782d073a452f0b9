"""EdgeCatalog bucketed layout end-to-end: the src-bucketed table feeds
CC + PageRank with NO exchange on the pre-bucketed side (VERDICT r2 #7 —
at 100 TB this layout is what lets the iterative drivers skip their initial
repartition of the m-row edge table)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from em_connected_components_spark.operators.normalize import canonicalize
from em_connected_components_spark.plans.connected_components import (
    connected_components,
)
from em_connected_components_spark.plans.pagerank import pagerank
from em_connected_components_spark.sources import tables as tbl
from em_connected_components_spark.sources.catalog import EdgeCatalog

from .conftest import labels_to_partition

SF = "/root/testdata/sf0.001"
TABLE = "t_edges_lineitem_bucketed"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_catalog(spark, tmp_path):
    cat = EdgeCatalog(spark, str(tmp_path / "edges_bucketed"), buckets=8)
    edges = canonicalize(tbl.edges_lineitem(spark, SF))
    cat.write_bucketed(edges, table=TABLE)
    yield cat, edges
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def test_bucketed_agg_has_no_exchange(spark, bucketed_catalog):
    cat, _ = bucketed_catalog
    br = cat.read_bucketed(TABLE)
    plan = _plan(br.groupBy("src").agg(F.min("dst").alias("mn")))
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan


def test_bucketed_join_exchanges_only_other_side(spark, bucketed_catalog):
    cat, _ = bucketed_catalog
    br = cat.read_bucketed(TABLE)
    other = spark.range(100).select(
        F.col("id").alias("src"), F.lit(1.0).alias("w")
    )
    # disable broadcast so the join must satisfy distribution requirements
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        import re

        plan = _plan(br.join(other, on="src"))
        # exactly ONE Exchange NODE: the non-bucketed side shuffles to the
        # bucketed layout; the edge side reads in place (formatted explain
        # prints each node twice — tree + details — so count node headers)
        exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
        assert len(exchanges) == 1, plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(64 * 1024 * 1024),
        )


def test_cc_and_pagerank_from_bucketed_catalog(spark, bucketed_catalog):
    cat, edges = bucketed_catalog
    br = cat.read_bucketed(TABLE)

    ref_labels = connected_components(edges, pre_canonicalized=True)
    cat_labels = connected_components(br, pre_canonicalized=True)
    assert labels_to_partition(cat_labels.collect()) == labels_to_partition(
        ref_labels.collect()
    )

    ref_pr = {
        r["node"]: r["rank"]
        for r in pagerank(edges, max_iters=5, tol=0.0).collect()
    }
    cat_pr = {
        r["node"]: r["rank"]
        for r in pagerank(
            br, max_iters=5, tol=0.0, pre_partitioned=True
        ).collect()
    }
    assert set(ref_pr) == set(cat_pr)
    assert all(abs(ref_pr[k] - cat_pr[k]) < 1e-12 for k in ref_pr)
