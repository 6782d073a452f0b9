"""Triangle counting — degree-ordered orientation + wedge join + closing check.

No reference counterpart (graft addition). The standard shuffle-efficient
plan (node-iterator++ / Schank-Wagner ordering):

1. canonicalize edges (undirected, src<dst, distinct);
2. orient every edge from the (degree, id)-SMALLER endpoint to the larger —
   every vertex's out-degree is then O(sqrt(m)), which bounds the wedge
   blow-up that a hub vertex would otherwise cause (the skew defense);
3. wedges = oriented ⋈ oriented on the common low vertex;
4. triangles = wedges semi-joined against the oriented edge set.

Three shuffles total; all joins are equi-joins AQE can re-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.aggregates import degrees
from ..operators.normalize import canonicalize


def orient_by_degree(edges: DataFrame) -> DataFrame:
    """Orient canonical edges low->high by (degree, id) total order."""
    e = canonicalize(edges).persist()  # read twice: degree calc + orientation
    deg = degrees(e)
    e = (
        e.join(deg.select(F.col("node").alias("src"), F.col("degree").alias("deg_s")), on="src")
        .join(deg.select(F.col("node").alias("dst"), F.col("degree").alias("deg_d")), on="dst")
    )
    fwd = (F.col("deg_s") < F.col("deg_d")) | (
        (F.col("deg_s") == F.col("deg_d")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    )


def triangles_count(edges: DataFrame) -> DataFrame:
    """Single-row DataFrame (n_triangles) — total triangle count."""
    o = orient_by_degree(edges).persist()
    w1 = o.select(F.col("lo").alias("pivot"), F.col("hi").alias("a"))
    w2 = o.select(F.col("lo").alias("pivot"), F.col("hi").alias("b"))
    wedges = w1.join(w2, on="pivot").filter(F.col("a") < F.col("b"))
    closing = o.select(
        F.least("lo", "hi").alias("a"), F.greatest("lo", "hi").alias("b")
    )
    tri = wedges.join(closing, on=["a", "b"], how="left_semi")
    # left_semi dedups the closing side but keeps one row per wedge — exactly
    # one triangle per (pivot, a, b) since wedges are distinct by construction
    return tri.agg(F.count("*").alias("n_triangles"))


def triangles_per_node(edges: DataFrame) -> DataFrame:
    """(node, n_triangles) — per-vertex triangle participation."""
    o = orient_by_degree(edges).persist()
    w1 = o.select(F.col("lo").alias("pivot"), F.col("hi").alias("a"))
    w2 = o.select(F.col("lo").alias("pivot"), F.col("hi").alias("b"))
    wedges = w1.join(w2, on="pivot").filter(F.col("a") < F.col("b"))
    closing = o.select(
        F.least("lo", "hi").alias("a"), F.greatest("lo", "hi").alias("b")
    )
    tri = wedges.join(closing, on=["a", "b"], how="left_semi")
    per = (
        tri.select(F.col("pivot").alias("node"))
        .unionAll(tri.select(F.col("a").alias("node")))
        .unionAll(tri.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return per
