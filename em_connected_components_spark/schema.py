"""Canonical schemas of the engine (reference: cpp/defs.hpp:10-11,35-61).

The reference has one logical relation — the 16-byte edge ``(u, v)`` with
``node_t = uint64_t`` ids, 1-based (0 reserved, cpp/defs.hpp:135-142) — plus
the node->component label map it produces. Spark has no unsigned 64-bit; we
use LongType and keep the ``id >= 1`` invariant.

The web-page table is the graft contract's upstream input
(BASELINE.json ``input_hint``): Common-Crawl-style pages from which the edge
table is derived by vectorized link extraction.
"""

from __future__ import annotations

from pyspark.sql import types as T

SRC = "src"
DST = "dst"
NODE = "node"
COMP = "comp"

EDGE_SCHEMA = T.StructType(
    [
        T.StructField(SRC, T.LongType(), False),
        T.StructField(DST, T.LongType(), False),
    ]
)

LABEL_SCHEMA = T.StructType(
    [
        T.StructField(NODE, T.LongType(), False),
        T.StructField(COMP, T.LongType(), False),
    ]
)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# node -> float score (PageRank and friends)
SCORE_SCHEMA = T.StructType(
    [
        T.StructField(NODE, T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)
