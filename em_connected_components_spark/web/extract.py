"""Web-page layer: pinned text extraction + vectorized link extraction.

The graft contract (BASELINE.json ``input_hint``) feeds the engine from a
table of Common-Crawl-style pages (url, warc_ts, html, text, lang) and
requires (a) the edge table to be derived by vectorized Arrow UDFs — no
per-row Python in the driver plan — and (b) **byte-identical extracted text
per url** against the pinned extractor. This module IS that pinned extractor:
``EXTRACTOR_VERSION`` stamps the algorithm; tests/test_web.py holds golden
hashes so any drift fails loudly.

The extraction itself is pure Python over bytes, but it runs inside
Arrow-batched ``mapInPandas``/``pandas_udf`` — one Python roundtrip per
record batch, not per row. At 10^12 documents this layer is embarrassingly
parallel (per-page, no shuffle); the expensive parts downstream (dedup by
url hash, edge normalization) stay JVM-side.
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACTOR_VERSION = 1

_SCRIPT_STYLE_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(
    rb"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)')""", re.IGNORECASE
)


def extract_text(html_bytes: bytes) -> str:
    """THE pinned text extractor (version 1). Deterministic, stdlib-only:

    1. drop <script>/<style> blocks and comments (bytes-level);
    2. drop all tags;
    3. utf-8 decode with replacement;
    4. unescape HTML entities;
    5. collapse all whitespace runs to single spaces, strip ends.

    Any change to these steps must bump EXTRACTOR_VERSION and regenerate the
    golden hashes in tests/test_web.py.
    """
    if html_bytes is None:
        return ""
    b = _SCRIPT_STYLE_RE.sub(b" ", html_bytes)
    b = _COMMENT_RE.sub(b" ", b)
    b = _TAG_RE.sub(b" ", b)
    s = b.decode("utf-8", errors="replace")
    s = _htmllib.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def extract_links(html_bytes: bytes, base_url: str) -> list[str]:
    """All <a href> targets, resolved and normalized (version 1):

    absolute http(s) links pass through; scheme-relative get the base scheme;
    root-relative join base origin; other relative join the base directory;
    fragments are dropped; everything else (mailto:, javascript:) is skipped.
    """
    if html_bytes is None:
        return []
    html_bytes = _SCRIPT_STYLE_RE.sub(b" ", html_bytes)
    html_bytes = _COMMENT_RE.sub(b" ", html_bytes)
    out: list[str] = []
    scheme, _, rest = base_url.partition("://")
    origin = scheme + "://" + rest.split("/", 1)[0]
    base_dir = base_url.rsplit("/", 1)[0] if "/" in rest else base_url
    for m in _HREF_RE.finditer(html_bytes):
        raw = (m.group(1) or m.group(2) or b"").decode("utf-8", errors="replace")
        raw = raw.split("#", 1)[0].strip()
        if not raw:
            continue
        if raw.startswith(("http://", "https://")):
            url = raw
        elif raw.startswith("//"):
            url = scheme + ":" + raw
        elif raw.startswith("/"):
            url = origin + raw
        elif ":" in raw.split("/", 1)[0]:
            continue  # mailto:, javascript:, data:, ...
        else:
            url = base_dir + "/" + raw
        out.append(url)
    return out


# ---------------------------------------------------------------------------
# Spark plumbing (Arrow-batched)
# ---------------------------------------------------------------------------

def with_extracted_text(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds ``text_extracted`` via an Arrow-batched pandas UDF."""

    def _extract_series(s):
        return s.map(lambda b: extract_text(bytes(b)) if b is not None else "")

    udf = F.pandas_udf(_extract_series, T.StringType())
    return pages.withColumn("text_extracted", udf(F.col(html_col)))


def with_links(pages: DataFrame, html_col: str = "html", url_col: str = "url") -> DataFrame:
    """Adds ``links: array<string>`` via an Arrow-batched pandas UDF."""

    def _links_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            links = [
                extract_links(
                    bytes(h) if h is not None else None, u
                )
                for h, u in zip(pdf[html_col], pdf[url_col])
            ]
            out = pdf.copy()
            out["links"] = links
            yield out

    schema = T.StructType(
        pages.schema.fields + [T.StructField("links", T.ArrayType(T.StringType()))]
    )
    return pages.mapInPandas(_links_fn, schema=schema)


def url_id(col) -> "F.Column":
    """Stable 64-bit node id for a url (xxhash64, JVM-side).

    Note: unlike the reference's dense 1-based ids (cpp/defs.hpp:135-142),
    web-graph node ids are hash values over the full signed-64 range; none of
    the engine's algorithms treats 0 or sign specially.
    """
    return F.xxhash64(col)


def pages_to_edges(pages: DataFrame) -> DataFrame:
    """(src, dst) = (xxhash64(url), xxhash64(link)) for every extracted link.

    Only the href scan is Python (Arrow-batched); explode + hash + the
    downstream normalize/dedup are JVM-side. Self-links are kept here —
    operators.normalize.canonicalize is the documented next step.
    """
    linked = with_links(pages)
    return (
        linked.select("url", F.explode("links").alias("link"))
        .select(url_id(F.col("url")).alias("src"), url_id(F.col("link")).alias("dst"))
    )
