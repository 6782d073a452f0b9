"""Web layer: pinned extractor (golden hashes = byte-identical invariant),
link extraction, pages->edges->CC end-to-end."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from em_connected_components_spark.plans.connected_components import (
    connected_components,
)
from em_connected_components_spark.sources.pages import (
    fixture_pages,
    page_url,
    render_html,
)
from em_connected_components_spark.web.extract import (
    EXTRACTOR_VERSION,
    extract_links,
    extract_text,
    pages_to_edges,
    with_extracted_text,
)

from .conftest import labels_to_partition


def test_extractor_pinned_golden():
    """Byte-identical invariant: these hashes pin extractor version 1.
    If extraction logic changes, bump EXTRACTOR_VERSION and regenerate."""
    assert EXTRACTOR_VERSION == 1
    cases = {
        b"<html><body><p>Hello &amp; goodbye</p></body></html>": (
            "Hello & goodbye"
        ),
        b"<script>ignore<a href='x'>me</a></script>text": "text",
        b"<style>p{}</style>a  b\n\nc": "a b c",
        b"<!-- <p>gone</p> -->kept": "kept",
        b"plain \xf0\x9f\x98\x80 emoji": "plain \U0001f600 emoji",
        b"broken \xff byte": "broken � byte",
    }
    for html, want in cases.items():
        assert extract_text(html) == want
    golden = hashlib.sha256(
        "\x00".join(extract_text(h) for h in cases).encode()
    ).hexdigest()
    assert golden == hashlib.sha256(
        "\x00".join(cases.values()).encode()
    ).hexdigest()


def test_extractor_fixture_corpus_golden():
    # corpus-level pin: extraction over the deterministic fixture html
    h = hashlib.sha256()
    for i in range(20):
        h.update(extract_text(render_html(i, [i + 1, i + 2])).encode())
    # literal golden — regenerate only on an EXTRACTOR_VERSION bump
    assert h.hexdigest() == (
        "a827591b673f2ea4e5ba49411b74ccd226899a55d11d5944d79ed781b48d43d1"
    )


def test_extract_links_resolution():
    html = (
        b'<a href="https://a.example/x">1</a>'
        b"<a href='/root.html'>2</a>"
        b'<a href="rel.html">3</a>'
        b'<a href="//cdn.example/y">4</a>'
        b'<a href="mailto:a@b.c">skip</a>'
        b'<a href="https://a.example/z#frag">5</a>'
        b"<script><a href='https://evil.example/'>skip</a></script>"
    )
    got = extract_links(html, "https://base.example/dir/page.html")
    assert got == [
        "https://a.example/x",
        "https://base.example/root.html",
        "https://base.example/dir/rel.html",
        "https://cdn.example/y",
        "https://a.example/z",
    ]
    # script/style/comment blocks are stripped before the href scan —
    # otherwise a shared boilerplate link would weld unrelated components
    assert "https://evil.example/" not in extract_links(
        html, "https://base.example/"
    )


def test_pages_text_byte_identical_in_spark(spark):
    pages = fixture_pages(spark, [(0, 1), (1, 2)], 3)
    got = with_extracted_text(pages).select("url", "text", "text_extracted")
    rows = got.collect()
    assert len(rows) == 3
    for r in rows:
        assert r["text_extracted"] == r["text"]  # byte-identical per url


def test_pages_to_edges_cc_end_to_end(spark):
    # link graph = two cliques of 4 (directed edges i->j, i<j within clique)
    edge_list = [
        (u, v)
        for base in (0, 4)
        for u in range(base, base + 4)
        for v in range(u + 1, base + 4)
    ]
    pages = fixture_pages(spark, edge_list, 8)
    edges = pages_to_edges(pages)
    labels = connected_components(edges, small_graph_threshold=0)
    part = labels_to_partition(labels.collect())
    import pyspark.sql.functions as FF

    id_of = {
        r["url"]: r["id"]
        for r in pages.select(
            "url", FF.xxhash64("url").alias("id")
        ).collect()
    }
    want = {
        frozenset(id_of[page_url(i)] for i in range(0, 4)),
        frozenset(id_of[page_url(i)] for i in range(4, 8)),
    }
    assert part == want


def test_pages_to_edges_is_vectorized(spark):
    # plumbing check: the plan contains Arrow evals, not per-row python UDFs
    pages = fixture_pages(spark, [(0, 1)], 2)
    plan = pages_to_edges(pages)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time python = forbidden
