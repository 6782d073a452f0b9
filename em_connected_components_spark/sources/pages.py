"""Deterministic fixture corpus of Common-Crawl-style pages.

Builds a pages DataFrame (url, warc_ts, html, text, lang — FIXTURES.md §1.3)
whose *link graph is a known fixture graph*, so CC/PageRank answers on the
extracted edges are known in advance: page i links to page j exactly when
edge (i, j) is in the generator graph (directed src->dst).

The ``text`` column is filled with the pinned extractor's output over the
generated html, so the byte-identical-extraction invariant is testable
end-to-end on this corpus.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from ..schema import PAGES_SCHEMA
from ..web.extract import extract_text

_LANGS = ["en", "de", "fr", "es"]
_SNIPPETS = {
    "en": "the quick brown fox jumps over the lazy dog and that is that",
    "de": "der schnelle braune fuchs springt und das ist nicht die katze",
    "fr": "le renard brun rapide saute et la chose est une belle affaire",
    "es": "el zorro marron salta y es una cosa que pasa en las calles",
}


def page_url(i: int) -> str:
    return f"https://example.org/site{i % 7}/page{i}.html"


def render_html(i: int, out_links: list[int]) -> bytes:
    lang = _LANGS[i % len(_LANGS)]
    anchors = "\n".join(
        f'<a href="{page_url(j)}">link to {j}</a>' for j in out_links
    )
    # deliberately include the hazards the extractor must strip
    return (
        f"<html><head><title>Page {i}</title>"
        f"<style>body {{ color: red; }}</style>"
        f"<script>var x = '<a href=\"https://evil.example/{i}\">';</script>"
        f"</head><body>"
        f"<!-- comment with <a href='https://comment.example/'>dead link</a> -->"
        f"<h1>Page {i} &amp; friends</h1>"
        f"<p>{_SNIPPETS[lang]} number {i}</p>"
        f"{anchors}"
        f"</body></html>"
    ).encode("utf-8")


def fixture_pages(
    spark: SparkSession, edges: list[tuple[int, int]], n_pages: int
) -> DataFrame:
    """Pages 0..n_pages-1 where page u links to page v per ``edges``."""
    out: dict[int, list[int]] = {i: [] for i in range(n_pages)}
    for u, v in edges:
        out[u].append(v)
    rows = []
    base_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    for i in range(n_pages):
        html = render_html(i, sorted(out[i]))
        rows.append(
            (
                page_url(i),
                base_ts + dt.timedelta(seconds=i),
                html,
                extract_text(html),
                _LANGS[i % len(_LANGS)],
            )
        )
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)
