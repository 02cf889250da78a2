"""Anchor-text link extraction — the crawl-graph front-end.

Web-curation pipelines mine the link graph from raw HTML (anchor
targets feed URL frontiers, PageRank-style quality priors — see
``ops/pagerank.py`` — and anchor-text retrieval corpora).  This module
extracts ``(src, href, anchor_text)`` triples from an HTML column with
a real HTML parser (stdlib ``html.parser``, the same engine
``functions/htmltext.py`` builds on), not a regex: attribute order,
quoting style, nested inline markup inside the anchor, and entity
references all parse correctly.

Shape at scale: an ACTOR-POOL ``map_batches`` stage — the parser is
per-doc by nature (HTML is not a vectorizable format), so the batch
function is a callable class reused across batches and the pool gives
node-level parallelism; output is a flat Dataset of link rows
(``flat_map`` semantics inside one map_batches).  No shuffle.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

__all__ = ["extract_links", "links_of_html"]


class _AnchorWalker(HTMLParser):
    """Collects (href, anchor-text) for every <a href=...> element.

    Nested anchors don't exist in valid HTML; the walker follows
    browser behavior (an <a> implicitly closes an open one).  Text
    inside nested inline tags (<b>, <span>, …) accumulates into the
    anchor text; entity references decode (convert_charrefs)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._buf: list[str] = []

    def _flush(self) -> None:
        if self._href is not None:
            self.links.append((self._href, "".join(self._buf).strip()))
        self._href, self._buf = None, []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._flush()  # implicit close of a dangling open anchor
            href = dict(attrs).get("href")
            if href:
                self._href = href
                self._buf = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._buf.append(data)


def links_of_html(html: str) -> list[tuple[str, str]]:
    """All ``(href, anchor_text)`` of one document (parser-backed)."""
    w = _AnchorWalker()
    w.feed(html or "")
    w.close()
    w._flush()  # unclosed trailing anchor still counts
    return w.links


class _LinkExtractor:
    """Actor-pool batch callable: one parser class per actor, one flat
    link table out per batch."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        htmls = t[self.col].to_pylist()
        src, href, anchor = [], [], []
        for d, h in zip(ids, htmls):
            for u, a in links_of_html(h):
                src.append(d)
                href.append(u)
                anchor.append(a)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "href": pa.array(href, pa.string()),
                "anchor": pa.array(anchor, pa.string()),
            }
        )

    def __init__(self, col: str) -> None:
        self.col = col


def extract_links(ds, html_col: str = "html", concurrency=(1, 4)):
    """``(src, href, anchor)`` Dataset from ``ds[doc_id, html_col]``.

    Autoscaling actor pool (the fixed-size-pool starvation fix from
    round 3 applies here too); feed the output to
    ``ops/textclean.py::canonicalize_urls`` and ``ops/pagerank.py``
    for the crawl-graph pipeline."""
    return ds.map_batches(
        _LinkExtractor,
        fn_constructor_args=(html_col,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
