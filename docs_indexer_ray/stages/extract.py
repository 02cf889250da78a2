"""Extract + assemble stage: ``pages`` batches → ``docs`` batches.

Re-creates the reference's per-page path (T1–T4 of SURVEY.md §2.1) as
one vectorizable Ray Data ``map_batches`` stage:

1. ``html → source text`` — reference extractor semantics
   (``/root/reference/common.py:33-38``; see ``functions/htmltext.py``).
   This output is the **byte-identical per-url invariant**.
2. front matter parse (``hugo.py:264-293``; ``functions/frontmatter.py``)
   → ``(data, body)``; unparseable front matter degrades to ``data={}``
   exactly like the caller at ``hugo.py:318-322``.
3. document assembly (``hugo.py:296-346``): ``type``, ``uri``,
   ``url = BASE_URL + uri``, ``breadcrumb`` (+ exploded
   ``breadcrumb_1..5``), ``body``, ``date``, and the catch-all ``text``
   built with the reference's exact concatenation recipe::

       text = ""
       if title:        text = title
       if body is not None: text += " " + body
       text += " " + uri
       text += " " + " ".join(breadcrumb)

Documented divergence: the reference leaves ``body = None`` for pages
without front-matter fences (crawl pages are not Hugo .md files); this
engine falls back to ``body = source.strip()`` so page content is never
dropped from the index.  The ``date`` analog of the reference's
git-last-modified lookup (``hugo.py:330-331``) is the page's
``warc_ts``; the reference's sentinel default 1900-01-01 (``hugo.py:52``)
applies when ``warc_ts`` is null.

Stateless per batch — instantiate as a callable class so per-actor
setup (nothing heavy here, but the pattern is uniform) happens once.
"""

from __future__ import annotations

import json
from datetime import date as _date
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

from ..functions.frontmatter import parse_front_matter
from ..functions.htmltext import html_to_text
from ..functions.uri import url_to_uri_breadcrumb

__all__ = [
    "ExtractAssemble",
    "DOCS_FIELDS",
    "DEFAULT_DATE_ISO",
    "normalize_date",
    "synthesize_text",
]

DEFAULT_DATE_ISO = "1900-01-01T00:00:00+00:00"  # hugo.py:52
MAX_BREADCRUMB = 5  # mappings/hugo.json:25-44 maps breadcrumb_1..5

DOCS_FIELDS = [
    "url",
    "warc_ts",
    "uri",
    "type",
    "title",
    "body",
    "date",
    "extras",
    "breadcrumb",
    *[f"breadcrumb_{i}" for i in range(1, MAX_BREADCRUMB + 1)],
    "text",
    "lang",
    "extract_error",
]

# the reference's two accepted timestamp formats (blog.py:28-29,
# parsed at blog.py:110-118 and given UTC)
_DATE_FORMATS = ("%Y-%m-%dT%H:%M:%S.%fZ", "%Y-%m-%dT%H:%M:%SZ")


def normalize_date(value, fallback_iso: str) -> str:
    """Normalize a front-matter date to an ISO-8601 UTC string.

    Tries the reference's two explicit formats (``blog.py:110-118``),
    then ISO-8601; YAML already hands naive ``date``/``datetime``
    objects for unquoted dates — those get UTC attached.  An
    unparseable value is returned verbatim (degrade, never fail —
    SURVEY §4); ``None`` falls back to ``fallback_iso`` (the page's
    ``warc_ts``, or the 1900-01-01 sentinel — ``hugo.py:52``)."""
    if value is None:
        return fallback_iso
    if isinstance(value, datetime):
        dt = value if value.tzinfo else value.replace(tzinfo=timezone.utc)
        return dt.astimezone(timezone.utc).isoformat()
    if isinstance(value, _date):
        return datetime(value.year, value.month, value.day, tzinfo=timezone.utc).isoformat()
    s = str(value)
    for fmt in _DATE_FORMATS:
        try:
            return datetime.strptime(s, fmt).replace(tzinfo=timezone.utc).isoformat()
        except ValueError:
            pass
    try:
        dt = datetime.fromisoformat(s)
        dt = dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)
        return dt.astimezone(timezone.utc).isoformat()
    except ValueError:
        return s


#: the stored columns synthesize_text reads — shared by every caller
#: that must fetch them first (reader.fetch_docs, significant.py's
#: docs-mode re-tokenization) so the recipe has ONE source of truth
SYNTHESIS_INPUT_COLUMNS = ("title", "body", "uri", "breadcrumb")


def synthesize_text(t: pa.Table) -> pa.Table:
    """Append the catch-all ``text`` column derived from stored fields.

    The hugo recipe (``hugo.py:333-342``) is a pure concatenation —
    ``title + " " + body + " " + uri + " " + " ".join(breadcrumb)``
    (an absent title and an empty title produce the same string) — so
    ``text`` need not be STORED at all: the docs store drops it
    (~40% of row bytes through the spill→store→tokenize path) and
    consumers re-derive it here with two vectorized Arrow kernels,
    byte-identical to the assembly-time column (tested).
    """
    import pyarrow.compute as pc

    crumbs = pc.binary_join(t["breadcrumb"], " ")
    text = pc.binary_join_element_wise(t["title"], t["body"], t["uri"], crumbs, " ")
    return t.append_column("text", text)


class ExtractAssemble:
    """pages batch (url, warc_ts, html, text, lang) → docs batch.

    ``use_html=False`` trusts the pre-extracted ``text`` column instead
    of re-extracting from ``html`` (the input contract says ``text`` may
    be stale, so the default re-extracts).

    ``recipe`` selects the per-source assembly recipe (SURVEY §2.1 T4
    vs T5 — the two sources build the catch-all differently):

    * ``"hugo"`` (default): front matter parsed; catch-all per
      ``hugo.py:333-342`` — ``title + " " + body + " " + uri + " " +
      " ".join(breadcrumb)``.
    * ``"blog"``: the blog recipe (``blog.py:71-93``): the whole
      extracted source is the body, title comes from front matter when
      present, ``breadcrumb = ["blog"]``, ``uri = url``, and the
      catch-all is ``f"{title}\\n\\n{body}"``.  Input columns ``id``
      and ``image_uri``/``featured_image`` (the API payload's stable
      post id and thumbnail, ``blog.py:80,88``) pass through as stored
      string columns, null when the source lacks them.
    """

    def __init__(
        self,
        type_label: str | None = None,
        use_html: bool = True,
        recipe: str = "hugo",
        emit_text: bool = True,
    ):
        if recipe not in ("hugo", "blog"):
            raise ValueError(f"unknown recipe: {recipe!r}")
        if not emit_text and recipe != "hugo":
            raise ValueError(
                "emit_text=False requires the hugo recipe — only its "
                "catch-all is re-derivable by synthesize_text"
            )
        self.recipe = recipe
        self.type_label = type_label if type_label is not None else (
            "page" if recipe == "hugo" else "post"
        )
        self.use_html = use_html
        self.emit_text = emit_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        urls = batch["url"].to_pylist()
        langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [None] * n
        if self.use_html:
            sources = []
            for h in batch["html"].to_pylist():
                try:
                    sources.append(html_to_text(h) if h is not None else None)
                except Exception:
                    sources.append(None)
        else:
            sources = batch["text"].to_pylist()

        # blog recipe carries the API payload's stable external id and
        # featured image (blog.py:80 'id', blog.py:88 'featuredImage',
        # mapped as stored keywords at mappings/blog.json:12-24); both
        # are pass-through columns when the source provides them, null
        # otherwise — the reference uses `id` as the index doc id
        # (blog.py:100-105), here it is a stored field users join on.
        ext_ids: list[str | None] = [None] * n
        image_uris: list[str | None] = [None] * n
        if self.recipe == "blog":
            if "id" in batch.column_names:
                ext_ids = [
                    None if v is None else str(v) for v in batch["id"].to_pylist()
                ]
            for cand in ("image_uri", "featured_image", "featuredImage"):
                if cand in batch.column_names:
                    image_uris = [
                        None if v is None else str(v)
                        for v in batch[cand].to_pylist()
                    ]
                    break

        uris, crumbs, titles, bodies, dates, texts = [], [], [], [], [], []
        extras_out: list[str | None] = []
        errors: list[str | None] = []
        warc = batch["warc_ts"]
        # tz-aware inputs (external parquet often types warc_ts as
        # timestamp(us, tz=UTC)) already isoformat with an offset — a
        # blind '+00:00' append produced double-offset garbage dates
        warc_iso = [
            DEFAULT_DATE_ISO
            if t is None
            else (t.isoformat() if t.tzinfo is not None else t.isoformat() + "+00:00")
            for t in warc.to_pylist()
        ]
        for i in range(n):
            # never fail the build on one bad row (SURVEY §4; the
            # reference logs-and-continues per doc, hugo.py:354-355):
            # a row that errors degrades to empty fields + an error tag
            err: str | None = None
            source = sources[i]
            if source is None:
                source, err = "", "extract:null"
            try:
                data, body = parse_front_matter(source)
            except Exception as exc:
                data, body = None, None
                err = err or f"frontmatter:{type(exc).__name__}"
            if data is None:
                data = {}
            if body is None:
                body = source.strip()  # documented divergence (module docstring)

            title = data.get("title")
            title = "" if title is None else str(title)

            if self.recipe == "blog":
                # blog.py:79-91: uri = url, breadcrumb fixed, catch-all
                # title\n\nbody
                uri, breadcrumb = urls[i], ["blog"]
                text = f"{title}\n\n{body}"
            else:
                uri, breadcrumb = url_to_uri_breadcrumb(urls[i])
                if self.emit_text:
                    # catch-all text, reference recipe (hugo.py:333-342)
                    text = ""
                    if "title" in data:
                        text = title
                    text += " " + body
                    text += " " + uri
                    text += " " + " ".join(breadcrumb)
                else:
                    text = ""  # derived on demand (synthesize_text)

            date = normalize_date(data.get("date"), warc_iso[i])

            # dynamic front-matter extras: the reference keeps every
            # YAML key in the indexed document (hugo.py:279, fields
            # added to the same dict at hugo.py:324-331; unmapped keys
            # rely on dynamic mapping).  Keys with dedicated columns
            # (title, date) are lifted out; the rest ride as a
            # deterministic JSON-string column (SURVEY §1.2).
            extra_items = {k: v for k, v in data.items() if k not in ("title", "date")}
            extras_out.append(
                json.dumps(extra_items, default=str, sort_keys=True)
                if extra_items
                else None
            )

            uris.append(uri)
            crumbs.append(breadcrumb)
            titles.append(title)
            bodies.append(body)
            dates.append(date)
            texts.append(text)
            errors.append(err)

        cols: dict[str, pa.Array] = {
            "url": pa.array(urls, pa.string()),
            "warc_ts": warc.combine_chunks() if isinstance(warc, pa.ChunkedArray) else warc,
            "uri": pa.array(uris, pa.string()),
            "type": pa.array([self.type_label] * n, pa.string()),
            "title": pa.array(titles, pa.string()),
            "body": pa.array(bodies, pa.string()),
            "date": pa.array(dates, pa.string()),
            "extras": pa.array(extras_out, pa.string()),
            "breadcrumb": pa.array(crumbs, pa.list_(pa.string())),
        }
        for level in range(1, MAX_BREADCRUMB + 1):
            cols[f"breadcrumb_{level}"] = pa.array(
                [c[level - 1] if len(c) >= level else None for c in crumbs], pa.string()
            )
        if self.recipe == "blog":
            cols["id"] = pa.array(ext_ids, pa.string())
            cols["image_uri"] = pa.array(image_uris, pa.string())
        if self.emit_text:
            cols["text"] = pa.array(texts, pa.string())
        cols["lang"] = pa.array(langs, pa.string())
        cols["extract_error"] = pa.array(errors, pa.string())
        return pa.table(cols)
