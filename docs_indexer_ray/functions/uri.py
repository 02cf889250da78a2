"""URL → (uri, breadcrumb) derivation with the reference's page semantics.

The reference walks a HUGO content tree (``/root/reference/hugo.py:198-241``)
and derives, per page:

* ``path``   — list of logical path segments, **original case**
  (``hugo_test.py:130-138``: path keeps case, uri does not);
* ``uri``    — ``"/" + "/".join(path) + "/"``, ``//`` collapsed,
  lowercased (HUGO lowercases rendered paths, ``hugo.py:231-232``);
* ``index.md`` / ``_index.md`` collapse to the directory URI, any other
  ``*.md`` appends its filename-sans-suffix as the last segment
  (``hugo.py:223-226``).

Our input is a ``url`` column (Common-Crawl-style pages), so the same
rules are applied to the URL's path component: scheme+authority are
dropped, empty segments collapse, a trailing ``index.md``/``_index.md``
segment is dropped, a trailing ``*.md`` segment loses its suffix.
"""

from __future__ import annotations

__all__ = ["url_to_uri_breadcrumb"]


def url_to_uri_breadcrumb(url: str) -> tuple[str, list[str]]:
    """Return ``(uri, breadcrumb)`` for one url; see module docstring."""
    path = url
    # drop scheme + authority
    if "://" in path:
        path = path.split("://", 1)[1]
        path = path[path.find("/") :] if "/" in path else "/"
    # drop query/fragment
    for sep in ("?", "#"):
        if sep in path:
            path = path.split(sep, 1)[0]

    segments = [s for s in path.split("/") if s]

    # hugo.py:223-226 file-segment handling
    if segments:
        last = segments[-1]
        if last in ("index.md", "_index.md"):
            segments = segments[:-1]
        elif last.endswith(".md"):
            # a segment that is EXACTLY '.md' strips to nothing — drop
            # it rather than carrying an empty breadcrumb element into
            # the keyword field and the catch-all text join
            stem = last[:-3]
            segments = segments[:-1] + ([stem] if stem else [])

    uri = "/" + "/".join(segments) + "/"
    while "//" in uri:  # hugo.py:229
        uri = uri.replace("//", "/")
    return uri.lower(), segments
