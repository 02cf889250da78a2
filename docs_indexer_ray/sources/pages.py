"""Pages-table source: pruned, filtered Parquet reads.

The engine's primary input (BASELINE.json input_hint): a Parquet table
``(url, warc_ts, html, text, lang)``.  This wrapper enforces the two
read rules that matter at 100 TB:

* **column pruning at the read** — callers name the columns they use
  (the build needs all five; text-stats pipelines need two);
* **predicate pushdown** — ``lang=`` and ``since=`` become pyarrow
  dataset expressions evaluated at the row-group level, so filtered
  crawls never leave storage.

Replaces the reference's content-tree walk (S1, ``hugo.py:198-241``);
the uri/breadcrumb derivation the walk interleaved lives in the
extract stage.
"""

from __future__ import annotations

__all__ = ["read_pages"]


def read_pages(
    paths,
    *,
    columns: list[str] | None = None,
    lang: str | None = None,
    since=None,
    **read_kwargs,
):
    """``ray.data.Dataset`` over a pages table with pushdown filters."""
    import pyarrow.dataset as pads
    import ray.data

    expr = None
    if lang is not None:
        expr = pads.field("lang") == lang
    if since is not None:
        e = pads.field("warc_ts") >= since
        expr = e if expr is None else (expr & e)

    kwargs = dict(read_kwargs)
    if columns is not None:
        kwargs["columns"] = columns
    if expr is not None:
        kwargs["filter"] = expr
    return ray.data.read_parquet(paths, **kwargs)
