"""Paged-API source: cursor-driven acquisition → Dataset.

Re-creates the reference's Hubspot blog source (S4,
``/root/reference/blog.py:39-68``): a generator loops ``GET page →
follow paging.next.link`` and filters ``state == 'PUBLISHED'`` before
yielding.  Paged HTTP APIs are inherently sequential on the cursor, so
acquisition runs on the driver (exactly like the reference) with
bounded retries per page (the reference's backoff wrapper S5,
``hugo.py:59-140``); everything *after* acquisition is a distributed
Dataset.

``fetch`` is any callable ``cursor -> (rows, next_cursor)`` where
``rows`` is a list of dicts and ``next_cursor=None`` ends the stream —
an HTTP client in production, a deterministic fake in tests (no
network exists in this environment).
"""

from __future__ import annotations

import time
from collections.abc import Callable

__all__ = ["read_paged_api"]


def read_paged_api(
    fetch: Callable,
    *,
    start_cursor=0,
    state_filter: tuple[str, str] | None = None,
    max_pages: int = 100_000,
    max_retries: int = 3,
    backoff_s: float = 0.05,
):
    """Drive a paged ``fetch`` to completion → ``ray.data.Dataset``.

    ``state_filter=(key, value)`` keeps only rows whose ``key`` equals
    ``value`` (the reference's PUBLISHED filter, ``blog.py:60-62``).
    """
    import pyarrow as pa
    import ray.data

    tables = []
    cursor = start_cursor
    for _ in range(max_pages):
        rows = None
        for attempt in range(max_retries):
            try:
                rows, cursor = fetch(cursor)
                break
            except Exception:
                if attempt == max_retries - 1:
                    raise
                time.sleep(backoff_s * (2**attempt))
        if state_filter is not None:
            key, value = state_filter
            rows = [r for r in rows if r.get(key) == value]
        if rows:
            tables.append(pa.Table.from_pylist(rows))
        if cursor is None:
            break
    if not tables:
        return ray.data.from_items([])
    return ray.data.from_arrow(pa.concat_tables(tables, promote_options="default"))
