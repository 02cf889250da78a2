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
:func:`http_page_fetch` builds one from a URL template (stdlib
urllib; honors ``Retry-After``/rate-limit-reset headers the way the
reference's wrapper does, ``hugo.py:87-101``), a deterministic fake
serves in tests (no network exists in this environment).

Scale note: pages become Dataset BLOCKS in windows of
``rows_per_block`` rows as they arrive — each window is put into the
object store independently (no single driver-side concat of the whole
stream), so downstream ``map_batches`` starts with real parallelism
and driver memory holds one window at a time plus Arrow metadata.
"""

from __future__ import annotations

import time
from collections.abc import Callable

__all__ = ["read_paged_api", "http_page_fetch"]


def _conform(t, schema):
    """Cast a window table to the stream-unified schema (missing
    columns become nulls) so every block shares one schema."""
    import pyarrow as pa

    cols = []
    for field in schema:
        if field.name in t.column_names:
            cols.append(t[field.name].cast(field.type))
        else:
            cols.append(pa.nulls(t.num_rows, field.type))
    return pa.Table.from_arrays(cols, schema=schema)


def read_paged_api(
    fetch: Callable,
    *,
    start_cursor=0,
    state_filter: tuple[str, str] | None = None,
    max_pages: int = 100_000,
    max_retries: int = 3,
    backoff_s: float = 0.05,
    rows_per_block: int = 4096,
):
    """Drive a paged ``fetch`` to completion → ``ray.data.Dataset``.

    ``state_filter=(key, value)`` keeps only rows whose ``key`` equals
    ``value`` (the reference's PUBLISHED filter, ``blog.py:60-62``).

    ``rows_per_block`` groups arriving pages into object-store blocks
    of roughly that many rows — one block per window, not one table
    for the whole stream.
    """
    import pyarrow as pa
    import ray
    import ray.data

    # each flushed window goes straight to the object store (ray.put);
    # the driver keeps only refs + schemas — holding every window table
    # in a driver list made driver memory O(entire stream)
    block_refs: list = []
    schemas: list[pa.Schema] = []
    window: list[pa.Table] = []
    window_rows = 0
    cursor = start_cursor

    def flush():
        nonlocal window, window_rows
        if window:
            t = pa.concat_tables(window, promote_options="permissive")
            schemas.append(t.schema)
            block_refs.append(ray.put(t))
            window, window_rows = [], 0

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
            t = pa.Table.from_pylist(rows)
            window.append(t)
            window_rows += t.num_rows
            if window_rows >= rows_per_block:
                flush()
        if cursor is None:
            break
    flush()
    if not block_refs:
        return ray.data.from_items([])
    # one schema across all blocks: later pages may carry extra keys.
    # Conforming happens lazily in tasks (batch_size=None: one block
    # per call, so differing-schema blocks are never concatenated
    # before the conform runs) — the driver never re-materializes the
    # stream.
    schema = pa.unify_schemas(schemas, promote_options="permissive")
    return ray.data.from_arrow_refs(block_refs).map_batches(
        lambda t: _conform(t, schema), batch_format="pyarrow", batch_size=None
    )


def http_page_fetch(
    url_template: str,
    *,
    rows_key: str = "objects",
    next_key: str = "offset",
    total_key: str | None = "total",
    headers: dict | None = None,
    page_size: int = 100,
    timeout_s: float = 30.0,
    max_ratelimit_wait_s: float = 3600.0,
    max_ratelimit_retries: int = 8,
    urlopen=None,
) -> Callable:
    """Build an offset-paged HTTP ``fetch`` callable for
    :func:`read_paged_api` from a URL template with ``{offset}`` and
    ``{limit}`` placeholders (the reference's Hubspot shape,
    ``blog.py:39-55``: response JSON carries the row list under
    ``rows_key`` and paging state under ``next_key``/``total_key``).

    Rate limiting follows the reference wrapper (``hugo.py:87-101``):
    on HTTP 403/429 the client honors ``Retry-After`` or
    ``X-RateLimit-Reset`` and sleeps until reset (capped at
    ``max_ratelimit_wait_s``) before retrying the same page; other
    errors propagate to ``read_paged_api``'s bounded backoff retry.

    ``urlopen`` is injectable for tests (defaults to
    ``urllib.request.urlopen`` — stdlib only, no third-party client).
    """
    import json as _json
    import urllib.request

    if urlopen is None:
        urlopen = urllib.request.urlopen

    def fetch(cursor):
        offset = int(cursor or 0)
        url = url_template.format(offset=offset, limit=page_size)
        req = urllib.request.Request(url, headers=headers or {})
        ratelimit_tries = 0
        while True:
            try:
                with urlopen(req, timeout=timeout_s) as resp:
                    payload = _json.loads(resp.read().decode("utf-8"))
                break
            except Exception as exc:
                status = getattr(exc, "code", None)
                hdrs = getattr(exc, "headers", None)
                if status in (403, 429) and hdrs is not None:
                    wait = hdrs.get("Retry-After")
                    if wait is None and hdrs.get("X-RateLimit-Reset"):
                        wait = float(hdrs["X-RateLimit-Reset"]) - time.time() + 1
                    if wait is not None:
                        # a PERMANENT 403 (expired token behind a CDN
                        # that attaches Retry-After to every error)
                        # must not loop forever
                        ratelimit_tries += 1
                        if ratelimit_tries > max_ratelimit_retries:
                            raise
                        wait = min(max(float(wait), 0.0), max_ratelimit_wait_s)
                        time.sleep(wait)
                        continue
                raise
        rows = payload.get(rows_key, [])
        nxt = offset + len(rows)
        if not rows:
            next_cursor = None
        elif total_key and total_key in payload:
            next_cursor = nxt if nxt < int(payload[total_key]) else None
        elif next_key in payload and payload[next_key] is not None:
            next_cursor = payload[next_key] if payload[next_key] > offset else None
        else:
            next_cursor = nxt
        return rows, next_cursor

    return fetch
