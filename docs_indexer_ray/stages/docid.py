"""URL dedup (last-writer-wins) + parallelism-invariant dense doc ids.

The reference dedups implicitly: ``es.index(id=uri)`` upserts, so a
duplicate uri silently overwrites in directory-walk order
(``/root/reference/hugo.py:350-353`` — nondeterministic across
filesystems, SURVEY §2.3).  This engine makes it deterministic:
**keep the row with max ``warc_ts``** per url (ties: lexicographically
greatest ``body``), independent of partitioning.

Doc ids must be dense and identical at any parallelism level (the
N-vs-4N rank-identity requirement), so they are a dense rank over the
globally url-sorted deduped table, computed scalably in three steps
without materializing the dataset on the driver:

1. **Deterministic sample** of urls (``crc32(url) % rate == 0`` — a
   property of the value, not of the partitioning) → sorted on the
   driver → ``B-1`` range boundaries.
2. Each row gets ``part = searchsorted(boundaries, url)`` (broadcast
   boundaries); a tiny ``groupby(part).count()`` gives per-part counts
   → driver cumsum → per-part id offsets (broadcast).
3. ``groupby(part).map_groups``: sort the part by url, assign
   ``doc_id = offset[part] + arange(len)``.

Range partitioning (not hash) keeps ids ordered by url globally, which
also gives delta-friendly doc_id gaps for urls from the same site —
the same locality trick web-scale indexes use for posting compression.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["dedup_latest", "assign_doc_ids"]


def _crc32_mod(urls: list[str], mod: int) -> np.ndarray:
    return np.array([zlib.crc32(u.encode()) % mod for u in urls], np.int64)


def dedup_latest(ds, key: str = "url", order: str = "warc_ts", num_parts: int = 64):
    """Keep, per ``key``, the row with max ``order`` (tie: max ``body``).

    One hash shuffle — but keyed on ``crc32(key) % num_parts``, not on
    the key itself: grouping by raw url makes one Python group call per
    url (millions of one-row groups).  Each reducer gets a whole hash
    partition and picks every key's winner vectorized: one multi-column
    sort, then take the last row of each key run.

    pyarrow batch format throughout: the list<string> breadcrumb column
    must not round-trip through pandas (object dtype breaks Arrow
    conversion).
    """

    def add_part(t: pa.Table) -> pa.Table:
        part = _crc32_mod(t[key].to_pylist(), num_parts)
        return t.append_column("__dpart", pa.array(part, pa.int32()))

    def keep_last(group: pa.Table) -> pa.Table:
        sort_keys = [(key, "ascending"), (order, "ascending")] + (
            [("body", "ascending")] if "body" in group.column_names else []
        )
        # nulls sort FIRST so a null warc_ts (missing crawl header)
        # always loses to a real timestamp under keep-last — pyarrow's
        # default at_end placement made the unknown-age row the winner
        g = group.take(
            pc.sort_indices(group, sort_keys=sort_keys, null_placement="at_start")
        )
        keys_np = np.asarray(g[key].to_pylist(), dtype=object)
        is_last = np.empty(len(keys_np), dtype=bool)
        is_last[-1] = True
        np.not_equal(keys_np[:-1], keys_np[1:], out=is_last[:-1])
        g = g.take(pa.array(np.flatnonzero(is_last)))
        return g.drop_columns(["__dpart"])

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__dpart")
        .map_groups(keep_last, batch_format="pyarrow")
    )


def assign_doc_ids(ds, num_parts: int = 32, sample_mod: int = 16):
    """Dense, url-sorted, parallelism-invariant ``doc_id`` (see module docstring).

    Returns ``(ds_with_doc_id_and_docpart, n_docs)``.  ``docpart`` (the
    url-range partition) is kept as a column — it is the natural
    partition key for the docs store layout and for resumable writes.
    """
    # materialize ONCE: the boundary sample, the count aggregate and
    # the assign shuffle below would otherwise each re-execute the
    # whole upstream pipeline (extract + dedup) feeding this stage
    ds = ds.materialize()
    # -- step 1: deterministic sample → range boundaries ------------------
    sample = ds.map_batches(
        lambda t: t.filter(pc.equal(pa.array(_crc32_mod(t["url"].to_pylist(), sample_mod)), 0))
        .select(["url"]),
        batch_format="pyarrow",
    )
    sample_urls = sorted(r["url"] for r in sample.take_all())
    if len(sample_urls) >= num_parts * 4:
        idx = np.linspace(0, len(sample_urls) - 1, num_parts + 1).astype(int)[1:-1]
        boundaries = [sample_urls[i] for i in idx]
    else:
        # tiny inputs: fall back to the sample itself as boundaries
        boundaries = sample_urls[: num_parts - 1]
    bounds_arr = np.array(boundaries, dtype=object)

    def add_part(t: pa.Table) -> pa.Table:
        urls = np.array(t["url"].to_pylist(), dtype=object)
        part = np.searchsorted(bounds_arr, urls, side="right").astype(np.int32)
        return t.append_column("docpart", pa.array(part, pa.int32()))

    ds = ds.map_batches(add_part, batch_format="pyarrow")

    # -- step 2: per-part counts → id offsets (tiny aggregate) ------------
    counts = {r["docpart"]: r["count()"] for r in ds.groupby("docpart").count().take_all()}
    offsets = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    n_docs = acc

    # -- step 3: per-part url sort + dense ids ----------------------------
    def assign(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("url", "ascending")])
        g = group.take(idx)
        part = g["docpart"][0].as_py()
        ids = np.arange(g.num_rows, dtype=np.uint64) + offsets[part]
        return g.append_column("doc_id", pa.array(ids, pa.uint64()))

    return ds.groupby("docpart").map_groups(assign, batch_format="pyarrow"), n_docs
