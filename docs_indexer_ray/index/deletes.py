"""Soft deletes — OpenSearch ``delete_by_query`` parity.

OpenSearch/Lucene deletes are TOMBSTONES: the doc is marked dead,
disappears from every query result and count immediately, but its
postings stay on disk and the global statistics (N, df, avgdl) keep
their old values until a segment merge rewrites the data.  The
reference relies on exactly this when it re-indexes a changed page
(``hugo.py`` index-then-alias-swap flow).

This module reproduces that model:

* tombstones live in ONE ``deletes.parquet`` beside the build's
  manifest (sorted unique doc ids; atomic tmp+replace updates — the
  same publish discipline as segments);
* :class:`~docs_indexer_ray.query.reader.IndexReader` loads them once
  per reader and every query surface excludes them:
  ``match_all_count`` subtracts, BM25 top-k ranks only live docs
  (scores of survivors are UNCHANGED — statistics are not rewritten,
  faithfully Lucene), facet match sets drop them;
* compaction = rebuild: ``merge_many`` refuses inputs with live
  tombstones (a merge re-ids docs densely, so carrying holes forward
  would corrupt the id space) — rebuild from the filtered source to
  reclaim space, exactly the reference's full-reindex flow.

Scale shape: the tombstone set is query-output-scale (ids only, no
doc payloads); readers hold it as a sorted array / bitmap like the
filtered-query machinery.  Deleting BY QUERY decodes only the query
terms' postings — never a corpus scan.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import manifest as mf

__all__ = ["add_deletes", "load_delete_ids", "delete_by_terms", "clear_deletes"]

DELETES_FILE = "deletes.parquet"


def _resolve(index_dir: str) -> str:
    if os.path.exists(os.path.join(index_dir, "CURRENT")):
        return mf.current_build(index_dir)
    return index_dir


def load_delete_ids(index_dir: str) -> np.ndarray:
    """Sorted unique tombstoned doc ids (empty array if none)."""
    path = os.path.join(_resolve(index_dir), DELETES_FILE)
    if not os.path.exists(path):
        return np.empty(0, np.int64)
    return pq.read_table(path)["doc_id"].to_numpy().astype(np.int64)


def add_deletes(index_dir: str, doc_ids) -> int:
    """Union ``doc_ids`` into the build's tombstone set (atomic);
    returns the total tombstone count afterwards.  Ids outside
    ``[0, n_docs)`` are rejected loudly — a tombstone for a doc that
    does not exist is always a caller bug."""
    bdir = _resolve(index_dir)
    man = mf.read_manifest(bdir)
    ids = np.unique(np.asarray(list(doc_ids), np.int64))
    if len(ids) and (ids[0] < 0 or ids[-1] >= int(man["n_docs"])):
        raise ValueError(
            f"delete ids outside [0, {man['n_docs']}): "
            f"{ids[(ids < 0) | (ids >= int(man['n_docs']))][:5].tolist()}"
        )
    # advisory lock around the read-modify-write: two concurrent
    # callers both unioning against the same base otherwise lose the
    # first writer's tombstones (tmp+replace only prevents torn files,
    # not lost updates)
    import fcntl

    path = os.path.join(bdir, DELETES_FILE)
    with open(path + ".lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        merged = np.union1d(load_delete_ids(bdir), ids)
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(
            pa.table({"doc_id": pa.array(merged, pa.int64())}), tmp, compression="zstd"
        )
        os.replace(tmp, path)
    return int(len(merged))


def delete_by_terms(index_dir: str, terms: list[str], chain: str | None = None) -> int:
    """``delete_by_query`` (match-any term list): tombstone every doc
    containing ≥1 of ``terms``; returns the number of NEWLY deleted
    docs.  Decodes only the query terms' postings."""
    from ..query.facets import match_doc_ids
    from ..query.reader import IndexReader

    bdir = _resolve(index_dir)
    reader = IndexReader(bdir, chain=chain)
    matched = match_doc_ids(reader, terms)  # already excludes prior tombstones
    before = len(load_delete_ids(bdir))
    after = add_deletes(bdir, matched) if len(matched) else before
    return after - before


def clear_deletes(index_dir: str) -> None:
    """Drop all tombstones (the post-compaction reset)."""
    path = os.path.join(_resolve(index_dir), DELETES_FILE)
    if os.path.exists(path):
        os.remove(path)
