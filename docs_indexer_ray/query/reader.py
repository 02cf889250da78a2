"""Index reader: manifest + doclens + per-term posting access.

Replaces the read side of what the reference delegated to OpenSearch
(D4/D9 of SURVEY §2.2).  An :class:`IndexReader` holds the loaded term
→ partition routing (``crc32(term) % num_parts`` — same function the
tokenizer used), the doc-length (norms) array, and cached Parquet file
handles; instantiate it once per query actor (``__init__`` does the
loading, queries are per-call), never per query.

Term lookup reads **one** segment file per term (or ``n_salt_runs``
files for a salted heavy term) with a Parquet row filter; segment rows
are term-sorted so row-group statistics prune the read.  A heavy
term's salted runs are doc-id **ranges** (``stages/tokenize.py``), so
concatenating runs in ``rpart`` order yields a globally doc-id-sorted
posting list — the reader stitches blocks, it never re-sorts.

Scale note: ``doclens`` is loaded as one numpy array indexed by
``doc_id`` (exact norms; Lucene stores a lossy byte-encoded norm —
documented divergence in this engine's favor).  At 10^12 docs norms
are sharded with the query actors — each actor serves a doc-id range
and holds only its shard's norms; the sandbox single-node reader holds
them all.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codec import varint_decode
from ..index import manifest as mf
from ..stages.tokenize import term_part
from .segments_io import TermPostings

__all__ = ["IndexReader", "prefix_upper_bound"]


def prefix_upper_bound(prefix: str) -> str | None:
    """The smallest string greater than EVERY string with this prefix
    (increment the last non-U+10FFFF char) — the sound searchsorted
    upper bound for a sorted-dictionary prefix range.  A plain
    ``prefix + '\\uffff'`` misses terms whose next char is an
    astral-plane codepoint.  ``None`` means unbounded (use
    ``len(terms)``)."""
    up = prefix
    while up and ord(up[-1]) == 0x10FFFF:
        up = up[:-1]
    return up[:-1] + chr(ord(up[-1]) + 1) if up else None


class _ShardNorms:
    """Doc-length lookup for a doc-id-range shard: holds only the
    shard's slice, indexed by GLOBAL doc id (scalar or ndarray)."""

    __slots__ = ("lo", "arr")

    def __init__(self, lo: int, arr: np.ndarray):
        self.lo = lo
        self.arr = arr

    def __getitem__(self, idx):
        return self.arr[idx - self.lo]

    def __len__(self) -> int:
        return len(self.arr)


class IndexReader:
    def __init__(
        self,
        index_dir: str,
        chain: str | None = None,
        doc_range: tuple[int, int] | None = None,
    ):
        """``chain`` selects an extra analyzer chain's posting table
        (``segments-<chain>/``, D8 multi-field builds); default is the
        build's main chain.

        ``doc_range=(lo, hi)`` loads a doc-id-range SHARD of the index:
        only the range's norms are held in memory (``doclens`` becomes
        a :class:`_ShardNorms`) while the manifest's global statistics
        (N, avgdl, per-term df) stay global — per-shard BM25 scores are
        therefore exactly the unsharded scores, so a top-k merge across
        shards is exact.  Use :func:`bm25.score_topk_range` to score a
        shard (the dense TAAT buffer is shard-sized, not corpus-sized)."""
        if os.path.exists(os.path.join(index_dir, "CURRENT")):
            index_dir = mf.current_build(index_dir)  # accept the root too
        self.index_dir = index_dir
        self.manifest = mf.read_manifest(index_dir)
        stats = self.manifest
        seg_dirname = "segments"
        if chain is not None and chain != self.manifest.get("analyzer"):
            extras = self.manifest.get("chains", {})
            if chain not in extras:
                raise KeyError(
                    f"chain {chain!r} not in this build (has: "
                    f"{self.manifest.get('analyzer')!r} + {sorted(extras)})"
                )
            stats = extras[chain]
            seg_dirname = f"segments-{chain}"
        self.chain = chain or self.manifest.get("analyzer")
        self.n_docs = int(self.manifest["n_docs"])
        self.avgdl = float(stats["avgdl"])
        self.num_parts = int(self.manifest["num_parts"])
        self.heavy = frozenset(stats.get("heavy_terms", ()))
        self.n_salt_runs = int(stats.get("n_salt_runs", 1))
        self.run_width = int(stats.get("run_width", 1 << 60))
        self._seg_dir = os.path.join(index_dir, seg_dirname)
        self._files: dict[int, pq.ParquetFile | None] = {}
        # hot-postings cache (term dictionary + postings page cache of a
        # real engine); bounded FIFO — query sets re-hit the same terms
        self._postings_cache: dict[str, TermPostings | None] = {}
        self._cache_cap = 4096

        # norms: dl per doc_id (0 for docs that analyzed to no tokens);
        # a doc_range shard holds only its slice
        if doc_range is None:
            self.doc_lo, self.doc_hi = 0, self.n_docs
            dl_arr = np.zeros(self.n_docs, dtype=np.uint32)
        else:
            self.doc_lo, self.doc_hi = int(doc_range[0]), int(doc_range[1])
            dl_arr = np.zeros(max(0, self.doc_hi - self.doc_lo), dtype=np.uint32)
        for fname in sorted(os.listdir(self._seg_dir)):
            # exact-suffix match: a crashed encode task can leave a
            # stale 'dl-*.parquet.tmp-<pid>' beside the real file —
            # reading it would crash (truncated) or double-count df
            if fname.startswith("dl-") and fname.endswith(".parquet"):
                t = pq.read_table(os.path.join(self._seg_dir, fname))
                ids = t["doc_id"].to_numpy()
                dls = t["dl"].to_numpy()
                if doc_range is not None:
                    keep = (ids >= self.doc_lo) & (ids < self.doc_hi)
                    ids, dls = ids[keep] - np.uint64(self.doc_lo), dls[keep]
                dl_arr[ids] = dls
        self.doclens = dl_arr if doc_range is None else _ShardNorms(self.doc_lo, dl_arr)

    # -- postings access ---------------------------------------------------
    def _segment_file(self, rpart: int) -> pq.ParquetFile | None:
        if rpart not in self._files:
            path = os.path.join(self._seg_dir, f"seg-{rpart:05d}.parquet")
            self._files[rpart] = pq.ParquetFile(path) if os.path.exists(path) else None
        return self._files[rpart]

    def _term_rows(self, term: str) -> list[dict]:
        part = term_part(term, self.num_parts)
        rparts = {part}
        if term in self.heavy:
            max_run = (self.n_docs - 1) // self.run_width if self.n_docs else 0
            rparts = {(part + r) % self.num_parts for r in range(max_run + 1)}
        rows: list[dict] = []
        for rp in sorted(rparts):
            f = self._segment_file(rp)
            if f is None:
                continue
            # row-group pruning via term statistics, then an exact filter
            groups = [
                i
                for i in range(f.metadata.num_row_groups)
                if _rg_may_contain(f.metadata.row_group(i), term)
            ]
            if not groups:
                continue
            t = f.read_row_groups(groups)
            mask = np.asarray(t["term"]) == term
            idx = np.flatnonzero(mask)
            for i in idx:
                rows.append({name: t[name][i].as_py() for name in t.column_names})
        # salted runs are disjoint doc-id ranges: first-block order is
        # global doc-id order (collided runs already merged at encode)
        rows.sort(key=lambda r: r["block_last"][0] if len(r["block_last"]) else 0)
        return rows

    def postings(self, term: str) -> TermPostings | None:
        """Full postings + block metadata for one term (None if absent)."""
        if term in self._postings_cache:
            return self._postings_cache[term]
        rows = self._term_rows(term)
        tp = TermPostings.from_rows(term, rows) if rows else None
        if len(self._postings_cache) >= self._cache_cap:
            self._postings_cache.pop(next(iter(self._postings_cache)))
        self._postings_cache[term] = tp
        return tp

    def decode_all(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """(doc_ids, tfs) fully decoded — the TAAT path."""
        tp = self.postings(term)
        return None if tp is None else tp.decode_all()

    # -- doc store ---------------------------------------------------------
    def fetch_docs(self, doc_ids: list[int], columns: list[str] | None = None):
        """Stored-field lookup (D9): rows from the docs store by id.
        The derivable catch-all ``text`` is synthesized on demand when
        requested (the store doesn't persist it)."""
        import pyarrow.dataset as pads

        # the docs store is immutable for this reader's lifetime —
        # memoize the dataset object so every fetch (search pages,
        # collapse, highlight) skips the per-call directory walk and
        # schema inference, like the cached segment file handles
        dset = getattr(self, "_docs_dset", None)
        if dset is None:
            dset = pads.dataset(
                os.path.join(self.index_dir, "docs"), partitioning="hive"
            )
            self._docs_dset = dset
        expr = pads.field("doc_id").isin([int(d) for d in doc_ids])
        if (
            columns is not None
            and "text" in columns
            and "text" not in dset.schema.names
        ):
            from ..stages.extract import SYNTHESIS_INPUT_COLUMNS, synthesize_text

            need = [c for c in columns if c != "text"]
            read_cols = list(
                dict.fromkeys(need + list(SYNTHESIS_INPUT_COLUMNS))
            )
            t = dset.to_table(filter=expr, columns=read_cols)
            return synthesize_text(t).select(columns)
        return dset.to_table(filter=expr, columns=columns)

    def stored_mask(self, col: str, op: str, value) -> np.ndarray:
        """Bool mask over this reader's doc range for a stored-field
        predicate — the docs-store half of Lucene range/term filters
        (query-DSL ``range`` clauses lower onto this).  Position ``i``
        answers for doc ``doc_lo + i``; the scan is row-group-pruned
        to the range (doc ids are written sorted) and the mask is
        memoized for the reader's lifetime, so corpus-wide filter
        state stays WITH the reader (one slice per shard on the
        sharded tier — never driver-resident).

        ISO-8601 strings are accepted for timestamp columns (query
        DSL bodies arrive as JSON, which has no datetime type)."""
        key = (col, op, repr(value))
        masks = getattr(self, "_stored_masks", None)
        if masks is None:
            masks = self._stored_masks = {}
        mask = masks.get(key)
        if mask is None:
            import pyarrow as pa
            import pyarrow.dataset as pads

            dset = getattr(self, "_docs_dset", None)
            if dset is None:
                dset = self._docs_dset = pads.dataset(
                    os.path.join(self.index_dir, "docs"), partitioning="hive"
                )
            if op == "exists" and col not in dset.schema.names:
                # OpenSearch `exists` on an unmapped field matches
                # nothing (every OTHER op on a missing column raises)
                mask = np.zeros(max(0, self.doc_hi - self.doc_lo), bool)
                masks[key] = mask
                return mask
            if isinstance(value, str) and pa.types.is_timestamp(
                dset.schema.field(col).type
            ):
                import datetime as _dt

                value = _dt.datetime.fromisoformat(value)
            f = pads.field(col)
            try:
                expr = {
                    ">=": f >= value,
                    ">": f > value,
                    "<=": f <= value,
                    "<": f < value,
                    "==": f == value,
                    "!=": f != value,
                    "exists": f.is_valid(),
                }[op]
            except KeyError:
                raise ValueError(f"unknown predicate op {op!r}") from None
            lo, hi = self.doc_lo, self.doc_hi
            t = dset.to_table(
                filter=(pads.field("doc_id") >= lo)
                & (pads.field("doc_id") < hi)
                & expr,
                columns=["doc_id"],
            )
            mask = np.zeros(max(0, hi - lo), dtype=bool)
            mask[t["doc_id"].to_numpy().astype(np.int64) - lo] = True
            masks[key] = mask
        return mask

    def stored_column(self, col: str):
        """This reader's doc-range slice of stored column ``col``,
        aligned so position ``i`` holds doc ``doc_lo + i``'s value —
        read ONCE from the docs store (row-group stats prune the scan
        to the range) and memoized for the reader's lifetime, like
        the norms and ``stored_mask``.  On the sharded tier every
        shard holds only ITS slice — corpus-wide column state lives
        with the fleet, never on the driver.  The field-``sort``
        surface (``query/sortq.py``) and the serving facets read
        through this."""
        import pyarrow as pa

        cols = getattr(self, "_stored_cols", None)
        if cols is None:
            cols = self._stored_cols = {}
        arr = cols.get(col)
        if arr is None:
            import pyarrow.dataset as pads

            dset = getattr(self, "_docs_dset", None)
            if dset is None:
                dset = self._docs_dset = pads.dataset(
                    os.path.join(self.index_dir, "docs"), partitioning="hive"
                )
            lo, hi = self.doc_lo, self.doc_hi
            t = dset.to_table(
                filter=(pads.field("doc_id") >= lo)
                & (pads.field("doc_id") < hi),
                columns=["doc_id"] if col == "doc_id" else ["doc_id", col],
            )
            if t.num_rows != hi - lo:
                raise ValueError(
                    f"docs store has {t.num_rows} rows in [{lo}, {hi}) — "
                    f"expected {hi - lo} (one per doc id)"
                )
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            perm = np.empty(hi - lo, np.int64)
            perm[ids - lo] = np.arange(hi - lo)
            arr = t[col].combine_chunks().take(pa.array(perm))
            cols[col] = arr
        return arr

    def vector_matrix(self, name: str = "emb") -> tuple[np.ndarray, np.ndarray]:
        """This reader's doc-range slice of the vector sidecar ``name``
        (``index/vectors.py``): ``(V, valid)`` where ``V`` is a
        ``float32 (range, dim)`` matrix of L2-normalized vectors
        aligned like ``stored_column`` (row ``i`` = doc ``doc_lo+i``;
        missing docs are zero rows) and ``valid`` the has-a-vector
        mask.  Loaded ONCE (vpart hive pruning restricts the read to
        the range) and memoized — a shard actor of the serving fleet
        holds only ITS slice, the k-NN analog of the sharded norms.
        Raises ``FileNotFoundError`` when no sidecar is attached."""
        mats = getattr(self, "_vec_mats", None)
        if mats is None:
            mats = self._vec_mats = {}
        got = mats.get(name)
        if got is None:
            from ..index.vectors import load_vector_slice

            got = mats[name] = load_vector_slice(
                self.index_dir, name, self.doc_lo, self.doc_hi
            )
        return got

    def deleted_ids(self) -> np.ndarray:
        """Sorted tombstoned doc ids (soft deletes — ``index/deletes``),
        loaded once per reader like the norms."""
        if not hasattr(self, "_deleted"):
            from ..index.deletes import load_delete_ids

            self._deleted = load_delete_ids(self.index_dir)
        return self._deleted

    @property
    def has_deletes(self) -> bool:
        return len(self.deleted_ids()) > 0

    def match_all_count(self) -> int:
        """The reference integration test's only query (D10) — LIVE
        docs only (tombstones excluded, OpenSearch count semantics)."""
        return self.n_docs - len(self.deleted_ids())

    def term_dictionary(self) -> tuple[np.ndarray, np.ndarray]:
        """The loaded term dictionary: ``(sorted_terms, total_dfs)``.

        Loaded ONCE per reader (the term-dictionary state of a query
        actor — SURVEY §7 step 7) from each segment file's (term, df)
        columns; df sums across a term's runs (salted / merged rows).
        At 10^12 docs the dictionary shards with the query actors —
        each actor serves a term-hash range and loads only its
        partitions' dictionaries; this single-node reader loads all.
        """
        if getattr(self, "_term_dict", None) is None:
            parts = []
            for fname in sorted(os.listdir(self._seg_dir)):
                if fname.startswith("seg-") and fname.endswith(".parquet"):
                    parts.append(
                        pq.read_table(
                            os.path.join(self._seg_dir, fname), columns=["term", "df"]
                        )
                    )
            if not parts:
                self._term_dict = (np.empty(0, object), np.empty(0, np.int64))
            else:
                t = pa.concat_tables(parts)
                terms = np.asarray(t["term"].to_pylist(), dtype=object)
                dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
                order = np.argsort(terms, kind="mergesort")
                terms, dfs = terms[order], dfs[order]
                starts = np.flatnonzero(
                    np.concatenate(([True], terms[1:] != terms[:-1]))
                )
                self._term_dict = (
                    terms[starts],
                    np.add.reduceat(dfs, starts),
                )
        return self._term_dict

    def term_df(self, term: str) -> int:
        """Total df of one term (0 if absent) via the dictionary."""
        terms, dfs = self.term_dictionary()
        i = np.searchsorted(terms, term)
        if i < len(terms) and terms[i] == term:
            return int(dfs[i])
        return 0

    def prefix_terms(self, prefix: str, limit: int = 10) -> list[tuple[str, int]]:
        """Terms starting with ``prefix``, by descending total df (term
        asc tie-break) — the suggester primitive behind the trigram /
        reverse sub-fields (D2/D3).  A binary-search range over the
        loaded term dictionary: O(log V + hits) per call instead of a
        per-call scan of every segment file."""
        terms, dfs = self.term_dictionary()
        lo = np.searchsorted(terms, prefix)
        ub = prefix_upper_bound(prefix)
        hi = np.searchsorted(terms, ub) if ub is not None else len(terms)
        top = sorted(
            zip(terms[lo:hi].tolist(), dfs[lo:hi].tolist()),
            key=lambda kv: (-kv[1], kv[0]),
        )
        return [(t, int(d)) for t, d in top[:limit]]


def _rg_may_contain(rg_meta, term: str) -> bool:
    col = rg_meta.column(0)  # term is the first schema column
    st = col.statistics
    if st is None or not st.has_min_max:
        return True
    return st.min <= term <= st.max


