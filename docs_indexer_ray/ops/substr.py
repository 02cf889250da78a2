"""Exact substring deduplication (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better" — the ExactSubstr
variant, re-expressed over fixed-length grams).

Semantics: every position whose length-``gram_len`` substring occurs
≥ 2 times anywhere in the corpus is MASKED, except the single
globally-first occurrence of each distinct gram (first = smallest
``(doc_id, pos)``).  Masked positions cover char ranges
``[pos, pos+gram_len)``; the union of those ranges per doc is the
duplicated text to cut.  A duplicated span of length ≥ ``gram_len``
is covered exactly (every window inside it is itself duplicated), so
this is the paper's suffix-array criterion restricted to spans ≥ L,
without the suffix-array build.

Shape at scale (the honest cost of EXACT substring dedup):

* the gram stream is O(total_chars) rows — unavoidable for exactness
  (suffix arrays are O(total_chars) too) — but each row is THREE
  int64s (two independent 64-bit rolling hashes + a packed
  ``doc_id:pos``), ~24 B, not the L-char gram text (≈ gram_len × 4
  bytes as UTF-32): ~8× lighter through the all-to-all at L = 50;
* hashing is fully vectorized: ONE prefix-sum pass per batch over the
  concatenated codepoints (wrapped uint64 polynomial hash, window
  hash recovered as ``(S[i+L] − S[i]) · B⁻ⁱ`` — B odd is invertible
  mod 2⁶⁴), no Python loop over docs or positions;
* duplicate detection is ``groupby(gpart).map_groups`` with a
  vectorized lexsort + run scan per partition — each distinct gram's
  group lands in one partition, so "keep the global first" is a
  per-run ``argmin`` with no driver state;
* grams are identified by the 128-bit pair ``(h1, h2)``; at 5·10¹⁴
  grams (10¹² docs) the false-collision probability is ~4·10⁻¹⁰.
  ``verify_exact=True`` re-reads the candidate grams' text (masked
  positions are DUP-scale, not corpus-scale) and drops any
  hash-collision false positives — exact at oracle scale, optional
  at corpus scale;
* the per-doc stats pass re-reads only ``(doc_id,)`` + lengths with
  the affected-doc set broadcast as a packed bitmap (``ray.put``
  once, zero-copy in every task), so nothing corpus-scale reaches
  the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "masked_positions",
    "substring_dedup_stats",
    "substring_dedup",
]

_B1 = np.uint64(0x100000001B3)  # FNV prime (odd → invertible mod 2^64)
_B2 = np.uint64(0x9E3779B97F4A7C15 | 1)  # golden-ratio constant, forced odd
_INV1 = np.uint64(pow(int(_B1), -1, 1 << 64))
_INV2 = np.uint64(pow(int(_B2), -1, 1 << 64))
_POS_BITS = 24  # pos < 16M chars/doc; doc_id gets 39 usable bits (sign stays 0)


def _gather(ds, schema: pa.Schema) -> pa.Table:
    """Concat a dataset's blocks via the shared collector
    (:func:`docs_indexer_ray.collect.tables_of` handles the
    zero-column blocks empty groupby partitions emit), with a typed
    empty table for the nothing-at-all case."""
    from ..collect import tables_of

    parts = tables_of(ds)
    if not parts:
        return schema.empty_table()
    return pa.concat_tables([t.select(schema.names) for t in parts])


def _codepoints(texts: list[str | None]) -> tuple[np.ndarray, np.ndarray]:
    """Batch of strings → (concatenated uint64 codepoint array,
    int64 doc start offsets of len(texts)+1)."""
    bufs = [(t or "").encode("utf-32-le") for t in texts]
    lens = np.fromiter((len(b) >> 2 for b in bufs), np.int64, len(bufs))
    starts = np.concatenate(([0], np.cumsum(lens)))
    if starts[-1] == 0:
        return np.empty(0, np.uint64), starts
    cat = np.frombuffer(b"".join(bufs), dtype="<u4").astype(np.uint64)
    return cat, starts


def _window_hashes(
    cat: np.ndarray, starts: np.ndarray, L: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All length-L windows fully inside one doc → (h1, h2, global
    window start g).  Caller maps g back to (doc, local pos)."""
    n = len(cat)
    if n < L:
        e = np.empty(0, np.uint64)
        return e, e, np.empty(0, np.int64)
    idx = np.arange(n, dtype=np.uint64)
    out = []
    for base, inv in ((_B1, _INV1), (_B2, _INV2)):
        pw = np.power(base, idx)  # wrapped uint64 B^j
        ipw = np.power(inv, idx[: n - L + 1])
        s = np.concatenate(([np.uint64(0)], np.cumsum(cat * pw)))
        out.append((s[L:] - s[: n - L + 1]) * ipw)
    g = np.arange(n - L + 1, dtype=np.int64)
    # windows must not straddle a doc boundary
    doc = np.searchsorted(starts, g, side="right") - 1
    ok = g + L <= starts[doc + 1]
    return out[0][ok], out[1][ok], g[ok]


def _gram_rows_fn(text_col: str, id_col: str, L: int, num_parts: int):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cat, starts = _codepoints(batch[text_col].to_pylist())
        h1, h2, g = _window_hashes(cat, starts, L)
        doc = np.searchsorted(starts, g, side="right") - 1
        pos = g - starts[doc]
        if pos.size and int(pos.max()) >= (1 << _POS_BITS):
            raise ValueError(
                f"doc longer than {1 << _POS_BITS} chars; raise _POS_BITS"
            )
        # doc_id gets the remaining 39 usable bits (64 − 24 − sign):
        # an id outside [0, 2^39) would wrap the shift negative and
        # silently corrupt both the first-occurrence ordering and the
        # decode — fail as loudly as the pos guard above
        if len(ids) and (
            int(ids.min()) < 0 or int(ids.max()) >= (1 << (63 - _POS_BITS))
        ):
            raise ValueError(
                f"{id_col} outside [0, 2^{63 - _POS_BITS}): the "
                "doc_id:pos packing cannot represent it"
            )
        dp = (ids[doc] << _POS_BITS) | pos
        return pa.table(
            {
                "h1": pa.array(h1.view(np.int64), pa.int64()),
                "h2": pa.array(h2.view(np.int64), pa.int64()),
                "dp": pa.array(dp, pa.int64()),
                "gpart": pa.array(
                    (h1 % np.uint64(num_parts)).astype(np.int32), pa.int32()
                ),
            }
        )

    return fn


def _masked_of_partition(t: pa.Table) -> pa.Table:
    """Gram-hash partition → masked (doc_id, pos) rows: every member
    of a duplicated (h1, h2) run except the min-dp (global-first)."""
    h1 = t["h1"].to_numpy(zero_copy_only=False)
    h2 = t["h2"].to_numpy(zero_copy_only=False)
    dp = t["dp"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dp, h2, h1))
    h1, h2, dp = h1[order], h2[order], dp[order]
    new = np.concatenate(([True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])))
    # within a run rows are dp-ascending — the first is the keeper
    dpm = dp[~new]
    return pa.table(
        {
            "doc_id": pa.array(dpm >> _POS_BITS, pa.int64()),
            "pos": pa.array(dpm & ((1 << _POS_BITS) - 1), pa.int64()),
        }
    )


def masked_positions(
    docs_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_len: int = 50,
    num_parts: int = 32,
    verify_exact: bool = False,
):
    """Dataset of masked ``(doc_id, pos)`` duplicated-gram positions
    (see module docstring for the keep-global-first semantics)."""
    grams = docs_ds.map_batches(
        _gram_rows_fn(text_col, id_col, gram_len, num_parts),
        batch_format="pyarrow",
    )
    masked = grams.groupby("gpart").map_groups(
        _masked_of_partition, batch_format="pyarrow"
    )
    if verify_exact:
        masked = _verify_masked(
            masked, docs_ds, text_col, id_col, gram_len
        )
    return masked


def _verify_masked(masked_ds, docs_ds, text_col, id_col, L):
    """Drop hash-collision false positives: re-extract the gram text
    at every masked position AND at the corresponding keeper position
    is unnecessary — a masked position is a false positive only if
    its gram text occurs exactly once in the corpus, so re-counting
    the candidate grams' text suffices.  Masked positions are
    dup-scale; the broadcast below is therefore output-scale."""
    import ray

    mt = _gather(masked_ds, pa.schema(
        [("doc_id", pa.int64()), ("pos", pa.int64())]))
    by_doc: dict[int, np.ndarray] = {}
    if mt.num_rows:
        d = mt["doc_id"].to_numpy(zero_copy_only=False)
        p = mt["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        cuts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
        ends = np.append(cuts[1:], len(d))
        for s, e in zip(cuts, ends):
            by_doc[int(d[s])] = p[s:e]
    ref = ray.put(by_doc)

    def grams_at(batch: pa.Table) -> pa.Table:
        bd = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        out_d, out_p, out_g = [], [], []
        for did, txt in zip(ids, texts):
            ps = bd.get(int(did))
            if ps is None:
                continue
            txt = txt or ""
            for q in ps:
                out_d.append(int(did))
                out_p.append(int(q))
                out_g.append(txt[q : q + L])
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "pos": pa.array(out_p, pa.int64()),
                "gram": pa.array(out_g, pa.string()),
            }
        )

    # candidate grams with their text; a false positive's gram text
    # appears at NO OTHER masked-or-keeper position — detectable as a
    # gram whose full-corpus occurrence count is 1.  Count via one
    # more pruned pass restricted to candidate docs' texts.
    cand = _gather(
        docs_ds.map_batches(grams_at, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("pos", pa.int64()),
                   ("gram", pa.string())]))
    if cand.num_rows == 0:
        return masked_ds
    import ray.data as rd

    # recount candidate gram text against the whole corpus
    gram_set = set(cand["gram"].to_pylist())
    gref = ray.put(gram_set)

    def count_hits(batch: pa.Table) -> pa.Table:
        gs = ray.get(gref)
        texts = batch[text_col].to_pylist()
        counts: dict[str, int] = {}
        for txt in texts:
            txt = txt or ""
            for q in range(len(txt) - L + 1):
                w = txt[q : q + L]
                if w in gs:
                    counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {
                "gram": pa.array(list(counts), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    hits = _gather(
        docs_ds.map_batches(count_hits, batch_format="pyarrow"),
        pa.schema([("gram", pa.string()), ("n", pa.int64())]))
    agg = hits.group_by("gram").aggregate([("n", "sum")])
    dup = {
        g for g, n in zip(agg["gram"].to_pylist(), agg["n_sum"].to_pylist())
        if n >= 2
    }
    keep = pc.is_in(cand["gram"], value_set=pa.array(list(dup), pa.string()))
    out = cand.filter(keep).select(["doc_id", "pos"])
    return rd.from_arrow(out)


def substring_dedup_stats(
    docs_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_len: int = 50,
    num_parts: int = 32,
) -> pa.Table:
    """Per-affected-doc duplication stats → ``(doc_id, masked_chars,
    kept_chars)`` sorted by doc_id (docs with nothing masked are
    omitted — the result is dup-scale, not corpus-scale).

    ``masked_chars`` = |union of ``[pos, pos+gram_len)`` over the
    doc's masked positions| (vectorized interval union);
    ``kept_chars`` = doc length − masked_chars, lengths fetched with
    one pruned pass filtered by an affected-doc bitmap broadcast."""
    import ray

    masked = masked_positions(docs_ds, text_col, id_col, gram_len, num_parts)
    mt = _gather(masked, pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())]))
    if mt.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "masked_chars": pa.array([], pa.int64()),
                "kept_chars": pa.array([], pa.int64()),
            }
        )
    d = mt["doc_id"].to_numpy(zero_copy_only=False)
    p = mt["pos"].to_numpy(zero_copy_only=False)
    order = np.lexsort((p, d))
    d, p = d[order], p[order]
    new_doc = np.concatenate(([True], d[1:] != d[:-1]))
    # covered[i] = min(L, next_pos - pos) within a doc; last of doc = L
    gap = np.empty(len(p), np.int64)
    gap[:-1] = p[1:] - p[:-1]
    gap[-1] = gram_len
    gap[np.flatnonzero(new_doc[1:])] = gram_len  # doc-final positions
    covered = np.minimum(gap, gram_len)
    doc_idx = np.cumsum(new_doc) - 1
    doc_ids = d[new_doc]
    masked_chars = np.bincount(doc_idx, weights=covered).astype(np.int64)

    # fetch affected docs' lengths (bitmap broadcast, dup-scale result)
    from docs_indexer_ray.query.facets import _member_mask, _pack_bitmap

    bits_ref = ray.put(_pack_bitmap(doc_ids))

    def lens_of(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.filter(pa.array(_member_mask(bits, ids)))
        return pa.table(
            {
                "doc_id": t[id_col].cast(pa.int64()),
                "blen": pc.utf8_length(t[text_col]).cast(pa.int64()),
            }
        )

    lens = _gather(
        docs_ds.map_batches(lens_of, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("blen", pa.int64())]))
    blen = dict(zip(lens["doc_id"].to_pylist(), lens["blen"].to_pylist()))
    kept = np.array(
        [blen[int(i)] for i in doc_ids], np.int64
    ) - masked_chars
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "masked_chars": pa.array(masked_chars, pa.int64()),
            "kept_chars": pa.array(kept, pa.int64()),
        }
    )


def substring_dedup(
    docs_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_len: int = 50,
    num_parts: int = 32,
):
    """Docs dataset with duplicated substrings CUT out of ``text_col``
    (chars in the union of masked ``[pos, pos+gram_len)`` ranges are
    removed; everything else is preserved in order).

    The mask table is dup-scale; it is broadcast once (``ray.put``)
    and applied per batch.  At corpus-scale dup rates swap the
    broadcast for a partitioned join on ``doc_id`` (ops/join.py's
    ``hash_join`` shape) — the cut kernel is unchanged."""
    import ray

    masked = masked_positions(docs_ds, text_col, id_col, gram_len, num_parts)
    mt = _gather(masked, pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())]))
    by_doc: dict[int, np.ndarray] = {}
    if mt.num_rows:
        d = mt["doc_id"].to_numpy(zero_copy_only=False)
        p = mt["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        cuts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
        ends = np.append(cuts[1:], len(d))
        for s, e in zip(cuts, ends):
            by_doc[int(d[s])] = p[s:e]
    ref = ray.put(by_doc)
    L = gram_len

    def cut(batch: pa.Table) -> pa.Table:
        bd = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        out = []
        for did, txt in zip(ids, texts):
            ps = bd.get(int(did))
            if ps is None or txt is None:
                out.append(txt)
                continue
            keep_mask = np.ones(len(txt), bool)
            for q in ps:
                keep_mask[q : q + L] = False
            out.append("".join(np.array(list(txt))[keep_mask]) if len(txt) else txt)
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, pa.array(out, pa.string()))

    return docs_ds.map_batches(cut, batch_format="pyarrow")
