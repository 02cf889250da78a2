"""Training-sequence packing: docs → fixed-length token-id sequences.

The last stage of a training-data pipeline (GPT-style "document
packing"): tokenize each document, append an EOS id, concatenate the
stream in doc order, and slice it into fixed ``seq_len`` windows.

Scale shape — packing is defined PER BUCKET of contiguous doc ids
(``doc_id // bucket_size``), the way real jobs pack per input shard:
the stream restarts at every bucket boundary, so buckets are
independent and the whole op is one ``groupby(bucket).map_groups``
with **no prefix-sum coordination, no driver pass, no shuffle beyond
the one bucket groupby**.  A global single-stream variant would need
an exclusive prefix sum of per-doc token counts across the corpus —
strictly more machinery for a semantics no trainer needs (shard
boundaries between sequences are standard).

Token ids are the rank of the term in the SORTED corpus vocabulary
(deterministic, engine-independent — a SQL ``dense_rank`` reproduces
them), EOS = vocab size.  The emitted per-sequence row is a compact
verifiable digest — ``(bucket, seq, n_tokens, sum_ids, first_id,
last_id)`` — rather than the id arrays themselves; a writer that
needs the arrays materializes them the same way inside the group
kernel (`_pack_group` yields them before digesting).

Vocabulary state: collected once — per-batch distinct (combiner)
→ ONE ``groupby(term)`` shuffle (the distributed distinct, so the
driver never sees duplicate terms from different batches) → driver
holds only the truly-distinct sorted vocabulary, the exact footprint
the ``ray.put`` broadcast needs (the suggester's term dictionary is
the same size); each group task does ONE ``np.searchsorted`` per doc
batch, no per-token Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.analyzer import Analyzer

__all__ = ["collect_vocab", "pack_sequences", "tokenize_to_ids", "pack_ids"]


def collect_vocab(ds, text_col: str = "text", chain: str = "simple") -> np.ndarray:
    """Sorted distinct analyzer terms of the corpus (the id space).

    Per-batch local distinct (the combiner — only a batch's distinct
    term strings leave a task) → ONE ``groupby(term)`` shuffle (the
    DISTRIBUTED distinct: cross-batch duplicate folding happens in the
    reduce tasks, the same one-shuffle shape as ``bpe.py``'s word
    count) → the driver collects blocks of already-globally-distinct
    terms and sorts.  Driver memory is exactly vocabulary-scale — the
    unavoidable footprint of the ``ray.put`` broadcast the packers do
    next (a web-scale 10^8-term vocabulary at ~10 B/term is ~1 GB:
    broadcast-able; the pre-fix per-batch-duplicates union was
    corpus-batch-scale and unbounded)."""
    import ray

    an = Analyzer(chain)

    def local(batch: pa.Table) -> pa.Table:
        seen: set[str] = set()
        for t in batch[text_col].to_pylist():
            seen.update(an(t or ""))
        return pa.table({"term": pa.array(sorted(seen), pa.string())})

    distinct = (
        ds.map_batches(local, batch_format="pyarrow").groupby("term").count()
    )
    parts = [
        ray.get(r)
        for r in distinct.materialize().to_arrow_refs()
    ]
    cols = [p["term"].combine_chunks() for p in parts if p.num_rows]
    if not cols:
        return np.empty(0, object)
    terms = pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols]
    )
    # post-groupby blocks are globally duplicate-free: sort, don't unique
    return np.sort(np.asarray(terms.to_pylist(), dtype=object))


def pack_sequences(
    ds,
    vocab: np.ndarray,
    seq_len: int = 64,
    bucket_size: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    chain: str = "simple",
):
    """Per-bucket packed-sequence digests (see module docstring).

    Returns a Dataset of ``(bucket, seq, n_tokens, sum_ids, first_id,
    last_id)`` — every column int64.  The final sequence of a bucket
    may be shorter than ``seq_len`` (no padding; trainers drop or pad
    it downstream)."""
    import ray
    import ray.data  # noqa: F401

    eos = int(len(vocab))
    vocab_ref = ray.put(vocab.astype(object))

    def pack_group(df):
        import pandas as pd

        voc = ray.get(vocab_ref)
        an = Analyzer(chain)
        df = df.sort_values(id_col)
        ids_parts = []
        unk = np.int64(eos + 1)
        for txt in df[text_col].tolist():
            toks = an(txt or "")
            if toks:
                arr = np.array(toks, dtype=object)
                tid = np.searchsorted(voc, arr).astype(np.int64)
                # searchsorted is an insertion point, not a lookup: an
                # out-of-vocab token (vocab built from another corpus
                # or chain) would silently take a neighbor's id — or
                # exactly the EOS id when it sorts past the vocabulary.
                # Verify membership and map misses to unk = eos+1, the
                # same contract as tokenize_to_ids.
                inb = tid < len(voc)
                ok = np.zeros(len(arr), bool)
                ok[inb] = voc[tid[inb]] == arr[inb]
                tid = np.where(ok, tid, unk)
                ids_parts.append(tid)
            ids_parts.append(np.array([eos], np.int64))
        stream = np.concatenate(ids_parts)
        n = len(stream)
        seq = np.arange(n, dtype=np.int64) // seq_len
        n_seqs = int(seq[-1]) + 1
        counts = np.bincount(seq, minlength=n_seqs).astype(np.int64)
        sums = np.bincount(seq, weights=stream, minlength=n_seqs).astype(np.int64)
        starts = np.arange(n_seqs, dtype=np.int64) * seq_len
        ends = np.minimum(starts + seq_len, n) - 1
        bucket = int(df[id_col].iloc[0]) // bucket_size
        return pd.DataFrame(
            {
                "bucket": np.full(n_seqs, bucket, np.int64),
                "seq": np.arange(n_seqs, dtype=np.int64),
                "n_tokens": counts,
                "sum_ids": sums,
                "first_id": stream[starts],
                "last_id": stream[ends],
            }
        )

    keyed = ds.map_batches(
        # strip parquet-borne pandas schema metadata: the groupby
        # reduce hashes block schemas for dedup and logs "unhashable
        # type: 'dict'" for every task otherwise
        lambda t: t.replace_schema_metadata(None).append_column(
            "bucket", pa.array(t[id_col].to_numpy(zero_copy_only=False) // bucket_size)
        ),
        batch_format="pyarrow",
    )
    return keyed.groupby("bucket").map_groups(pack_group)


def tokenize_to_ids(
    ds,
    vocab: np.ndarray,
    text_col: str = "text",
    id_col: str = "doc_id",
    chain: str = "simple",
):
    """Tokenize each doc to its sorted-vocab-rank id list (the
    ``pack_sequences`` id space as a REAL ``large_list<int64>``
    column) → Dataset of ``(id_col, token_ids, n_tokens)``.  Vocab is
    broadcast once (``ray.put``); per batch ONE ``np.searchsorted``
    over the batch's flattened tokens — no per-token Python.  Terms
    outside ``vocab`` map to ``len(vocab)+1`` (distinct from the EOS
    id ``len(vocab)`` that :func:`pack_ids` appends)."""
    import ray

    vocab_ref = ray.put(np.asarray(vocab, dtype=object))
    an = Analyzer(chain)

    def fn(t: pa.Table) -> pa.Table:
        voc = ray.get(vocab_ref)
        unk = np.int64(len(voc) + 1)
        flats: list[np.ndarray] = []
        counts = np.empty(t.num_rows, np.int64)
        for i, txt in enumerate(t[text_col].to_pylist()):
            toks = an(txt or "")
            if toks:
                arr = np.array(toks, dtype=object)
                tid = np.searchsorted(voc, arr).astype(np.int64)
                # searchsorted gives the insertion point; verify membership
                inb = tid < len(voc)
                ok = np.zeros(len(arr), bool)
                ok[inb] = voc[tid[inb]] == arr[inb]
                tid = np.where(ok, tid, unk)
                flats.append(tid)
                counts[i] = len(tid)
            else:
                counts[i] = 0
        flat = np.concatenate(flats) if flats else np.array([], np.int64)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        return pa.table(
            {
                id_col: t[id_col],
                "token_ids": pa.LargeListArray.from_arrays(
                    pa.array(offsets, pa.int64()), pa.array(flat, pa.int64())
                ),
                "n_tokens": pa.array(counts),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def pack_ids(
    enc_ds,
    seq_len: int,
    eos_id: int,
    bucket_size: int = 100,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
):
    """Pack pre-tokenized id lists (e.g. :func:`tokenize_to_ids` or
    ``ops/bpe.py::bpe_encode`` output) into the ACTUAL fixed-length
    training sequences — the artifact a trainer reads — unlike
    :func:`pack_sequences`, which emits only the verification digest.

    Same bucket semantics (stream restarts at every ``doc_id //
    bucket_size`` boundary → independent groups, one groupby, no
    prefix-sum coordination): within a bucket, docs concatenate in
    ``id_col`` order with ``eos_id`` appended after each doc, and the
    stream slices into ``seq_len`` windows (final window unpadded —
    trainers drop or pad downstream).  Returns a Dataset of
    ``(bucket, seq, input_ids: large_list<int64>, n_tokens)``.

    The group kernel is fully vectorized: EOS insertion is one
    scatter (``stream[idx] = flat`` with ``idx`` shifted by the doc
    ordinal), slicing is one offsets array — no per-token Python."""

    def pack_group(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.sort_by(id_col)
        ids = t[ids_col].combine_chunks()
        flat = ids.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = ids.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = t.num_rows
        counts = np.diff(offs)
        total = int(flat.size + n_docs)
        stream = np.empty(total, np.int64)
        idx = np.arange(flat.size, dtype=np.int64) + np.repeat(
            np.arange(n_docs, dtype=np.int64), counts
        )
        stream[idx] = flat
        stream[offs[1:] + np.arange(n_docs, dtype=np.int64)] = np.int64(eos_id)
        n_seqs = (total + seq_len - 1) // seq_len
        seq_offs = np.minimum(
            np.arange(n_seqs + 1, dtype=np.int64) * seq_len, total
        )
        bucket = int(pc.min(t["bucket"]).as_py())
        return pa.table(
            {
                "bucket": pa.array(np.full(n_seqs, bucket, np.int64)),
                "seq": pa.array(np.arange(n_seqs, dtype=np.int64)),
                "input_ids": pa.LargeListArray.from_arrays(
                    pa.array(seq_offs, pa.int64()),
                    pa.array(stream, pa.int64()),
                ),
                "n_tokens": pa.array(np.diff(seq_offs)),
            }
        )

    keyed = enc_ds.map_batches(
        lambda t: t.append_column(
            "bucket",
            pa.array(t[id_col].to_numpy(zero_copy_only=False) // bucket_size),
        ),
        batch_format="pyarrow",
    )
    return keyed.groupby("bucket").map_groups(pack_group, batch_format="pyarrow")
