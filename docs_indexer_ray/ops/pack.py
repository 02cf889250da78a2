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

Vocabulary state: collected once (per-batch distinct → driver sorted
unique — vocabulary-scale, the same footprint the suggester already
holds) and broadcast via ``ray.put``; each group task does ONE
``np.searchsorted`` per doc batch, no per-token Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.analyzer import Analyzer

__all__ = ["collect_vocab", "pack_sequences"]


def collect_vocab(ds, text_col: str = "text", chain: str = "simple") -> np.ndarray:
    """Sorted distinct analyzer terms of the corpus (the id space).

    Per-batch local distinct (vectorized set) → small per-batch rows →
    driver unique.  Only distinct-term strings ever leave a task."""
    an = Analyzer(chain)

    def local(batch: pa.Table) -> pa.Table:
        seen: set[str] = set()
        for t in batch[text_col].to_pylist():
            seen.update(an(t or ""))
        return pa.table({"term": pa.array(sorted(seen), pa.string())})

    parts = ds.map_batches(local, batch_format="pyarrow").take_all()
    vocab = np.unique(np.array([r["term"] for r in parts], dtype=object))
    return vocab


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
        for txt in df[text_col].tolist():
            toks = an(txt or "")
            if toks:
                tid = np.searchsorted(voc, np.array(toks, dtype=object))
                ids_parts.append(tid.astype(np.int64))
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
        lambda t: t.append_column(
            "bucket", pa.array(t[id_col].to_numpy(zero_copy_only=False) // bucket_size)
        ),
        batch_format="pyarrow",
    )
    return keyed.groupby("bucket").map_groups(pack_group)
