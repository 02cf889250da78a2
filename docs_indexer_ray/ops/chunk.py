"""Sliding-window document chunking — training/embedding window prep.

Long documents don't fit model contexts; every embedding / pretraining
pipeline splits them into token windows with overlap (stride < window
keeps boundary context, the HuggingFace ``return_overflowing_tokens``
shape).  ``chunk_documents`` emits one row per window:

    (doc_id, chunk_idx, start_tok, n_tokens, chunk_text)

Window starts go ``0, stride, 2·stride, …`` while ``start <
n_tokens``; the trailing windows may be short (trainers pad or drop —
same contract as ``ops/pack.py``).  Empty docs emit nothing.

Shape at scale: ONE streaming ``map_batches`` — a doc's windows never
leave its batch, no shuffle.  Tokenization is the vectorized Arrow
split kernel; window start arithmetic is numpy over the flattened
token array; only the output-string assembly (a join per emitted
chunk) is per-row Python, and that IS the output.  A DuckDB replay
(``generate_series`` starts × list slicing) pins the semantics
bit-exactly, whitespace tokens and all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["chunk_documents"]


def chunk_documents(
    ds,
    window: int = 64,
    stride: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Overlapping whitespace-token windows per document.

    ``stride`` may equal ``window`` (disjoint chunks) or be smaller
    (overlap); ``stride > window`` would silently drop tokens and is
    rejected."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        raise ValueError("stride > window drops tokens — not allowed")

    def fn(t: pa.Table) -> pa.Table:
        arr = t[text_col].combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_trim_whitespace(arr), pattern=r"\s+")
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = offs[1:] - offs[:-1]
        # an empty text splits to [''] — treat as zero tokens
        if len(lists.values):
            first_empty = (
                pc.utf8_length(lists.values).to_numpy(zero_copy_only=False)[
                    offs[:-1].clip(max=len(lists.values) - 1)
                ]
                == 0
            )
            n_tok = np.where((n_tok == 1) & first_empty, 0, n_tok)

        # vectorized over docs; the only loop is the chunk ORDINAL
        # (corpus-independent, ~n_tok_max/stride iterations): slice the
        # token lists of every still-emitting doc at once and join —
        # no per-token Python, no per-chunk join loop
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            }
        )
        if len(n_tok) == 0 or int(n_tok.max()) == 0:
            return empty
        out = []
        k = 0
        while k * stride < int(n_tok.max()):
            st = k * stride
            sel = n_tok > st
            sel_arr = pa.array(sel)
            sliced = pc.list_slice(
                lists.filter(sel_arr), start=st, stop=st + window
            )
            txts = pc.binary_join(sliced, " ")
            take = np.minimum(window, n_tok[sel] - st)
            out.append(
                pa.table(
                    {
                        id_col: pa.array(ids[sel], pa.int64()),
                        "chunk_idx": pa.array(
                            np.full(int(sel.sum()), k, np.int64)
                        ),
                        "start_tok": pa.array(
                            np.full(int(sel.sum()), st, np.int64)
                        ),
                        "n_tokens": pa.array(take.astype(np.int64)),
                        "chunk_text": txts,
                    }
                )
            )
            k += 1
        return pa.concat_tables(out) if out else empty

    return ds.map_batches(fn, batch_format="pyarrow")
