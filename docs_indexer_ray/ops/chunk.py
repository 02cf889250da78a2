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
        flat = np.asarray(lists.flatten().to_pylist(), dtype=object)
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = offs[1:] - offs[:-1]
        # an empty text splits to [''] — treat as zero tokens
        empty = np.zeros(len(n_tok), dtype=bool)
        if len(flat):
            first = flat[offs[:-1].clip(max=len(flat) - 1)]
            empty = (n_tok == 1) & (first == "")
        n_tok = np.where(empty, 0, n_tok)

        out_id, out_ci, out_st, out_n, out_txt = [], [], [], [], []
        for row in range(len(ids)):
            n = int(n_tok[row])
            base = int(offs[row])
            st = 0
            ci = 0
            while st < n:
                take = min(window, n - st)
                out_id.append(int(ids[row]))
                out_ci.append(ci)
                out_st.append(st)
                out_n.append(take)
                out_txt.append(" ".join(flat[base + st : base + st + take]))
                st += stride
                ci += 1
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "chunk_idx": pa.array(out_ci, pa.int64()),
                "start_tok": pa.array(out_st, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "chunk_text": pa.array(out_txt, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
