"""``more_like_this`` + ``term_vectors`` — per-document term views
(OpenSearch's MLT query; the reference's search UI exposes "related
pages" through it).

Semantics (mirroring Lucene's MoreLikeThis):

1. analyze the source doc's stored field with the index's own chain;
2. select the ``max_query_terms`` best terms by ``tf·idf`` with the
   engine's BM25 idf, ``sel = tf_doc · ln(1 + (N − df + ½)/(df + ½))``
   (tie-break term asc) — high-tf rare terms characterize the doc;
3. run a standard BM25 OR-query over the selected terms, excluding
   the source doc, and return the top ``k``.

Shape at scale: step 1–2 touch ONE stored doc + ``max_query_terms``
dictionary lookups (row-group-pruned segment reads); step 3 is the
existing top-k machinery — WAND locally, or per-doc-range shards via
``ShardedQueryService`` (global statistics keep the merge exact).
Nothing corpus-scale runs on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.analyzer import Analyzer
from .bm25 import topk

__all__ = ["more_like_this", "select_mlt_terms", "term_vectors"]


def term_vectors(
    reader, doc_id: int, with_positions: bool = False
) -> pa.Table:
    """OpenSearch ``_termvectors``: one doc's terms with ``tf``, the
    index-wide ``df``, and optionally the token positions →
    ``(term, tf, df[, positions])``, term ascending.

    Recomputed from the STORED field with the index's own analyzer
    (the reference's ``with_positions_offsets`` term vectors deliver
    the same view) — one docs-store fetch + ``n_terms`` dictionary
    lookups; nothing corpus-scale."""
    fetched = reader.fetch_docs([int(doc_id)], columns=["doc_id", "body"])
    if fetched.num_rows == 0:
        raise KeyError(f"doc_id {doc_id} not in the docs store")
    toks = Analyzer(reader.chain)(fetched["body"][0].as_py())
    if not toks:
        cols = {
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
        }
        if with_positions:
            cols["positions"] = pa.array([], pa.list_(pa.int64()))
        return pa.table(cols)
    arr = np.asarray(toks, dtype=object)
    terms, tfs = np.unique(arr, return_counts=True)
    dfs = np.array([reader.term_df(str(t)) for t in terms], np.int64)
    cols = {
        "term": pa.array([str(t) for t in terms], pa.string()),
        "tf": pa.array(tfs.astype(np.int64), pa.int64()),
        "df": pa.array(dfs, pa.int64()),
    }
    if with_positions:
        pos_map: dict[str, list[int]] = {}
        for i, t in enumerate(toks):
            pos_map.setdefault(t, []).append(i)
        cols["positions"] = pa.array(
            [pos_map[str(t)] for t in terms], pa.list_(pa.int64())
        )
    return pa.table(cols)


def select_mlt_terms(
    reader, doc_id: int, max_query_terms: int = 25
) -> list[str]:
    """The MLT term-selection step: the source doc's
    ``max_query_terms`` highest ``tf·idf`` terms (term-asc tie-break)."""
    fetched = reader.fetch_docs([int(doc_id)], columns=["doc_id", "body"])
    if fetched.num_rows == 0:
        raise KeyError(f"doc_id {doc_id} not in the docs store")
    toks = Analyzer(reader.chain)(fetched["body"][0].as_py())
    if not toks:
        return []
    terms, tfs = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    n = float(reader.n_docs)
    dfs = np.array([reader.term_df(str(t)) for t in terms], np.float64)
    keep = dfs > 0  # vocabulary terms only (df 0 can't score anything)
    terms, tfs, dfs = terms[keep], tfs[keep], dfs[keep]
    sel = tfs.astype(np.float64) * np.log(1.0 + (n - dfs + 0.5) / (dfs + 0.5))
    order = sorted(range(len(terms)), key=lambda i: (-sel[i], terms[i]))
    return [str(terms[i]) for i in order[:max_query_terms]]


def more_like_this(
    reader,
    doc_id: int,
    k: int = 10,
    max_query_terms: int = 25,
) -> pa.Table:
    """Top-``k`` docs most similar to ``doc_id`` → ``(rank, doc_id)``
    (the source doc itself is excluded, as in OpenSearch MLT)."""
    terms = select_mlt_terms(reader, doc_id, max_query_terms)
    if not terms:
        return pa.table(
            {"rank": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
        )
    # structurally near-duplicate docs score equal up to float
    # summation order (a 25-term sum differs in the last ulp between
    # any two engines) — rank on the score QUANTIZED to 1e-9 with the
    # doc-id tiebreak, so near-ties order deterministically; fetch a
    # candidate margin so re-ranking can't cross the k boundary
    hits = topk(reader, terms, k=k + 25)
    cand = [
        (round(float(s), 9), int(d)) for d, s in hits if int(d) != int(doc_id)
    ]
    cand.sort(key=lambda x: (-x[0], x[1]))
    out = [d for _, d in cand[:k]]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(out) + 1, dtype=np.int64)),
            "doc_id": pa.array(out, pa.int64()),
        }
    )
