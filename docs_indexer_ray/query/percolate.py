"""Percolator: reverse search — match stored queries against documents.

OpenSearch's ``percolate`` query inverts retrieval: users REGISTER
queries (alerts, saved searches, routing rules); each incoming
document reports which registered queries it satisfies.  This is the
alerting/stream-classification primitive for a crawl pipeline ("tell
me when a page about X arrives").

Supported stored-query form: conjunctive term queries — a query is a
set of analyzer terms, a doc matches when it contains ALL of them
(OpenSearch's ``match`` with ``operator: and``; disjunctions register
as multiple stored queries, which is also how Lucene's percolator
decomposes them for its candidate pre-filter).

Scale shape: the registered-query table is SMALL (it's human-authored
alerts), so it broadcasts to an actor pool once via
``fn_constructor_args``; docs stream through ``map_batches`` with one
set-intersection pass per doc — no shuffle, no index required, and
adding a new stored query never touches the corpus.  The term →
query-ids inverted map built per actor in ``__init__`` means a doc
only examines queries that share at least one of its terms (Lucene's
candidate-query optimization, in miniature).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.analyzer import Analyzer

__all__ = ["percolate"]


def percolate(
    ds,
    queries: dict[int, list[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    chain: str = "simple",
):
    """``(doc_id, query_id)`` for every doc × registered query the doc
    satisfies (contains ALL the query's terms); doc/query order
    normalized by the final sort the caller applies.  ``queries``
    maps query_id → term list (terms are analyzer-space)."""

    class Perc:
        def __init__(self, qitems):
            self._qs = [(int(qid), frozenset(terms)) for qid, terms in qitems]
            # term → indices of stored queries containing it: a doc
            # only checks queries sharing ≥1 of its terms
            cand: dict[str, list[int]] = {}
            for i, (_, terms) in enumerate(self._qs):
                for t in terms:
                    cand.setdefault(t, []).append(i)
            self._cand = cand
            self._an = Analyzer(chain)

        def __call__(self, batch: pa.Table) -> pa.Table:
            doc_out, q_out = [], []
            for d, t in zip(
                batch[id_col].to_pylist(), batch[text_col].to_pylist()
            ):
                toks = frozenset(self._an(t or ""))
                seen: set[int] = set()
                for tok in toks:
                    for qi in self._cand.get(tok, ()):
                        seen.add(qi)
                for qi in seen:
                    qid, terms = self._qs[qi]
                    if terms <= toks:
                        doc_out.append(int(d))
                        q_out.append(qid)
            return pa.table(
                {
                    "doc_id": pa.array(np.array(doc_out, np.int64)),
                    "query_id": pa.array(np.array(q_out, np.int64)),
                }
            )

    return ds.map_batches(
        Perc,
        fn_constructor_args=(sorted(queries.items()),),
        concurrency=(1, 8),
        batch_format="pyarrow",
    )
