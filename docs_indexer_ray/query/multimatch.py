"""OpenSearch ``multi_match`` — one query scored across several
fields with per-field boosts.

The reference's search UI issues ``multi_match`` queries against the
document's sub-fields (the four-analyzer family of D8,
``mappings/hugo.json:54-72``) and stored fields, letting OpenSearch
combine per-field BM25 scores.  This module rebuilds both combination
modes on the engine's per-field indexes:

* ``most_fields`` — score(doc) = Σ_f boost_f × BM25_f(q, doc): fields
  reinforce each other (the sub-field recall shape);
* ``best_fields`` — score(doc) = max_f + tie_breaker × (Σ_f − max_f):
  Lucene's ``DisjunctionMaxQuery`` (the "best matching field wins"
  shape, default for OpenSearch ``multi_match``).

Each field is an :class:`~.reader.IndexReader` over its own posting
space (own df / doclens / avgdl — field statistics are per-field,
exactly as Lucene keeps them) plus a boost; the query text is
analyzed per field with THAT field's chain, so a stemmed sub-field
sees stemmed query terms.

Scale note: per-field scoring here is the exact dense-TAAT path; at
10^12 docs the same combination runs per DOC-RANGE SHARD via
``score_topk_range`` (global per-field stats make shard scores
globally comparable) with the exact cross-shard ``merge_shard_topk``
— the serving tier's existing machinery composes unchanged because
score combination is pointwise per doc.  The single-field WAND upper
bound generalizes too (Σ_f boost_f × maxscore_f) for a pruned path.
"""

from __future__ import annotations

import numpy as np

from ..functions.analyzer import Analyzer
from .bm25 import B, K1, _rank_top, bm25_scores_dense

__all__ = ["multi_match_topk"]


def multi_match_topk(
    fields: list[tuple[object, float]],
    query: str,
    k: int = 10,
    mode: str = "most_fields",
    tie_breaker: float = 0.0,
    k1: float = K1,
    b: float = B,
) -> list[tuple[int, float]]:
    """Exact top-k ``[(doc_id, score)]`` of a multi-field query.

    ``fields`` — ``[(reader, boost), ...]``; every reader must index
    the SAME doc-id space (one corpus, different fields/chains — the
    flagship's builds share url-order id assignment, so any two of
    its indexes align).  ``mode`` — ``"most_fields"`` (sum) or
    ``"best_fields"`` (max + ``tie_breaker`` × rest).  Ranking is
    score desc, doc id asc — identical tie rules to ``score_topk``.
    """
    if not fields:
        return []
    n = {r.n_docs for r, _ in fields}
    if len(n) != 1:
        raise ValueError(f"fields index different doc spaces: n_docs={sorted(n)}")
    per_field = []
    for reader, boost in fields:
        terms = Analyzer(reader.chain)(query)
        per_field.append(boost * bm25_scores_dense(reader, terms, k1, b))
    stack = np.stack(per_field)
    if mode == "most_fields":
        combined = stack.sum(axis=0)
    elif mode == "best_fields":
        mx = stack.max(axis=0)
        combined = mx + tie_breaker * (stack.sum(axis=0) - mx)
    else:
        raise ValueError(f"unknown multi_match mode: {mode!r}")
    return _rank_top(combined, k)
