"""OpenSearch ``_rank_eval`` API — search-quality metrics for a query
set against relevance judgments.

Reference semantics (OpenSearch rank-eval module): for each named
query, run it at ``k`` and score the ranked hits against the judged
``(query, doc_id, relevance)`` set:

* ``precision_k`` — fraction of the top-k with relevance > 0
  (unjudged docs count as non-relevant, the API's default);
* ``mrr`` — 1/rank of the first relevant hit (0 when none);
* ``dcg`` — Σ (2^rel − 1) / log2(rank + 1) over the top-k;
* ``ndcg`` — dcg / ideal-dcg, ideal = the judged relevances of THIS
  query sorted descending, truncated to k (0 when no judged docs).

Floats: each term is a single expression of exact ints (2^rel − 1
exact, ``math.log2`` == DuckDB ``log2`` — both libm, same rule as the
``math.log`` == ``ln`` finding in BASELINE notes); the ≤k-term sums
are accumulated in RANK order on the engine side and quantized to
1e-9 (the established sum-order trick) so the SQL oracle
hash-matches.

Scale shape: judgments are human-labeled and therefore tiny by
definition (eval-scale, not corpus-scale) — they ride the driver;
each query's top-k comes from the distributed index reader, so the
corpus-scale work is the retrieval itself.
"""

from __future__ import annotations

import math

import pyarrow as pa

from .bm25 import topk

__all__ = ["rank_eval"]


def metrics_at_k(
    hit_ids: list[int], judged: dict[int, int], k: int
) -> tuple[float, float, float, float]:
    """``(precision@k, MRR, DCG, NDCG)`` for one ranked id list against
    a ``doc_id → relevance`` judgment map — the exact-int expressions
    the SQL oracle replays (``math.log2`` ≡ DuckDB ``log2``), each
    quantized to 1e-9.  Shared by the library :func:`rank_eval` and
    the REST ``/_rank_eval`` endpoint."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    rels = [judged.get(int(d), 0) for d in hit_ids]
    p = sum(1 for r in rels if r > 0) / k
    mrr = 0.0
    for rank, r in enumerate(rels, 1):
        if r > 0:
            mrr = 1.0 / rank
            break
    dcg = 0.0
    for rank, r in enumerate(rels, 1):
        dcg += (2**r - 1) / math.log2(rank + 1)
    ideal = sorted(judged.values(), reverse=True)[:k]
    idcg = 0.0
    for rank, r in enumerate(ideal, 1):
        idcg += (2**r - 1) / math.log2(rank + 1)
    ndcg = dcg / idcg if idcg > 0 else 0.0
    return round(p, 9), round(mrr, 9), round(dcg, 9), round(ndcg, 9)


def rank_eval(
    reader,
    queries: dict[str, list[str]],
    judgments: pa.Table,
    k: int = 10,
) -> pa.Table:
    """``(query, precision_k, mrr, dcg, ndcg)`` per named query,
    metrics quantized to 1e-9.  ``judgments`` columns: ``query``
    (string), ``doc_id`` (int), ``relevance`` (int ≥ 0)."""
    jq = judgments["query"].to_pylist()
    jd = judgments["doc_id"].to_pylist()
    jr = judgments["relevance"].to_pylist()
    by_query: dict[str, dict[int, int]] = {}
    for q, d, r in zip(jq, jd, jr):
        by_query.setdefault(q, {})[int(d)] = int(r)

    names, prec, mrr_v, dcg_v, ndcg_v = [], [], [], [], []
    for name in sorted(queries):
        judged = by_query.get(name, {})
        hits = topk(reader, queries[name], k=k)
        p, mrr, dcg, ndcg = metrics_at_k(
            [int(d) for d, _ in hits], judged, k
        )
        names.append(name)
        prec.append(p)
        mrr_v.append(mrr)
        dcg_v.append(dcg)
        ndcg_v.append(ndcg)
    return pa.table(
        {
            "query": pa.array(names, pa.string()),
            "precision_k": pa.array(prec, pa.float64()),
            "mrr": pa.array(mrr_v, pa.float64()),
            "dcg": pa.array(dcg_v, pa.float64()),
            "ndcg": pa.array(ndcg_v, pa.float64()),
        }
    )
