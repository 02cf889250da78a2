"""Hybrid lexical+semantic retrieval via Reciprocal Rank Fusion.

OpenSearch 2.x hybrid search runs a BM25 query and a kNN vector query
and fuses the two rankings; RRF (Cormack, Clarke & Buettcher, SIGIR
2009) is the standard score-free fusion rule the reference's serving
stack would get from the OpenSearch hybrid/``rrf`` processor:

    rrf(d) = Σ_r  1 / (c + rank_r(d))        over rankings r where d
                                             appears in the top window

Score-FREE matters: BM25 scores and cosine similarities live on
incomparable scales, so fusing by rank sidesteps per-query min-max
normalization (the other OpenSearch technique) and is stable under
score distribution drift.

This engine already has both legs — ``bm25.topk`` (or the sharded
fleet's exact merge) and ``ops.ann.knn_cosine`` — so hybrid search is
a pure fusion step over two (doc_id, score) rank lists.  The fusion
itself is O(window) per query: never corpus-scale, no distribution
concern; the distributed work stays in the two retrieval legs.

Determinism contract (what the SQL oracle replays): ranks are
1-based positions in each input list; the fused score is the SUM over
rankings IN INPUT ORDER of ``1.0 / (c + rank)`` (IEEE double — both
engines add the same two terms in the same order); final order is
(rrf desc, doc_id asc).
"""

from __future__ import annotations

__all__ = ["rrf_fuse", "hybrid_topk"]


def rrf_fuse(
    rankings: list[list[tuple[int, float]]],
    k: int = 10,
    c: int = 60,
    window: int | None = None,
) -> list[tuple[int, float]]:
    """Fuse rank lists into a top-``k`` of ``(doc_id, rrf_score)``.

    ``rankings``: each a list of ``(doc_id, score)`` in rank order —
    the underlying scores are IGNORED (rank fusion); position ``i`` is
    rank ``i+1``.  ``c`` is the standard RRF constant (60 in the paper
    and in OpenSearch's default ``rank_constant``).  ``window`` caps
    how deep each ranking contributes (defaults to its full length —
    callers usually pass top-``window`` lists already).

    A doc appearing in several rankings accumulates one reciprocal
    term per ranking, added in input order; ties break doc asc."""
    scores: dict[int, float] = {}
    for ranking in rankings:
        top = ranking if window is None else ranking[:window]
        for pos, (doc, _) in enumerate(top):
            scores[doc] = scores.get(doc, 0.0) + 1.0 / (c + pos + 1)
    fused = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return [(int(d), float(s)) for d, s in fused[:k]]


def hybrid_topk(
    reader,
    terms: list[str],
    knn_hits: list[tuple[int, float]],
    k: int = 10,
    c: int = 60,
    window: int = 20,
) -> list[tuple[int, float]]:
    """One-call hybrid query over a local reader: BM25 top-``window``
    (the engine's adaptive WAND/TAAT planner) fused with an
    already-computed kNN rank list (e.g. ``ops.ann.knn_cosine``'s rows
    for this query, or a sharded ANN tier's merge) — lexical leg
    first, semantic leg second, matching the oracle's term order."""
    from .bm25 import topk

    lexical = topk(reader, terms, k=window)
    return rrf_fuse([lexical, knn_hits], k=k, c=c, window=window)
