"""Hybrid retrieval: reciprocal-rank fusion of lexical and vector legs.

Modern search (the capability the reference delegates to OpenSearch's
hybrid ``sub_searches``/RRF processor) runs BOTH a BM25 query and a
kNN vector query for the same information need and fuses the two
rankings.  Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
SIGIR 2009) is the standard score-free fusion:

    rrf(d) = sum over legs L of 1 / (k + rank_L(d))

with ``k`` = 60 by convention; docs absent from a leg contribute 0.

Scale shape: each LEG is the distributed part — BM25 via the WAND /
sharded-service path, kNN via the broadcast-matmul ``knn_cosine``
op — and each returns only its top-N (N ~ 100) candidates.  Fusion
therefore runs over ≤ legs x N rows, **output-scale by construction**:
no corpus-scale data ever reaches the fusion step, so a driver-side
vectorized pass is the correct (not merely convenient) place for it.

Determinism / oracle parity: contributions are computed as
``1.0 / (k + rank)`` with integer ranks and summed left-to-right in
leg order, the exact expression shape DuckDB evaluates for
``COALESCE(1.0/(k+r1),0) + COALESCE(1.0/(k+r2),0)`` — fused scores
are bit-identical doubles, so the hash-matched oracle can include the
score column (see the float-exactness notes in ``query/oracle.py``).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pyarrow as pa

__all__ = ["rrf_fuse"]


def rrf_fuse(
    rank_maps: Sequence[Mapping[int, int]],
    k: int = 60,
    topn: int = 10,
) -> pa.Table:
    """Fuse per-leg ``{doc_id: 1-based rank}`` maps into an RRF top-n.

    Returns ``(rank, doc_id, rrf)`` ordered by fused score descending,
    doc_id ascending on ties.  Input maps are top-N lists (output
    scale); the union loop below touches ≤ legs x N entries.
    """
    ids = np.array(sorted(set().union(*[set(m) for m in rank_maps])), np.int64)
    score = np.zeros(len(ids), np.float64)
    for m in rank_maps:
        # left-to-right accumulation matches the SQL `a + b` shape
        score = score + np.array(
            [1.0 / (k + m[d]) if d in m else 0.0 for d in ids.tolist()],
            np.float64,
        )
    order = np.lexsort((ids, -score))[:topn]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "doc_id": pa.array(ids[order]),
            "rrf": pa.array(score[order]),
        }
    )
