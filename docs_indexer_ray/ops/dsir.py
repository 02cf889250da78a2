"""DSIR — Data Selection with Importance Resampling (Xie et al.,
NeurIPS 2023): select raw-corpus documents whose n-gram feature
distribution looks like a small TARGET domain, by importance weight

    log w(x) = Σ_f  c_f(x) · ( log p_target(f) − log q_raw(f) )

over unigram+bigram features with add-one smoothing.  The paper's
production variant hashes features into buckets; this is the EXACT
n-gram variant (the distribution the hashing approximates) restricted
to the target vocabulary — which is what makes it SQL-oracle-able.

Shape at scale:

* **Target fit is one counting shuffle** over the (small, fixed)
  target set — per-batch ``Counter`` partials, ``groupby.sum`` —
  producing a vocabulary-scale ``(feature, count)`` table (like the
  LM in ``ops/lm.py``, this is a fixed artifact, not corpus-scale).
* **Raw counts stream**: the target vocabulary is broadcast ONCE
  (``ray.put``); each batch emits a CONSTANT-SIZE partial — one
  bincount vector over the vocab + one total — so the raw pass ships
  O(n_blocks × |vocab|) to the driver, never corpus-scale rows.
* **Scoring streams** through an actor pool (vocab index built once
  per actor in ``__init__``): Arrow regex split, ``pd.Index`` C-hash
  feature→id, ``np.bincount`` per-doc weight folds — no Python token
  loop.  Each batch emits only its LOCAL top-k (the global top-k is
  inside the union of per-batch top-ks under the same total order),
  so the driver sees k × n_blocks rows.

Weights are sums of libm logs (batch-order association), so ranking
uses ``round(w, 9)`` + doc-id tiebreak per the float-oracle rules —
the resampling itself is deterministic top-k (the paper's Gumbel
noise is a seeded additive term; plug it into ``lr`` if sampled
rather than ranked selection is wanted).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from docs_indexer_ray.ops.lm import _doc_tokens

__all__ = ["fit_dsir", "dsir_topk"]


def _batch_features(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """All unigram + bigram ("w1 w2") features of a batch + doc idx."""
    toks, doc_idx = _doc_tokens(texts)
    m = doc_idx[:-1] == doc_idx[1:]
    a, b = toks[:-1][m], toks[1:][m]
    bi = np.array([x + " " + y for x, y in zip(a.tolist(), b.tolist())], object)
    feats = np.concatenate([toks, bi]) if len(bi) else toks
    fdoc = np.concatenate([doc_idx, doc_idx[:-1][m]]) if len(bi) else doc_idx
    return feats, fdoc


def fit_dsir(target_ds, raw_ds, text_col: str = "text") -> dict:
    """Fit the importance model → ``{feats, log_ratio}`` (sorted
    feature array + per-feature ``ln p − ln q``), both vocab-scale."""
    import ray
    from ray.data.aggregate import Sum

    def count_feats(t: pa.Table) -> pa.Table:
        from collections import Counter

        feats, _ = _batch_features(t[text_col].to_pylist())
        c = Counter(feats.tolist())
        return pa.table(
            {
                "f": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    folded = (
        target_ds.map_batches(count_feats, batch_format="pyarrow")
        .groupby("f")
        .aggregate(Sum(on="c", alias_name="c"))
    )
    from ..collect import tables_of

    tt_parts = tables_of(folded)
    if not tt_parts:
        raise ValueError(
            "fit_dsir: target corpus produced no features (no tokenizable "
            "text) — cannot fit an importance model"
        )
    tt = pa.concat_tables(tt_parts)
    feats = np.asarray(tt["f"].to_pylist(), object)
    tc = tt["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(feats)
    feats, tc = feats[order], tc[order]
    V = len(feats)
    t_total = int(tc.sum())

    # raw pass: constant-size partials against the broadcast vocab —
    # an ACTOR POOL so the vocab-scale pd.Index is built once per
    # actor (a plain function re-hashed the whole vocabulary per batch)
    idx_ref = ray.put(feats)

    class _RawCounter:
        def __init__(self):
            import pandas as pd

            self._fv = ray.get(idx_ref)
            self._index = pd.Index(self._fv)

        def __call__(self, t: pa.Table) -> pa.Table:
            bf, _ = _batch_features(t[text_col].to_pylist())
            ids = self._index.get_indexer(bf)
            part = np.bincount(ids[ids >= 0], minlength=len(self._fv)).astype(
                np.int64
            )
            return pa.table(
                {
                    "part": pa.array([part], pa.list_(pa.int64())),
                    "total": pa.array([len(bf)], pa.int64()),
                }
            )

    parts = tables_of(
        raw_ds.map_batches(_RawCounter, batch_format="pyarrow", concurrency=(1, 4))
    )
    rc = np.zeros(V, np.int64)
    r_total = 0
    for p in parts:
        for row in p["part"].to_pylist():
            rc += np.asarray(row, np.int64)
        r_total += int(
            np.sum(p["total"].to_numpy(zero_copy_only=False))
        )

    # math.log == libm == DuckDB ln (float-oracle rule); single
    # division inside each log mirrors the SQL expression tree
    lr = np.array(
        [
            math.log((int(tc[i]) + 1) / (t_total + V))
            - math.log((int(rc[i]) + 1) / (r_total + V))
            for i in range(V)
        ],
        np.float64,
    )
    return {"feats": feats, "log_ratio": lr}


class _DsirScorer:
    """Actor-pool scorer: vocab index built once per actor."""

    def __init__(self, model_ref, text_col: str, id_col: str, k: int):
        import pandas as pd
        import ray

        m = ray.get(model_ref)
        self._index = pd.Index(m["feats"])
        self._lr = m["log_ratio"]
        self._text_col = text_col
        self._id_col = id_col
        self._k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        feats, fdoc = _batch_features(t[self._text_col].to_pylist())
        ids = self._index.get_indexer(feats)
        hit = ids >= 0
        n = t.num_rows
        w = np.bincount(fdoc[hit], weights=self._lr[ids[hit]], minlength=n)
        seen = np.bincount(fdoc[hit], minlength=n) > 0
        doc_ids = t[self._id_col].to_numpy(zero_copy_only=False)[seen]
        wq = np.round(w[seen], 9)
        # local top-k under the global total order (wq desc, id asc)
        order = np.lexsort((doc_ids, -wq))[: self._k]
        return pa.table(
            {
                self._id_col: pa.array(doc_ids[order], pa.int64()),
                "w": pa.array(wq[order], pa.float64()),
            }
        )


def dsir_topk(
    docs_ds,
    model: dict,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 4),
) -> pa.Table:
    """Top-k docs by DSIR importance weight → ``(rank, doc_id)``
    (rank-identity contract; weights quantized at 1e-9)."""
    import ray

    from ..collect import tables_of

    model_ref = ray.put(model)
    parts = tables_of(
        docs_ds.map_batches(
            _DsirScorer,
            fn_constructor_args=(model_ref, text_col, id_col, k),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    )
    if not parts:
        return pa.table(
            {"rank": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
        )
    t = pa.concat_tables(parts)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    w = t["w"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -w))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
        }
    )
