"""Trained character-n-gram language classifier (Cavnar & Trenkle
1994, "N-Gram-Based Text Categorization" — the TextCat algorithm).

The classic pre-neural lang-id used by web crawlers: per-class
profiles = the top-K character trigrams ranked by frequency; a
document is classified to the profile minimizing the OUT-OF-PLACE
distance Σ |doc_rank − profile_rank| (missing gram ⇒ penalty K).
Everything is INTEGER arithmetic, so the whole train+predict path is
bit-exact against a SQL oracle — no float-ordering caveats.

Shape at scale:

* **Training is one counting shuffle**: per-batch ``(label, gram,
  count)`` partials → ``groupby.sum``; profiles are model-scale
  (n_labels × K rows), collected once.
* **Prediction streams** through an actor pool: profiles broadcast
  once; per batch, trigram extraction is the same vectorized
  UTF-32-window pass as ``ops/substr.py``, per-doc top-M ranking is
  one pandas groupby + lexsort, and per-label distances fold with
  ``np.bincount``.

Honesty note: the sandbox's synthetic ``lang`` labels are
content-uncorrelated (every lang shares one English word-salad
vocabulary), so measured accuracy on the test tables is chance-level
BY CONSTRUCTION — the oracle pins the algorithm, not the labels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["fit_textcat", "textcat_predict"]


def _doc_trigrams(texts: list[str | None]) -> tuple[np.ndarray, np.ndarray]:
    """All char trigrams of lowercased texts (+ doc index), extracted
    via one vectorized codepoint-window pass per batch."""
    lows = [(t or "").lower() for t in texts]
    # windows over the concatenated codepoints, filtered to in-doc
    from docs_indexer_ray.ops.substr import _codepoints

    cat, starts = _codepoints(lows)
    n = len(cat)
    if n < 3:
        return np.empty(0, object), np.empty(0, np.int64)
    g = np.arange(n - 2, dtype=np.int64)
    doc = np.searchsorted(starts, g, side="right") - 1
    ok = g + 3 <= starts[doc + 1]
    g, doc = g[ok], doc[ok]
    buf = np.ascontiguousarray(cat, dtype="<u4")
    if not (buf == 0).any():
        # overlapping '<U3' window view over the codepoint buffer —
        # one C-level string materialization per kept gram instead of
        # a Python slice per codepoint position of every document
        win = np.ndarray((n - 2,), dtype="<U3", buffer=buf, strides=(4,))
        grams = win[g].astype(object)
    else:
        # NUL codepoints truncate numpy unicode strings — keep the
        # exact slicing semantics on the (rare) batches that carry them
        joined = "".join(lows)
        grams = np.array([joined[i : i + 3] for i in g.tolist()], object)
    return grams, doc


def fit_textcat(
    docs_ds, label_col: str = "lang", text_col: str = "text", k: int = 100
) -> dict:
    """Train per-label trigram profiles → ``{label: {gram: rank}}``
    (rank 1..k by count desc, gram asc) + the penalty ``k``."""
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import collections

        grams, doc = _doc_trigrams(t[text_col].to_pylist())
        labels = t[label_col].to_pylist()
        if any(l is None for l in labels):
            # drop null-labeled docs: a None label would flow into the
            # profile groupby and crash the label sort
            valid = np.array([l is not None for l in labels], bool)
            keep = valid[doc]
            grams, doc = grams[keep], doc[keep]
        c: collections.Counter = collections.Counter(
            zip((labels[d] for d in doc.tolist()), grams.tolist())
        )
        return pa.table(
            {
                "label": pa.array([a for a, _ in c.keys()], pa.string()),
                "gram": pa.array([b for _, b in c.keys()], pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    folded = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "gram"])
        .aggregate(Sum(on="c", alias_name="c"))
    )
    from ..collect import tables_of

    parts = tables_of(folded)
    if not parts:
        raise ValueError(
            "fit_textcat: no trainable rows (every doc under 3 chars or "
            "null-labeled) — cannot fit profiles"
        )
    tbl = pa.concat_tables(parts)
    labels = np.asarray(tbl["label"].to_pylist(), object)
    grams = np.asarray(tbl["gram"].to_pylist(), object)
    c = tbl["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    profiles: dict[str, dict[str, int]] = {}
    for lab in sorted(set(labels.tolist())):
        m = labels == lab
        g, cc = grams[m], c[m]
        order = np.lexsort((g, -cc))[:k]
        profiles[lab] = {g[i]: r + 1 for r, i in enumerate(order)}
    return {"profiles": profiles, "k": k}


class _TextCatPredictor:
    """Actor-pool predictor: profiles decoded once per actor."""

    def __init__(self, model_ref, text_col: str, id_col: str, m_top: int):
        import pandas as pd
        import ray

        model = ray.get(model_ref)
        self._k = model["k"]
        self._labels = sorted(model["profiles"])
        self._prof = []
        for lab in self._labels:
            p = model["profiles"][lab]
            idx = pd.Index(np.asarray(list(p.keys()), object))
            self._prof.append((idx, np.asarray(list(p.values()), np.int64)))
        self._text_col = text_col
        self._id_col = id_col
        self._m = m_top

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as pd

        grams, doc = _doc_trigrams(t[self._text_col].to_pylist())
        n = t.num_rows
        if len(grams) == 0:
            return pa.table(
                {
                    self._id_col: t[self._id_col].slice(0, 0),
                    "pred_label": pa.array([], pa.string()),
                }
            )
        # per-(doc, gram) counts → per-doc top-M ranks (count desc,
        # gram asc) — one pandas groupby for the whole batch
        df = pd.DataFrame({"doc": doc, "gram": grams})
        cnt = df.groupby(["doc", "gram"], sort=False).size().reset_index(name="c")
        d = cnt["doc"].to_numpy(np.int64)
        g = cnt["gram"].to_numpy(object)
        c = cnt["c"].to_numpy(np.int64)
        order = np.lexsort((g, -c, d))  # doc asc, count desc, gram asc
        d, g = d[order], g[order]
        new_doc = np.concatenate(([True], d[1:] != d[:-1]))
        pos_in_doc = np.arange(len(d)) - np.maximum.accumulate(
            np.where(new_doc, np.arange(len(d)), 0)
        )
        keep = pos_in_doc < self._m
        d, g, dr = d[keep], g[keep], pos_in_doc[keep] + 1  # doc ranks 1..M
        # distance per label: |doc_rank - prof_rank| or penalty K
        dists = np.zeros((n, len(self._labels)), np.int64)
        for li, (idx, ranks) in enumerate(self._prof):
            pos = idx.get_indexer(g)
            oop = np.where(pos >= 0, np.abs(dr - ranks[np.clip(pos, 0, None)]), self._k)
            dists[:, li] = np.bincount(d, weights=oop, minlength=n).astype(np.int64)
        has = np.bincount(d, minlength=n) > 0
        pred = np.argmin(dists, axis=1)  # ties → first = lex-smallest label
        out_pred = np.asarray(self._labels, object)[pred]
        return pa.table(
            {
                self._id_col: t[self._id_col].filter(pa.array(has)),
                "pred_label": pa.array(out_pred[has].tolist(), pa.string()),
            }
        )


def textcat_predict(
    docs_ds,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_top: int = 20,
    concurrency=(1, 4),
):
    """Stream ``docs_ds`` through the trained profiles → Dataset of
    ``(id_col, pred_label)`` (docs with <3 chars drop)."""
    import ray

    model_ref = ray.put(model)
    return docs_ds.map_batches(
        _TextCatPredictor,
        fn_constructor_args=(model_ref, text_col, id_col, m_top),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
