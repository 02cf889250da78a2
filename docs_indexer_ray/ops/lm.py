"""Distributed n-gram LM training + perplexity scoring (CCNet shape).

Web-corpus curation filters documents by perplexity under a language
model trained on a trusted reference corpus (CCNet, Wenzek et al.
2020, uses KenLM over Wikipedia; Gopher / RefinedWeb keep the same
shape).  No LM runtime exists in this sandbox, so the model itself is
a from-scratch bigram LM with add-one (Laplace) smoothing — the
training and scoring PLUMBING is the real, scale-relevant part:

* **Training is one counting shuffle**: ``map_batches`` tokenizes and
  pre-aggregates per-batch ``(w1, w2, count)`` partials (unigrams ride
  the same stream with a ``""`` sentinel — the empty string can never
  be a token), then ONE ``groupby.sum`` folds them.  The result is
  *model*-scale (vocabulary²-bounded, independent of corpus size —
  CCNet's model is a fixed artifact trained once on a reference set),
  so collecting it to the driver is doclens-class, not corpus-class.
* **Scoring streams**: the model is ``ray.put`` once and each scoring
  actor builds its lookup structures (token→id hash index, sorted
  bigram key array, context-count vector) in ``__init__``; per batch
  everything is vectorized — Arrow regex split, ``pd.Index``
  C-hash token→id mapping, ``searchsorted`` bigram lookup,
  ``np.bincount`` per-doc folds.  No Python loop over tokens.

At 100 TB the reference corpus (and hence the model) stays fixed
while scoring streams the full corpus; if the vocabulary outgrows a
single broadcast (multi-GB), shard the bigram table by ``hash(w1)``
across a scoring-actor fleet and route batches by the same hash — the
per-actor state here is already keyed that way.

Per-bigram smoothed probability (matching the SQL oracle's expression
tree exactly): ``(c(w1,w2) + 1.0) / (ctx(w1) + V)`` where ``ctx(w1)``
counts bigrams starting at ``w1`` and ``V`` is the distinct-token
count of the training corpus.  Per-doc output is the average negative
log-likelihood and its exp (perplexity).  Sums of libm logs associate
in batch order, so hashed outputs quantize (1e-9 / 1e-6) per the
established float-oracle rules.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..collect import tables_of

__all__ = ["train_bigram_lm", "perplexity_scores", "ppl_buckets"]

_TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")


def _doc_tokens(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """All non-empty lowercase tokens of a batch + their doc index.

    Arrow's split kernel hands back one flat values buffer; empties
    (leading/trailing separators) are masked out vectorized."""
    import pyarrow.compute as pc

    arr = pc.split_pattern_regex(
        pc.utf8_lower(pa.array(texts, pa.string())), pattern="[^a-z0-9]+"
    )
    flat = arr.values.to_numpy(zero_copy_only=False)
    counts = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
    doc_idx = np.repeat(np.arange(len(texts)), counts)
    mask = flat != ""
    return flat[mask], doc_idx[mask]


def train_bigram_lm(docs_ds, text_col: str = "text"):
    """One counting pass over ``docs_ds[text_col]`` → model dict
    ``{vocab, ctx, bigram_keys, bigram_counts, V}``.

    Unigram and bigram partial counts ride one shuffle (unigram rows
    use ``w2=""``); Ray Data's combiner pre-folds inside map_batches
    so the exchange carries per-batch-distinct grams, not tokens."""
    import ray
    from ray.data.aggregate import Sum

    def count_grams(t: pa.Table) -> pa.Table:
        from collections import Counter

        toks, doc_idx = _doc_tokens(t[text_col].to_pylist())
        uni = Counter(toks.tolist())
        m = doc_idx[:-1] == doc_idx[1:]
        big = Counter(zip(toks[:-1][m].tolist(), toks[1:][m].tolist()))
        w1 = list(uni.keys()) + [k[0] for k in big.keys()]
        w2 = [""] * len(uni) + [k[1] for k in big.keys()]
        c = list(uni.values()) + list(big.values())
        return pa.table(
            {
                "w1": pa.array(w1, pa.string()),
                "w2": pa.array(w2, pa.string()),
                "c": pa.array(c, pa.int64()),
            }
        )

    folded = (
        docs_ds.map_batches(count_grams, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum(on="c", alias_name="c"))
    )
    # model-scale collect (vocabulary-bounded, like doclens)
    parts = tables_of(folded)
    if not parts:  # zero tokens anywhere → empty model, not a crash
        return {
            "vocab": np.empty(0, object),
            "ctx": np.zeros(1, np.int64),
            "bigram_keys": np.empty(0, np.int64),
            "bigram_counts": np.empty(0, np.int64),
            "V": 0,
        }
    tbl = pa.concat_tables(parts)
    w1 = np.asarray(tbl["w1"].to_pylist(), dtype=object)
    w2 = np.asarray(tbl["w2"].to_pylist(), dtype=object)
    c = tbl["c"].to_numpy(zero_copy_only=False)

    is_uni = w2 == ""
    vocab = np.sort(w1[is_uni])
    V = len(vocab)
    tok2pos = {t: i for i, t in enumerate(vocab.tolist())}

    bw1, bw2, bc = w1[~is_uni], w2[~is_uni], c[~is_uni]
    id1 = np.array([tok2pos[t] for t in bw1.tolist()], np.int64)
    id2 = np.array([tok2pos[t] for t in bw2.tolist()], np.int64)
    ctx = np.zeros(V + 1, np.int64)  # slot V = OOV (zero context)
    np.add.at(ctx, id1, bc)
    keys = id1 * np.int64(V + 1) + id2
    order = np.argsort(keys)
    return {
        "vocab": vocab,
        "ctx": ctx,
        "bigram_keys": keys[order],
        "bigram_counts": bc[order],
        "V": V,
    }


class _PplScorer:
    """Actor-pool scorer: model decoded once per actor in __init__."""

    def __init__(self, model_ref, text_col: str, id_col: str):
        import ray

        m = ray.get(model_ref)
        import pandas as pd

        self._index = pd.Index(m["vocab"])
        self._ctx = m["ctx"]
        self._bkeys = m["bigram_keys"]
        self._bvals = m["bigram_counts"]
        self._V = m["V"]
        self._text_col = text_col
        self._id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        toks, doc_idx = _doc_tokens(t[self._text_col].to_pylist())
        ids = self._index.get_indexer(toks)  # -1 = OOV
        ids = np.where(ids < 0, self._V, ids).astype(np.int64)
        m = doc_idx[:-1] == doc_idx[1:]
        id1, id2 = ids[:-1][m], ids[1:][m]
        bdoc = doc_idx[:-1][m]

        keys = id1 * np.int64(self._V + 1) + id2
        pos = np.searchsorted(self._bkeys, keys)
        pos_c = np.clip(pos, 0, max(len(self._bkeys) - 1, 0))
        if len(self._bkeys):
            hit = self._bkeys[pos_c] == keys
            cnt = np.where(hit, self._bvals[pos_c], 0).astype(np.float64)
        else:
            cnt = np.zeros(len(keys))
        # expression tree mirrors the SQL oracle exactly
        p = (cnt + 1.0) / (self._ctx[id1] + self._V)
        nll = -np.log(p)

        n = t.num_rows
        nb = np.bincount(bdoc, minlength=n)
        snll = np.bincount(bdoc, weights=nll, minlength=n)
        keep = nb > 0
        avg = snll[keep] / nb[keep]
        return pa.table(
            {
                self._id_col: t[self._id_col].filter(pa.array(keep)),
                "n_bigrams": pa.array(nb[keep].astype(np.int64)),
                "avg_nll": pa.array(np.round(avg, 9)),
                "ppl": pa.array(np.round(np.exp(avg), 6)),
            }
        )


def perplexity_scores(
    docs_ds,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 4),
):
    """Stream ``docs_ds`` through the broadcast ``model`` → Dataset of
    ``(id_col, n_bigrams, avg_nll, ppl)``; docs with < 2 tokens are
    dropped (no bigram evidence).  Quantized per the float-oracle
    rules (avg_nll 1e-9, ppl 1e-6)."""
    import ray

    model_ref = ray.put(model)
    return docs_ds.map_batches(
        _PplScorer,
        fn_constructor_args=(model_ref, text_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _quantile_cont(vals: np.ndarray, q: float) -> float:
    """DuckDB/Postgres ``quantile_cont`` bit-exactly (same h=(n-1)·q
    continuous interpolation as ``query/facets.py::percentiles``)."""
    v = np.sort(np.asarray(vals, np.float64))
    n = len(v)
    if n == 0:
        return float("nan")
    h = (n - 1) * q
    lo = int(np.floor(h))
    x_lo = float(v[lo])
    x_hi = float(v[min(lo + 1, n - 1)])
    return x_lo + (h - lo) * (x_hi - x_lo)


def ppl_buckets(
    docs_ds,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 4),
):
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3):
    bucket every document by LM perplexity against thresholds taken
    from a deterministic SAMPLE — exactly CCNet's procedure (it
    computes the tertile cutoffs on a fraction of the corpus, then
    streams assignment), which is also what makes the op scale-safe:
    the only driver-side collect is the 1/16 hash sample's scores.

    Returns an Arrow table ``(doc_id, ppl, bucket)`` sorted by doc id,
    bucket ∈ {head, middle, tail} with ``ppl ≤ c⅓ → head``,
    ``ppl ≤ c⅔ → middle`` (ties at a cutoff bucket DOWN — the
    deterministic rule the SQL oracle mirrors)."""
    import pyarrow.compute as pc
    import ray

    from docs_indexer_ray.ops.sample import sample_by_hash

    sample_scored = perplexity_scores(
        sample_by_hash(docs_ds, key=text_col, rate=1 / 16),
        model,
        text_col=text_col,
        id_col=id_col,
        concurrency=concurrency,
    )
    sp_parts = tables_of(sample_scored)
    svals = (
        pa.concat_tables(sp_parts)["ppl"].to_numpy(zero_copy_only=False)
        if sp_parts
        else np.empty(0, np.float64)
    )

    scored = perplexity_scores(
        docs_ds, model, text_col=text_col, id_col=id_col, concurrency=concurrency
    )
    if svals.size == 0:
        # the 1/16 sample missed every scoreable doc (tiny corpus):
        # take cutoffs from the full scored set instead — same scale
        # as the output that is collected below anyway
        full_parts = tables_of(scored)
        if full_parts:
            svals = pa.concat_tables(full_parts)["ppl"].to_numpy(
                zero_copy_only=False
            )
    if svals.size == 0:
        c1 = c2 = float("inf")  # nothing scoreable; output is empty
    else:
        c1 = _quantile_cont(svals, 1.0 / 3)
        c2 = _quantile_cont(svals, 2.0 / 3)

    def assign(t: pa.Table) -> pa.Table:
        ppl = t["ppl"].to_numpy(zero_copy_only=False)
        bucket = np.where(ppl <= c1, "head", np.where(ppl <= c2, "middle", "tail"))
        return pa.table(
            {
                id_col: t[id_col],
                "ppl": t["ppl"],
                "bucket": pa.array(bucket.tolist(), pa.string()),
            }
        )

    parts = tables_of(scored.map_batches(assign, batch_format="pyarrow"))
    out = pa.concat_tables(parts) if parts else pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "ppl": pa.array([], pa.float64()),
            "bucket": pa.array([], pa.string()),
        }
    )
    return out.sort_by(id_col)
