"""Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) +
encoding with the trained merges.

The scale insight every production trainer (SentencePiece,
HuggingFace tokenizers) uses: BPE statistics are a function of the
WORD-FREQUENCY table, not the corpus — so the only corpus-scale work
is ONE word-counting shuffle (per-batch ``Counter`` partials →
``groupby.sum``), after which the merge loop runs over the
vocabulary-scale ``(word, count)`` table on the driver.  At 10¹²
docs the distinct-word table is still ~10⁷–10⁸ rows (Heaps' law) —
doclens-class, not corpus-class.

Determinism: ties in pair frequency break on the lexicographically
smaller ``(left, right)`` pair, so the merge list is a pure function
of the word counts (pinned by the pure-Python reference in
``tests/test_ops.py``).  Encoding streams through an actor pool with
the merge ranks broadcast once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docs_indexer_ray.ops.lm import _doc_tokens

__all__ = ["word_counts", "train_bpe", "bpe_encode_counts", "bpe_vocab", "bpe_encode"]

_EOW = "</w>"  # end-of-word marker (Sennrich's formulation)


def word_counts(docs_ds, text_col: str = "text") -> pa.Table:
    """ONE counting shuffle → ``(word, n)`` table, vocabulary-scale."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        toks, _ = _doc_tokens(t[text_col].to_pylist())
        c = Counter(toks.tolist())
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    folded = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum(on="n", alias_name="n"))
    )
    from ..collect import tables_of

    parts = tables_of(folded)
    if not parts:
        return pa.table({"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    return pa.concat_tables(parts)


def train_bpe(wc: pa.Table, n_merges: int = 100) -> list[tuple[str, str]]:
    """BPE merge list from a word-count table (driver-side, vocab-scale).

    Classic Sennrich training with an incremental pair-count index:
    each merge updates only the words that CONTAIN the merged pair
    (tracked per pair), not the whole vocabulary."""
    words: list[list[str]] = [
        list(w) + [_EOW] for w in wc["word"].to_pylist()
    ]
    counts = wc["n"].to_numpy(zero_copy_only=False).astype(np.int64)

    # pair → total count, and pair → set of word indices containing it
    from collections import defaultdict

    pair_n: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, sym in enumerate(words):
        c = int(counts[wi])
        for a, b in zip(sym[:-1], sym[1:]):
            pair_n[(a, b)] += c
            pair_words[(a, b)].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_n:
            break
        # max count, ties → lexicographically smallest pair
        best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_n[best] <= 0:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(pair_words[best]):
            sym = words[wi]
            c = int(counts[wi])
            # remove old pair contributions of this word
            for a, b in zip(sym[:-1], sym[1:]):
                pair_n[(a, b)] -= c
                if pair_n[(a, b)] <= 0:
                    del pair_n[(a, b)]
                pw = pair_words.get((a, b))
                if pw is not None:
                    pw.discard(wi)
                    if not pw:
                        del pair_words[(a, b)]
            # apply the merge left-to-right
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[wi] = out
            # add new contributions
            for a, b in zip(out[:-1], out[1:]):
                pair_n[(a, b)] += c
                pair_words[(a, b)].add(wi)
    return merges


def _encode_word(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i, p in enumerate(zip(sym[:-1], sym[1:])):
            r = rank.get(p)
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class _BpeEncoder:
    """Actor-pool encoder: merge ranks decoded once per actor; per
    batch each DISTINCT word is encoded once (memoized), then counts
    fold vectorized."""

    def __init__(self, merges_ref, text_col: str, id_col: str):
        import ray

        self._rank = {p: i for i, p in enumerate(ray.get(merges_ref))}
        self._memo: dict[str, int] = {}
        self._text_col = text_col
        self._id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        toks, doc_idx = _doc_tokens(t[self._text_col].to_pylist())
        n = t.num_rows
        lens = np.empty(len(toks), np.int64)
        for i, w in enumerate(toks.tolist()):
            v = self._memo.get(w)
            if v is None:
                v = len(_encode_word(w, self._rank))
                self._memo[w] = v
            lens[i] = v
        return pa.table(
            {
                self._id_col: t[self._id_col],
                "n_words": pa.array(
                    np.bincount(doc_idx, minlength=n).astype(np.int64)
                ),
                "n_bpe_tokens": pa.array(
                    np.bincount(doc_idx, weights=lens, minlength=n).astype(np.int64)
                ),
            }
        )


def bpe_encode_counts(
    docs_ds,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 4),
):
    """Stream the corpus through the trained merges → Dataset of
    ``(id_col, n_words, n_bpe_tokens)`` per doc."""
    import ray

    merges_ref = ray.put(merges)
    return docs_ds.map_batches(
        _BpeEncoder,
        fn_constructor_args=(merges_ref, text_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def bpe_vocab(wc: pa.Table, merges: list[tuple[str, str]]) -> dict[str, int]:
    """Deterministic symbol → id table for a trained merge list: the
    sorted base alphabet of the training word table, then ``_EOW``,
    then each merge's output symbol in rank order (first occurrence
    wins if two merges compose the same string).  A pure function of
    ``(word_counts, merges)`` — every worker derives identical ids.
    ``len(vocab)`` is reserved as the ``<unk>`` id for characters
    never seen in training."""
    chars: set[str] = set()
    for w in wc["word"].to_pylist():
        chars.update(w)
    vocab: dict[str, int] = {}
    for s in sorted(chars) + [_EOW] + [l + r for l, r in merges]:
        if s not in vocab:
            vocab[s] = len(vocab)
    return vocab


class _BpeIdEncoder:
    """Actor-pool id encoder: merge ranks + vocab decoded once per
    actor; each DISTINCT word's id sequence computed once (memoized),
    per-doc id lists assembled vectorized from the flat token stream."""

    def __init__(self, merges_ref, vocab_ref, text_col: str, id_col: str):
        import ray

        self._rank = {p: i for i, p in enumerate(ray.get(merges_ref))}
        self._vocab: dict[str, int] = ray.get(vocab_ref)
        self._unk = len(self._vocab)
        self._memo: dict[str, np.ndarray] = {}
        self._text_col = text_col
        self._id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        toks, doc_idx = _doc_tokens(t[self._text_col].to_pylist())
        n = t.num_rows
        per_tok: list[np.ndarray] = []
        lens = np.empty(len(toks), np.int64)
        for i, w in enumerate(toks.tolist()):
            ids = self._memo.get(w)
            if ids is None:
                ids = np.array(
                    [
                        self._vocab.get(s, self._unk)
                        for s in _encode_word(w, self._rank)
                    ],
                    np.int64,
                )
                self._memo[w] = ids
            per_tok.append(ids)
            lens[i] = len(ids)
        flat = (
            np.concatenate(per_tok) if per_tok else np.array([], np.int64)
        )
        per_doc = np.zeros(n, np.int64)
        if len(toks):
            per_doc = np.bincount(doc_idx, weights=lens, minlength=n).astype(
                np.int64
            )
        offsets = np.concatenate([[0], np.cumsum(per_doc)])
        token_ids = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(flat, pa.int64())
        )
        return pa.table(
            {
                self._id_col: t[self._id_col],
                "token_ids": token_ids,
                "n_tokens": pa.array(per_doc),
            }
        )


def bpe_encode(
    docs_ds,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 4),
):
    """Distributed tokenization with a TRAINED BPE: stream the corpus
    through the merge list → Dataset of ``(id_col,
    token_ids: large_list<int64>, n_tokens: int64)`` per doc — the
    tokenize-for-training step between :func:`train_bpe` and sequence
    packing.  Merges + vocab broadcast ONCE (``ray.put``, read
    zero-copy per actor in ``__init__``); per-batch cost is memoized
    per distinct word, so the merge loop runs O(distinct words), not
    O(corpus tokens).  Characters unseen in training map to the
    reserved ``len(vocab)`` ``<unk>`` id."""
    import ray

    merges_ref = ray.put(merges)
    vocab_ref = ray.put(vocab)
    return docs_ds.map_batches(
        _BpeIdEncoder,
        fn_constructor_args=(merges_ref, vocab_ref, text_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
