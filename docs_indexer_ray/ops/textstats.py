"""Text-analysis operators over a document table (Dataset stages).

Training-data-pipeline staples, each a vectorized ``map_batches``
stage over ``(doc_id, text)`` batches:

* :func:`token_count` — simple-analyzer token counts;
* :func:`quality_score` — length / stopword-ratio / mean-token-length
  quality signals (ratios are single divisions of exact integers, so a
  SQL oracle reproduces them bit-exactly — no rounding anywhere);
* :func:`lang_id` — tiny deterministic stopword-hit heuristic
  (SQL-replicable; a real model would ride the same actor-pool stage);
* :func:`fingerprint` — exact content fingerprint (md5 hex, matching
  SQL ``md5(text)``) plus a 64-bit FNV-1a rolling-hash **winnowing**
  fingerprint (Schleimer et al., SIGMOD'03: min hash per sliding
  window of k-gram hashes → a compact doc sketch for near-dup blocking).

The stopword list is deliberately small and frozen — it is part of the
operator contract shared with the DuckDB oracles in ``__ray_entry__``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

__all__ = [
    "STOP10",
    "token_count",
    "quality_score",
    "gopher_quality",
    "gopher_filter",
    "lang_id",
    "fingerprint",
    "winnow_fingerprint_batch",
]

STOP10 = ("a", "the", "and", "of", "to", "in", "is", "it", "that", "for")
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall((text or "").lower())


# BPE-style pre-tokenizer (the GPT-2 pattern's RE2-compatible ASCII
# core: contractions, letter runs, digit runs, punctuation runs,
# whitespace runs — public knowledge, Radford et al. 2019 released
# regex).  RE2-compatible on purpose so a DuckDB regexp oracle can
# reproduce counts bit-exactly.
_BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+")
_WS_RE = re.compile(r"\S+")


def token_count(ds, mode: str = "regex"):
    """Per-doc token counts; ``mode`` picks the tokenizer:

    * ``"regex"`` — lowercase alnum word tokens (the engine's simple
      analyzer, shared with the dedup/text ops);
    * ``"whitespace"`` — non-whitespace runs;
    * ``"bpe"`` — a BPE-style pre-tokenizer pass (GPT-2-like pattern):
      the unit a subword tokenizer would merge within — the cheap
      training-data proxy for "how many BPE tokens is this document".
    """
    counters = {
        "regex": lambda t: len(_tokens(t)),
        "whitespace": lambda t: len(_WS_RE.findall(t or "")),
        "bpe": lambda t: len(_BPE_RE.findall((t or "").lower())),
    }
    if mode not in counters:
        raise ValueError(f"unknown token_count mode: {mode!r}")
    count = counters[mode]

    def fn(batch: pa.Table) -> pa.Table:
        n = [count(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(np.array(n, np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_score(ds):
    stop = frozenset(STOP10)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_chars, n_tok, stop_ratio, mean_len = [], [], [], []
        for t in texts:
            toks = _tokens(t)
            nt = len(toks)
            n_chars.append(len(t or ""))
            n_tok.append(nt)
            hits = sum(1 for w in toks if w in stop)
            # single int/int divisions → bit-exact in any IEEE engine
            stop_ratio.append(hits / nt if nt else 0.0)
            mean_len.append(sum(len(w) for w in toks) / nt if nt else 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array(np.array(n_chars, np.int64)),
                "n_tokens": pa.array(np.array(n_tok, np.int64)),
                "stop_ratio": pa.array(np.array(stop_ratio, np.float64)),
                "mean_token_len": pa.array(np.array(mean_len, np.float64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _gopher_doc(t: str | None, stop: frozenset) -> tuple:
    """Per-doc Gopher metrics: ``(n_words, mean_word_len, alpha_frac,
    n_stop_distinct, top2gram_frac, dup5gram_frac)`` — shared by the
    metrics op and the curation row filter."""
    from collections import Counter

    toks = _tokens(t)
    n = len(toks)
    cchars = sum(map(len, toks))
    if n == 0:
        return 0, 0.0, 0.0, 0, 0.0, 0.0
    mean_len = cchars / n
    n_alpha = n - sum(map(str.isdigit, toks))
    alpha = n_alpha / n
    nstop = len(stop.intersection(toks))
    # most frequent 2-gram, ties → smallest "w1 w2".  Tuple min is
    # order-equivalent to the joined-string compare here: the token
    # alphabet is [a-z0-9] and ' ' < every token char, so a
    # prefix-first-word pair sorts first under BOTH orders — and
    # that's the ordering the SQL oracle's (w1 || ' ' || w2) uses.
    if n >= 2 and cchars:
        bg = Counter(zip(toks, toks[1:]))
        mc = max(bg.values())
        best = min(bg) if mc == 1 else min(k for k, v in bg.items() if v == mc)
        top2 = mc * (len(best[0]) + len(best[1])) / cchars
    else:
        top2 = 0.0
    # characters covered by any duplicated 5-gram
    if n >= 5 and cchars:
        grams = list(zip(toks, toks[1:], toks[2:], toks[3:], toks[4:]))
        g5 = Counter(grams)
        if len(g5) < len(grams):  # any duplicate at all
            covered = bytearray(n)
            for i, g in enumerate(grams):
                if g5[g] > 1:
                    covered[i : i + 5] = b"\x01" * 5
            dup5 = sum(len(w) for w, c in zip(toks, covered) if c) / cchars
        else:
            dup5 = 0.0
    else:
        dup5 = 0.0
    return n, mean_len, alpha, nstop, top2, dup5


def gopher_quality(
    ds,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stop_distinct: int = 2,
    max_top2gram_frac: float = 0.20,
    max_dup5gram_frac: float = 0.15,
):
    """Gopher-style quality rules (Rae et al. 2021, "Scaling Language
    Models: Methods, Analysis & Insights from Training Gopher",
    Table A1) adapted to the word level (the synthetic corpus has no
    line structure):

    * word count within ``[min_words, max_words]``;
    * mean word length within ``[min_mean_word_len, max_mean_word_len]``;
    * fraction of words containing an alphabetic character
      ≥ ``min_alpha_frac`` (Gopher: 0.8);
    * at least ``min_stop_distinct`` DISTINCT stopwords present
      (Gopher's "two of eight stop words" rule over the engine's
      frozen :data:`STOP10` contract list);
    * repetition: fraction of word-characters inside occurrences of
      the MOST FREQUENT word 2-gram ≤ ``max_top2gram_frac`` (ties on
      count broken by lexicographically smallest bigram), and
      fraction of word-characters covered by any duplicated word
      5-gram ≤ ``max_dup5gram_frac``.

    Every ratio is a single int/int division (bit-exact vs DuckDB's
    integer ``/`` → DOUBLE), so the SQL oracle hash-matches the
    doubles; ``passes`` is emitted as int64 0/1.  Per-doc work is
    O(n_words) C-level counting (``Counter`` over ``zip`` n-gram
    streams, no per-doc numpy allocs) inside a ``map_batches`` task —
    the stage streams, nothing shuffles.  Measured ~21k docs/s/core
    at ~35-word docs (1.46× the naive dict/slice version; remaining
    cost is the tokenizer regex + the two Counter passes).
    """

    def fn(batch: pa.Table) -> pa.Table:
        out = {
            "n_words": [],
            "mean_word_len": [],
            "alpha_frac": [],
            "n_stop_distinct": [],
            "top2gram_frac": [],
            "dup5gram_frac": [],
            "passes": [],
        }
        stop = frozenset(STOP10)
        for t in batch["text"].to_pylist():
            n, mean_len, alpha, nstop, top2, dup5 = _gopher_doc(t, stop)
            ok = (
                min_words <= n <= max_words
                and min_mean_word_len <= mean_len <= max_mean_word_len
                and alpha >= min_alpha_frac
                and nstop >= min_stop_distinct
                and top2 <= max_top2gram_frac
                and dup5 <= max_dup5gram_frac
            )
            out["n_words"].append(n)
            out["mean_word_len"].append(mean_len)
            out["alpha_frac"].append(alpha)
            out["n_stop_distinct"].append(nstop)
            out["top2gram_frac"].append(top2)
            out["dup5gram_frac"].append(dup5)
            out["passes"].append(1 if ok else 0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(np.array(out["n_words"], np.int64)),
                "mean_word_len": pa.array(np.array(out["mean_word_len"], np.float64)),
                "alpha_frac": pa.array(np.array(out["alpha_frac"], np.float64)),
                "n_stop_distinct": pa.array(np.array(out["n_stop_distinct"], np.int64)),
                "top2gram_frac": pa.array(np.array(out["top2gram_frac"], np.float64)),
                "dup5gram_frac": pa.array(np.array(out["dup5gram_frac"], np.float64)),
                "passes": pa.array(np.array(out["passes"], np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def gopher_filter(
    ds,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stop_distinct: int = 2,
    max_top2gram_frac: float = 0.20,
    max_dup5gram_frac: float = 0.15,
    text_col: str = "text",
):
    """Row-filtering companion of :func:`gopher_quality`: keep only
    docs passing every rule, ALL columns pass through — the curation-
    pipeline stage shape (one streaming pass, no metrics join-back).
    Shares the exact per-doc kernel, so kept set ≡
    ``gopher_quality(...)`` rows with ``passes = 1``."""
    stop = frozenset(STOP10)

    def fn(batch: pa.Table) -> pa.Table:
        keep = []
        for t in batch[text_col].to_pylist():
            n, mean_len, alpha, nstop, top2, dup5 = _gopher_doc(t, stop)
            keep.append(
                min_words <= n <= max_words
                and min_mean_word_len <= mean_len <= max_mean_word_len
                and alpha >= min_alpha_frac
                and nstop >= min_stop_distinct
                and top2 <= max_top2gram_frac
                and dup5 <= max_dup5gram_frac
            )
        # typed mask: pa.array([]) infers null type and Table.filter
        # rejects it — a 0-row batch must pass through, not crash
        return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")


def lang_id(ds, threshold: float = 0.05):
    """Predict 'en' when ≥ ``threshold`` of tokens are English stopwords."""
    stop = frozenset(STOP10)

    def fn(batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch["text"].to_pylist():
            toks = _tokens(t)
            hits = sum(1 for w in toks if w in stop)
            preds.append("en" if toks and hits / len(toks) >= threshold else "und")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(preds, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv1a64(s: str) -> np.uint64:
    """Scalar FNV-1a (the definitional loop — kept as the oracle for
    the vectorized batch kernel below)."""
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
    return h


def _fnv1a64_batch(strs: list[str]) -> np.ndarray:
    """FNV-1a over many strings at once: the byte loop runs over byte
    *positions* (≈ gram length), vectorized across all strings — the
    same values as :func:`_fnv1a64`, ~the string count times faster.

    Strings are processed in LENGTH-SORTED chunks so the padded
    ``count × maxlen`` matrix stays under ~64 MB: one pathological
    long token (minified JS / base64 in crawled text) must not
    multiply the whole batch's memory by its length."""
    n = len(strs)
    if n == 0:
        return np.empty(0, np.uint64)
    bs = [s.encode("utf-8") for s in strs]
    lens = np.fromiter((len(b) for b in bs), np.int64, n)
    out = np.empty(n, np.uint64)
    order = np.argsort(lens, kind="stable")
    budget = 1 << 26  # padded-matrix cells (bytes) per chunk
    start = 0
    while start < n:
        end = start + 1
        while end < n and (end + 1 - start) * lens[order[end]] <= budget:
            end += 1
        idx = order[start:end]
        clens = lens[idx]
        maxlen = int(clens[-1])  # sorted ascending
        arr = np.zeros((len(idx), max(maxlen, 1)), np.uint8)
        for row, i in enumerate(idx):
            if lens[i]:
                arr[row, : lens[i]] = np.frombuffer(bs[i], np.uint8)
        h = np.full(len(idx), _FNV_OFFSET, np.uint64)
        with np.errstate(over="ignore"):
            for j in range(maxlen):
                mask = clens > j
                h[mask] = (h[mask] ^ arr[mask, j].astype(np.uint64)) * _FNV_PRIME
        out[idx] = h
        start = end
    return out


def winnow_fingerprint_batch(
    texts: list[str], k: int = 5, window: int = 4
) -> list[list[int]]:
    """Winnowing sketches: per doc, the sorted distinct minima of each
    sliding window over the k-gram (word) rolling hashes.  All grams of
    the batch are hashed in ONE vectorized FNV pass."""
    per_doc_grams: list[list[str]] = []
    for t in texts:
        toks = _tokens(t)
        per_doc_grams.append(
            [" ".join(toks[i : i + k]) for i in range(max(0, len(toks) - k + 1))]
        )
    flat = [g for grams in per_doc_grams for g in grams]
    all_hs = _fnv1a64_batch(flat)
    out = []
    pos = 0
    for grams in per_doc_grams:
        hs = all_hs[pos : pos + len(grams)]
        pos += len(grams)
        if len(hs) == 0:
            out.append([])
            continue
        if len(hs) <= window:
            out.append([int(hs.min())])
            continue
        w = np.lib.stride_tricks.sliding_window_view(hs, window)
        out.append(sorted({int(x) for x in w.min(axis=1)}))
    return out


def fingerprint(ds, k: int = 5, window: int = 4):
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
        sketches = winnow_fingerprint_batch(texts, k, window)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "md5": pa.array(md5s, pa.string()),
                "winnow": pa.array(sketches, pa.list_(pa.uint64())),
                "n_winnow": pa.array(
                    np.array([len(s) for s in sketches], np.int64)
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
