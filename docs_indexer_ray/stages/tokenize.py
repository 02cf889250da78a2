"""Tokenize stage: docs batches → postings rows ``(term, doc_id, tf, dl, rpart)``.

Replaces the analysis half of what OpenSearch did for the reference
(D1–D3 of SURVEY.md §2.2; analyzer config ``/root/reference/common.py:4-31``,
``mappings/hugo.json``).  Runs as a ``map_batches`` **callable class**
so the analyzer (compiled regexes + Porter stem memo) is built once per
actor, per the actor-pool rule for stateful stages.

Per input row the whole analysis happens inside the batch function:

* analyze the chosen field → token list;
* ``dl`` = number of emitted tokens (Lucene norm semantics: length
  *after* the analysis chain — stopwords don't count);
* term frequencies via one hash pass per doc;
* one output row per distinct ``(term, doc)``; ``dl`` rides along on
  every posting row because the segment encoder needs per-posting
  ``dl`` for block-max metadata (``codec.encode_postings``).

**Shuffle key and skew**: the reduce key is a single column ``rpart``:

    part  = crc32(term) % num_parts              (hash partition by term)
    run   = doc_id // run_width  if term is heavy else 0
    rpart = part + num_parts * run

Heavy terms (df estimated over a deterministic doc sample in
``index/build.py``) are *salted* across ``n_salt_runs`` reducers by
contiguous doc-id range, so one hot term's posting list is built as
several independently encoded runs.  Because runs are doc-id **ranges**
(``run_width`` consecutive ids each), concatenating a term's runs in
run order is already globally doc-id-sorted — the reader stitches, it
never re-sorts (``query/reader.py``).
"""

from __future__ import annotations

import zlib
from collections import Counter

import numpy as np
import pyarrow as pa

from ..functions.analyzer import Analyzer

__all__ = ["Tokenizer", "term_part"]


def term_part(term: str, num_parts: int) -> int:
    """Stable (process-independent) term → reducer partition."""
    return zlib.crc32(term.encode("utf-8")) % num_parts


class Tokenizer:
    def __init__(
        self,
        field: str = "text",
        chain: str = "english",
        num_parts: int = 32,
        heavy_terms: frozenset[str] | set[str] | None = None,
        run_width: int = 1 << 60,
    ):
        self.field = field
        self.analyzer = Analyzer(chain)
        self.num_parts = num_parts
        self.heavy = frozenset(heavy_terms or ())
        self.run_width = max(1, run_width)
        self._part_cache: dict[str, int] = {}

    def _part(self, term: str) -> int:
        p = self._part_cache.get(term)
        if p is None:
            p = term_part(term, self.num_parts)
            self._part_cache[term] = p
        return p

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch[self.field].to_pylist()

        terms: list[str] = []
        out_doc: list[int] = []
        out_tf: list[int] = []
        out_dl: list[int] = []
        out_rpart: list[int] = []
        out_dlc: list[bool] = []
        analyze = self.analyzer
        heavy = self.heavy
        num_parts = self.num_parts
        rw = self.run_width
        for i, text in enumerate(texts):
            toks = analyze(text if text is not None else "")
            dl = len(toks)
            did = int(doc_ids[i])
            run_of_doc = did // rw
            first = True  # dl-carrier: exactly one posting row per doc
            for term, tf in Counter(toks).items():
                terms.append(term)
                out_doc.append(did)
                out_tf.append(tf)
                out_dl.append(dl)
                out_dlc.append(first)
                first = False
                part = self._part(term)
                out_rpart.append(
                    part + num_parts * run_of_doc if term in heavy else part
                )

        return pa.table(
            {
                "term": pa.array(terms, pa.string()).dictionary_encode(),
                "doc_id": pa.array(np.array(out_doc, np.uint64)),
                "tf": pa.array(np.array(out_tf, np.uint32)),
                "dl": pa.array(np.array(out_dl, np.uint32)),
                "rpart": pa.array(np.array(out_rpart, np.int32)),
                "dlc": pa.array(out_dlc, pa.bool_()),
            }
        )
