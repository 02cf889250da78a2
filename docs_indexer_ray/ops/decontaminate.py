"""Benchmark decontamination: flag training docs overlapping an eval set.

The standard pre-training hygiene pass (GPT-3 appendix C, "dirty"
13-gram rule; PaLM / Llama use the same shape): a document is
CONTAMINATED if any of its word n-grams appears in the evaluation
benchmark's n-gram set.  Removing (or flagging) such docs prevents
test-set leakage into training.

Scale shape: the eval side is SMALL by definition (benchmarks are
thousands of examples, not terabytes), so its distinct n-gram set is
collected once and **broadcast via ``ray.put``** — the corpus side
streams through one ``map_batches`` with a C-speed set probe per
gram; no shuffle, no driver pass over the corpus.  This is the
canonical broadcast-join-against-a-small-side pattern.

Gram = ``n`` consecutive analyzer tokens joined with single spaces —
replicable in SQL with ``lead()`` windows, which is how the oracle
pins it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.analyzer import Analyzer

__all__ = ["ngram_set", "flag_contaminated", "filter_clean"]


def ngram_set(texts, n: int = 13, chain: str = "simple") -> frozenset[str]:
    """Distinct word ``n``-grams of the eval texts (the dirty set)."""
    an = Analyzer(chain)
    grams: set[str] = set()
    for t in texts:
        toks = an(t or "")
        grams.update(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
    return frozenset(grams)


def flag_contaminated(
    ds,
    eval_grams: frozenset[str],
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    chain: str = "simple",
):
    """Per-doc contamination flags against a broadcast eval-gram set.

    Returns ``(doc_id, n_hits, contaminated)`` — ``n_hits`` counts
    every overlapping gram OCCURRENCE (a doc repeating a dirty gram
    counts each time, matching the SQL join-count), ``contaminated``
    is the 0/1 GPT-3 dirty flag.  Docs shorter than ``n`` tokens can
    never be dirty."""
    class Flag:
        def __init__(self, grams):
            # passed via fn_constructor_args: Ray stores the set in the
            # object store ONCE and hands each actor the same copy —
            # broadcast semantics without a closure-captured ObjectRef
            self._grams = grams
            self._an = Analyzer(chain)

        def __call__(self, batch: pa.Table) -> pa.Table:
            g = self._grams
            an = self._an
            hits = []
            for t in batch[text_col].to_pylist():
                toks = an(t or "")
                c = 0
                for i in range(len(toks) - n + 1):
                    if " ".join(toks[i : i + n]) in g:
                        c += 1
                hits.append(c)
            hits_arr = np.array(hits, np.int64)
            return pa.table(
                {
                    "doc_id": batch[id_col],
                    "n_hits": pa.array(hits_arr),
                    "contaminated": pa.array((hits_arr > 0).astype(np.int64)),
                }
            )

    return ds.map_batches(
        Flag,
        fn_constructor_args=(eval_grams,),
        concurrency=(1, 8),
        batch_format="pyarrow",
    )


def filter_clean(
    ds,
    eval_grams: frozenset[str],
    n: int = 13,
    text_col: str = "text",
    chain: str = "simple",
):
    """Row-filtering companion of :func:`flag_contaminated`: DROP
    every doc sharing ≥1 dirty n-gram with the eval set, all columns
    pass through — the curation-pipeline stage shape.  Same broadcast
    (``fn_constructor_args`` actor pool) and probe kernel, so the
    kept set ≡ ``flag_contaminated(...)`` rows with
    ``contaminated = 0``."""

    class Clean:
        def __init__(self, grams):
            self._grams = grams
            self._an = Analyzer(chain)

        def __call__(self, batch: pa.Table) -> pa.Table:
            g = self._grams
            an = self._an
            keep = []
            for t in batch[text_col].to_pylist():
                toks = an(t or "")
                dirty = any(
                    " ".join(toks[i : i + n]) in g
                    for i in range(len(toks) - n + 1)
                )
                keep.append(not dirty)
            # typed mask: an empty batch's [] infers null type, which
            # Table.filter rejects — pass 0-row batches through
            return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(
        Clean,
        fn_constructor_args=(eval_grams,),
        concurrency=(1, 8),
        batch_format="pyarrow",
    )
