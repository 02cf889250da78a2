"""Minimal-interval (extent) algebra for the ``intervals`` query.

The reference exposes OpenSearch/Lucene's modern positional API; the
plain rules (``match``, ``any_of``) LOWER onto the engine's vectorized
phrase/span kernels (``query/dsl.py``).  ``all_of`` nesting and the
interval ``filter`` rules cannot be expressed as doc masks — they need
real extent enumeration (which *positions* matched, not just whether a
doc matched).  This module implements that algebra per doc, in the
minimal-interval semantics of Clarke/Cormack (and Vigna's "Efficient
optimally lazy algorithms for minimal-interval semantics"): every rule
evaluates to the set of intervals satisfying it from which no interval
properly contains another.

Semantics implemented (documented engine semantics — deterministic,
pinned by tests; Lucene's internal gap accounting differs in some
edge cases):

* ``term``            → one interval ``(p, p)`` per occurrence.
* ``match`` ordered   → for each start of the first term the greedy
  minimal chain (same walk as the sloppy phrase); ``gaps`` =
  ``span_width − n_terms``; keep ``gaps ≤ max_gaps`` when
  ``max_gaps ≥ 0`` (−1 = unlimited, the Lucene default).
* ``match`` unordered → minimal windows covering every term;
  same gap rule.
* ``any_of``          → union of the sub-sources' intervals, pruned
  to minimal.
* ``all_of`` ordered  → one interval per sub-source, in order and
  non-overlapping (each next interval starts strictly after the
  previous ends — Lucene's ordered combination); ``gaps`` = sum of
  inter-interval gaps.
* ``all_of`` unordered→ one interval per sub-source, any order,
  overlaps allowed; ``gaps`` = window width − |union of the chosen
  intervals| (positions inside the window covered by no sub).
* ``filter``          → relation predicates against the filter
  source's minimal intervals: ``containing``, ``contained_by``,
  ``not_containing``, ``not_contained_by``, ``overlapping``,
  ``not_overlapping``, ``before`` (source ends before some filter
  interval starts), ``after`` (source starts after some filter
  interval ends).  ``script`` filters are refused at lowering.

Cost shape: candidate docs come from the posting-list intersection of
the rule's REQUIRED terms (cheap, vectorized); only those docs run the
per-doc extent enumeration (numpy per doc; interval lists are
occurrence-scale).  The common plain rules never reach this module —
they keep the fully vectorized `_phrase_walk`/`_slop_walk` kernels.
Per-doc locality means doc-range shards compose exactly, like every
other positional leaf.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

__all__ = [
    "ExtTerm",
    "ExtMatch",
    "ExtAnyOf",
    "ExtAllOf",
    "ExtFilter",
    "eval_intervals",
    "collect_terms",
]


@dataclass
class ExtTerm:
    term: str


@dataclass
class ExtMatch:
    terms: list
    ordered: bool = False
    max_gaps: int = -1


@dataclass
class ExtAnyOf:
    subs: list = field(default_factory=list)


@dataclass
class ExtAllOf:
    subs: list = field(default_factory=list)
    ordered: bool = False
    max_gaps: int = -1


@dataclass
class ExtFilter:
    source: object
    relation: str  # containing | contained_by | not_* | overlapping | …
    filter: object


_NEGATIVE_RELATIONS = {"not_containing", "not_contained_by", "not_overlapping"}
_RELATIONS = _NEGATIVE_RELATIONS | {
    "containing", "contained_by", "overlapping", "before", "after",
}


def collect_terms(rule) -> set:
    """Every term mentioned anywhere in the rule (for postings decode)."""
    if isinstance(rule, ExtTerm):
        return {rule.term}
    if isinstance(rule, ExtMatch):
        return set(rule.terms)
    if isinstance(rule, (ExtAnyOf, ExtAllOf)):
        out = set()
        for s in rule.subs:
            out |= collect_terms(s)
        return out
    if isinstance(rule, ExtFilter):
        return collect_terms(rule.source) | collect_terms(rule.filter)
    raise TypeError(f"unknown extent rule {rule!r}")


def _required_term_sets(rule) -> list:
    """DNF-ish requirement: a list of term-sets; a doc is a candidate
    if it contains EVERY term of at least one set.  ``any_of`` unions
    alternatives; negative filter relations don't require the filter
    side."""
    if isinstance(rule, ExtTerm):
        return [{rule.term}]
    if isinstance(rule, ExtMatch):
        return [set(rule.terms)]
    if isinstance(rule, ExtAnyOf):
        out = []
        for s in rule.subs:
            out.extend(_required_term_sets(s))
        return out
    if isinstance(rule, ExtAllOf):
        combos = [set()]
        for s in rule.subs:
            alts = _required_term_sets(s)
            combos = [c | a for c in combos for a in alts]
            if len(combos) > 64:
                # cap the DNF blowup.  Soundness requires candidates ⊇
                # matching docs, so WEAKEN to the terms every
                # alternative requires (never strengthen — a union
                # would silently drop valid matches)
                combos = [set.intersection(*combos)]
        return combos
    if isinstance(rule, ExtFilter):
        src = _required_term_sets(rule.source)
        if rule.relation in _NEGATIVE_RELATIONS:
            return src
        flt = _required_term_sets(rule.filter)
        return [a | b for a in src for b in flt]
    raise TypeError(f"unknown extent rule {rule!r}")


def _minimal(iv: np.ndarray) -> np.ndarray:
    """Prune to minimal intervals: drop duplicates and any interval
    properly containing another.  Result sorted by start (ends then
    strictly increase — the property the combiners rely on)."""
    if len(iv) == 0:
        return iv.reshape(0, 2)
    iv = np.unique(iv, axis=0)  # sorts by (start, end), dedupes
    # within equal starts keep only the smallest end
    first = np.ones(len(iv), bool)
    first[1:] = iv[1:, 0] != iv[:-1, 0]
    iv = iv[first]
    # starts strictly increase; an interval is non-minimal iff some
    # LATER interval has end <= its end → suffix-min of ends
    ends = iv[:, 1]
    suffix_min = np.minimum.accumulate(ends[::-1])[::-1]
    keep = np.ones(len(iv), bool)
    keep[:-1] = ends[:-1] < suffix_min[1:]
    return iv[keep]


def _ordered_combine(sub_ivs: list, max_gaps: int) -> np.ndarray:
    """One interval per sub, in order, non-overlapping, greedy-minimal
    per start; gap sum filtered against ``max_gaps``."""
    if any(len(s) == 0 for s in sub_ivs):
        return np.empty((0, 2), np.int64)
    out = []
    for s0, e0 in sub_ivs[0]:
        cur_end = e0
        gaps = 0
        ok = True
        for nxt in sub_ivs[1:]:
            # minimal lists have strictly increasing starts AND ends →
            # the first interval starting after cur_end is the greedy-
            # optimal choice
            j = int(np.searchsorted(nxt[:, 0], cur_end + 1))
            if j >= len(nxt):
                ok = False
                break
            gaps += int(nxt[j, 0]) - cur_end - 1
            cur_end = int(nxt[j, 1])
        if ok and (max_gaps < 0 or gaps <= max_gaps):
            out.append((int(s0), cur_end))
    return _minimal(np.asarray(out, np.int64).reshape(-1, 2))


def _unordered_combine(sub_ivs: list, max_gaps: int) -> np.ndarray:
    """One interval per sub, any order (overlaps allowed): the classic
    min-window sweep — at each step the window is (min start, max end)
    over the current pointer combo; advance the pointer holding the
    minimal start."""
    m = len(sub_ivs)
    if any(len(s) == 0 for s in sub_ivs):
        return np.empty((0, 2), np.int64)
    ptr = [0] * m
    out = []
    while True:
        starts = np.array([sub_ivs[i][ptr[i], 0] for i in range(m)])
        ends = np.array([sub_ivs[i][ptr[i], 1] for i in range(m)])
        w_s, w_e = int(starts.min()), int(ends.max())
        if max_gaps < 0:
            out.append((w_s, w_e))
        else:
            # uncovered positions inside the window
            covered = np.zeros(w_e - w_s + 1, bool)
            for i in range(m):
                covered[sub_ivs[i][ptr[i], 0] - w_s:
                        sub_ivs[i][ptr[i], 1] - w_s + 1] = True
            if int((~covered).sum()) <= max_gaps:
                out.append((w_s, w_e))
        adv = int(starts.argmin())
        ptr[adv] += 1
        if ptr[adv] >= len(sub_ivs[adv]):
            break
    return _minimal(np.asarray(out, np.int64).reshape(-1, 2))


def _apply_filter(src: np.ndarray, rel: str, flt: np.ndarray) -> np.ndarray:
    if len(src) == 0:
        return src
    if rel in ("containing", "not_containing"):
        hit = np.array([
            bool(len(flt)) and bool(
                ((flt[:, 0] >= s) & (flt[:, 1] <= e)).any()
            )
            for s, e in src
        ])
        return src[hit] if rel == "containing" else src[~hit]
    if rel in ("contained_by", "not_contained_by"):
        hit = np.array([
            bool(len(flt)) and bool(
                ((flt[:, 0] <= s) & (flt[:, 1] >= e)).any()
            )
            for s, e in src
        ])
        return src[hit] if rel == "contained_by" else src[~hit]
    if rel in ("overlapping", "not_overlapping"):
        hit = np.array([
            bool(len(flt)) and bool(
                ((flt[:, 0] <= e) & (flt[:, 1] >= s)).any()
            )
            for s, e in src
        ])
        return src[hit] if rel == "overlapping" else src[~hit]
    if rel == "before":
        hit = np.array([
            bool(len(flt)) and bool((flt[:, 0] > e).any()) for _, e in src
        ])
        return src[hit]
    if rel == "after":
        hit = np.array([
            bool(len(flt)) and bool((flt[:, 1] < s).any()) for s, _ in src
        ])
        return src[hit]
    raise ValueError(f"unknown interval filter relation {rel!r}")


def _doc_intervals(rule, pos: dict) -> np.ndarray:
    """Minimal intervals of ``rule`` on one doc, given that doc's
    per-term sorted position arrays (missing term → empty)."""
    if isinstance(rule, ExtTerm):
        p = pos.get(rule.term)
        if p is None or len(p) == 0:
            return np.empty((0, 2), np.int64)
        return np.stack([p, p], axis=1).astype(np.int64)
    if isinstance(rule, ExtMatch):
        subs = [_doc_intervals(ExtTerm(t), pos) for t in rule.terms]
        if len(subs) == 1:
            return subs[0]
        comb = _ordered_combine if rule.ordered else _unordered_combine
        return comb(subs, rule.max_gaps)
    if isinstance(rule, ExtAnyOf):
        parts = [_doc_intervals(s, pos) for s in rule.subs]
        parts = [p for p in parts if len(p)]
        if not parts:
            return np.empty((0, 2), np.int64)
        return _minimal(np.concatenate(parts, axis=0))
    if isinstance(rule, ExtAllOf):
        subs = [_doc_intervals(s, pos) for s in rule.subs]
        comb = _ordered_combine if rule.ordered else _unordered_combine
        return comb(subs, rule.max_gaps)
    if isinstance(rule, ExtFilter):
        src = _doc_intervals(rule.source, pos)
        if len(src) == 0:
            return src
        flt = _doc_intervals(rule.filter, pos)
        return _apply_filter(src, rule.relation, flt)
    raise TypeError(f"unknown extent rule {rule!r}")


def eval_intervals(reader, rule, lo: Optional[int] = None,
                   hi: Optional[int] = None) -> np.ndarray:
    """Matching GLOBAL doc ids of ``rule`` within ``[lo, hi)`` (full
    corpus when unset), tombstones excluded, ascending."""
    full = lo is None and hi is None
    if lo is None:
        lo = 0
    if hi is None:
        hi = reader.n_docs
    terms = sorted(collect_terms(rule))
    decoded = {}
    for t in terms:
        tp = reader.postings(t)
        if tp is None:
            decoded[t] = (np.empty(0, np.int64), np.empty(0, np.int64),
                          np.zeros(1, np.int64))
            continue
        if full:
            ids, _ = tp.decode_all()
            flat, offs = tp.decode_all_positions()
        else:
            ids, _, flat, offs = tp.decode_range_positions(lo, hi)
        decoded[t] = (np.asarray(ids, np.int64), np.asarray(flat, np.int64),
                      np.asarray(offs, np.int64))

    # candidate docs from the DNF of required-term sets
    cand = None
    for req in _required_term_sets(rule):
        docs = None
        for t in sorted(req):
            ids = decoded[t][0]
            docs = ids if docs is None else np.intersect1d(
                docs, ids, assume_unique=True
            )
            if docs is not None and len(docs) == 0:
                break
        if docs is None:
            # empty requirement set (DNF-cap fallback with disjoint
            # alternatives): every doc in range is a candidate
            docs = np.arange(lo, hi, dtype=np.int64)
        cand = docs if cand is None else np.union1d(cand, docs)
    if cand is None or len(cand) == 0:
        return np.empty(0, np.int64)
    cand = cand[(cand >= lo) & (cand < hi)]

    matched = []
    for doc in cand.tolist():
        pos = {}
        for t in terms:
            ids, flat, offs = decoded[t]
            j = int(np.searchsorted(ids, doc))
            if j < len(ids) and ids[j] == doc:
                pos[t] = flat[offs[j]:offs[j + 1]]
        if len(_doc_intervals(rule, pos)):
            matched.append(doc)
    if not matched:
        return np.empty(0, np.int64)
    out = np.asarray(matched, np.int64)
    if reader.has_deletes:
        dels = reader.deleted_ids()
        j = np.searchsorted(dels, out)
        dead = (j < len(dels)) & (dels[np.minimum(j, len(dels) - 1)] == out)
        out = out[~dead]
    return out
