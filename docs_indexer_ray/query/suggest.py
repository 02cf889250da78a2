"""'Did you mean' phrase suggester over the index's term dictionary.

The reference feeds OpenSearch's *phrase suggester* with a
trigram-shingle analyzer and a reverse analyzer
(``/root/reference/common.py:10-27``; ``mappings/hugo.json:63-70``) —
candidate generation by character-n-gram overlap against the indexed
vocabulary, ranked by a mix of string similarity and term frequency.
This module rebuilds that capability directly:

* a **character-trigram index** over the term dictionary (built once
  per :class:`Suggester`, i.e. once per query actor) maps each padded
  trigram ``^te``, ``ter``, … to the terms containing it;
* for an input token absent from (or rare in) the vocabulary,
  candidates are every term sharing ≥1 trigram, scored by trigram
  **Jaccard** similarity with df as the tiebreak (similar strings
  first, then the more frequent term — the suggester's "popular"
  mode);
* :meth:`suggest` corrects each token of a query phrase independently
  and returns re-assembled phrase suggestions with a combined score —
  the phrase-suggester surface the reference exposes to its search UI.

Scale note: the trigram index is vocabulary-sized (× avg term length)
— per-actor state, sharded with the term dictionary at 10^12 docs.
All ranking is deterministic (similarity desc, df desc, term asc).
"""

from __future__ import annotations

import numpy as np

from ..functions.analyzer import tokenize_simple, tokenize_standard
from .fuzzy import edit_distance
from .reader import IndexReader

__all__ = ["Suggester"]


def _trigrams(term: str) -> set[str]:
    padded = f"^{term}$"
    if len(padded) < 3:
        return {padded}
    return {padded[i : i + 3] for i in range(len(padded) - 2)}


class Suggester:
    """Per-actor suggester state over one index chain's vocabulary.

    ``min_df`` — tokens with df below this are considered misspelled
    and get correction candidates; ``min_sim`` — minimum trigram
    Jaccard for a candidate to be proposed.
    """

    def __init__(
        self,
        reader: IndexReader,
        min_df: int = 1,
        min_sim: float = 0.25,
        max_len_diff: int = 2,
    ):
        from ..functions.analyzer import Analyzer

        self.reader = reader
        self.min_df = min_df
        self.min_sim = min_sim
        self.max_len_diff = max_len_diff
        self._analyzer = Analyzer(reader.chain)
        terms, dfs = reader.term_dictionary()
        self.terms = terms
        self.dfs = dfs
        self._tri: dict[str, list[int]] = {}
        # only the trigram COUNT per term is ever needed for Jaccard —
        # storing the sets themselves is a vocabulary-scale memory
        # blowup per query actor (the trigram→terms map above already
        # holds the strings once)
        tri_counts = np.empty(len(terms), np.int32)
        for i, term in enumerate(terms):
            tris = _trigrams(term)
            tri_counts[i] = len(tris)
            for g in tris:
                self._tri.setdefault(g, []).append(i)
        self._tri_counts = tri_counts

    def correct_token(self, token: str, limit: int = 3) -> list[tuple[str, float, int]]:
        """Candidate corrections ``(term, similarity, df)`` for one
        token, best first; empty if nothing clears ``min_sim``.

        Primary generator: trigram-overlap candidates (cheap, catches
        most typos).  Fallback for transpositions and short tokens —
        which can share NO trigram with their correction ("hsah" vs
        "hash") — a bounded Damerau-Levenshtein scan over same-first-
        or-last-letter terms of similar length (the OpenSearch
        candidate generator's edit-distance leg)."""
        tris = _trigrams(token)
        counts: dict[int, int] = {}
        for g in tris:
            for i in self._tri.get(g, ()):
                counts[i] = counts.get(i, 0) + 1
        out = []
        for i, inter in counts.items():
            term = self.terms[i]
            if abs(len(term) - len(token)) > self.max_len_diff:
                continue
            union = len(tris) + int(self._tri_counts[i]) - inter
            sim = inter / union
            if sim >= self.min_sim and term != token:
                out.append((term, sim, int(self.dfs[i])))
        if not out:
            for i, term in enumerate(self.terms):
                if abs(len(term) - len(token)) > 1 or term == token:
                    continue
                if term[0] != token[0] and term[-1] != token[-1]:
                    continue
                d = edit_distance(token, term, cap=2)
                if d <= 2:
                    sim = 1.0 - d / max(len(token), len(term))
                    out.append((term, sim, int(self.dfs[i])))
        out.sort(key=lambda c: (-c[1], -c[2], c[0]))
        return out[:limit]

    def suggest(self, text: str, max_suggestions: int = 3) -> list[tuple[str, float]]:
        """Phrase suggestions for a query, best first.

        Each low-df token is independently corrected; the phrase score
        is the product of per-token similarities (kept tokens score 1).
        Returns only phrases that changed something — an empty list
        means the query looks fine (the "did you mean" banner stays
        hidden, matching the reference UI behavior).

        The df check runs each SURFACE token through the index chain's
        analyzer (the vocabulary lives in analyzer space — on the
        ``english`` chain "merging" stems to "merg"), so correctly
        spelled inflected words are recognized and kept verbatim;
        tokens the analyzer drops entirely (stopwords) are kept too.
        Corrections themselves are matched in analyzer space and
        emitted as vocabulary terms (stems on stemmed chains).

        Surface tokenization uses the chain's own tokenizer (unicode
        standard regex, or ``[a-z0-9]+`` on the ``simple`` chain) — an
        ASCII-only split would truncate accented words ("café" → "caf",
        df 0) and then "correct" them back to themselves, violating the
        only-changed-phrases contract above."""
        if self.reader.chain == "simple":
            tokens = tokenize_simple(text)
        else:
            tokens = [t.lower() for t in tokenize_standard(text)]
        per_token: list[list[tuple[str, float]]] = []
        any_changed = False
        for tok in tokens:
            analyzed = self._analyzer(tok)
            if not analyzed or any(
                self.reader.term_df(a) >= self.min_df for a in analyzed
            ):
                per_token.append([(tok, 1.0)])
                continue
            cands = self.correct_token(analyzed[0], limit=max_suggestions)
            if cands:
                any_changed = True
                per_token.append([(term, sim) for term, sim, _ in cands])
            else:
                per_token.append([(tok, 1.0)])
        if not any_changed or not tokens:
            return []
        # beam over per-token candidates (first candidate everywhere,
        # then single-token alternates) — deterministic, no blowup
        best = [c[0] for c in per_token]
        phrases: list[tuple[str, float]] = []
        # never propose the user's own phrase back (a vocabulary term
        # can equal a surface token even when its analyzed form has df 0)
        seen = {" ".join(tokens)}

        def add(choice: list[tuple[str, float]]):
            phrase = " ".join(term for term, _ in choice)
            if phrase in seen:
                return
            seen.add(phrase)
            score = float(np.prod([s for _, s in choice]))
            phrases.append((phrase, score))

        add(best)
        for i, cands in enumerate(per_token):
            for alt in cands[1:]:
                add(best[:i] + [alt] + best[i + 1 :])
        phrases.sort(key=lambda p: (-p[1], p[0]))
        return phrases[:max_suggestions]
