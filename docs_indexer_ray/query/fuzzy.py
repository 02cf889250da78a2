"""Fuzzy and wildcard term queries over the term dictionary.

The reference's search UI queries OpenSearch, whose query DSL exposes
``fuzzy`` (edit-distance term expansion: ``fuzziness`` /
``prefix_length`` / ``transpositions`` / ``max_expansions`` —
the match-query leg the reference relies on for typo tolerance) and
``wildcard`` (``*`` / ``?`` pattern over the term dictionary).  This
module rebuilds both directly on the engine's term dictionary:

* :func:`fuzzy_expand` — every vocabulary term within bounded edit
  distance of a query token, ``(term, distance, df)`` ranked the way
  Lucene ranks fuzzy expansions (closer first, then more frequent);
* :func:`fuzzy_match_doc_ids` — the doc set matching ANY expansion
  (the ``fuzzy`` query's document-level result);
* :func:`wildcard_terms` — terms matching a ``*``/``?`` pattern with
  a literal-prefix binary-search fast path.

Scale note: both operators are **vocabulary-sized** — per query-actor
state, sharded with the term dictionary at 10^12 docs exactly like
the suggesters (``suggest.py``).  Lucene compiles a Levenshtein
automaton and intersects it with the term FST; this implementation
prunes by length band (``|len(term) - len(token)| <= max_edits``) and
required literal prefix, then runs a cap-bounded DP — the same
O(pruned_vocab × len²) work, without the automaton machinery.
"""

from __future__ import annotations

import re

import numpy as np

from .reader import IndexReader, prefix_upper_bound

__all__ = [
    "edit_distance",
    "fuzzy_expand",
    "fuzzy_match_doc_ids",
    "wildcard_terms",
]


def edit_distance(a: str, b: str, cap: int = 2, transpositions: bool = True) -> int:
    """Bounded edit distance, early-exiting once every path exceeds
    ``cap`` (returns ``cap + 1`` then).

    ``transpositions=True`` → optimal-string-alignment (restricted
    Damerau-Levenshtein), Lucene's default for fuzzy queries;
    ``False`` → plain Levenshtein (insert/delete/substitute only),
    which matches DuckDB's ``levenshtein()`` bit-for-bit — the
    engine's SQL oracles use that mode."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev2: list[int] = []
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                transpositions
                and i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        if min(cur) > cap:
            return cap + 1
        prev2, prev = prev, cur
    return prev[lb]


def auto_fuzziness(token: str) -> int:
    """OpenSearch ``fuzziness: AUTO``: 0 edits below 3 chars, 1 for
    3–5 chars, 2 above."""
    n = len(token)
    if n < 3:
        return 0
    if n <= 5:
        return 1
    return 2


def fuzzy_expand(
    reader: IndexReader,
    token: str,
    max_edits: int | None = None,
    prefix_length: int = 0,
    transpositions: bool = True,
    max_expansions: int = 50,
) -> list[tuple[str, int, int]]:
    """Vocabulary terms within ``max_edits`` of ``token`` →
    ``(term, distance, df)``, ranked distance asc / df desc / term asc
    (closest-then-popular, Lucene's ``FuzzyQuery`` expansion order),
    capped at ``max_expansions`` AFTER ranking.

    ``max_edits=None`` → ``fuzziness: AUTO``.  ``prefix_length`` pins
    the first k characters (binary-search range over the sorted
    dictionary — the cheap path for interactive queries).
    """
    if max_edits is None:
        max_edits = auto_fuzziness(token)
    terms, dfs = reader.term_dictionary()
    if prefix_length > 0:
        pre = token[:prefix_length]
        lo = int(np.searchsorted(terms, pre))
        ub = prefix_upper_bound(pre)
        hi = int(np.searchsorted(terms, ub)) if ub is not None else len(terms)
        terms, dfs = terms[lo:hi], dfs[lo:hi]
    out: list[tuple[str, int, int]] = []
    tl = len(token)
    for term, df in zip(terms.tolist(), dfs.tolist()):
        if abs(len(term) - tl) > max_edits:
            continue
        if term == token:
            out.append((term, 0, int(df)))
            continue
        if max_edits == 0:
            continue
        d = edit_distance(token, term, cap=max_edits, transpositions=transpositions)
        if d <= max_edits:
            out.append((term, d, int(df)))
    out.sort(key=lambda c: (c[1], -c[2], c[0]))
    return out[:max_expansions]


def fuzzy_match_doc_ids(
    reader: IndexReader,
    token: str,
    max_edits: int | None = None,
    prefix_length: int = 0,
    transpositions: bool = True,
    max_expansions: int = 50,
) -> np.ndarray:
    """Sorted doc ids containing ANY fuzzy expansion of ``token`` —
    the document-level result of an OpenSearch ``fuzzy`` query
    (expansion union, exactly ``facets.match_doc_ids`` over the
    expanded term list)."""
    from .facets import match_doc_ids

    exp = fuzzy_expand(
        reader,
        token,
        max_edits=max_edits,
        prefix_length=prefix_length,
        transpositions=transpositions,
        max_expansions=max_expansions,
    )
    return match_doc_ids(reader, [t for t, _, _ in exp])


def _wildcard_regex(pattern: str) -> re.Pattern:
    """``*``→any run, ``?``→one char, everything else literal."""
    parts = []
    for ch in pattern:
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(re.escape(ch))
    return re.compile("".join(parts))


def _vocab_trigram_index(reader: IndexReader) -> dict[str, np.ndarray]:
    """Padded-trigram → sorted term-index postings over the loaded
    dictionary (pg_trgm's structure) — built lazily ONCE per reader,
    cached like the postings cache; vocabulary-scale memory."""
    if not hasattr(reader, "_wc_trigram_index"):
        terms, _ = reader.term_dictionary()
        tri: dict[str, list[int]] = {}
        for i, t in enumerate(terms.tolist()):
            padded = f"^{t}$"
            for j in range(max(len(padded) - 2, 1)):
                tri.setdefault(padded[j : j + 3], []).append(i)
        # unique per gram: a term containing the same trigram twice
        # ("banana" → "ana"×2) must post ONCE, or wildcard results
        # duplicate and intersect1d(assume_unique=True) misbehaves
        reader._wc_trigram_index = {
            g: np.unique(np.array(v, np.int64)) for g, v in tri.items()
        }
    return reader._wc_trigram_index


def _pattern_trigrams(pattern: str) -> list[str]:
    """Trigram constraints every match must contain: trigrams of each
    literal run, anchored with ``^``/``$`` when the run touches the
    pattern's start/end (a ``?`` contributes position, not letters, so
    runs split on BOTH wildcard chars)."""
    padded = f"^{pattern}$"
    out: list[str] = []
    run: list[str] = []
    for ch in padded:
        if ch in "*?":
            if len(run) >= 3:
                out.extend(
                    "".join(run[i : i + 3]) for i in range(len(run) - 2)
                )
            run = []
        else:
            run.append(ch)
    if len(run) >= 3:
        out.extend("".join(run[i : i + 3]) for i in range(len(run) - 2))
    return out


def _regex_trigrams(pattern: str) -> list[str] | None:
    """Trigram constraints every match of an ANCHORED regex must
    contain, from the pattern's top-level mandatory literal runs —
    or ``None`` when the pattern can't be accelerated (top-level
    alternation makes every run optional).

    Conservative single-pass scan: a plain literal char extends the
    current run; any other construct (``.``, a class, a group, an
    escape) flushes it; a quantifier makes the PRECEDING atom
    optional, so that atom is retracted from the run before flushing.
    Runs touching the pattern's start/end gain the ``^``/``$`` pads
    the vocabulary trigram index uses.
    """
    runs: list[tuple[str, bool, bool]] = []  # (text, at_start, at_end)
    run: list[str] = []
    i, n = 0, len(pattern)
    at_start = True  # no construct consumed yet

    def flush(end_anchor: bool = False) -> None:
        nonlocal at_start
        if run:
            runs.append(("".join(run), at_start, end_anchor))
            run.clear()
        at_start = False

    while i < n:
        c = pattern[i]
        if c == "|":
            return None  # top-level alternation: nothing is mandatory
        if c in "*+?{":
            # quantifier on the previous atom: retract it (a lone
            # literal was the atom; groups/classes already flushed)
            if c == "{":
                j = pattern.find("}", i)
                i = (j if j >= 0 else n - 1) + 1
            else:
                i += 1
            if run:
                run.pop()
            flush()
            continue
        if c == "\\":
            flush()
            i += 2
            continue
        if c == "[":
            j = i + 1
            if j < n and pattern[j] == "^":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 2 if pattern[j] == "\\" else 1
            flush()
            i = j + 1
            continue
        if c == "(":
            depth, j = 1, i + 1
            while j < n and depth:
                if pattern[j] == "\\":
                    j += 1
                elif pattern[j] == "(":
                    depth += 1
                elif pattern[j] == ")":
                    depth -= 1
                j += 1
            flush()
            i = j
            continue
        if c in ".^$)":
            flush()
            i += 1
            continue
        run.append(c)
        i += 1
    # a run that survives to the very end is end-anchored — unless a
    # trailing quantifier retracted into it (handled above)
    if run:
        runs.append(("".join(run), at_start, True))
    out: list[str] = []
    for text, s_anchor, e_anchor in runs:
        padded = ("^" if s_anchor else "") + text + ("$" if e_anchor else "")
        out.extend(padded[k : k + 3] for k in range(len(padded) - 2))
    return out


def regexp_terms(
    reader: IndexReader, pattern: str, limit: int = 10_000
) -> list[tuple[str, int]]:
    """Terms fully matching an anchored regex, by descending df (term
    asc tie-break) — OpenSearch's ``regexp`` query surface.

    Same plan as :func:`wildcard_terms`: mandatory literal runs
    extracted from the pattern become trigram constraints intersected
    against the cached vocabulary trigram index
    (:func:`_vocab_trigram_index`), candidates verified with
    ``re.fullmatch``; full dictionary scan only when no ≥3-char
    mandatory run exists.  Keep patterns RE2-compatible (no
    backrefs/lookaround) so a DuckDB ``regexp_full_match`` oracle can
    replay them."""
    rx = re.compile(pattern)
    terms, dfs = reader.term_dictionary()
    grams = _regex_trigrams(pattern) or []
    grams = [g for g in grams if len(g) == 3]
    if grams:
        tri = _vocab_trigram_index(reader)
        idx: np.ndarray | None = None
        for g in grams:
            post = tri.get(g)
            if post is None:
                return []
            idx = post if idx is None else np.intersect1d(
                idx, post, assume_unique=True
            )
            if len(idx) == 0:
                return []
        cand_terms, cand_dfs = terms[idx], dfs[idx]
    else:
        cand_terms, cand_dfs = terms, dfs
    hits = [
        (t, int(d))
        for t, d in zip(cand_terms.tolist(), cand_dfs.tolist())
        if rx.fullmatch(t)
    ]
    hits.sort(key=lambda kv: (-kv[1], kv[0]))
    return hits[:limit]


def wildcard_terms(
    reader: IndexReader, pattern: str, limit: int = 10_000
) -> list[tuple[str, int]]:
    """Terms fully matching a ``*``/``?`` pattern, by descending df
    (term asc tie-break) — OpenSearch's ``wildcard`` query surface.

    Plan, best-first:

    1. literal prefix before the first wildcard → binary-search range
       of the sorted dictionary (same trick as ``reader.prefix_terms``);
    2. otherwise (leading/infix wildcards) the pattern's literal runs
       become TRIGRAM constraints intersected against a lazily-built
       vocabulary trigram index (the pg_trgm acceleration — OpenSearch
       documents leading wildcards as full-dictionary scans; here they
       cost |shortest trigram posting| instead), candidates verified
       by regex;
    3. full scan only when no literal run is ≥3 chars (nothing to
       index on)."""
    cut = min(
        [i for i, c in enumerate(pattern) if c in "*?"] or [len(pattern)]
    )
    prefix = pattern[:cut]
    terms, dfs = reader.term_dictionary()
    if cut == len(pattern):
        # no wildcard at all: ONE binary search (the dictionary is
        # sorted), not a vocabulary-scale Python scan
        df = reader.term_df(pattern)
        return [(pattern, df)] if df and limit > 0 else []
    rx = _wildcard_regex(pattern)
    if prefix:
        lo = int(np.searchsorted(terms, prefix))
        ub = prefix_upper_bound(prefix)
        hi = int(np.searchsorted(terms, ub)) if ub is not None else len(terms)
        cand_terms, cand_dfs = terms[lo:hi], dfs[lo:hi]
    else:
        grams = _pattern_trigrams(pattern)
        if grams:
            tri = _vocab_trigram_index(reader)
            idx: np.ndarray | None = None
            for g in grams:
                post = tri.get(g)
                if post is None:
                    return []  # a required trigram exists in no term
                idx = post if idx is None else np.intersect1d(
                    idx, post, assume_unique=True
                )
                if len(idx) == 0:
                    return []
            cand_terms, cand_dfs = terms[idx], dfs[idx]
        else:  # e.g. "*a*" — nothing to constrain on
            cand_terms, cand_dfs = terms, dfs
    hits = [
        (t, int(d))
        for t, d in zip(cand_terms.tolist(), cand_dfs.tolist())
        if rx.fullmatch(t)
    ]
    hits.sort(key=lambda kv: (-kv[1], kv[0]))
    return hits[:limit]
