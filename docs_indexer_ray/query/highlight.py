"""Query-time highlighting: match offsets + snippet extraction.

The reference configures ``"term_vector": "with_positions_offsets"``
on every text field (``/root/reference/mappings/hugo.json:6,48,60``) so
OpenSearch can highlight hits.  This engine keeps postings lean
(term, doc, tf) and recovers offsets at query time by re-analyzing the
*one* document being rendered — the standard "plain highlighter"
trade-off: storing positions would grow every posting by ~4× to speed
up a per-hit operation that touches k ≤ 10 docs per query.

``highlight`` tokenizes the stored text with character offsets (the
same standard-tokenizer regex the analyzer chain uses), applies the
chain's normalization per token, and marks tokens whose normalized
form is in the query's analyzed term set.
"""

from __future__ import annotations

from ..functions.analyzer import TOKEN_RE as _TOKEN_RE
from ..functions.analyzer import Analyzer, strip_possessive
from ..functions.porter import porter_stem

__all__ = ["match_spans", "highlight", "best_snippet"]


def _normalize(token: str, chain: str) -> str:
    """Map ONE surface token to the analyzer-space form query terms are
    matched against.  Must agree with :class:`Analyzer`'s per-chain
    normalization (the tokenizer itself is shared via ``TOKEN_RE``).
    ``trigram``/``edge`` match on the lowered unigram — the chains
    emit it among their terms (edge n-grams include the full token up
    to length 15), so single-word query terms still light up."""
    if chain == "english":
        return porter_stem(strip_possessive(token).lower())
    if chain == "reverse":
        return token.lower()[::-1]
    return token.lower()  # standard / simple / trigram / edge


def match_spans(text: str, query_terms: set[str], chain: str = "english"):
    """``[(start, end)]`` character spans of tokens matching the query."""
    spans = []
    for m in _TOKEN_RE.finditer(text):
        if _normalize(m.group(0), chain) in query_terms:
            spans.append((m.start(), m.end()))
    return spans


def highlight(
    text: str,
    query: str,
    chain: str = "english",
    pre: str = "<em>",
    post: str = "</em>",
) -> str:
    """Full text with every query-term occurrence wrapped."""
    terms = set(Analyzer(chain)(query))
    out, last = [], 0
    for s, e in match_spans(text, terms, chain):
        out.append(text[last:s])
        out.append(pre + text[s:e] + post)
        last = e
    out.append(text[last:])
    return "".join(out)


def best_snippet(
    text: str,
    query: str,
    chain: str = "english",
    width: int = 160,
    pre: str = "<em>",
    post: str = "</em>",
    terms: set[str] | None = None,
) -> str:
    """The densest ``width``-char window of matches, highlighted —
    what a result page shows under each hit.  Pass ``terms`` to skip
    the analyzer and highlight a precomputed analyzer-space term set
    (the query_string path, where raw query text contains syntax and
    must_not terms that should NOT light up)."""
    if terms is None:
        terms = set(Analyzer(chain)(query))
    spans = match_spans(text, terms, chain)
    if not spans:
        return text[:width]
    # densest window: two-pointer over span starts
    best_i, best_j = 0, 0
    j = 0
    for i in range(len(spans)):
        if j < i:
            j = i
        while j + 1 < len(spans) and spans[j + 1][1] - spans[i][0] <= width:
            j += 1
        if j - i > best_j - best_i:
            best_i, best_j = i, j
    # center the densest run; a single match longer than width makes
    # the extent exceed width — clamp the margin at 0 so lo never lands
    # past the span start (which would skip the only highlight)
    extent = spans[best_j][1] - spans[best_i][0]
    lo = max(0, spans[best_i][0] - max(0, width - extent) // 2)
    hi = min(len(text), lo + width)
    window = text[lo:hi]
    out, last = [], 0
    for s, e in spans[best_i : best_j + 1]:
        # clip spans to the window: a match wider than the window still
        # gets (partial) markup instead of silently losing its highlight
        s, e = max(s - lo, 0), min(e - lo, len(window))
        if e <= s:
            continue
        out.append(window[last:s])
        out.append(pre + window[s:e] + post)
        last = e
    out.append(window[last:])
    prefix = "…" if lo > 0 else ""
    suffix = "…" if hi < len(text) else ""
    return prefix + "".join(out) + suffix
