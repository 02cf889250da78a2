"""OpenSearch ``simple_query_string`` — the LENIENT query language.

Lucene's ``SimpleQueryParser`` (which OpenSearch exposes as the
``simple_query_string`` query) is the user-facing search box that
NEVER throws: syntax it can't make sense of degrades to literal text
instead of a 400.  This module re-creates that contract over the
engine's existing AST (``query/qstring.py``) — parsing is new, the
evaluation stack (dense ``_eval``, the sharded ``_eval_range``,
facets, highlight, pagination) is untouched, so the language serves
on every backend the moment it lowers.

Supported operators (the OpenSearch set):

=============  ====================================================
``+``          AND (binds tighter than ``|``)
``|``          OR
``-``          negate the next clause
``"…"``        phrase; ``"…"~N`` sloppy phrase
``term*``      prefix (constant-score wildcard rewrite)
``term~N``     fuzzy
``( … )``      grouping
``\\x``        escape — the next character is literal
=============  ====================================================

Leniency rules (matching Lucene's parser behavior where it is
documented, with the engine's own tie-breaks otherwise — each is
pinned by a test):

* an unterminated ``"`` starts a phrase that runs to end of input;
* an unmatched ``)`` is ignored; an unclosed ``(`` closes at end of
  input; an EMPTY group ``()`` vanishes;
* a dangling operator (``+`` / ``|`` / ``-`` with nothing after it,
  or at a position with nothing before it) is ignored;
* ``~`` without digits is literal; ``*`` anywhere but the end of a
  term is literal (only trailing ``*`` means prefix);
* whitespace adjacency = ``default_operator`` (OR unless set);
* input that reduces to nothing (empty, operators only, stopwords
  only) returns ``None`` — the clause vanishes, like a ``match`` on
  stopwords.

``parse_simple_query_string`` is TOTAL: any unicode string returns a
node or ``None``, never raises (hypothesis-fuzzed).
"""

from __future__ import annotations

__all__ = ["parse_simple_query_string"]

_SPECIAL = set('+|-"()~\\*')


def _lex(qs: str) -> list[tuple[str, object]]:
    """Lenient scanner → (kind, value) tokens: LP RP AND OR NOT
    PHRASE(text, slop) WORD(text, fuzzy_edits|None, prefix_bool)."""
    out: list[tuple[str, object]] = []
    i, n = 0, len(qs)

    def _num_after_tilde(j: int) -> tuple[int | None, int]:
        """Digits following a '~' at j (exclusive) → (value, end)."""
        k = j
        # ASCII digits only: str.isdigit() accepts e.g. '²' which int() rejects.
        while k < n and "0" <= qs[k] <= "9":
            k += 1
        if k == j:
            return None, j
        return int(qs[j:k]), k

    while i < n:
        c = qs[i]
        if c.isspace():
            i += 1
        elif c == "(":
            out.append(("LP", None))
            i += 1
        elif c == ")":
            out.append(("RP", None))
            i += 1
        elif c == "+":
            out.append(("AND", None))
            i += 1
        elif c == "|":
            out.append(("OR", None))
            i += 1
        elif c == "-":
            out.append(("NOT", None))
            i += 1
        elif c == '"':
            j = qs.find('"', i + 1)
            if j == -1:
                text, i = qs[i + 1:], n  # unterminated → runs to EOS
                slop = 0
            else:
                text = qs[i + 1: j]
                i = j + 1
                slop = 0
                if i < n and qs[i] == "~":
                    val, end = _num_after_tilde(i + 1)
                    if val is not None:
                        slop, i = val, end
            out.append(("PHRASE", (text, slop)))
        else:
            # a word: consume until whitespace or a special char,
            # honoring backslash escapes; '*' only terminates the
            # word when it is the trailing character (prefix)
            buf = []
            fuzzy = None
            prefix = False
            while i < n:
                c = qs[i]
                if c == "\\" and i + 1 < n:
                    buf.append(qs[i + 1])
                    i += 2
                    continue
                if c.isspace() or c in '+|-"()':
                    break
                if c == "~":
                    val, end = _num_after_tilde(i + 1)
                    if val is not None:
                        fuzzy, i = val, end
                        break
                    buf.append(c)  # bare '~' is literal
                    i += 1
                    continue
                if c == "*":
                    nxt = qs[i + 1] if i + 1 < n else " "
                    if nxt.isspace() or nxt in '+|-"()':
                        prefix = True
                        i += 1
                        break
                    buf.append(c)  # mid-word '*' is literal
                    i += 1
                    continue
                buf.append(c)
                i += 1
            word = "".join(buf)
            if word:
                out.append(("WORD", (word, fuzzy, prefix)))
            # an empty word (e.g. lone '\\' at EOS) vanishes
    return out


class _P:
    """Recursive-descent over the lenient token stream — mirrors the
    query_string parser's ladder (OR over AND over signed primaries)
    but swallows every malformed shape instead of raising."""

    def __init__(self, toks, analyzer, default_and: bool):
        self.toks = toks
        self.pos = 0
        self.analyzer = analyzer
        self.default_and = default_and

    def _peek(self):
        return self.toks[self.pos][0] if self.pos < len(self.toks) else None

    _STARTERS = ("WORD", "PHRASE", "LP", "NOT")

    def _or(self, depth: int):
        """OR level: AND-chains separated by '|' (or by adjacency when
        the default operator is OR).  Mirrors the query_string
        parser's ladder; a dangling '|' simply vanishes."""
        from .qstring import _Bool

        children = []
        while True:
            got = self._and(depth)
            if got is not None:
                children.append(got)
            kind = self._peek()
            if kind == "OR":
                self.pos += 1
            elif kind == "AND":
                self.pos += 1  # dangling '+' between nothings — skip
            elif kind == "RP" and depth == 0:
                self.pos += 1  # stray ')' with no open group — ignored
            elif not self.default_and and kind in self._STARTERS:
                pass  # adjacency = OR → next chain
            elif got is None and kind in self._STARTERS:
                pass  # chain vanished (e.g. stopword) — keep going
            else:
                break
        if not children:
            return None
        if len(children) == 1 and children[0][0] == "":
            return children[0][1]
        b = _Bool()
        for sign, node in children:
            (b.must if sign == "+" else b.must_not if sign == "-"
             else b.should).append(node)
        return b

    def _and(self, depth: int):
        """One AND chain → a single signed clause for the OR level:
        signed primaries joined by '+' (or by adjacency when the
        default operator is AND)."""
        from .qstring import _Bool

        first = self._signed(depth)
        parts = [] if first is None else [first]
        while True:
            kind = self._peek()
            if kind == "AND":
                self.pos += 1
            elif self.default_and and kind in self._STARTERS:
                pass  # adjacency = AND
            else:
                break
            got = self._signed(depth)
            if got is not None:
                parts.append(got)
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        b = _Bool()
        for sign, node in parts:
            (b.must_not if sign == "-" else b.must).append(node)
        # an all-negative chain stays a valid Bool — it matches
        # nothing (the query_string parser's rule)
        return ("", b)

    def _signed(self, depth: int):
        sign = ""
        while self._peek() == "NOT":
            self.pos += 1
            sign = "-" if sign != "-" else ""
        node = self._primary(depth)
        if node is None:
            return None
        return (sign, node)

    # nesting cap: each group costs ~4 stack frames, so unbounded
    # depth would turn "("*300 into a RecursionError — violating the
    # TOTAL contract.  Lenient degrade: groups beyond the cap have
    # their '(' swallowed (parsing continues flat at the cap), the
    # same spirit as the unmatched-paren rules.
    _MAX_DEPTH = 50

    def _primary(self, depth: int):
        from .qstring import _Fuzzy, _Phrase, _Term, _Wildcard

        kind = self._peek()
        while kind == "LP" and depth >= self._MAX_DEPTH:
            self.pos += 1  # too deep — the '(' is ignored, stay flat
            kind = self._peek()
        if kind is None or kind == "RP":
            return None
        tok = self.toks[self.pos]
        self.pos += 1
        if kind == "LP":
            inner = self._or(depth + 1)
            if self._peek() == "RP":
                self.pos += 1  # unclosed '(' just closes at EOS
            if inner is None:
                return None  # empty group vanishes
            return inner
        if kind == "PHRASE":
            text, slop = tok[1]
            terms = self.analyzer(text)
            if not terms:
                return None
            if len(terms) == 1:
                return _Term(terms[0])
            return _Phrase(terms, slop=slop)
        if kind == "WORD":
            word, fuzzy, prefix = tok[1]
            if prefix:
                return _Wildcard(word.lower() + "*")
            if fuzzy is not None:
                return _Fuzzy(word.lower(), fuzzy)
            terms = self.analyzer(word)
            if not terms:
                return None
            if len(terms) == 1:
                return _Term(terms[0])
            return _Phrase(terms, slop=0)
        # AND/OR/NOT reaching here would be a parser bug — swallow
        return None  # pragma: no cover


def parse_simple_query_string(qs: str, analyzer, default_operator: str = "or"):
    """Parse lenient ``simple_query_string`` input → an AST node, or
    ``None`` when the input reduces to nothing.  NEVER raises on any
    string input (the Lucene SimpleQueryParser contract)."""
    toks = _lex(str(qs))
    node = _P(toks, analyzer, default_operator == "and")._or(0)
    return node
