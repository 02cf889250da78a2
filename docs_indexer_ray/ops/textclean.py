"""Text cleaning for web-crawl training data: PII redaction and
whitespace normalization.

``redact_pii`` is the standard pre-training scrub (emails, IPv4
addresses, long phone-like digit runs → fixed placeholders — the
C4/RefinedWeb-style pass).  Patterns are deliberately RE2-compatible
(no backrefs, no lookaround) and substitution is sequential
email → ip → phone, so the DuckDB oracle replays the exact pipeline
with ``regexp_replace(…, 'g')`` and the output strings hash
bit-identically.

Shape: pure ``map_batches`` string kernels — Arrow's
``replace_substring_regex`` is a VECTORIZED RE2 engine (the same
regex engine DuckDB embeds), so the hot path has no Python-per-row
loop and the oracle equivalence is by construction, not by luck.
Streams with no shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "redact_pii",
    "normalize_whitespace",
    "canonicalize_urls",
    "PII_PATTERNS",
    "URL_CANON_STEPS",
]

# RE2-compatible; order matters (email eats its digits before the
# phone pass can) and is part of the contract
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d() -]{7,}\d", "<PHONE>"),
]


def redact_pii(ds, col: str = "text", out_col: str | None = None):
    """Replace emails / IPv4s / phone-like digit runs in ``ds[col]``
    with placeholders (in place, or into ``out_col``)."""
    target = out_col or col

    def fn(t: pa.Table) -> pa.Table:
        arr = t[col].combine_chunks()
        for pat, repl in PII_PATTERNS:
            arr = pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
        if target in t.column_names:
            return t.set_column(t.schema.get_field_index(target), target, arr)
        return t.append_column(target, arr)

    return ds.map_batches(fn, batch_format="pyarrow")


# URL canonicalization contract (crawl-dedup pass): ordered,
# RE2-compatible, each applied globally — a DuckDB regexp_replace
# chain replays it bit-identically.  Deliberately NOT lowercasing
# (paths are case-sensitive; crawls emit lowercase scheme/host).
URL_CANON_STEPS: list[tuple[str, str]] = [
    (r"#.*$", ""),                                            # fragment
    (r"(utm_[a-z]+|fbclid|gclid|ref)=[^&]*&", ""),            # tracking param + &
    (r"[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&]*$", ""),        # trailing tracking param
    (r":(80|443)([/?]|$)", r"\2"),                            # default ports
    (r"^(https?://)www\.", r"\1"),                            # www prefix
    (r"\?$", ""),                                             # empty query
    (r"^(https?://[^/]+/.+)/$", r"\1"),                      # trailing slash (non-root)
]


def canonicalize_urls(ds, col: str = "url", out_col: str = "url_canon"):
    """Canonical crawl-URL form for exact dedup: strip fragments,
    tracking params (utm_*/fbclid/gclid/ref), default ports, a
    ``www.`` host prefix, empty query strings and non-root trailing
    slashes — the :data:`URL_CANON_STEPS` chain, vectorized RE2 per
    batch (no Python-per-row), streaming, no shuffle.  Two crawls of
    the same page with different tracking decorations collapse to one
    key; pair with a ``groupby(url_canon).Min(doc_id)`` for the
    actual dedup (`ops/dedup.py::exact_dedup`'s shape)."""

    def fn(t: pa.Table) -> pa.Table:
        arr = t[col].combine_chunks()
        for pat, repl in URL_CANON_STEPS:
            arr = pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
        if out_col in t.column_names:
            return t.set_column(t.schema.get_field_index(out_col), out_col, arr)
        return t.append_column(out_col, arr)

    return ds.map_batches(fn, batch_format="pyarrow")


def normalize_whitespace(ds, col: str = "text"):
    """Collapse whitespace runs to single spaces and strip ends — the
    canonical-form step before hashing/dedup.  Vectorized RE2 + trim
    kernels."""

    def fn(t: pa.Table) -> pa.Table:
        arr = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                t[col].combine_chunks(), pattern=r"\s+", replacement=" "
            )
        )
        return t.set_column(t.schema.get_field_index(col), col, arr)

    return ds.map_batches(fn, batch_format="pyarrow")
