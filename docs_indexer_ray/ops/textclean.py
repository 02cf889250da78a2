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

__all__ = ["redact_pii", "normalize_whitespace", "PII_PATTERNS"]

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
