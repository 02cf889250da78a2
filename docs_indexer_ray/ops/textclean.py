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
    "line_filter",
    "PII_PATTERNS",
    "URL_CANON_STEPS",
    "BOILERPLATE_PATTERN",
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
    # tracking params are matched only AFTER a [?&] delimiter (an
    # unanchored '(…|ref)=' also ate 'href='/'pref=' substrings and
    # corrupted redirect-style urls); the (?:…&)+ run form keeps
    # consecutive tracking params collapsing in one global pass
    (r"([?&])(?:(?:utm_[a-z]+|fbclid|gclid|ref)=[^&]*&)+", r"\1"),
    (r"[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&]*$", ""),        # trailing tracking param
    # default ports are scheme-specific and anchored to the authority:
    # an unanchored ':(80|443)' rewrote ':80' inside paths and treated
    # :443 as default for http (a genuinely different resource)
    (r"^(http://[^/:?#]*):80([/?]|$)", r"\1\2"),              # http default port
    (r"^(https://[^/:?#]*):443([/?]|$)", r"\1\2"),            # https default port
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


# RefinedWeb/C4 line-wise boilerplate markers (Penedo et al. 2023
# "The RefinedWeb Dataset" §3.1.3 line-wise corrections; Raffel et al.
# 2020 C4 §2.2 line rules).  Lowercase substrings, RE2-alternation —
# DuckDB's regexp_matches(lower(line), …) replays it bit-identically.
BOILERPLATE_PATTERN = (
    "click here|subscribe|cookie|javascript|sign in|log in"
    "|privacy policy|terms of use|all rights reserved|read more"
)


def line_filter(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    boilerplate: str | None = BOILERPLATE_PATTERN,
    require_terminal_punct: bool = False,
    keep_num: int = 1,
    keep_den: int = 2,
):
    """C4/RefinedWeb line-wise correction filter.

    Splits each document into lines, drops lines that are too short
    (``< min_words`` whitespace tokens) or match the boilerplate
    pattern (case-insensitive) or — opt-in, C4's rule — lack terminal
    punctuation; re-joins the survivors in order, and flags the doc
    ``kept`` when the surviving-line fraction is ≥ ``keep_num /
    keep_den`` (an INTEGER cross-multiplication, so the threshold has
    no float-tie ambiguity and the SQL oracle hash-matches).

    Returns ``(id_col, n_lines, n_kept, cleaned, kept)``.

    Scale shape: one streaming ``map_batches`` — a doc's lines never
    leave its batch, so there is NO shuffle; every kernel (split,
    regex word-count, boilerplate match, list re-join) is a
    vectorized Arrow/RE2 call, no Python per line.  References:
    C4 line rules (Raffel et al. 2020 §2.2), RefinedWeb line-wise
    corrections (Penedo et al. 2023 §3.1.3).
    """
    import numpy as np

    def fn(t: pa.Table) -> pa.Table:
        arr = t[col].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):  # 0-chunk tables
            arr = pa.concat_arrays(arr.chunks) if arr.num_chunks else pa.array([], pa.string())
        # a null doc must behave like '' (1 short line → kept=False):
        # left null it splits to ZERO lines and the keep test
        # degenerates to 0 >= 0, passing garbage through the gate
        arr = pc.fill_null(arr, "")
        lists = pc.split_pattern(arr, pattern="\n")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = pc.greater_equal(
            pc.count_substring_regex(flat, pattern=r"\S+"), min_words
        )
        if boilerplate:
            keep = pc.and_(
                keep,
                pc.invert(
                    pc.match_substring_regex(
                        pc.utf8_lower(flat), pattern=boilerplate
                    )
                ),
            )
        if require_terminal_punct:
            keep = pc.and_(
                keep,
                pc.match_substring_regex(flat, pattern=r"[.!?\"']\s*$"),
            )
        keep_np = keep.to_numpy(zero_copy_only=False).astype(bool)
        n = len(arr)
        n_lines = np.bincount(parent, minlength=n)
        n_kept = np.bincount(parent[keep_np], minlength=n)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(n_kept, out=offsets[1:])
        kept_lines = flat.filter(keep)  # order-preserving
        if isinstance(kept_lines, pa.ChunkedArray):
            kept_lines = kept_lines.combine_chunks()
        cleaned = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()), kept_lines
            ),
            "\n",
        )
        # integer cross-multiplication: n_kept/n_lines >= num/den
        kept_doc = n_kept * keep_den >= n_lines * keep_num
        return pa.table(
            {
                id_col: t[id_col],
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "cleaned": cleaned,
                "kept": pa.array(kept_doc),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
