"""Codec round-trip + property tests (FIXTURES.md §3)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from docs_indexer_ray.functions.codec import (
    BLOCK_SIZE,
    decode_block,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_known_values():
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert len(varint_decode(b"")) == 0


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    a = np.array(values, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(a)), a)


def test_varint_uint64_max():
    a = np.array([2**64 - 1, 0, 2**63], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(a)), a)


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=700, unique=True),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(ids, data):
    doc_ids = np.sort(np.array(ids, dtype=np.uint64))
    n = len(doc_ids)
    tfs = np.array(data.draw(st.lists(st.integers(1, 1000), min_size=n, max_size=n)), dtype=np.uint64)
    dls = np.array(data.draw(st.lists(st.integers(1, 10000), min_size=n, max_size=n)), dtype=np.uint64)
    enc = encode_postings(doc_ids, tfs, dls)
    out_ids, out_tfs = decode_postings(enc["doc_ids_enc"], enc["tfs_enc"])
    assert np.array_equal(out_ids, doc_ids)
    assert np.array_equal(out_tfs, tfs)
    assert enc["df"] == n
    assert enc["cf"] == int(tfs.sum())


def test_postings_block_metadata_and_block_decode():
    n = 1000
    rng = np.random.default_rng(42)
    doc_ids = np.sort(rng.choice(10**9, size=n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 50, n).astype(np.uint64)
    dls = rng.integers(10, 500, n).astype(np.uint64)
    enc = encode_postings(doc_ids, tfs, dls)
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(enc["block_last"]) == n_blocks
    # per-block decode matches slices of the full list
    for b in range(n_blocks):
        lo, hi = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, n)
        ids_b, tfs_b = decode_block(
            enc["doc_ids_enc"], enc["tfs_enc"],
            enc["block_id_offsets"], enc["block_tf_offsets"], b)
        assert np.array_equal(ids_b, doc_ids[lo:hi])
        assert np.array_equal(tfs_b, tfs[lo:hi])
        assert enc["block_last"][b] == doc_ids[hi - 1]
        assert enc["block_max_tf"][b] == tfs[lo:hi].max()
        assert enc["block_min_dl"][b] == dls[lo:hi].min()


def test_positions_roundtrip():
    import numpy as np

    from docs_indexer_ray.functions.codec import (
        decode_positions_block,
        encode_positions,
    )

    rs = np.random.RandomState(5)
    plists = [
        np.sort(rs.choice(500, size=rs.randint(1, 9), replace=False)).astype(np.uint64)
        for _ in range(300)
    ]
    enc, offsets = encode_positions(plists, block_size=128)
    got = []
    for b in range(len(offsets) - 1):
        block = plists[b * 128 : (b + 1) * 128]
        tfs = np.array([len(p) for p in block], np.uint64)
        flat, offs = decode_positions_block(
            memoryview(enc)[offsets[b] : offsets[b + 1]], tfs
        )
        got.extend(flat[offs[j] : offs[j + 1]].tolist() for j in range(len(block)))
    assert [list(map(int, p)) for p in plists] == [list(map(int, g)) for g in got]
