"""Posting-list codecs: delta + LEB128 varint, numpy-vectorized.

Replaces what Lucene's postings format did for the reference (the
reference's index lives inside OpenSearch, ``mappings/hugo.json`` —
here the encoding is explicit).  Encode and decode are vectorized: the
per-element loop runs over *byte positions* (≤ 10 for uint64), not
over elements, so a million-entry posting list costs a handful of
numpy passes.

Layout produced by :func:`encode_postings` for one term:

* ``doc_ids`` — strictly increasing uint64, stored as
  ``varint(delta)`` with the delta restarting at every block boundary
  (blocks of ``block_size`` entries are therefore independently
  decodable — required for block-max WAND skipping);
* ``tfs`` — uint32 term frequencies, plain varint;
* per block: last doc_id, byte offsets into both streams, max tf and
  min dl (an upper bound pair for the BM25 term contribution — tfn is
  monotone ↑ in tf and ↓ in dl, so ``(tf_max, dl_min)`` gives a sound
  block max score *independent of the global avgdl*, which is not yet
  known at segment-build time).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "varint_encode_with_lengths",
    "varint_encode",
    "varint_decode",
    "encode_postings",
    "decode_postings",
    "encode_positions",
    "decode_positions_block",
    "BLOCK_SIZE",
]

BLOCK_SIZE = 128


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized over byte positions)."""
    return varint_encode_with_lengths(values)[0]


def varint_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128 bytes PLUS each value's encoded byte length — one pass.
    Callers that need per-value offsets (the segment encoder's block
    index) previously recomputed the identical 7-bit-group loop."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(a)
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    # number of 7-bit groups per value
    lengths = np.ones(n, dtype=np.int64)
    shifted = a >> np.uint64(7)
    while shifted.any():
        lengths += (shifted != 0)
        shifted >>= np.uint64(7)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    np.cumsum(lengths[:-1], out=starts[1:])
    out = np.empty(int(lengths.sum()), dtype=np.uint8)
    k = 0
    while True:
        mask = lengths > k
        if not mask.any():
            break
        group = ((a[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        more = (lengths[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = group | more
        k += 1
    return out.tobytes(), lengths


def varint_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode a LEB128 byte stream back to uint64 (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = np.zeros(len(ends), dtype=np.uint64)
    max_len = int(lengths.max())
    for k in range(max_len):
        mask = lengths > k
        out[mask] |= (b[starts[mask] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    return out


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Encode one term's postings; ``dls`` are the docs' token counts.

    Returns a dict with binary streams and per-block skip metadata —
    one segment-table row (FIXTURES.md §3 schema).
    """
    n = len(doc_ids)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)

    n_blocks = (n + block_size - 1) // block_size
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    # restart the delta at each block boundary → blocks decode alone
    block_starts = np.arange(1, n_blocks) * block_size
    deltas[block_starts] = doc_ids[block_starts]

    id_chunks, tf_chunks = [], []
    # accumulate in int64, cast after the budget check — the stored
    # schema is uint32, and a >4GiB run must fail loudly, not wrap
    id_offsets = np.empty(n_blocks + 1, dtype=np.int64)
    tf_offsets = np.empty(n_blocks + 1, dtype=np.int64)
    id_offsets[0] = tf_offsets[0] = 0
    block_last = np.empty(n_blocks, dtype=np.uint64)
    block_max_tf = np.empty(n_blocks, dtype=np.uint32)
    block_min_dl = np.empty(n_blocks, dtype=np.uint32)
    for i in range(n_blocks):
        lo, hi = i * block_size, min((i + 1) * block_size, n)
        ec = varint_encode(deltas[lo:hi])
        tc = varint_encode(tfs[lo:hi])
        id_chunks.append(ec)
        tf_chunks.append(tc)
        id_offsets[i + 1] = id_offsets[i] + len(ec)
        tf_offsets[i + 1] = tf_offsets[i] + len(tc)
        block_last[i] = doc_ids[hi - 1]
        block_max_tf[i] = tfs[lo:hi].max()
        block_min_dl[i] = dls[lo:hi].min()

    if id_offsets[-1] > 0xFFFFFFFF or tf_offsets[-1] > 0xFFFFFFFF:
        raise ValueError(
            f"encoded posting run exceeds the uint32 block-offset budget "
            f"({int(id_offsets[-1])}/{int(tf_offsets[-1])} bytes, {n} postings): "
            "split the term run across more partitions/salt"
        )
    return {
        "df": n,
        "cf": int(tfs.sum()),
        "doc_ids_enc": b"".join(id_chunks),
        "tfs_enc": b"".join(tf_chunks),
        "block_last": block_last,
        "block_id_offsets": id_offsets.astype(np.uint32),
        "block_tf_offsets": tf_offsets.astype(np.uint32),
        "block_max_tf": block_max_tf,
        "block_min_dl": block_min_dl,
        "max_tf": int(block_max_tf.max()),
        "min_dl": int(block_min_dl.min()),
    }


def decode_postings(
    doc_ids_enc: bytes,
    tfs_enc: bytes,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode full posting streams → (doc_ids uint64, tfs uint64)."""
    deltas = varint_decode(doc_ids_enc)
    tfs = varint_decode(tfs_enc)
    n = len(deltas)
    if n > block_size:
        # per-block delta restarts (absolute value at each block start)
        # mean a single global cumsum would carry a bogus prefix across
        # boundaries — rebuild blockwise
        doc_ids = np.empty(n, dtype=np.uint64)
        for lo in range(0, n, block_size):
            hi = min(lo + block_size, n)
            doc_ids[lo:hi] = np.cumsum(deltas[lo:hi], dtype=np.uint64)
    else:
        doc_ids = np.cumsum(deltas, dtype=np.uint64)
    return doc_ids, tfs


def encode_positions(
    positions_per_posting: list[np.ndarray],
    block_size: int = BLOCK_SIZE,
) -> tuple[bytes, np.ndarray]:
    """Encode per-posting position lists (ascending, posting order).

    Layout mirrors the posting streams: one varint chunk per BLOCK of
    postings; within a block, each posting's positions are
    delta-encoded with an absolute restart at the posting boundary, so
    a block's positions decode given only the block's tfs (the
    per-posting lengths).  Returns ``(pos_enc, block_pos_offsets)``
    (``n_blocks + 1`` byte offsets).
    """
    n = len(positions_per_posting)
    n_blocks = (n + block_size - 1) // block_size
    offsets = np.empty(n_blocks + 1, dtype=np.int64)
    offsets[0] = 0
    chunks = []
    for b in range(n_blocks):
        plists = [
            np.ascontiguousarray(p, dtype=np.uint64)
            for p in positions_per_posting[b * block_size : (b + 1) * block_size]
        ]
        flat = np.concatenate(plists) if plists else np.empty(0, np.uint64)
        if len(flat):
            deltas = np.empty_like(flat)
            deltas[0] = flat[0]
            np.subtract(flat[1:], flat[:-1], out=deltas[1:])
            starts = np.cumsum([0, *(len(p) for p in plists[:-1])])
            starts = starts[np.fromiter((len(p) for p in plists), np.int64) > 0]
            deltas[starts] = flat[starts]  # absolute restart per posting
            enc = varint_encode(deltas)
        else:
            enc = b""
        chunks.append(enc)
        offsets[b + 1] = offsets[b] + len(enc)
    if n_blocks and offsets[-1] > 0xFFFFFFFF:
        raise ValueError(
            f"encoded position run exceeds the uint32 block-offset budget "
            f"({int(offsets[-1])} bytes): split the term run across more "
            "partitions/salt"
        )
    return b"".join(chunks), offsets.astype(np.uint32)


def decode_positions_block(
    pos_enc_block: bytes | memoryview,
    tfs_block: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """One block's position stream → ``(flat_positions,
    posting_offsets)``; posting ``j``'s positions are
    ``flat[offsets[j]:offsets[j+1]]`` (``offsets = cumsum(tfs)``)."""
    deltas = varint_decode(pos_enc_block)
    offs = np.concatenate(([0], np.cumsum(np.asarray(tfs_block, np.int64))))
    if len(deltas) == 0:
        return deltas, offs
    cs = np.cumsum(deltas, dtype=np.uint64)
    # undo cross-posting accumulation: subtract each posting's prefix
    prefix = np.zeros(len(offs) - 1, np.uint64)
    nonfirst = offs[:-1] > 0
    prefix[nonfirst] = cs[offs[:-1][nonfirst] - 1]
    lens = np.diff(offs)
    flat = cs - np.repeat(prefix, lens)
    return flat, offs


def decode_block(
    doc_ids_enc: bytes | memoryview,
    tfs_enc: bytes | memoryview,
    id_offsets: np.ndarray,
    tf_offsets: np.ndarray,
    block: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a single posting block (used by WAND skipping)."""
    ids = varint_decode(memoryview(doc_ids_enc)[id_offsets[block] : id_offsets[block + 1]])
    tfs = varint_decode(memoryview(tfs_enc)[tf_offsets[block] : tf_offsets[block + 1]])
    return np.cumsum(ids, dtype=np.uint64), tfs
