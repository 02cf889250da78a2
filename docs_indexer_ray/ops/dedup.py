"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Sketches from the public literature: MinHash (Broder, 1997) with LSH
banding (Leskovec/Rajaraman/Ullman, MMDS ch.3), SimHash (Charikar,
STOC 2002) with the Hamming-ball band trick (Manku et al., WWW 2007).

Each is a composition of Ray Data primitives chosen for the 100 TB
shape of the problem:

* **exact** — content-hash in a vectorized ``map_batches``, then ONE
  hash shuffle on the digest and per-group first-keeper selection.
  No text moves through the shuffle — only (digest, doc_id).
* **n-gram Jaccard (exact pairwise)** — inverted-index pattern:
  explode distinct word n-grams, group by gram to emit co-occurring
  pairs, count pair intersections, then ``jac = c / (na + nb - c)``
  with per-doc gram counts **broadcast** (``ray.put``) instead of a
  second shuffle.  Exact, so it carries a SQL oracle; grams whose
  posting exceeds ``hot_gram_cap`` docs are dropped from *candidate
  generation only* (a standard stop-gram bound — pairs sharing only
  ultra-common grams aren't near-dups), which keeps the pair blowup
  O(Σ df²) bounded.  At web scale this is the candidate stage you run
  *after* MinHash banding; it is also the verifier for those bands.
* **MinHash-LSH** — per-batch signature computation (numpy, all docs
  of a batch at once), banding → ``(band, bandhash)`` shuffle →
  candidate pairs → signature-estimated Jaccard filter.
* **SimHash** — 64-bit simhash per doc; 4×16-bit band blocking;
  exact Hamming verification within buckets.

All randomness is a fixed seeded ``RandomState(42)`` — outputs are
parallelism-invariant and reproducible.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
]

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall((text or "").lower())


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(ds, key: str = "text", id_col: str = "doc_id"):
    """Keep the min-``id_col`` row per exact content digest.

    Returns ``(id_col, md5)`` of the keepers — join back to the full
    table for the surviving rows (keeps the shuffle payload tiny).
    """

    def digest(batch: pa.Table) -> pa.Table:
        md5s = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch[key].to_pylist()
        ]
        return pa.table({id_col: batch[id_col], "md5": pa.array(md5s, pa.string())})

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, id_col)

    return (
        ds.map_batches(digest, batch_format="pyarrow")
        .groupby("md5")
        .map_groups(keep_first, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (inverted-index pairwise)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    hot_gram_cap: int = 200,
):
    """All pairs with word-``n``-gram Jaccard ≥ ``threshold``.

    Output ``(a, b, inter, na, nb, jaccard)`` with a < b; ``jaccard``
    is one exact integer division (SQL-bit-identical).
    """
    import ray

    num_parts = 32

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, grams_out, parts_out = [], [], []
        ids = batch[id_col].to_pylist()
        for did, t in zip(ids, batch["text"].to_pylist()):
            toks = _tokens(t)
            gs = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            ids_out.extend([did] * len(gs))
            grams_out.extend(gs)
            parts_out.extend(zlib.crc32(g.encode()) % num_parts for g in gs)
        return pa.table(
            {
                id_col: pa.array(ids_out, pa.int64()),
                "gram": pa.array(grams_out, pa.string()),
                "gpart": pa.array(parts_out, pa.int32()),
            }
        )

    grams = ds.map_batches(explode, batch_format="pyarrow")

    # per-doc distinct gram counts: each doc lives wholly in one batch,
    # so one cheap extra map pass gives exact counts — no shuffle
    def count_grams(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        counts = [
            len({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
            for toks in (_tokens(t) for t in batch["text"].to_pylist())
        ]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    counts_ds = ds.map_batches(count_grams, batch_format="pyarrow")
    gram_counts = {r[id_col]: r["n"] for r in counts_ds.take_all()}
    counts_ref = ray.put(gram_counts)

    def pairs_of_partition(group: pd.DataFrame) -> pd.DataFrame:
        """All co-occurrence pairs within one gram-hash partition:
        sort by gram, then emit pairs per gram run (vectorized per run;
        the Python loop is over grams with ≥2 docs only)."""
        g = group.sort_values(["gram", id_col], kind="mergesort")
        grams_np = g["gram"].to_numpy(dtype=object)
        ids_np = g[id_col].to_numpy(np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], grams_np[1:] != grams_np[:-1]))
        )
        ends = np.append(starts[1:], len(grams_np))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            cnt = e - s
            if cnt < 2 or cnt > hot_gram_cap:
                continue
            ids_run = ids_np[s:e]
            ai, bi = np.triu_indices(cnt, k=1)
            out_a.append(ids_run[ai])
            out_b.append(ids_run[bi])
        if not out_a:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    pair_counts = (
        grams.groupby("gpart")
        .map_groups(pairs_of_partition, batch_format="pandas")
        .groupby(["a", "b"])
        .count()
    )

    def finish(batch: pa.Table) -> pa.Table:
        counts = ray.get(counts_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        inter = batch["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = np.array([counts[x] for x in a], np.int64)
        nb = np.array([counts[x] for x in b], np.int64)
        jac = inter / (na + nb - inter)
        keep = jac >= threshold
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "inter": pa.array(inter[keep]),
                "na": pa.array(na[keep]),
                "nb": pa.array(nb[keep]),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return pair_counts.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class _MinHasher:
    """Per-actor state: the fixed permutation coefficients.

    ``h_i(x) = a_i·x + b_i  (mod 2^64)`` with odd ``a_i`` — uint64
    wraparound multiply is a perfectly good MinHash permutation family
    and stays fully vectorized (no bigint path)."""

    def __init__(self, num_perm: int, shingle_k: int, id_col: str):
        rs = np.random.RandomState(42)
        self.a = (
            rs.randint(1, 1 << 62, size=num_perm, dtype=np.int64).astype(np.uint64) | 1
        )
        self.b = rs.randint(0, 1 << 62, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.k = shingle_k
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        toks = _tokens(text)
        shingles = {
            " ".join(toks[i : i + self.k]) for i in range(len(toks) - self.k + 1)
        }
        if not shingles:
            return np.full(len(self.a), np.iinfo(np.uint64).max, np.uint64)
        base = np.array(
            [zlib.crc32(s.encode()) | (zlib.adler32(s.encode()) << 32) for s in shingles],
            np.uint64,
        )
        with np.errstate(over="ignore"):
            vals = base[None, :] * self.a[:, None] + self.b[:, None]
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        sigs = [self.signature(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def minhash_lsh_pairs(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
):
    """Candidate near-dup pairs via MinHash banding, filtered by the
    signature-estimated Jaccard.  Output ``(a, b, est_jaccard)``."""
    rows_per_band = num_perm // bands

    sigs = ds.map_batches(
        _MinHasher(num_perm, shingle_k, id_col), batch_format="pyarrow", batch_size=512
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sig_list = batch["sig"].to_pylist()
        out_id, out_band, out_hash, out_sig = [], [], [], []
        for did, sig in zip(ids, sig_list):
            for bi in range(bands):
                chunk = tuple(sig[bi * rows_per_band : (bi + 1) * rows_per_band])
                out_id.append(did)
                out_band.append(bi)
                out_hash.append(zlib.crc32(repr(chunk).encode()))
                out_sig.append(sig)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "bandhash": pa.array(out_hash, pa.int64()),
                "sig": pa.array(out_sig, pa.list_(pa.uint64())),
            }
        )

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        sigs_np = np.array(group["sig"].to_pylist(), np.uint64)
        order = np.argsort(ids)
        ids_s = np.array(ids, np.int64)[order]
        sigs_np = sigs_np[order]
        ai, bi = np.triu_indices(len(ids_s), k=1)
        est = (sigs_np[ai] == sigs_np[bi]).mean(axis=1)
        return pa.table(
            {
                "a": pa.array(ids_s[ai]),
                "b": pa.array(ids_s[bi]),
                "est_jaccard": pa.array(est, pa.float64()),
            }
        )

    pairs = (
        banded.groupby(["band", "bandhash"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )

    # a pair can match in several bands → dedup on (a, b), keep one
    def uniq(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return (
        pairs.map_batches(
            lambda t: t.filter(pa.compute.greater_equal(t["est_jaccard"], threshold)),
            batch_format="pyarrow",
        )
        .groupby(["a", "b"])
        .map_groups(uniq, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_pairs(ds, max_hamming: int = 3, id_col: str = "doc_id"):
    """Near-dup pairs by 64-bit SimHash with band blocking.

    4 bands of 16 bits: any pair within Hamming distance ≤ 3 of each
    other shares at least one identical band (pigeonhole), so blocking
    on bands loses nothing.  Output ``(a, b, hamming)``.
    """

    def simhash(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        out = []
        for t in batch["text"].to_pylist():
            acc = np.zeros(64, np.int64)
            for tok, cnt in pd.Series(_tokens(t)).value_counts().items():
                h = zlib.crc32(tok.encode()) | (zlib.adler32(tok.encode()) << 32)
                bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), cnt, -cnt)
            out.append(int(np.packbits((acc > 0)[::-1]).view(">u8")[0]))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "simhash": pa.array(np.array(out, np.uint64)),
            }
        )

    hashed = ds.map_batches(simhash, batch_format="pyarrow")

    def band_explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        hs = batch["simhash"].to_numpy(zero_copy_only=False)
        out_id, out_band, out_key, out_h = [], [], [], []
        for did, h in zip(ids, hs):
            for bi in range(4):
                out_id.append(did)
                out_band.append(bi)
                out_key.append(int((int(h) >> (16 * bi)) & 0xFFFF))
                out_h.append(int(h))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "key": pa.array(out_key, pa.int64()),
                "simhash": pa.array(np.array(out_h, np.uint64)),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.array(group[id_col].to_pylist(), np.int64)
        hs = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids)
        ids, hs = ids[order], hs[order]
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        ai, bi = np.triu_indices(len(ids), k=1)
        x = np.bitwise_xor(hs[ai], hs[bi])
        ham = np.array([bin(int(v)).count("1") for v in x], np.int64)
        keep = ham <= max_hamming
        return pa.table(
            {
                "a": pa.array(ids[ai][keep]),
                "b": pa.array(ids[bi][keep]),
                "hamming": pa.array(ham[keep]),
            }
        )

    def uniq(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return (
        hashed.map_batches(band_explode, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .map_groups(uniq, batch_format="pyarrow")
    )
