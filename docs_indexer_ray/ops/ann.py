"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_cosine` — exact brute-force top-k: the (small) query
  matrix is **broadcast once** (``ray.put``), each ``map_batches``
  task does one float64 matmul against its batch and keeps only its
  per-batch top-k, and a final tiny per-query reduce merges the
  partial top-ks.  Data never shuffles — only ``O(q·k)`` candidate
  rows per batch leave the tasks.  This is the scale-correct shape:
  at 100 TB the matmul streams and the reduce stays tiny.
* :func:`knn_lsh` — the approximate scale path: random-hyperplane
  LSH (signed projections → bucket key), queries probe only their
  bucket (+ optional multi-probe by flipping low-margin bits);
  recall/cost is tunable by ``n_planes``/``n_probe``.
* :func:`embedding_dup_pairs` — near-duplicate pairs by cosine ≥
  threshold, bucketed the same LSH way (exact verify inside buckets).

Randomness is a fixed ``RandomState(42)`` → deterministic output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["knn_cosine", "knn_lsh", "knn_ivf", "embedding_dup_pairs", "embedding_dup_pairs_exact", "semdedup", "train_ivf_centroids", "quantize_embeddings", "knn_cosine_quantized", "knn_cosine_filtered"]


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """(n, dim) float64 matrix from a ``list<float>`` column —
    zero-copy flatten + reshape on the fast path (uniform lengths, no
    nulls), Python-list fallback otherwise."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        # 2-D so _normalize's axis=1 norm works on empty blocks
        return np.empty((0, 0), np.float64)
    if arr.null_count == 0:
        lens = np.diff(arr.offsets.to_numpy())
        if len(lens) and (lens == lens[0]).all():
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(arr), int(lens[0])).astype(np.float64)
    return np.array(arr.to_pylist(), dtype=np.float64)


_PARTIAL_EMPTY = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "sim": pa.array([], pa.float64()),
    }
)


_FINAL_EMPTY = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
    }
)


def _final_topk(partials, k: int, exclude_self: bool, num_parts: int = 32):
    """Merge per-batch partial top-k candidate rows into the final
    ``(query_id, rank, neighbor_id)`` — ONE hash-partitioned vectorized
    pass (lexsort + run-length rank), no per-query Python/pandas."""

    def add_qpart(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__qpart", pa.array((q % num_parts).astype(np.int32))
        )

    def final(group: pa.Table) -> pa.Table:
        q = group["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nbr = group["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sim = group["sim"].to_numpy(zero_copy_only=False).astype(np.float64)
        if exclude_self:
            keep = nbr != q
            q, nbr, sim = q[keep], nbr[keep], sim[keep]
        if len(q) == 0:
            return _FINAL_EMPTY
        # per query: sim desc, then neighbor_id asc (deterministic ties)
        order = np.lexsort((nbr, -sim, q))
        q, nbr = q[order], nbr[order]
        new_run = np.concatenate(([True], q[1:] != q[:-1]))
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        rank = np.arange(len(q)) - starts[run_id] + 1
        keep = rank <= k
        return pa.table(
            {
                "query_id": pa.array(q[keep]),
                "rank": pa.array(rank[keep].astype(np.int64)),
                "neighbor_id": pa.array(nbr[keep]),
            }
        )

    return (
        partials.map_batches(add_qpart, batch_format="pyarrow")
        .groupby("__qpart")
        .map_groups(final, batch_format="pyarrow")
    )


def knn_cosine(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    col: str = "embedding",
    exclude_self: bool = True,
):
    """Exact cosine top-k for each query row.  Output
    ``(query_id, rank, neighbor_id)`` with rank 1..k (ties: lower
    neighbor_id first — fully deterministic)."""
    import ray

    qn = _normalize(np.asarray(queries))
    q_ref = ray.put((qn, np.asarray(query_ids, np.int64)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty block: no candidates
            return _PARTIAL_EMPTY
        q, qids = ray.get(q_ref)
        emb = _normalize(_embedding_matrix(batch, col))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = q @ emb.T  # (nq, nb)
        take = min(k + (1 if exclude_self else 0), sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, take - 1)[:take] if take < len(row) else np.arange(len(row))
            out_q.extend([int(qids[qi])] * len(top))
            out_n.extend(ids[top].tolist())
            out_s.extend(row[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return _final_topk(
        ds.map_batches(partial_topk, batch_format="pyarrow"), k, exclude_self
    )


class _Planes:
    """Shared fixed hyperplanes.

    ``kind="gauss"`` (default) — seeded Gaussian planes (seed 42).
    ``kind="hadamard"`` — the first ``n_planes`` rows of the
    Walsh–Hadamard matrix ``H[j,i] = (-1)^popcount(i & j)``: ±1
    entries, mutually orthogonal, and — over integer-quantized
    vectors — the sign dot products are EXACT integers, which is what
    lets the driver replay the whole LSH bucket assignment in SQL
    (``bit_count`` parity).  Keys are always computed on the RAW
    (pre-normalization) vectors: signs are scale-invariant, and on
    the integer surface this keeps exact-zero dots exactly zero."""

    def __init__(self, dim: int, n_planes: int, kind: str = "gauss"):
        if kind == "gauss":
            rs = np.random.RandomState(42)
            self.planes = rs.normal(size=(n_planes, dim))
        elif kind == "hadamard":
            i = np.arange(dim, dtype=np.int64)[None, :]
            j = np.arange(n_planes, dtype=np.int64)[:, None]
            pop = (
                np.bitwise_count(i & j)
                if hasattr(np, "bitwise_count")
                else np.vectorize(lambda x: bin(x).count("1"))(i & j)
            )
            self.planes = np.where(pop % 2 == 0, 1.0, -1.0)
        else:
            raise ValueError(f"unknown plane kind {kind!r}")

    def key(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes.T) > 0
        return (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(
            axis=1
        )


class _LshKeyer:
    """Per-worker state: hyperplanes built once (lazily — the dim comes
    from the first batch; seed 42, so every worker builds the identical
    planes) and reused for all subsequent batches."""

    def __init__(self, n_planes: int, id_col: str, col: str):
        self.n_planes = n_planes
        self.id_col = id_col
        self.col = col
        self._planes: _Planes | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("bucket", pa.array([], pa.int64()))
        emb = _normalize(_embedding_matrix(batch, self.col))
        if self._planes is None:
            self._planes = _Planes(emb.shape[1], self.n_planes)
        keys = self._planes.key(emb)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                self.col: batch[self.col],
                "bucket": pa.array(keys.astype(np.int64)),
            }
        )


def knn_lsh(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    col: str = "embedding",
    exclude_self: bool = True,
    plane_kind: str = "gauss",
):
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (hyperplane signs — Gaussian by default, ``"hadamard"``
    for the SQL-replayable ±1 family), exact cosine within the
    bucket.  Same output schema as :func:`knn_cosine`."""
    import ray

    q_raw = np.asarray(queries, np.float64)
    qn = _normalize(q_raw)
    dim = qn.shape[1]
    planes = _Planes(dim, n_planes, plane_kind)
    # keys from the RAW vectors — sign-equivalent to keying the
    # normalized ones, and exact when inputs and planes are integral
    q_keys = planes.key(q_raw)
    # planes ride the one broadcast — built ONCE here, never per batch
    q_ref = ray.put((qn, np.asarray(query_ids, np.int64), q_keys, planes))

    def bucket_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PARTIAL_EMPTY
        q, qids, qk, planes_ = ray.get(q_ref)
        emb_raw = _embedding_matrix(batch, col)
        emb = _normalize(emb_raw)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = planes_.key(emb_raw)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q)):
            mask = keys == qk[qi]
            if not mask.any():
                continue
            row = q[qi] @ emb[mask].T
            cand = ids[mask]
            take = min(k + (1 if exclude_self else 0), len(cand))
            top = np.argpartition(-row, take - 1)[:take] if take < len(row) else np.arange(len(row))
            out_q.extend([int(qids[qi])] * len(top))
            out_n.extend(cand[top].tolist())
            out_s.extend(row[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return _final_topk(
        ds.map_batches(bucket_partial, batch_format="pyarrow"), k, exclude_self
    )


def train_ivf_centroids(
    sample: np.ndarray, n_centroids: int = 16, iters: int = 10
) -> np.ndarray:
    """Deterministic spherical k-means (seeded, fixed iterations) on a
    driver-side sample — the coarse quantizer of an IVF index.  At
    scale the sample comes from ``ds.random_sample(frac, seed=…)``;
    the lloyd iterations stay driver-side (centroids are tiny)."""
    x = _normalize(np.asarray(sample, np.float64))
    rs = np.random.RandomState(42)
    cent = x[rs.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def _hash_stride_sample(ds, id_col: str, col: str, train_sample: int) -> np.ndarray:
    """Deterministic value-property training sample — no global sort:
    keep rows whose multiplicative id-hash lands in a stride sized to
    yield ~2×train_sample rows, then truncate by (hash, id).  The
    selection depends only on row VALUES, so it is identical at any
    parallelism level, and only O(train_sample) rows reach the driver."""
    import ray

    n_total = ds.count()
    mod = np.uint64(max(1, n_total // max(1, 2 * train_sample)))

    def sample_batch(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            h = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        keep = (h % mod) == 0
        return pa.table(
            {
                "_h": pa.array(h[keep]),
                id_col: pa.array(ids[keep]),
                col: t[col].filter(pa.array(keep))
                if isinstance(t[col], pa.ChunkedArray)
                else pa.chunked_array([t[col]]).filter(pa.array(keep)),
            }
        )

    from ..collect import tables_of

    sample_tbl = pa.concat_tables(
        tables_of(ds.map_batches(sample_batch, batch_format="pyarrow"))
    )
    import pyarrow.compute as _pc

    order = _pc.sort_indices(
        sample_tbl, sort_keys=[("_h", "ascending"), (id_col, "ascending")]
    )
    sample_tbl = sample_tbl.take(order).slice(0, train_sample)
    return np.array(sample_tbl[col].to_pylist(), np.float64)


def knn_ivf(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    id_col: str = "vec_id",
    col: str = "embedding",
    exclude_self: bool = True,
):
    """IVF approximate top-k: coarse k-means cells, queries probe their
    ``n_probe`` nearest cells, exact cosine within probed cells only.

    The scale path: candidate work per query drops from O(N) to
    O(N · n_probe / n_centroids); recall is tuned by ``n_probe``.
    Same output schema as :func:`knn_cosine` (query_id, rank,
    neighbor_id)."""
    import ray

    cent = train_ivf_centroids(
        _hash_stride_sample(ds, id_col, col, train_sample), n_centroids
    )

    qn = _normalize(np.asarray(queries))
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    q_ref = ray.put((qn, np.asarray(query_ids, np.int64), cent, probe))

    def cell_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PARTIAL_EMPTY
        q, qids, cent_, probe_ = ray.get(q_ref)
        emb = _normalize(_embedding_matrix(batch, col))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cells = (emb @ cent_.T).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q)):
            mask = np.isin(cells, probe_[qi])
            if not mask.any():
                continue
            row = q[qi] @ emb[mask].T
            cand = ids[mask]
            take = min(k + (1 if exclude_self else 0), len(cand))
            top = (
                np.argpartition(-row, take - 1)[:take]
                if take < len(row)
                else np.arange(len(row))
            )
            out_q.extend([int(qids[qi])] * len(top))
            out_n.extend(cand[top].tolist())
            out_s.extend(row[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return _final_topk(
        ds.map_batches(cell_partial, batch_format="pyarrow"), k, exclude_self
    )


def embedding_dup_pairs(
    ds,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """Pairs with cosine ≥ threshold: LSH-bucket blocking + exact
    verification within buckets.  Output ``(a, b)`` with a < b.

    Note: pure bucket blocking can miss pairs straddling a hyperplane;
    at ``threshold`` ≥ 0.95 and few planes the miss-rate is tiny, and
    the exact (quadratic) alternative exists as the oracle."""

    add_key = _LshKeyer(n_planes, id_col, col)

    def verify(group: pa.Table) -> pa.Table:
        ids = np.array(group[id_col].to_pylist(), np.int64)
        if len(ids) < 2:  # guard BEFORE the matrix build (empty-safe)
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        emb = _normalize(_embedding_matrix(group, col))
        order = np.argsort(ids)
        ids, emb = ids[order], emb[order]
        sims = emb @ emb.T
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = sims[ai, bi] >= threshold
        return pa.table(
            {
                "a": pa.array(ids[ai][keep]),
                "b": pa.array(ids[bi][keep]),
                "sim": pa.array(sims[ai, bi][keep], pa.float64()),
            }
        )

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pyarrow")
    )


def knn_cosine_filtered(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    allowed_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    col: str = "embedding",
    exclude_self: bool = True,
):
    """Filtered vector search: exact cosine top-k restricted to
    ``allowed_ids`` (pre-filtered kNN, the vector-DB metadata-filter
    primitive).  The allowed set is broadcast ONCE as a sorted id
    array; each batch drops excluded rows BEFORE the matmul, so the
    compute scales with the filtered corpus, not the full one.
    Output ``(query_id, rank, neighbor_id)`` — identical to
    :func:`knn_cosine` run over the filtered dataset."""
    import ray

    qn = _normalize(np.asarray(queries))
    allowed = np.unique(np.asarray(allowed_ids, np.int64))
    q_ref = ray.put((qn, np.asarray(query_ids, np.int64), allowed))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q, qids, ok_ids = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(ids, ok_ids, assume_unique=False)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
        if not keep.any():
            return empty
        batch = batch.filter(pa.array(keep))
        ids = ids[keep]
        emb = _normalize(_embedding_matrix(batch, col))
        sims = q @ emb.T
        take = min(k + (1 if exclude_self else 0), sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = (
                np.argpartition(-row, take - 1)[:take]
                if take < len(row)
                else np.arange(len(row))
            )
            out_q.extend([int(qids[qi])] * len(top))
            out_n.extend(ids[top].tolist())
            out_s.extend(row[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return _final_topk(
        ds.map_batches(partial_topk, batch_format="pyarrow"), k, exclude_self
    )


def quantize_embeddings(ds, col: str = "embedding", id_col: str = "vec_id"):
    """Per-vector symmetric int8 quantization (scale = max|x| / 127):
    ``(id_col, emb_q list<int8>, scale float32)`` — 4× smaller vectors
    for the ANN scale path, ≲0.4 % cosine error at typical embedding
    distributions.  Streaming map_batches, no shuffle; dequantize with
    :func:`knn_cosine_quantized` or ``q * scale``."""

    def fn(t: pa.Table) -> pa.Table:
        emb = _embedding_matrix(t, col)
        scale = np.abs(emb).max(axis=1) / 127.0
        scale = np.where(scale == 0, 1.0, scale)
        q = np.clip(np.round(emb / scale[:, None]), -127, 127).astype(np.int8)
        n, d = q.shape
        return pa.table(
            {
                id_col: t[id_col],
                "emb_q": pa.FixedSizeListArray.from_arrays(
                    pa.array(q.ravel(), pa.int8()), d
                ),
                "scale": pa.array(scale.astype(np.float32), pa.float32()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def knn_cosine_quantized(
    ds_q8,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    exclude_self: bool = True,
):
    """Exact cosine top-k over an int8-quantized corpus
    (:func:`quantize_embeddings` output): each batch dequantizes
    ``q · scale`` and runs the same broadcast-matmul partial-top-k as
    :func:`knn_cosine`.  Approximation comes ONLY from the
    quantization rounding — recall vs the float corpus is the pytest
    pin."""
    import ray

    qn = _normalize(np.asarray(queries))
    q_ref = ray.put((qn, np.asarray(query_ids, np.int64)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q, qids = ray.get(q_ref)
        flat = batch["emb_q"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        n = batch.num_rows
        d = len(flat) // max(n, 1)
        scale = batch["scale"].to_numpy(zero_copy_only=False).astype(np.float64)
        emb = _normalize(
            flat.astype(np.float64).reshape(n, d) * scale[:, None]
        )
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = q @ emb.T
        take = min(k + (1 if exclude_self else 0), sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = (
                np.argpartition(-row, take - 1)[:take]
                if take < len(row)
                else np.arange(len(row))
            )
            out_q.extend([int(qids[qi])] * len(top))
            out_n.extend(ids[top].tolist())
            out_s.extend(row[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return _final_topk(
        ds_q8.map_batches(partial_topk, batch_format="pyarrow"), k, exclude_self
    )


def embedding_dup_pairs_exact(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """EXACT all-pairs near-duplicate reference: every pair with
    cosine ≥ ``threshold`` → Dataset of ``(a, b)`` with a < b.

    Quadratic by definition — this is the oracle that PINS
    :func:`embedding_dup_pairs`' LSH recall, not the scale path.  The
    full normalized matrix is broadcast ONCE (``ray.put``); each
    batch does one matmul of its rows against the broadcast side and
    emits only qualifying pairs, so compute distributes over batches
    even though the comparison set is global.  Use the LSH variant
    when n² (not n) is the problem."""
    import ray

    from ..collect import tables_of

    full = pa.concat_tables(tables_of(ds)).combine_chunks().sort_by(id_col)
    all_ids = full[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    all_emb = _normalize(_embedding_matrix(full, col))
    ref = ray.put((all_ids, all_emb))

    def pairs_of_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        ids_all, emb_all = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = _normalize(_embedding_matrix(batch, col))
        sims = emb @ emb_all.T  # (b, n)
        # keep (batch row, global row) with batch_id < global_id
        keep = (sims >= threshold) & (ids[:, None] < ids_all[None, :])
        bi, gi = np.nonzero(keep)
        return pa.table(
            {
                "a": pa.array(ids[bi], pa.int64()),
                "b": pa.array(ids_all[gi], pa.int64()),
            }
        )

    return ds.map_batches(pairs_of_batch, batch_format="pyarrow")


def semdedup(
    ds,
    threshold: float = 0.95,
    n_centroids: int = 16,
    train_sample: int = 2048,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """SemDeDup (Abbas et al. 2023): semantic deduplication by
    k-means clustering + WITHIN-CLUSTER pairwise cosine — the paper's
    trick for making embedding dedup sub-quadratic: pairs are only
    examined inside a cluster, so cost is Σ|cluster|² ≪ N².

    Returns a Dataset of REMOVED rows ``(vec_id, cluster)``: within
    each cluster, connected groups of pairs with cosine ≥
    ``threshold`` keep their min-id representative and drop the rest
    (the paper keeps the member farthest from the centroid; the keep
    rule is a local, per-group choice — swap it here if wanted).

    Shape at scale: centroids from the deterministic hash-stride
    sample (driver-side, tiny), assignment streams (one matmul per
    batch against the broadcast centroids), then ONE
    ``groupby(cluster)`` shuffle and a vectorized in-cluster pass.
    Clusters cap the quadratic term; raise ``n_centroids`` as N grows
    (the paper uses √N-ish).  Caveat shared with the paper: near-dups
    straddling a cluster boundary are missed — the exact all-pairs
    reference (:func:`embedding_dup_pairs_exact`) bounds the loss in
    tests."""
    import ray

    cent = train_ivf_centroids(
        _hash_stride_sample(ds, id_col, col, train_sample), n_centroids
    )
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    col: t[col],
                    "cluster": pa.array([], pa.int32()),
                }
            )
        c = ray.get(cent_ref)
        emb = _normalize(_embedding_matrix(t, col))
        cl = (emb @ c.T).argmax(axis=1).astype(np.int32)
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                col: t[col],
                "cluster": pa.array(cl, pa.int32()),
            }
        )

    def dedup_cluster(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) < 2:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "cluster": pa.array([], pa.int32())}
            )
        order = np.argsort(ids)
        ids = ids[order]
        emb = _normalize(_embedding_matrix(group, col))[order]
        sims = emb @ emb.T
        # union-find over qualifying pairs (cluster-sized, vectorized
        # pair extraction; the python loop is over DUP pairs only)
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = sims[ai, bi] >= threshold
        parent = np.arange(len(ids))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(ai[keep].tolist(), bi[keep].tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(len(ids))])
        removed = roots != np.arange(len(ids))  # ids sorted ⇒ root = min id
        cl = int(group["cluster"][0].as_py())
        return pa.table(
            {
                id_col: pa.array(ids[removed], pa.int64()),
                "cluster": pa.array(
                    np.full(int(removed.sum()), cl, np.int32), pa.int32()
                ),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pyarrow")
    )
