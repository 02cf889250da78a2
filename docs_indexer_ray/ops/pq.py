"""Product Quantization for billion-scale vector search (Jégou,
Douze & Schmid, "Product Quantization for Nearest Neighbor Search",
TPAMI 2011).

The memory-scale ANN path the rest of the family (``ops/ann.py``)
lacks: the corpus is compressed to ``m`` bytes per vector (one uint8
codebook index per subspace — 32× smaller than 64×float32), and
queries score the *codes* via asymmetric distance computation (ADC):
inner-product lookup tables of shape ``(m, ks)`` per query, one table
gather + sum per corpus row — no float matrix ever re-enters memory.
At 100 TB this is the difference between "embeddings fit nowhere" and
"codes fit in the page cache of every node".

Shapes (all composing with the existing ANN idioms):

* :func:`train_pq` — per-subspace Lloyd k-means on a deterministic
  hash-stride sample (same ``_hash_stride_sample`` value-property
  selection as IVF: O(train_sample) to the driver, no global sort,
  parallelism-invariant).  Codebooks are tiny ((m, ks, d/m) floats)
  and broadcast once via ``ray.put``.
* :func:`pq_encode` — one streaming ``map_batches`` pass: vectorized
  argmin against each sub-codebook, codes emitted as
  ``fixed_size_binary(m)`` built zero-copy from the (n, m) uint8
  matrix buffer (no per-row Python).
* :func:`knn_pq` — ADC top-k over a codes Dataset: per-query LUTs
  are precomputed ONCE on the driver ((nq, m, ks) — query-scale) and
  broadcast; each batch does ``m`` uint8 gathers + adds, keeps its
  per-batch top-k, and the shared ``_final_topk`` reduce merges —
  identical output schema to :func:`ops.ann.knn_cosine`
  ``(query_id, rank, neighbor_id)``.

Cosine regime: corpus vectors are L2-normalized before training and
encoding (matching every other op in the family), so the ADC
inner-product estimate approximates cosine similarity directly.
Determinism: fixed ``RandomState(42)`` init, fixed iteration count,
ties broken by lower centroid / neighbor id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import (
    _PARTIAL_EMPTY,
    _embedding_matrix,
    _final_topk,
    _hash_stride_sample,
    _normalize,
    train_ivf_centroids,
)

__all__ = [
    "train_pq",
    "pq_encode",
    "knn_pq",
    "train_ivfpq",
    "ivfpq_encode",
    "knn_ivfpq",
]


def _concat_partials(ds) -> pa.Table:
    """Collect a (query_id, rank, neighbor_id) result — query-scale by
    construction (≤ nq·k rows)."""
    from ..collect import tables_of

    tabs = tables_of(ds)
    if not tabs:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(tabs)


def _refine_exact(
    emb_ds,
    shortlist: pa.Table,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    id_col: str,
    col: str,
    exclude_self: bool,
):
    """Exact re-rank of an ADC shortlist: the (query-scale) shortlist
    is broadcast once as two sorted arrays; each batch dot-products
    ONLY its rows that appear in some query's shortlist."""
    import ray

    qn = _normalize(np.asarray(queries))
    qids = np.asarray(query_ids, np.int64)
    sl_n = shortlist["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sl_q = shortlist["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    # query_id -> row index in qn
    qpos = {int(q): i for i, q in enumerate(qids)}
    sl_qi = np.array([qpos[int(q)] for q in sl_q], np.int64)
    order = np.argsort(sl_n, kind="stable")
    sl_n, sl_qi = sl_n[order], sl_qi[order]
    ref = ray.put((qn, qids, sl_n, sl_qi))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PARTIAL_EMPTY
        qn_, qids_, sln, slqi = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # rows of this batch present in ANY shortlist
        lo = np.searchsorted(sln, ids, "left")
        hi = np.searchsorted(sln, ids, "right")
        hit = hi > lo
        if not hit.any():
            return _PARTIAL_EMPTY
        emb = _normalize(_embedding_matrix(batch, col))
        out_q, out_n, out_s = [], [], []
        for ri in np.flatnonzero(hit):
            v = emb[ri]
            for qi in slqi[lo[ri] : hi[ri]]:
                out_q.append(int(qids_[qi]))
                out_n.append(int(ids[ri]))
                out_s.append(float(qn_[qi] @ v))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return _final_topk(
        emb_ds.map_batches(partial, batch_format="pyarrow"), k, exclude_self
    )


def _kmeans_subspace(x: np.ndarray, ks: int, iters: int) -> np.ndarray:
    """Deterministic Euclidean Lloyd on one subspace sample.  Empty
    clusters keep their previous centroid (stable under any input)."""
    rs = np.random.RandomState(42)
    ks = min(ks, len(x))
    cent = x[rs.choice(len(x), size=ks, replace=False)].copy()
    for _ in range(iters):
        # ||x-c||^2 argmin == argmax(x·c - ||c||²/2)
        score = x @ cent.T - 0.5 * (cent * cent).sum(axis=1)
        assign = score.argmax(axis=1)
        sums = np.zeros_like(cent)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=ks).astype(np.float64)
        nonzero = counts > 0
        cent[nonzero] = sums[nonzero] / counts[nonzero, None]
    return cent


def train_pq(
    ds,
    m: int = 8,
    ks: int = 256,
    train_sample: int = 4096,
    iters: int = 12,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> np.ndarray:
    """Train PQ codebooks: ``(m, ks, d/m)`` float64.  ``d`` must be
    divisible by ``m`` (loud failure otherwise — silent zero-padding
    would corrupt the inner-product estimate)."""
    if ks > 256:
        raise ValueError(f"ks={ks} > 256: codes are uint8 (one byte per subspace)")
    sample = _normalize(_hash_stride_sample(ds, id_col, col, train_sample))
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    dsub = d // m
    return np.stack(
        [
            _kmeans_subspace(
                np.ascontiguousarray(sample[:, j * dsub : (j + 1) * dsub]), ks, iters
            )
            for j in range(m)
        ]
    )


def _codes_matrix(batch: pa.Table, codes_col: str, m: int) -> np.ndarray:
    """(n, m) uint8 view over a ``fixed_size_binary(m)`` column —
    zero-copy off the Arrow data buffer (offset-adjusted)."""
    arr = batch[codes_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    buf = arr.buffers()[1]
    flat = np.frombuffer(buf, np.uint8, count=(arr.offset + len(arr)) * m)
    return flat.reshape(-1, m)[arr.offset :]


def pq_encode(
    ds,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """Encode an embedding Dataset to ``(id_col, codes)`` where
    ``codes`` is ``fixed_size_binary(m)`` — one streaming pass, the
    codebooks broadcast once."""
    import ray

    m, ks, dsub = codebooks.shape
    cb_ref = ray.put(codebooks)
    empty = pa.table(
        {id_col: pa.array([], pa.int64()), "codes": pa.array([], pa.binary(m))}
    )

    def encode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        cb = ray.get(cb_ref)
        emb = _normalize(_embedding_matrix(batch, col))
        n = emb.shape[0]
        codes = np.empty((n, m), np.uint8)
        for j in range(m):
            sub = emb[:, j * dsub : (j + 1) * dsub]
            score = sub @ cb[j].T - 0.5 * (cb[j] * cb[j]).sum(axis=1)
            codes[:, j] = score.argmax(axis=1).astype(np.uint8)
        codes = np.ascontiguousarray(codes)
        codes_arr = pa.Array.from_buffers(
            pa.binary(m), n, [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table({id_col: batch[id_col], "codes": codes_arr})

    return ds.map_batches(encode, batch_format="pyarrow")


def knn_pq(
    codes_ds,
    codebooks: np.ndarray,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    exclude_self: bool = True,
    refine_ds=None,
    refine_factor: int = 4,
    col: str = "embedding",
):
    """ADC top-k over PQ codes.  Output ``(query_id, rank,
    neighbor_id)`` — the family's shared schema; ties by lower
    neighbor_id (deterministic).

    ``refine_ds`` enables the FAISS/SCaNN reorder stage: the ADC scan
    keeps a ``refine_factor × k`` shortlist per query, then ONE
    streaming pass over the float Dataset re-scores exactly — but only
    rows in some query's shortlist (a broadcast query-scale id set)
    ever compute a dot product, so full-precision vectors are read
    only at output scale while the corpus-wide scan stays on the
    m-byte codes."""
    import ray

    if refine_ds is not None:
        shortlist = _concat_partials(
            knn_pq(
                codes_ds,
                codebooks,
                queries,
                query_ids,
                k=max(k, refine_factor * k),
                id_col=id_col,
                codes_col=codes_col,
                exclude_self=exclude_self,
            )
        )
        return _refine_exact(
            refine_ds, shortlist, queries, query_ids, k, id_col, col, exclude_self
        )

    m, ks, dsub = codebooks.shape
    qn = _normalize(np.asarray(queries))
    if qn.shape[1] != m * dsub:
        raise ValueError(f"query dim {qn.shape[1]} != codebook dim {m * dsub}")
    # per-query inner-product lookup tables, (nq, m, ks): query-scale,
    # computed once driver-side, broadcast once.
    luts = np.einsum(
        "qjd,jkd->qjk", qn.reshape(len(qn), m, dsub), codebooks
    )
    q_ref = ray.put((luts, np.asarray(query_ids, np.int64)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PARTIAL_EMPTY
        luts_, qids = ray.get(q_ref)
        codes = _codes_matrix(batch, codes_col, m)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = codes.shape[0]
        take = min(k + (1 if exclude_self else 0), n)
        out_q, out_n, out_s = [], [], []
        for qi in range(luts_.shape[0]):
            sims = np.zeros(n, np.float64)
            lut = luts_[qi]
            for j in range(m):
                sims += lut[j, codes[:, j]]
            top = (
                np.argpartition(-sims, take - 1)[:take]
                if take < n
                else np.arange(n)
            )
            out_q.extend([int(qids[qi])] * len(top))
            out_n.extend(ids[top].tolist())
            out_s.extend(sims[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return _final_topk(
        codes_ds.map_batches(partial_topk, batch_format="pyarrow"), k, exclude_self
    )


def train_ivfpq(
    ds,
    n_centroids: int = 16,
    m: int = 8,
    ks: int = 256,
    train_sample: int = 4096,
    iters: int = 12,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """IVF-PQ training (the FAISS ``IVFx,PQy`` billion-scale index):
    coarse spherical k-means cells, then PQ codebooks fit on the
    RESIDUALS (x − coarse[cell]) — residuals concentrate near zero,
    so the same ``ks`` buys a much finer quantizer than whole-vector
    PQ.  Returns ``(coarse (C, d), codebooks (m, ks, d/m))``; both
    tiny, both broadcast once downstream."""
    if ks > 256:
        raise ValueError(f"ks={ks} > 256: codes are uint8 (one byte per subspace)")
    sample = _normalize(_hash_stride_sample(ds, id_col, col, train_sample))
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    coarse = train_ivf_centroids(sample, n_centroids)
    resid = sample - coarse[(sample @ coarse.T).argmax(axis=1)]
    dsub = d // m
    codebooks = np.stack(
        [
            _kmeans_subspace(
                np.ascontiguousarray(resid[:, j * dsub : (j + 1) * dsub]), ks, iters
            )
            for j in range(m)
        ]
    )
    return coarse, codebooks


def ivfpq_encode(
    ds,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """Encode to ``(id_col, cell: int32, codes: fixed_size_binary(m))``
    — one streaming pass; the corpus index state is m+4 bytes/vector."""
    import ray

    m, ks, dsub = codebooks.shape
    ref = ray.put((coarse, codebooks))
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "cell": pa.array([], pa.int32()),
            "codes": pa.array([], pa.binary(m)),
        }
    )

    def encode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        coarse_, cb = ray.get(ref)
        emb = _normalize(_embedding_matrix(batch, col))
        n = emb.shape[0]
        cells = (emb @ coarse_.T).argmax(axis=1)
        resid = emb - coarse_[cells]
        codes = np.empty((n, m), np.uint8)
        for j in range(m):
            sub = resid[:, j * dsub : (j + 1) * dsub]
            score = sub @ cb[j].T - 0.5 * (cb[j] * cb[j]).sum(axis=1)
            codes[:, j] = score.argmax(axis=1).astype(np.uint8)
        codes_arr = pa.Array.from_buffers(
            pa.binary(m), n, [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())]
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "cell": pa.array(cells.astype(np.int32)),
                "codes": codes_arr,
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def knn_ivfpq(
    codes_ds,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    exclude_self: bool = True,
    refine_ds=None,
    refine_factor: int = 4,
    col: str = "embedding",
):
    """IVF-PQ ADC top-k: each query probes its ``n_probe`` nearest
    coarse cells and ADC-scores ONLY rows in those cells —
    ``q·x = q·coarse[cell] + q·residual ≈ q·coarse[cell] + Σⱼ LUT[j,
    codeⱼ]`` (inner-product tables are cell-independent, so one
    (m, ks) LUT per query serves every probed cell).  Candidate work
    per query drops to ``O(N · n_probe / C)`` over m-byte codes; the
    optional refine stage is the same output-scale exact re-rank as
    :func:`knn_pq`."""
    import ray

    m, ks, dsub = codebooks.shape
    qn = _normalize(np.asarray(queries))
    if qn.shape[1] != m * dsub:
        raise ValueError(f"query dim {qn.shape[1]} != codebook dim {m * dsub}")

    if refine_ds is not None:
        shortlist = _concat_partials(
            knn_ivfpq(
                codes_ds,
                coarse,
                codebooks,
                queries,
                query_ids,
                k=max(k, refine_factor * k),
                n_probe=n_probe,
                id_col=id_col,
                exclude_self=exclude_self,
            )
        )
        return _refine_exact(
            refine_ds, shortlist, queries, query_ids, k, id_col, col, exclude_self
        )

    qc = qn @ coarse.T  # (nq, C) query·cell terms
    probe = np.argsort(-qc, axis=1)[:, : min(n_probe, coarse.shape[0])]
    luts = np.einsum("qjd,jkd->qjk", qn.reshape(len(qn), m, dsub), codebooks)
    ref = ray.put((luts, qc, probe, np.asarray(query_ids, np.int64)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PARTIAL_EMPTY
        luts_, qc_, probe_, qids = ray.get(ref)
        codes = _codes_matrix(batch, "codes", m)
        cells = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_n, out_s = [], [], []
        for qi in range(luts_.shape[0]):
            mask = np.isin(cells, probe_[qi])
            if not mask.any():
                continue
            c = codes[mask]
            sims = qc_[qi, cells[mask]].astype(np.float64)
            lut = luts_[qi]
            for j in range(m):
                sims += lut[j, c[:, j]]
            cand = ids[mask]
            take = min(k + (1 if exclude_self else 0), len(cand))
            top = (
                np.argpartition(-sims, take - 1)[:take]
                if take < len(sims)
                else np.arange(len(sims))
            )
            out_q.extend([int(qids[qi])] * len(top))
            out_n.extend(cand[top].tolist())
            out_s.extend(sims[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return _final_topk(
        codes_ds.map_batches(partial_topk, batch_format="pyarrow"), k, exclude_self
    )
