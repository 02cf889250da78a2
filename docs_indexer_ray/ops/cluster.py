"""Distributed k-means over an embedding column — the data-curation
clustering primitive (cluster-balanced sampling, SemDeDup-style
bucketing, topic discovery) exposed directly rather than embedded in
IVF/SemDeDup.

Unlike :func:`ops.ann.train_ivf_centroids` (which fits on a driver-side
sample), :func:`fit_kmeans` refines over the FULL corpus: every Lloyd
iteration is ONE streaming ``map_batches`` pass emitting a
constant-size partial per block — ``(cluster, count, sum-vector)``
rows, k·d floats regardless of block size — folded on the driver
(k·d is centroid-scale, the broadcast-state footprint class).  No
corpus materialization, no shuffle; the centroids are re-broadcast
with one ``ray.put`` per iteration, exactly the PageRank loop shape.

Determinism: the init comes from the deterministic hash-stride sample
(value property ⇒ same at any parallelism), iteration count is fixed,
and empty clusters keep their previous centroid.  Per-block partial
sums make the fold order block-dependent only in float last-ulps.

``spherical=True`` (default) renormalizes centroids each round —
cosine k-means, matching the rest of the embedding family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import (
    _embedding_matrix,
    _hash_stride_sample,
    _normalize,
    train_ivf_centroids,
)

__all__ = ["fit_kmeans", "assign_clusters"]


def fit_kmeans(
    ds,
    n_clusters: int = 16,
    iters: int = 5,
    train_sample: int = 2048,
    id_col: str = "vec_id",
    col: str = "embedding",
    spherical: bool = True,
) -> np.ndarray:
    """Full-corpus Lloyd refinement from the sampled spherical-k-means
    init.  Returns ``(n_clusters, d)`` float64 centroids (unit-norm
    when ``spherical``)."""
    import ray

    from ..collect import tables_of

    cent = train_ivf_centroids(
        _hash_stride_sample(ds, id_col, col, train_sample), n_clusters
    )
    k = cent.shape[0]

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "count": pa.array([], pa.int64()),
                        "sum": pa.array([], pa.large_list(pa.float64())),
                    }
                )
            emb = _normalize(_embedding_matrix(batch, col))
            assign = (emb @ c.T).argmax(axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, emb)
            counts = np.bincount(assign, minlength=len(c))
            nz = np.flatnonzero(counts)
            return pa.table(
                {
                    "cluster": pa.array(nz.astype(np.int64)),
                    "count": pa.array(counts[nz].astype(np.int64)),
                    "sum": pa.array(list(sums[nz]), pa.large_list(pa.float64())),
                }
            )

        sums = np.zeros_like(cent)
        counts = np.zeros(k, np.int64)
        for t in tables_of(ds.map_batches(partial, batch_format="pyarrow")):
            # np.add.at, not fancy-indexed += — a block may hold more
            # than one partial table concatenated (duplicate cluster
            # ids within t), and += silently keeps only the last one
            cl = t["cluster"].to_numpy(zero_copy_only=False)
            np.add.at(counts, cl, t["count"].to_numpy(zero_copy_only=False))
            np.add.at(sums, cl, np.array(t["sum"].to_pylist(), np.float64))
        live = counts > 0
        if spherical:
            norms = np.linalg.norm(sums[live], axis=1)
            ok = norms > 0
            upd = np.flatnonzero(live)[ok]
            cent[upd] = sums[upd] / norms[ok, None]
        else:
            cent[live] = sums[live] / counts[live, None]
    return cent


def assign_clusters(
    ds,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """One streaming pass: ``(id_col, cluster, sim)`` — nearest
    centroid by cosine, broadcast once."""
    import ray

    ref = ray.put(np.asarray(centroids, np.float64))
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        c = ray.get(ref)
        emb = _normalize(_embedding_matrix(batch, col))
        sims = emb @ c.T
        a = sims.argmax(axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(a.astype(np.int64)),
                "sim": pa.array(sims[np.arange(len(a)), a]),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")
