"""Distributed PCA over an embedding column — compression for ANN.

Training-data pipelines compress embeddings (store less, search
faster) with PCA before quantization; this module fits it the
scale-correct way:

* :func:`fit_pca` — ONE streaming pass computing per-block moment
  partials ``(n, Σx, XᵀX)`` — each partial is a CONSTANT-SIZE d×d
  matrix regardless of block rows (the classic combiner shape), so
  the driver folds ``n_blocks`` small matrices, never rows.  Mean /
  covariance assemble on the driver, ``np.linalg.eigh`` (d×d, tiny)
  gives the components.  Eigenvector SIGN is normalized (largest-|·|
  component made positive) so results don't flip run to run.
* :func:`transform_pca` — broadcast ``(mean, components)`` once via
  ``ray.put``; each batch does one matmul.  Composes directly with
  ``ops/ann.py``'s kNN ops (search in the compressed space) and
  ``quantize_embeddings`` (PCA → int8 is the standard stack).

Float note: the moment-sum fold order follows Ray's block order, so
covariance entries can differ in final ulps across partitionings —
eigh is stable to that (tested: projections agree to 1e-8 across a
repartition), but bit-exact SQL oracle parity is NOT possible for an
eigendecomposition; the driver records this op rows-only and pytest
pins variance ordering, orthonormality, reconstruction optimality and
agreement with a single-process numpy reference.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _embedding_matrix

__all__ = ["fit_pca", "transform_pca"]


def fit_pca(ds, k: int, col: str = "embedding", center: bool = True):
    """Fit a ``k``-component PCA.  Returns ``(mean, components,
    explained_var)`` — components as a (k, d) row matrix, eigenvalues
    descending.

    ``center=False`` fits UNCENTERED truncated SVD (eigh of the raw
    second-moment matrix; returned mean is zeros) — the right variant
    for COSINE-space compression: centering shifts all vectors and
    destroys angle structure, while the uncentered basis preserves
    cosine up to the dropped energy (L2-normalize inputs first)."""
    import ray

    def moments(batch: pa.Table) -> pa.Table:
        x = _embedding_matrix(batch, col)
        d = x.shape[1]
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "s": pa.array([x.sum(axis=0).tobytes()], pa.binary()),
                "xtx": pa.array([(x.T @ x).ravel().tobytes()], pa.binary()),
                "d": pa.array([d], pa.int64()),
            }
        )

    from ..collect import tables_of

    parts = tables_of(ds.map_batches(moments, batch_format="pyarrow"))
    # drop empty-block partials (n=0, d=0, zero-length buffers) — they
    # would broadcast-fail against a real block's d-sized moments
    rows = [
        (int(p["n"][i].as_py()), p["s"][i].as_py(), p["xtx"][i].as_py(), int(p["d"][i].as_py()))
        for p in parts
        for i in range(p.num_rows)
        if int(p["n"][i].as_py()) > 0
    ]
    if not rows:
        raise ValueError("empty dataset")
    d = rows[0][3]
    n = 0
    s = np.zeros(d)
    xtx = np.zeros((d, d))
    for pn, ps, pxtx, _ in rows:
        n += pn
        s += np.frombuffer(ps, np.float64)
        xtx += np.frombuffer(pxtx, np.float64).reshape(d, d)
    if n < 2:
        raise ValueError("need at least 2 rows to fit PCA")
    if center:
        mean = s / n
        cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    else:
        mean = np.zeros(d)
        cov = xtx / (n - 1)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # (k, d)
    # deterministic sign: largest-|component| coordinate positive
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return mean, comps, w[order]


def transform_pca(ds, mean: np.ndarray, components: np.ndarray,
                  col: str = "embedding", out_col: str = "pca"):
    """Project ``col`` onto the fitted components (one matmul per
    batch against the broadcast basis); appends ``out_col`` as
    ``list<float>`` of dim k."""
    import ray

    basis_ref = ray.put((np.asarray(mean), np.asarray(components)))

    def project(batch: pa.Table) -> pa.Table:
        mu, comps = ray.get(basis_ref)
        x = _embedding_matrix(batch, col)
        y = (x - mu) @ comps.T
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(y.astype(np.float32).ravel(), pa.float32()), y.shape[1]
        ).cast(pa.list_(pa.float32()))
        return batch.append_column(out_col, arr)

    return ds.map_batches(project, batch_format="pyarrow")
