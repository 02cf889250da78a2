"""Doc-aligned vector sidecar — the serving tier's k-NN storage.

OpenSearch's k-NN plugin stores one dense vector per document next to
the inverted index so ``/_search`` can answer ``knn`` queries and
2.x ``hybrid`` (BM25 + vector RRF) requests.  The reference delegates
that capability wholesale; this module rebuilds the storage side:
vectors attach to a PUBLISHED build as a sidecar keyed by the build's
dense doc ids — the index itself is untouched (same fingerprint, same
segments), so attaching vectors never invalidates postings, resumes,
or merges.

Layout (under the build dir)::

    vectors/<name>.meta.json            {dim, n_docs, num_parts, count}
    vectors/<name>/vpart=K/*.parquet    (doc_id int64, v list<float>)

(meta lives BESIDE the parquet dir — a JSON file inside it would
break the hive dataset scan; its presence is the attached marker,
written LAST so a crashed attach never looks complete)

``vpart = doc_id * num_parts // n_docs`` — a deterministic doc-id
RANGE partitioning, so a doc-range shard reader loads only its
overlapping vparts (hive-partition pruning; the same locality story
as the docs store's ``docpart``).  Each shard of the serving fleet
therefore holds only ITS slice of the vector matrix — corpus-scale
vector state lives with the fleet, never on the driver.

Scale shape of :func:`attach_vectors`: the id mapping is either a
column rename (``id_col`` — embeddings already keyed by the build's
doc ids) or ONE hash-join shuffle against the docs store's
``(doc_id, url)`` projection (``url_col`` — the crawl-native key;
``ops/join.py::hash_join``, bucket co-location, no driver state);
the write is a streaming ``write_parquet(partition_cols=["vpart"])``.
Nothing corpus-scale touches the driver.

Query-side scoring contract (``query/qstring._Knn``): vectors are
L2-normalized at READ time and a hit scores ``boost × (1 + cos) / 2``
— the OpenSearch k-NN ``cosinesimil`` space function, positive for
every stored vector so the engine's ``scores > 0`` match convention
holds.  Docs without a vector never match a ``knn`` clause.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

__all__ = [
    "attach_vectors",
    "vectors_meta",
    "load_vector_slice",
    "carry_sidecars",
]


def _vec_dir(build_dir: str, name: str) -> str:
    return os.path.join(build_dir, "vectors", name)


def _pack_vb(vcol: pa.Array) -> pa.Array:
    """``list<float>`` → one binary cell of float32 bytes per row
    (equal dims enforced) — the join-safe wire form."""
    vcol = vcol.cast(pa.list_(pa.float32()))
    n = len(vcol)
    if n == 0:
        return pa.array([], pa.binary())
    lens = vcol.value_lengths().to_numpy(zero_copy_only=False)
    if len(np.unique(lens)) > 1:
        raise ValueError(
            f"ragged vector column: dims {sorted(set(lens.tolist()))}"
        )
    dim = int(lens[0])
    flat = np.asarray(
        vcol.flatten().to_numpy(zero_copy_only=False), np.float32
    )
    offsets = np.arange(0, (n + 1) * dim * 4, dim * 4, dtype=np.int32)
    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat.tobytes())],
    )


def _unpack_vb(arr: pa.Array) -> pa.Array:
    """Inverse of :func:`_pack_vb`."""
    n = len(arr)
    if n == 0:
        return pa.array([], pa.list_(pa.float32()))
    offs = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset: arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    widths = np.unique(np.diff(offs))
    if len(widths) != 1 or widths[0] % 4:
        raise ValueError(f"corrupt packed vectors: byte widths {widths}")
    dim = int(widths[0]) // 4
    flat = data[offs[0]: offs[-1]].view(np.float32)
    return pa.FixedSizeListArray.from_arrays(
        pa.array(flat, pa.float32()), dim
    ).cast(pa.list_(pa.float32()))


def vectors_meta(build_dir: str, name: str = "emb") -> dict | None:
    """The sidecar's meta, or ``None`` when no vectors are attached."""
    path = _vec_dir(build_dir, name) + ".meta.json"
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def attach_vectors(
    build_dir: str,
    emb_ds,
    *,
    vec_col: str = "embedding",
    id_col: str | None = None,
    url_col: str | None = None,
    name: str = "emb",
    num_parts: int = 32,
    skip_if_present: bool = True,
) -> dict:
    """Attach a vector sidecar ``name`` to a published build.

    ``emb_ds``: a Ray Dataset with ``vec_col`` (``list<float>``, one
    fixed dim) and EITHER ``id_col`` (already the build's doc ids) or
    ``url_col`` (joined against the docs store's ``(doc_id, url)`` —
    one hash-join shuffle, the crawl-native path).  Docs absent from
    ``emb_ds`` simply have no vector (they never match ``knn``).
    Returns the written meta dict.
    """
    import ray.data

    from ..index import manifest as mf

    if os.path.exists(os.path.join(build_dir, "CURRENT")):
        build_dir = mf.current_build(build_dir)
    if (id_col is None) == (url_col is None):
        raise ValueError("exactly one of id_col / url_col is required")
    vdir = _vec_dir(build_dir, name)
    if skip_if_present and vectors_meta(build_dir, name) is not None:
        return vectors_meta(build_dir, name)
    man = mf.read_manifest(build_dir)
    n_docs = int(man["n_docs"])

    if url_col is not None:
        from ..ops.join import hash_join

        docs = ray.data.read_parquet(
            os.path.join(build_dir, "docs"), columns=["doc_id", "url"]
        )

        # Arrow's hash join refuses list-typed payload columns — pack
        # each vector into a binary cell for the shuffle (vectorized
        # buffer reinterpretation both ways, no per-row Python)
        def _pack(t: pa.Table) -> pa.Table:
            return pa.table({
                "url": t[url_col].combine_chunks().cast(pa.string()),
                "vb": _pack_vb(t[vec_col].combine_chunks()),
            })

        left = emb_ds.select_columns([url_col, vec_col]).map_batches(
            _pack, batch_format="pyarrow"
        )
        joined = hash_join(left, docs, on="url")

        def _unpack(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": t["doc_id"],
                vec_col: _unpack_vb(t["vb"].combine_chunks()),
            })

        ds = joined.map_batches(_unpack, batch_format="pyarrow")
    else:
        ds = emb_ds.select_columns([id_col, vec_col])
        if id_col != "doc_id":

            def _rename(t: pa.Table) -> pa.Table:
                return t.rename_columns(
                    ["doc_id" if c == id_col else c for c in t.column_names]
                )

            ds = ds.map_batches(_rename, batch_format="pyarrow")

    def _tag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= n_docs):
            raise ValueError(
                f"vector doc_id outside [0, {n_docs}): "
                f"[{ids.min()}, {ids.max()}]"
            )
        vcol = t[vec_col].combine_chunks()
        if t.num_rows:
            lens = (
                vcol.cast(pa.list_(pa.float32()))
                .value_lengths()
                .to_numpy(zero_copy_only=False)
            )
            if len(np.unique(lens)) > 1:
                raise ValueError(
                    f"ragged vector column: dims {sorted(set(lens.tolist()))}"
                )
        vpart = ids * num_parts // max(1, n_docs)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "v": vcol.cast(pa.list_(pa.float32())),
                "vpart": pa.array(vpart.astype(np.int32), pa.int32()),
            }
        )

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    tmp = vdir + ".tmp"
    import shutil

    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    tagged.write_parquet(tmp, partition_cols=["vpart"])

    # dim + count from the written files (the map-side dim_seen list
    # doesn't travel back from Ray workers)
    import pyarrow.dataset as pads

    dset = pads.dataset(tmp, partitioning="hive")
    count = dset.count_rows()
    dim = 0
    for frag in dset.get_fragments():
        head = frag.head(1)
        if head.num_rows:
            dim = len(head["v"][0])
            break
    meta = {
        "name": name,
        "dim": int(dim),
        "n_docs": n_docs,
        "num_parts": int(num_parts),
        "count": int(count),
    }
    if os.path.exists(vdir):
        shutil.rmtree(vdir)
    os.makedirs(os.path.dirname(vdir), exist_ok=True)
    os.replace(tmp, vdir)
    # meta is written LAST (its presence marks the sidecar attached,
    # like the build's manifest publish) and atomically
    mpath = vdir + ".meta.json"
    with open(mpath + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(mpath + ".tmp", mpath)
    return meta


def _sidecar_names(build_dir: str) -> list[str]:
    """Attached sidecar names under one build (meta present = attached)."""
    vroot = os.path.join(build_dir, "vectors")
    if not os.path.isdir(vroot):
        return []
    suf = ".meta.json"
    return sorted(f[: -len(suf)] for f in os.listdir(vroot) if f.endswith(suf))


def _carry_vpart(
    src_dir: str, tmp_root: str, shift: int, n_total: int, num_parts: int, tag: str
) -> int:
    """Task body: re-home ONE input vpart directory into the merged
    sidecar's id space — add ``shift`` to doc ids and re-bucket by the
    MERGED ``vpart`` law (``id * P // n_total``; both ``n_docs`` and
    possibly ``P`` changed, so even the shift-0 input re-buckets).  An
    old vpart is a contiguous doc-id range, so its rows land in at
    most a couple of new vparts.  Output files are ``tag``-unique —
    tasks never collide inside a shared ``vpart=K`` dir."""
    import pyarrow.parquet as pq

    t = pq.read_table(src_dir, columns=["doc_id", "v"])
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64) + shift
    vp = ids * num_parts // max(1, n_total)
    n = 0
    for k in np.unique(vp):
        mask = vp == k
        sub = pa.table(
            {
                "doc_id": pa.array(ids[mask], pa.int64()),
                "v": t["v"].combine_chunks().filter(pa.array(mask)),
            }
        )
        odir = os.path.join(tmp_root, f"vpart={int(k)}")
        os.makedirs(odir, exist_ok=True)
        out = os.path.join(odir, f"{tag}.parquet")
        tmp = out + f".tmp-{os.getpid()}"
        pq.write_table(sub, tmp, compression="zstd")
        os.replace(tmp, out)
        n += sub.num_rows
    return n


def carry_sidecars(
    input_dirs: list[str], shifts: list[int], n_total: int, out_build_dir: str
) -> dict[str, dict]:
    """Carry every vector sidecar through a merge: for each sidecar
    name attached to ANY input, rewrite its vectors into the merged
    build's id space (``merge_many`` shifts input ``i``'s doc ids by
    ``shifts[i]``) — so a ``knn``/``hybrid`` query keeps serving after
    an incremental ``/_bulk`` → merge instead of silently dying on the
    new build.

    An input without the sidecar contributes nothing — its docs simply
    have no vector in the merged build (they never match ``knn``),
    matching attach-time semantics for absent docs.  Inputs that DO
    carry the name must agree on ``dim``.

    Scale shape mirrors the merge's docs-store round: one Ray task per
    (input, vpart dir) does the shift + re-bucket; the driver only
    lists directories.  Idempotent: a name whose meta already exists
    under ``out_build_dir`` is skipped (merge resume).  Meta is
    written LAST, after the atomic dir rename — a crashed merge never
    leaves a sidecar that looks attached.

    Returns ``{name: merged_meta}``.
    """
    import shutil

    import ray

    per_name: dict[str, list[tuple[str, int, dict]]] = {}
    for d, s in zip(input_dirs, shifts):
        for name in _sidecar_names(d):
            per_name.setdefault(name, []).append((d, s, vectors_meta(d, name)))

    task = ray.remote(num_cpus=1)(_carry_vpart)
    out: dict[str, dict] = {}
    for name, sources in sorted(per_name.items()):
        existing = vectors_meta(out_build_dir, name)
        if existing is not None:
            out[name] = existing
            continue
        dims = {int(m["dim"]) for _, _, m in sources}
        if len(dims) > 1:
            raise ValueError(
                f"merge inputs disagree on vector sidecar {name!r} dim: "
                f"{sorted(dims)}"
            )
        num_parts = max(int(m["num_parts"]) for _, _, m in sources)
        vdir = _vec_dir(out_build_dir, name)
        tmp = vdir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        jobs = []
        for i, (d, shift, _m) in enumerate(sources):
            src_root = _vec_dir(d, name)
            for pd in sorted(os.listdir(src_root)):
                if not pd.startswith("vpart="):
                    continue
                jobs.append(
                    task.remote(
                        os.path.join(src_root, pd),
                        tmp,
                        shift,
                        n_total,
                        num_parts,
                        f"in{i}-{pd.split('=')[1]}",
                    )
                )
        count = sum(ray.get(jobs))
        meta = {
            "name": name,
            "dim": int(next(iter(dims))),
            "n_docs": int(n_total),
            "num_parts": int(num_parts),
            "count": int(count),
        }
        if os.path.exists(vdir):
            shutil.rmtree(vdir)
        os.makedirs(os.path.dirname(vdir), exist_ok=True)
        os.replace(tmp, vdir)
        mpath = vdir + ".meta.json"
        with open(mpath + ".tmp", "w") as f:
            json.dump(meta, f)
        os.replace(mpath + ".tmp", mpath)
        out[name] = meta
    return out


def load_vector_slice(
    build_dir: str, name: str, lo: int, hi: int
) -> tuple[np.ndarray, np.ndarray]:
    """``(V, valid)`` for doc range ``[lo, hi)``: ``V`` is a
    ``float32 (hi-lo, dim)`` matrix of L2-NORMALIZED vectors (missing
    docs are zero rows), ``valid`` the bool has-a-vector mask.  Reads
    only the range's overlapping ``vpart`` hive partitions — a shard
    reader pays for its slice, not the corpus."""
    import pyarrow.dataset as pads

    meta = vectors_meta(build_dir, name)
    if meta is None:
        raise FileNotFoundError(
            f"no vector sidecar {name!r} under {build_dir} "
            "(attach one with index.vectors.attach_vectors)"
        )
    dim, n_docs, num_parts = meta["dim"], meta["n_docs"], meta["num_parts"]
    n_local = max(0, hi - lo)
    V = np.zeros((n_local, dim), np.float32)
    valid = np.zeros(n_local, bool)
    if n_local == 0:
        return V, valid
    p_lo = lo * num_parts // max(1, n_docs)
    p_hi = (hi - 1) * num_parts // max(1, n_docs)
    dset = pads.dataset(_vec_dir(build_dir, name), partitioning="hive")
    t = dset.to_table(
        columns=["doc_id", "v"],
        filter=(
            (pads.field("vpart") >= p_lo)
            & (pads.field("vpart") <= p_hi)
            & (pads.field("doc_id") >= lo)
            & (pads.field("doc_id") < hi)
        ),
    )
    if t.num_rows == 0:
        return V, valid
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64) - lo
    uniq = np.unique(ids)
    if len(uniq) != len(ids):
        raise ValueError(
            f"duplicate doc_id rows in vector sidecar {name!r} — "
            "attach_vectors input must be one row per doc"
        )
    # copy: Arrow hands back a read-only buffer, and the rows are
    # normalized in place below
    flat = np.array(
        t["v"].combine_chunks().flatten().to_numpy(zero_copy_only=False),
        np.float32,
        copy=True,
    ).reshape(len(ids), dim)
    norms = np.linalg.norm(flat, axis=1)
    nz = norms > 0
    flat[nz] /= norms[nz, None]
    V[ids] = flat
    valid[ids] = True
    return V, valid
