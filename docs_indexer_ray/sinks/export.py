"""Resumable sharded-Parquet corpus export — the curation pipeline's
output stage.

A 100 TB curation run cannot afford to re-export everything when one
task (or the whole job) dies.  This sink writes the dataset as
``num_shards`` Parquet files under ``out_root`` with:

* **deterministic shard assignment** — a vectorized splitmix64
  finalizer over the id, mod ``num_shards`` (a value property: the
  same row lands in the same shard at any parallelism, so re-runs
  produce byte-stable shards — see :func:`_shard_of`);
* **deterministic shard content** — each shard's rows sort by id
  before writing, so the file is a pure function of the data;
* **atomic publish** — write to ``<file>.tmp``, fsync-free
  ``os.replace`` (the same tmp+rename contract the index part files
  use);
* **a manifest** (``manifest.json``) with per-shard row counts and a
  content fingerprint (sha256 over the sorted Arrow IPC stream — the
  VALUES, not the Parquet bytes, so it is stable across Parquet
  writer versions);
* **resume** — a re-run loads the manifest, verifies which shard
  files exist, and drops their rows BEFORE the shuffle (broadcast
  membership test in ``map_batches``), so a 1-shard failure re-moves
  ~1/num_shards of the data, not all of it.

One ``groupby(shard)`` all-to-all is the only exchange; each shard
writes from exactly one task.  Size ``num_shards`` to ≥ cluster task
slots (it is also the resume granularity).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa

__all__ = ["write_corpus_shards", "read_manifest"]

_MANIFEST = "manifest.json"


def _shard_of(ids: np.ndarray, num_shards: int) -> np.ndarray:
    """Value-property shard id (parallelism-invariant): a vectorized
    splitmix64 finalizer over the int ids — no per-row Python (the
    sink has no SQL oracle, so it does not pay ``ops/sample.py``'s
    deliberate md5-per-row SQL-parity price)."""
    x = ids.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return (x % np.uint64(num_shards)).astype(np.int64)


def _fingerprint(t: pa.Table) -> str:
    """sha256 of the table's IPC stream — a content hash of the sorted
    rows, independent of the Parquet writer."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return hashlib.sha256(sink.getvalue().to_pybytes()).hexdigest()


def read_manifest(out_root: str) -> dict:
    p = os.path.join(out_root, _MANIFEST)
    if not os.path.exists(p):
        return {"shards": {}}
    with open(p) as f:
        return json.load(f)


def write_corpus_shards(
    ds,
    out_root: str,
    num_shards: int = 32,
    id_col: str = "doc_id",
    resume: bool = True,
) -> dict:
    """Export ``ds`` as ``num_shards`` deterministic Parquet shards
    under ``out_root``; returns the manifest dict.

    On resume, shards already recorded in the manifest whose file
    still exists are skipped — their rows are dropped before the
    shuffle, so the re-run's exchange moves only the missing shards'
    data."""
    import ray
    import pyarrow.parquet as pq

    os.makedirs(out_root, exist_ok=True)
    manifest = read_manifest(out_root) if resume else {"shards": {}}
    # the resume-skip is only valid under the SAME partitioning: a
    # re-run with a different num_shards (or id_col) would treat the
    # old hash%old_n files as covering rows of the new hash%new_n
    # space and silently drop roughly done/new_n of the corpus
    if manifest["shards"]:
        for key, want in (("num_shards", num_shards), ("id_col", id_col)):
            have = manifest.get(key)
            if have is not None and have != want:
                raise ValueError(
                    f"resume {key} mismatch: manifest has {have!r}, "
                    f"caller passed {want!r} — use a fresh out_root "
                    "(or resume=False) to re-partition"
                )
    manifest["num_shards"] = num_shards
    manifest["id_col"] = id_col
    done = {
        int(k)
        for k, v in manifest["shards"].items()
        if os.path.exists(os.path.join(out_root, v["file"]))
    }
    done_ref = ray.put(frozenset(done))

    def assign(t: pa.Table) -> pa.Table:
        # pandas metadata dicts make block schemas unhashable for Ray's
        # reduce-side dedup (log noise); the values don't need it
        t = t.replace_schema_metadata(None)
        finished = ray.get(done_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = _shard_of(ids, num_shards)
        t = t.append_column("__shard", pa.array(shard, pa.int64()))
        if finished:
            keep = ~np.isin(shard, np.fromiter(finished, np.int64))
            t = t.filter(pa.array(keep))
        return t

    def write_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"shard": pa.array([], pa.int64()),
                 "n_rows": pa.array([], pa.int64()),
                 "sha256": pa.array([], pa.string())}
            )
        shard = int(group["__shard"][0].as_py())
        body = group.drop_columns(["__shard"]).sort_by(id_col)
        fname = f"shard-{shard:05d}.parquet"
        tmp = os.path.join(out_root, fname + ".tmp")
        pq.write_table(body, tmp)
        os.replace(tmp, os.path.join(out_root, fname))
        return pa.table(
            {
                "shard": pa.array([shard], pa.int64()),
                "n_rows": pa.array([body.num_rows], pa.int64()),
                "sha256": pa.array([_fingerprint(body)], pa.string()),
            }
        )

    rows = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(write_shard, batch_format="pyarrow")
    )
    from ..collect import tables_of

    parts = tables_of(rows)
    written = pa.concat_tables(parts) if parts else None
    if written is not None:
        for s, n, h in zip(
            written["shard"].to_pylist(),
            written["n_rows"].to_pylist(),
            written["sha256"].to_pylist(),
        ):
            manifest["shards"][str(int(s))] = {
                "file": f"shard-{int(s):05d}.parquet",
                "n_rows": int(n),
                "sha256": h,
            }
    tmp = os.path.join(out_root, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_root, _MANIFEST))
    return manifest
