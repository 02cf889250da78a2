"""Training-shard export — the pipeline's last mile.

A trained-on corpus ships as a fixed set of shard files: data loaders
assign shards to workers, resume by shard, and re-shuffle epochs by
permuting shard order.  This op turns a Dataset into exactly
``n_shards`` deterministic output files:

* **shard assignment** is a value property — ``shard =
  int(md5(f"{seed}:{key}")[:8], 16) % n_shards`` — so the same (seed,
  data) always lands in the same shard at ANY parallelism, and the
  rule replays in one line of SQL
  (``('0x' || substr(md5(...),1,8))::UBIGINT % n``);
* **within-shard order** is the seeded-shuffle order ``(md5, key)``
  (``ops/sample.py::seeded_shuffle``'s rule per shard) — a
  deterministic global shuffle baked into the files;
* **one file per shard, written atomically** (tmp + rename), and an
  existing file is a RESUME SKIP — a crashed export reruns and only
  writes the missing shards.

Scale shape: one streaming ``map_batches`` computes the hash + shard
id, then ONE ``groupby(shard)`` all-to-all (the export IS a global
shuffle — that exchange is inherent to deterministic sharding) and
each ``map_groups`` task sorts and writes ITS shard.  Pick
``n_shards`` so a shard is ~1–4 GB at full scale (100 TB → ~50k
shards); shards far outnumber cores, so the groupby stays balanced.
Only the manifest (one row per shard) returns to the driver.

``fmt="jsonl"`` writes newline-delimited JSON for loaders that want
text lines — serialization is per row by nature; ``parquet`` (the
default) is the scale path.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

__all__ = ["export_shards"]


def _hash_cols(vals: list, seed, n_shards: int) -> tuple[list, np.ndarray]:
    hs = [hashlib.md5(f"{seed}:{v}".encode()).hexdigest() for v in vals]
    shards = np.array([int(h[:8], 16) % n_shards for h in hs], np.int32)
    return hs, shards


def export_shards(
    ds,
    out_dir: str,
    *,
    n_shards: int,
    seed=0,
    key: str = "doc_id",
    columns: list[str] | None = None,
    fmt: str = "parquet",
) -> pa.Table:
    """Export ``ds`` as ``n_shards`` deterministic shard files under
    ``out_dir``; returns the manifest ``(shard, n_rows, first_key,
    last_key, path, skipped)`` sorted by shard.  ``columns`` prunes
    the exported payload; the ``key`` column always stays IN the files
    (loaders resume by it) — only the internal ``__h``/``__shard``
    exchange columns are dropped before writing."""
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be parquet|jsonl: {fmt!r}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    os.makedirs(out_dir, exist_ok=True)

    if columns is not None:
        keep = list(dict.fromkeys([key, *columns]))
        ds = ds.select_columns(keep)

    def assign(t: pa.Table) -> pa.Table:
        hs, shards = _hash_cols(t[key].to_pylist(), seed, n_shards)
        return (
            t.replace_schema_metadata(None)
            .append_column("__h", pa.array(hs, pa.string()))
            .append_column("__shard", pa.array(shards, pa.int32()))
        )

    width = len(str(max(0, n_shards - 1)))
    ext = "parquet" if fmt == "parquet" else "jsonl"

    def write_shard(t: pa.Table) -> pa.Table:
        shard = int(t["__shard"][0].as_py())
        order = pa.compute.sort_indices(
            t, sort_keys=[("__h", "ascending"), (key, "ascending")]
        )
        t = t.take(order)
        first_k = t[key][0].as_py()
        last_k = t[key][t.num_rows - 1].as_py()
        body = t.drop_columns(["__h", "__shard"])
        path = os.path.join(out_dir, f"shard-{shard:0{width}d}.{ext}")
        skipped = os.path.exists(path)
        if not skipped:
            tmp = path + f".tmp-{os.getpid()}"
            if fmt == "parquet":
                import pyarrow.parquet as pq

                pq.write_table(body, tmp, compression="zstd")
            else:
                import json

                with open(tmp, "w") as f:
                    for row in body.to_pylist():
                        f.write(json.dumps(row, default=str) + "\n")
            os.replace(tmp, path)
        return pa.table(
            {
                "shard": pa.array([shard], pa.int64()),
                "n_rows": pa.array([t.num_rows], pa.int64()),
                "first_key": pa.array([first_k]),
                "last_key": pa.array([last_k]),
                "path": pa.array([path], pa.string()),
                "skipped": pa.array([skipped], pa.bool_()),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    manifest_parts = (
        assigned.groupby("__shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .take_all()
    )

    # groupby only yields OCCUPIED shards — a shard the hash never hit
    # still owes its (empty) file and manifest row, or loaders that
    # enumerate 0..n_shards-1 crash on the gap
    seen = {int(r["shard"]) for r in manifest_parts}
    missing = [k for k in range(n_shards) if k not in seen]
    if missing:
        payload_schema = pa.schema(
            [f for f in assigned.schema().base_schema
             if f.name not in ("__h", "__shard")]
        )
        for k in missing:
            path = os.path.join(out_dir, f"shard-{k:0{width}d}.{ext}")
            skipped = os.path.exists(path)
            if not skipped:
                tmp = path + f".tmp-{os.getpid()}"
                if fmt == "parquet":
                    import pyarrow.parquet as pq

                    pq.write_table(payload_schema.empty_table(), tmp,
                                   compression="zstd")
                else:
                    open(tmp, "w").close()
                os.replace(tmp, path)
            manifest_parts.append({
                "shard": k, "n_rows": 0, "first_key": None,
                "last_key": None, "path": path, "skipped": skipped,
            })

    import pandas as pd

    mf = pa.Table.from_pandas(
        pd.DataFrame(manifest_parts), preserve_index=False
    )
    return mf.sort_by([("shard", "ascending")])
