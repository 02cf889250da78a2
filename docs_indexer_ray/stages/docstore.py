"""Docs-store build: range-partitioned spill + per-partition reduce.

The scalable phase-1 layout (extract → dedup → dense doc ids → store)
as ONE map pass over pages plus two parallel per-partition task rounds
— no Ray sort shuffle, no ``materialize()``:

1. **Boundary sample** — urls with ``crc32(url) % sample_mod == 0``
   (a value property, parallelism-invariant) collected to the driver,
   sorted, quantiled into ``num_parts-1`` range boundaries.  Callers
   that can derive boundaries more cheaply (e.g. the synthetic-pages
   flagship, whose url set is a pure function of the seed table) pass
   them in via ``boundaries=`` and skip this pass.  Boundaries affect
   only partition *balance*: doc ids are the global url rank and come
   out identical for any boundary choice.
2. **Extract + spill** — pages → ``ExtractAssemble`` → ``docpart =
   searchsorted(boundaries, url)``, each batch written as ONE spill
   file sorted by docpart with a row group per docpart slice (the
   map-output-file shuffle layout — file count tracks batch count, not
   tasks × partitions).
3. **Count round** — per partition, filter-read only ``url``: the
   deduped row count is ``n_distinct(url)``.  Driver cumsums counts in
   part order (= url order, because partitions are url *ranges*) into
   dense doc-id offsets.
4. **Finalize round** — per partition, filter-read all columns, keep
   the max ``(warc_ts, body)`` row per url (vectorized last-of-run over
   one sorted pass), sort by url, assign ``doc_id = offset + arange``,
   and atomically write ``docs/docpart=K/part.parquet``.

Determinism: boundaries, dedup winners and id ranks are all functions
of row *values*, so any parallelism level yields identical ids — the
property the reference's rank-identity requirement rests on.  Each
partition file write is atomic; a rerun skips finished partitions.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .extract import ExtractAssemble

__all__ = ["build_docs_store", "sample_url_boundaries"]


def _crc_sample_urls(batch: pa.Table, mod: int) -> pa.Table:
    urls = batch["url"].to_pylist()
    keep = [u for u in urls if zlib.crc32(u.encode()) % mod == 0]
    return pa.table({"url": pa.array(keep, pa.string())})


def _quantile_boundaries(sample_urls: list[str], num_parts: int) -> list[str]:
    sample_urls = sorted(sample_urls)
    if len(sample_urls) >= num_parts * 4:
        idx = np.linspace(0, len(sample_urls) - 1, num_parts + 1).astype(int)[1:-1]
        return [sample_urls[i] for i in idx]
    return sample_urls[: num_parts - 1]


def sample_url_boundaries(pages_ds, num_parts: int, sample_mod: int = 16) -> list[str]:
    """Generic boundary sampling (one url-only pass over pages)."""
    sample = pages_ds.map_batches(
        lambda t: _crc_sample_urls(t, sample_mod), batch_format="pyarrow"
    )
    return _quantile_boundaries([r["url"] for r in sample.take_all()], num_parts)


class _ExtractSpill:
    """Map side: extract+assemble, tag docpart, write one rpart-sorted
    spill file per batch (row group per docpart).

    File names are content-derived (digest of the batch's first/last
    (url, warc_ts) + row count): per-process sequence numbers overwrite
    earlier tasks' files when Ray re-deserializes the callable per
    task, and content names stay idempotent under task retries."""

    def __init__(self, spill_dir: str, boundaries: list[str], type_label: str):
        self.spill_dir = spill_dir
        self.bounds = np.array(boundaries, dtype=object)
        self.extract = ExtractAssemble(type_label=type_label)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        first_url = batch["url"][0].as_py() if batch.num_rows else ""
        last_url = batch["url"][-1].as_py() if batch.num_rows else ""
        ts0 = str(batch["warc_ts"][0].value) if batch.num_rows else "0"
        tag = hashlib.sha1(
            f"{first_url}|{last_url}|{ts0}|{batch.num_rows}".encode()
        ).hexdigest()[:16]

        out = self.extract(batch)
        urls = np.array(out["url"].to_pylist(), dtype=object)
        part = np.searchsorted(self.bounds, urls, side="right").astype(np.int32)
        out = out.append_column("docpart", pa.array(part, pa.int32()))
        order = np.argsort(part, kind="stable")
        out = out.take(pa.array(order))
        parts_sorted = part[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], parts_sorted[1:] != parts_sorted[:-1]))
        )
        bounds = np.append(bounds, len(parts_sorted))

        name = f"dspill-{tag}.parquet"
        path = os.path.join(self.spill_dir, name)
        tmp = f"{path}.tmp-{os.getpid()}"
        writer = pq.ParquetWriter(tmp, out.schema)
        for i in range(len(bounds) - 1):
            writer.write_table(out.slice(bounds[i], bounds[i + 1] - bounds[i]))
        writer.close()
        os.replace(tmp, path)
        return pa.table({"file": pa.array([name]), "rows": pa.array([out.num_rows])})


def build_docs_store(
    pages_ds,
    spill_dir: str,
    docs_dir: str,
    *,
    num_parts: int = 32,
    type_label: str = "page",
    sample_mod: int = 16,
    batch_size: int = 2048,
    boundaries: list[str] | None = None,
) -> tuple[int, int]:
    """Run phases 1–4 (module docstring); returns ``(n_docs,
    n_extract_errors)`` — rows that degrade (SURVEY §4 never-fail
    rule) are kept, tagged in ``extract_error``, and counted."""
    import ray
    import ray.data
    import pyarrow.dataset as pads

    import sys
    import time as _time

    _dbg = os.environ.get("DIXR_TIMING")
    _t = _time.time()

    if boundaries is None:
        boundaries = sample_url_boundaries(pages_ds, num_parts, sample_mod)
    if _dbg:
        print(f"[t] boundaries {_time.time()-_t:.1f}s", file=sys.stderr); _t=_time.time()

    os.makedirs(spill_dir, exist_ok=True)
    pages_ds.map_batches(
        _ExtractSpill(spill_dir, boundaries, type_label),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).take_all()
    if _dbg:
        print(f"[t] extract+spill {_time.time()-_t:.1f}s", file=sys.stderr); _t=_time.time()

    items = [{"docpart": k, "path": spill_dir} for k in range(len(boundaries) + 1)]

    # -- 3: per-part deduped counts (url column only, row-group pruned) ---
    def count_part(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in batch.iterrows():
            dset = pads.dataset(r["path"], format="parquet")
            t = dset.to_table(
                filter=pads.field("docpart") == int(r["docpart"]), columns=["url"]
            )
            rows.append(
                {"docpart": int(r["docpart"]), "n": len(pc.unique(t["url"]))}
            )
        return pd.DataFrame(rows)

    counts = (
        ray.data.from_items(items)
        .repartition(max(1, len(items)))
        .map_batches(count_part, batch_size=1, batch_format="pandas")
        .take_all()
    )
    if _dbg:
        print(f"[t] count round {_time.time()-_t:.1f}s", file=sys.stderr); _t=_time.time()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["docpart"]):
        offsets[r["docpart"]] = acc
        acc += r["n"]
    n_docs = acc

    # -- 4: per-part dedup + ids + final write ----------------------------
    def finalize_part(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in batch.iterrows():
            rp = int(r["docpart"])
            out_dir = os.path.join(docs_dir, f"docpart={rp}")
            out_file = os.path.join(out_dir, "part.parquet")
            if os.path.exists(out_file):  # resume
                rows.append({"docpart": rp, "n": pq.read_metadata(out_file).num_rows})
                continue
            dset = pads.dataset(r["path"], format="parquet")
            t = dset.to_table(filter=pads.field("docpart") == rp)
            if t.num_rows == 0:
                rows.append({"docpart": rp, "n": 0})
                continue
            sort_keys = [("url", "ascending"), ("warc_ts", "ascending")] + (
                [("body", "ascending")] if "body" in t.column_names else []
            )
            t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
            urls = np.array(t["url"].to_pylist(), dtype=object)
            is_last = np.empty(len(urls), dtype=bool)
            is_last[-1] = True
            np.not_equal(urls[:-1], urls[1:], out=is_last[:-1])
            t = t.take(pa.array(np.flatnonzero(is_last)))
            ids = np.arange(t.num_rows, dtype=np.uint64) + offsets[rp]
            t = t.append_column("doc_id", pa.array(ids, pa.uint64()))
            n_err = (
                t.num_rows - t["extract_error"].null_count
                if "extract_error" in t.column_names
                else 0
            )
            os.makedirs(out_dir, exist_ok=True)
            tmp = out_file + f".tmp-{os.getpid()}"
            pq.write_table(t, tmp, compression="zstd")
            os.replace(tmp, out_file)
            rows.append({"docpart": rp, "n": t.num_rows, "n_err": n_err})
        return pd.DataFrame(rows)

    fin = (
        ray.data.from_items(items)
        .repartition(max(1, len(items)))
        .map_batches(finalize_part, batch_size=1, batch_format="pandas")
        .take_all()
    )
    n_errors = int(sum(r.get("n_err") or 0 for r in fin))
    if _dbg:
        print(f"[t] finalize round {_time.time()-_t:.1f}s", file=sys.stderr)
    return n_docs, n_errors
