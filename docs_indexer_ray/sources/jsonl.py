"""JSONL corpus source — the dominant LLM-training-corpus interchange
format (Dolma, RedPajama, The Pile, FineWeb dumps all ship
``*.jsonl[.gz]`` shards: one JSON object per line).

``read_jsonl`` ingests sharded JSONL with the same file-wise
parallelism contract as ``sources/warc.py::read_warc``: one archive
file per input block (the corpus's own sharding IS the parallelism),
parsing inside ``map_batches`` tasks, strict schema handling:

* ``required`` columns must be present in every record — a missing
  key raises loudly (silent nulls hide corpus corruption);
* unexpected keys are KEPT in an ``extras`` JSON-string column (the
  same dynamic-extras contract as the hugo front-matter assembly,
  ``stages/extract.py``), so no producer field is ever dropped.

``write_jsonl_shards`` is the deterministic fixture writer (sorted
keys, ``\\n``-joined, optional gzip with fixed mtime) used by the
round-trip tests and the driver query.
"""

from __future__ import annotations

import gzip
import io
import json

import pyarrow as pa

__all__ = ["read_jsonl", "write_jsonl_shards"]


def _parse_lines(raw: bytes, required: tuple[str, ...]) -> pa.Table:
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    cols: dict[str, list] = {c: [] for c in required}
    extras: list[str | None] = []
    for ln, line in enumerate(raw.splitlines()):
        if not line.strip():
            continue
        obj = json.loads(line)
        if not isinstance(obj, dict):
            raise ValueError(f"line {ln}: JSONL record is not an object")
        for c in required:
            if c not in obj:
                raise ValueError(f"line {ln}: missing required key {c!r}")
            cols[c].append(obj[c])
        rest = {k: v for k, v in obj.items() if k not in cols}
        extras.append(json.dumps(rest, sort_keys=True) if rest else None)
    out = {c: pa.array(cols[c]) for c in required}
    out["extras"] = pa.array(extras, pa.string())
    return pa.table(out)


def read_jsonl(paths, required: tuple[str, ...] = ("doc_id", "text")):
    """``ray.data.Dataset`` from JSONL shard files (plain or ``.gz``).

    File-wise parallel; loud failure on records missing a
    ``required`` key; producer-side extra keys survive in ``extras``."""
    import ray.data

    ds = ray.data.read_binary_files(paths)

    def expand(batch: pa.Table) -> pa.Table:
        tables = [_parse_lines(b.as_py(), tuple(required)) for b in batch["bytes"]]
        if not tables:
            fields = [pa.field(c, pa.null()) for c in required]
            return pa.schema(fields + [pa.field("extras", pa.string())]).empty_table()
        # permissive concat: a zero-record shard infers null-typed
        # columns, and shards may legitimately drift in inferred types
        # (int vs double doc_id) — a strict concat failed the whole read
        return pa.concat_tables(tables, promote_options="permissive")

    return ds.map_batches(expand, batch_format="pyarrow")


def write_jsonl_shards(
    table: pa.Table, out_dir: str, n_shards: int = 4, compress: bool = True
) -> list[str]:
    """Deterministic JSONL shard writer (fixture + export helper):
    row order preserved, keys sorted, gzip with zeroed mtime so the
    bytes are a pure function of the data."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    rows = table.to_pylist()
    per = (len(rows) + n_shards - 1) // n_shards
    paths = []
    for i in range(n_shards):
        shard = rows[i * per : (i + 1) * per]
        if not shard:
            break
        body = "\n".join(json.dumps(r, sort_keys=True) for r in shard).encode()
        ext = ".jsonl.gz" if compress else ".jsonl"
        p = os.path.join(out_dir, f"part-{i:05d}{ext}")
        if compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(body)
            data = buf.getvalue()
        else:
            data = body
        with open(p, "wb") as f:
            f.write(data)
        paths.append(p)
    return paths
