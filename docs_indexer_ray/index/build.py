"""End-to-end index build: ``pages`` Dataset → published on-disk index.

The Ray-Data-shaped rebuild of the reference's run loop
(``/root/reference/hugo.py:397-483`` — SURVEY §3.1/§3.3), with the
OpenSearch-delegated index construction done explicitly:

    pages ─ map_batches(ExtractAssemble) ──────────── stateless tasks
          ─ groupby(url).map_groups(keep-latest) ──── shuffle #1 (dedup)
          ─ assign_doc_ids (sample → part → offsets)─ shuffle #2 (range)
          ─ write docs store (parquet, by docpart) ── checkpoint A
    docs  ─ map_batches(Tokenizer actor pool) ─────── analyzer, D1
          ─ groupby(rpart).map_groups(SegmentEncoder) shuffle #3 (term,
            hash-partitioned, heavy terms salted) ─── checkpoint B
          ─ stats aggregate (N, avgdl) ── manifest ── atomic publish

Scale notes (the 100 TB story):

* The only all-to-all exchanges are the three labelled shuffles; the
  postings shuffle dominates and is keyed by ``crc32(term) % P`` with
  df-heavy terms salted across doc-id-range runs (learned from a
  deterministic ~1/64 doc sample — a tiny pre-pass, not a second full
  tokenization).
* The docs store is written before tokenization, so the expensive
  extraction runs exactly once per build and a resumed build re-reads
  the checkpoint instead of re-extracting (per-partition lineage in
  the manifest; segment files skip themselves, see segments.py).
* Nothing materializes the full dataset on the driver; the one
  ``materialize()`` pins the *deduped docs* in the object store only
  within the docs-store phase because id assignment needs three cheap
  passes over it (sample / count / assign) — at multi-node scale this
  is the natural spill-backed checkpoint before the store write.
"""

from __future__ import annotations

import os
import time
import zlib

import numpy as np
import pyarrow as pa

from ..stages.docid import assign_doc_ids, dedup_latest
from ..stages.extract import ExtractAssemble
from ..stages.tokenize import Tokenizer
from . import manifest as mf
from .segments import SegmentEncoder

__all__ = ["build_index", "IndexBuildResult"]


class IndexBuildResult(dict):
    """manifest dict + .index_dir attribute."""

    index_dir: str


def _detect_heavy_terms(
    docs_ds,
    field: str,
    chain: str,
    n_docs: int,
    heavy_df_ratio: float,
    sample_mod: int = 64,
) -> set[str]:
    """Deterministic sampled df pre-pass → terms with estimated
    df/N above ``heavy_df_ratio`` (the salting candidates)."""
    from collections import Counter

    from ..functions.analyzer import Analyzer

    def sample_counts(batch: pa.Table) -> pa.Table:
        analyzer = Analyzer(chain)
        c: Counter = Counter()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch[field].to_pylist()
        for did, text in zip(ids, texts):
            if int(did) % sample_mod:
                continue
            c.update(set(analyzer(text or "")))
        return pa.table(
            {
                "term": pa.array(list(c.keys()), pa.string()),
                "df": pa.array(np.fromiter(c.values(), np.int64, len(c)), pa.int64()),
            }
        )

    parts = docs_ds.select_columns(["doc_id", field]).map_batches(
        sample_counts, batch_format="pyarrow"
    )
    from ray.data.aggregate import Sum

    agg = parts.groupby("term").aggregate(Sum("df", alias_name="df")).take_all()
    # doc ids are dense 0..n-1 → the sample size is exact, no extra pass
    total_sampled = max(1, -(-n_docs // sample_mod))
    thresh = heavy_df_ratio * total_sampled
    return {r["term"] for r in agg if r["df"] >= thresh}


def build_index(
    pages_ds,
    out_root: str,
    *,
    prefix: str = "docs",
    field: str = "text",
    chain: str = "english",
    num_parts: int | None = None,
    block_size: int = 128,
    type_label: str = "page",
    input_paths: list[str] | None = None,
    fingerprint: str | None = None,
    salt_heavy: bool = True,
    heavy_df_ratio: float = 0.25,
    n_salt_runs: int = 8,
    concurrency: int | None = None,
    skip_if_current: bool = True,
    publish: bool = True,
) -> IndexBuildResult:
    """Build (or resume) an index from a pages Dataset; returns manifest.

    ``fingerprint`` names the build (default: digest of ``input_paths``
    or a timestamp — the blog indexer's datetime naming,
    ``blog.py:180-181``).  If the published CURRENT already points at
    this fingerprint the build short-circuits like the reference's
    ``check_index`` (``hugo.py:424-427``).
    """
    import ray

    t0 = time.time()
    if fingerprint is None:
        fingerprint = (
            mf.input_fingerprint(input_paths) if input_paths else time.strftime("%Y%m%d%H%M%S")
        )
    if skip_if_current and mf.is_current(out_root, prefix, fingerprint):
        bdir = mf.current_build(out_root)
        res = IndexBuildResult(mf.read_manifest(bdir))
        res.index_dir = bdir
        res["resumed_current"] = True
        return res

    cpus = int(ray.cluster_resources().get("CPU", 8))
    if num_parts is None:
        num_parts = max(8, 2 * cpus)
    if concurrency is None:
        concurrency = max(2, cpus - 2)

    bdir = mf.build_dir(out_root, prefix, fingerprint)
    seg_dir = os.path.join(bdir, "segments")
    docs_dir = os.path.join(bdir, "docs")
    os.makedirs(seg_dir, exist_ok=True)

    # ---- phase 1: extract → dedup → doc ids → docs store ---------------
    docs_done = os.path.join(bdir, "_DOCS_DONE")
    if os.path.exists(docs_done):
        import json

        with open(docs_done) as f:
            docs_meta = json.load(f)
        n_docs = docs_meta["n_docs"]
    else:
        ds = pages_ds.map_batches(
            ExtractAssemble(type_label=type_label),
            batch_format="pyarrow",
            batch_size=256,
        )
        ds = dedup_latest(ds)
        ds = ds.materialize()  # 3 cheap passes follow (see module docstring)
        ds, n_docs = assign_doc_ids(ds, num_parts=max(8, cpus))
        ds.write_parquet(docs_dir, partition_cols=["docpart"])
        import json

        docs_meta = {"n_docs": n_docs, "wall_s": time.time() - t0}
        tmp = docs_done + ".tmp"
        with open(tmp, "w") as f:
            json.dump(docs_meta, f)
        os.replace(tmp, docs_done)

    # ---- phase 2: tokenize → postings shuffle → segments ---------------
    t1 = time.time()
    docs_ds = ray.data.read_parquet(docs_dir, columns=["doc_id", field])

    heavy: set[str] = set()
    run_width = 1 << 60
    if salt_heavy and n_docs > 0:
        heavy = _detect_heavy_terms(docs_ds, field, chain, n_docs, heavy_df_ratio)
        run_width = max(1, -(-n_docs // n_salt_runs))  # ceil

    postings = docs_ds.map_batches(
        Tokenizer(
            field=field,
            chain=chain,
            num_parts=num_parts,
            heavy_terms=heavy,
            run_width=run_width,
        ),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=concurrency,
    )
    encoder = SegmentEncoder(seg_dir, block_size)

    def encode_group(group):
        return encoder(group)

    lineage = postings.groupby("rpart").map_groups(encode_group, batch_format="pandas")
    lineage_rows = lineage.take_all()

    # ---- phase 3: stats + manifest + publish ---------------------------
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    dl_files = sorted(
        os.path.join(seg_dir, f) for f in os.listdir(seg_dir) if f.startswith("dl-")
    )
    dl_sum = 0
    dl_n = 0
    for f in dl_files:
        t = pq.read_table(f, columns=["dl"])
        dl_sum += int(pc.sum(t["dl"]).as_py() or 0)
        dl_n += t.num_rows
    avgdl = (dl_sum / dl_n) if dl_n else 0.0

    man = {
        "prefix": prefix,
        "fingerprint": fingerprint,
        "field": field,
        "analyzer": chain,
        "num_parts": num_parts,
        "block_size": block_size,
        "n_docs": n_docs,
        "n_docs_with_terms": dl_n,
        "total_tokens": dl_sum,
        "avgdl": avgdl,
        "bm25_k1": 1.2,
        "bm25_b": 0.75,
        "heavy_terms": sorted(heavy),
        "n_salt_runs": n_salt_runs if heavy else 1,
        "run_width": run_width,
        "partitions": [
            {k: (int(v) if isinstance(v, (np.integer,)) else v) for k, v in r.items()}
            for r in sorted(lineage_rows, key=lambda r: r["rpart"])
        ],
        "timings_s": {
            "docs_store": round(t1 - t0, 3),
            "index": round(time.time() - t1, 3),
            "total": round(time.time() - t0, 3),
        },
    }
    mf.write_manifest(bdir, man)
    if publish:
        mf.publish(out_root, f"{prefix}-{fingerprint}")

    res = IndexBuildResult(man)
    res.index_dir = bdir
    return res
