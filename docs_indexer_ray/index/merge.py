"""Index merge: combine a base index and a delta index into one.

The reference gets incrementality for free from OpenSearch (segment
merges happen inside Lucene; the indexer just feeds docs).  Here the
merge is explicit — the piece that makes **incremental builds** work:
index yesterday's crawl once, build a small delta index for today's
pages, merge in O(delta + touched postings) instead of rebuilding.

Semantics:

* delta doc ids are shifted by ``base.n_docs`` (dense ids stay dense;
  base ids — and therefore base posting blocks — are untouched);
* per reduce partition ``k``, a merge task collects each input's term
  rows (including a heavy term's salted runs from their
  ``(part + r) % P`` partitions — the task filters those files by
  computed term partition), decodes via the same stitching logic the
  reader uses, concatenates base-then-delta postings (already
  doc-id-sorted because delta ids all exceed base ids), re-encodes,
  and writes the output segment file atomically;
* the merged index is **unsalted on disk** (a term's runs live as
  multiple rows in its home partition, which the reader already
  stitches in first-doc order), so merged manifests need no heavy-term
  routing;
* global stats are exact: N and total token counts add; df adds per
  term (url sets are expected disjoint — the caller dedups across
  builds by using the delta pipeline's url filter);
* doclens concatenate (dl files are per-partition carrier sets).

Constraint: both inputs must share ``num_parts``, ``analyzer``,
``field`` and ``block_size`` (checked).  BM25 scores after merge are
identical to a from-scratch build over the union corpus (tested —
ranks compared by url since doc ids differ).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codec import encode_postings
from ..stages.tokenize import term_part
from . import manifest as mf
from .segments import SEGMENT_SCHEMA, doclen_path, segment_path

__all__ = ["merge_indexes", "merge_many"]


def merge_many(
    index_dirs: list[str],
    out_root: str,
    *,
    prefix: str = "docs",
    publish: bool = True,
):
    """K-way merge by left-fold of the pairwise per-partition merge.

    Each fold is itself a parallel per-partition pass, so a fold of k
    inputs costs k-1 passes over ever-larger left sides — fine for the
    daily-delta cadence this exists for (k small, deltas small).  A
    single-pass k-way heap merge per partition is the optimization for
    merging many same-sized segments; the per-term concat here already
    generalizes (runs are disjoint id ranges), the fold just sequences
    the id shifting.
    """
    import tempfile

    if len(index_dirs) < 2:
        raise ValueError("merge_many needs >= 2 indexes")
    acc = index_dirs[0]
    tmp_roots = []
    for i, nxt in enumerate(index_dirs[1:]):
        last = i == len(index_dirs) - 2
        root = out_root if last else tempfile.mkdtemp(prefix="dixr_mergetmp_")
        if not last:
            tmp_roots.append(root)
        man = merge_indexes(acc, nxt, root, prefix=prefix, publish=publish or not last)
        acc = root
    for r in tmp_roots:
        shutil.rmtree(r, ignore_errors=True)
    return man


def _load_part_rows(index_dir: str, man: dict, k: int) -> dict[str, list[dict]]:
    """All term rows belonging to home partition ``k`` of one input:
    the rows in seg file k whose home part is k, plus salted runs of
    k's heavy terms found in files (k + r) % P."""
    num_parts = int(man["num_parts"])
    heavy = set(man.get("heavy_terms", ()))
    n_salt = int(man.get("n_salt_runs", 1))
    seg_dir = os.path.join(index_dir, "segments")

    candidates = {k} | {(k + r) % num_parts for r in range(n_salt)} if heavy else {k}
    out: dict[str, list[dict]] = {}
    for rp in sorted(candidates):
        path = segment_path(seg_dir, rp)
        if not os.path.exists(path):
            continue
        t = pq.read_table(path)
        for i in range(t.num_rows):
            term = t["term"][i].as_py()
            if term_part(term, num_parts) != k:
                continue
            if rp != k and term not in heavy:
                continue
            out.setdefault(term, []).append(
                {name: t[name][i].as_py() for name in t.column_names}
            )
    # stitch order: runs are disjoint doc ranges → first-block order
    for rows in out.values():
        rows.sort(key=lambda r: r["block_last"][0] if len(r["block_last"]) else 0)
    return out


def _decode_rows(rows: list[dict]) -> tuple[np.ndarray, np.ndarray]:
    from ..query.segments_io import TermPostings

    tp = TermPostings.from_rows(rows[0]["term"], rows)
    return tp.decode_all()


def merge_indexes(
    base_dir: str,
    delta_dir: str,
    out_root: str,
    *,
    prefix: str = "docs",
    fingerprint: str | None = None,
    publish: bool = True,
):
    """Merge two published builds; returns the merged manifest dict."""
    import ray
    import ray.data

    base_dir = mf.current_build(base_dir) or base_dir
    delta_dir = mf.current_build(delta_dir) or delta_dir
    man_a = mf.read_manifest(base_dir)
    man_b = mf.read_manifest(delta_dir)
    for key in ("num_parts", "analyzer", "field", "block_size"):
        if man_a[key] != man_b[key]:
            raise ValueError(f"merge inputs disagree on {key}: {man_a[key]} != {man_b[key]}")
    num_parts = int(man_a["num_parts"])
    block_size = int(man_a["block_size"])
    n_base = int(man_a["n_docs"])
    n_delta = int(man_b["n_docs"])

    if fingerprint is None:
        fingerprint = f"m{man_a['fingerprint'][:7]}{man_b['fingerprint'][:7]}"
    bdir = mf.build_dir(out_root, prefix, fingerprint)
    seg_dir = os.path.join(bdir, "segments")
    os.makedirs(seg_dir, exist_ok=True)

    shift = np.uint64(n_base)

    def merge_part(batch: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for _, item in batch.iterrows():
            k = int(item["k"])
            seg_file = segment_path(seg_dir, k)
            dl_file = doclen_path(seg_dir, k)
            if not (os.path.exists(seg_file) and os.path.exists(dl_file)):
                rows_a = _load_part_rows(base_dir, man_a, k)
                rows_b = _load_part_rows(delta_dir, man_b, k)

                dl_map = item["dl_map"]
                cols = {name: [] for name in SEGMENT_SCHEMA.names}
                for term in sorted(set(rows_a) | set(rows_b)):
                    ids_parts, tf_parts = [], []
                    if term in rows_a:
                        ia, ta = _decode_rows(rows_a[term])
                        ids_parts.append(ia)
                        tf_parts.append(ta)
                    if term in rows_b:
                        ib, tb = _decode_rows(rows_b[term])
                        ids_parts.append(ib + shift)
                        tf_parts.append(tb)
                    ids = np.concatenate(ids_parts)
                    tfs = np.concatenate(tf_parts)
                    dls = dl_map[ids.astype(np.int64)].astype(np.uint64)
                    enc = encode_postings(ids, tfs, dls, block_size)
                    cols["term"].append(term)
                    cols["rpart"].append(k)
                    for name in (
                        "df",
                        "cf",
                        "doc_ids_enc",
                        "tfs_enc",
                        "block_last",
                        "block_id_offsets",
                        "block_tf_offsets",
                        "block_max_tf",
                        "block_min_dl",
                        "max_tf",
                        "min_dl",
                    ):
                        cols[name].append(enc[name])

                seg = pa.Table.from_pydict(cols, schema=SEGMENT_SCHEMA)
                tmp = seg_file + f".tmp-{os.getpid()}"
                pq.write_table(seg, tmp, compression="zstd")
                os.replace(tmp, seg_file)

                # merged dl carriers: base file k as-is + delta file k shifted
                dl_tabs = []
                pa_base = doclen_path(os.path.join(base_dir, "segments"), k)
                if os.path.exists(pa_base):
                    dl_tabs.append(pq.read_table(pa_base))
                pa_delta = doclen_path(os.path.join(delta_dir, "segments"), k)
                if os.path.exists(pa_delta):
                    td = pq.read_table(pa_delta)
                    dl_tabs.append(
                        pa.table(
                            {
                                "doc_id": pa.array(
                                    td["doc_id"].to_numpy() + shift, pa.uint64()
                                ),
                                "dl": td["dl"],
                            }
                        )
                    )
                dlt = (
                    pa.concat_tables(dl_tabs)
                    if dl_tabs
                    else pa.table({"doc_id": pa.array([], pa.uint64()), "dl": pa.array([], pa.uint32())})
                )
                tmp = dl_file + f".tmp-{os.getpid()}"
                pq.write_table(dlt, tmp, compression="zstd")
                os.replace(tmp, dl_file)

            out_rows.append({"rpart": k, "n_terms": pq.read_metadata(seg_file).num_rows})
        return pd.DataFrame(out_rows)

    # full dl map (doc_id → dl over the merged id space), built once on
    # the driver and broadcast — needed for block-min-dl metadata.  At
    # 10^12 docs this is per-shard state; here one array.
    dl_map = np.zeros(n_base + n_delta, np.uint32)
    for src_dir, off in ((base_dir, 0), (delta_dir, n_base)):
        sdir = os.path.join(src_dir, "segments")
        for f in sorted(os.listdir(sdir)):
            if f.startswith("dl-"):
                t = pq.read_table(os.path.join(sdir, f))
                dl_map[t["doc_id"].to_numpy().astype(np.int64) + off] = t["dl"].to_numpy()
    dl_ref = ray.put(dl_map)

    def merge_with_map(batch: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        batch = batch.copy()
        batch["dl_map"] = [_ray.get(dl_ref)] * len(batch)
        return merge_part(batch)

    items = [{"k": k} for k in range(num_parts)]
    (
        ray.data.from_items(items)
        .repartition(num_parts)
        .map_batches(merge_with_map, batch_size=1, batch_format="pandas")
        .take_all()
    )

    # merged docs store: copy partition links (cheap hardlinks) with the
    # delta's doc ids shifted — rewrite delta parts
    docs_dir = os.path.join(bdir, "docs")
    os.makedirs(docs_dir, exist_ok=True)
    _copy_docs(os.path.join(base_dir, "docs"), docs_dir, 0, 0)
    base_parts = len(
        [d for d in os.listdir(os.path.join(base_dir, "docs")) if d.startswith("docpart=")]
    )
    _copy_docs(os.path.join(delta_dir, "docs"), docs_dir, base_parts, n_base)

    man = {
        **{k: man_a[k] for k in ("prefix", "field", "analyzer", "num_parts", "block_size", "bm25_k1", "bm25_b")},
        "fingerprint": fingerprint,
        "n_docs": n_base + n_delta,
        "n_docs_with_terms": int(man_a.get("n_docs_with_terms", n_base))
        + int(man_b.get("n_docs_with_terms", n_delta)),
        "total_tokens": int(man_a["total_tokens"]) + int(man_b["total_tokens"]),
        "avgdl": 0.0,  # set below
        "heavy_terms": [],
        "n_salt_runs": 1,
        "run_width": 1 << 60,
        "merged_from": [man_a["fingerprint"], man_b["fingerprint"]],
        "partitions": [],
    }
    denom = man["n_docs_with_terms"] or 1
    man["avgdl"] = man["total_tokens"] / denom
    mf.write_manifest(bdir, man)
    if publish:
        mf.publish(out_root, f"{prefix}-{fingerprint}")
    return man


def _copy_docs(src: str, dst: str, part_offset: int, id_offset: int) -> None:
    for d in sorted(os.listdir(src)):
        if not d.startswith("docpart="):
            continue
        k = int(d.split("=")[1]) + part_offset
        out_dir = os.path.join(dst, f"docpart={k}")
        os.makedirs(out_dir, exist_ok=True)
        for f in os.listdir(os.path.join(src, d)):
            src_f = os.path.join(src, d, f)
            dst_f = os.path.join(out_dir, f)
            if os.path.exists(dst_f):
                continue
            if id_offset == 0:
                try:
                    os.link(src_f, dst_f)
                except OSError:
                    shutil.copy2(src_f, dst_f)
            else:
                t = pq.read_table(src_f)
                idx = t.schema.get_field_index("doc_id")
                t = t.set_column(
                    idx,
                    "doc_id",
                    pa.array(t["doc_id"].to_numpy() + np.uint64(id_offset), pa.uint64()),
                )
                pq.write_table(t, dst_f, compression="zstd")
