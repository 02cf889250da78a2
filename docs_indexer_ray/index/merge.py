"""Index merge: combine k published indexes into one, in one pass.

The reference gets incrementality for free from OpenSearch (segment
merges happen inside Lucene; the indexer just feeds docs).  Here the
merge is explicit — the piece that makes **incremental builds** work:
index yesterday's crawl once, build a small delta index for today's
pages, merge in O(touched segment rows) instead of rebuilding.

Design — the merge never decodes or re-encodes postings:

* input ``i``'s doc ids are shifted by ``Σ n_docs`` of inputs before
  it (dense ids stay dense; the first input is untouched);
* the reader already stitches a term stored as SEVERAL rows (salted
  runs — ``query/segments_io.py``): runs are disjoint ascending doc-id
  ranges presented as one flat block sequence.  The merged segment
  file therefore simply contains every input's rows for the term,
  sorted by (term, first block doc id) — a term that exists in k
  inputs has k rows, exactly like a salted heavy term;
* shifting a row's encoded ids by a constant only changes each
  block's FIRST varint (blocks restart delta-encoding at an absolute
  doc id — ``functions/codec.py``); intra-block deltas are invariant.
  The merge patches those varints byte-level and adds the shift to
  ``block_last``; ``tfs_enc``, ``block_max_tf``, ``block_min_dl``,
  ``df``/``cf`` are untouched.  No per-posting ``dl`` is ever needed,
  so the O(n_docs) driver-side dl map of the naive design disappears;
* per reduce partition ``k``, a merge task collects each input's home
  rows (including a heavy term's salted runs from their ``(part + r)
  % P`` files), patches, concatenates, sorts by term and writes the
  output segment file atomically — one parallel ``ray.remote`` round;
* the merged index is **unsalted on disk** (a term's runs live as
  multiple rows in its home partition, which the reader stitches),
  so merged manifests need no heavy-term routing;
* extra analyzer chains (D8 multi-field builds) merge the same way,
  per ``segments-<chain>/`` dir, and their stats carry into the
  merged manifest — a multi-field merge loses nothing;
* global stats are exact: N and token counts add; df adds per term
  (url sets are expected disjoint — the caller dedups across builds
  by using the delta pipeline's url filter);
* doclens concatenate with the shift (dl files are per-partition
  carrier sets).

Constraint: all inputs must share ``num_parts``, ``analyzer``,
``field``, ``block_size`` and the extra-chain set (checked).  BM25
scores after merge are identical to a from-scratch build over the
union corpus — same postings, same stats; only block *boundaries*
differ, which affects WAND skipping, never scores (tested — ranks
compared by url since doc ids differ).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codec import varint_decode, varint_encode
from ..stages.tokenize import term_part
from . import manifest as mf
from .segments import SEGMENT_SCHEMA, doclen_path, segment_path

__all__ = ["merge_indexes", "merge_many"]


def _shift_encoded_ids(
    enc: bytes, id_offsets: list[int], shift: int
) -> tuple[bytes, list[int]]:
    """Add ``shift`` to every encoded doc id by patching each block's
    first (absolute) varint; all other bytes are reused verbatim."""
    mv = memoryview(enc)
    chunks: list[bytes] = []
    new_off = [0]
    s = np.uint64(shift)
    for j in range(len(id_offsets) - 1):
        block = mv[id_offsets[j] : id_offsets[j + 1]]
        b = np.frombuffer(block, np.uint8)
        end = int(np.flatnonzero((b & 0x80) == 0)[0])  # first varint's last byte
        first = varint_decode(block[: end + 1])[0]
        chunk = varint_encode(np.array([first + s], np.uint64)) + bytes(block[end + 1 :])
        chunks.append(chunk)
        new_off.append(new_off[-1] + len(chunk))
    return b"".join(chunks), new_off


def _load_home_rows(seg_dir: str, stats: dict, k: int) -> pa.Table | None:
    """One input's segment rows whose home partition is ``k`` — the
    rows in file k plus salted runs of k's heavy terms found in files
    ``(k + r) % P`` (and *minus* other terms' salted runs parked in
    file k)."""
    num_parts = int(stats["num_parts"])
    heavy = set(stats.get("heavy_terms", ()))
    n_salt = int(stats.get("n_salt_runs", 1))
    candidates = (
        sorted({k} | {(k + r) % num_parts for r in range(n_salt)}) if heavy else [k]
    )
    tabs = []
    for rp in candidates:
        path = segment_path(seg_dir, rp)
        if not os.path.exists(path):
            continue
        t = pq.read_table(path)
        if heavy:
            keep = [term_part(x, num_parts) == k for x in t["term"].to_pylist()]
            t = t.filter(pa.array(keep, pa.bool_()))
        if t.num_rows:
            tabs.append(t)
    if not tabs:
        return None
    return pa.concat_tables(tabs)


def _shift_rows(t: pa.Table, shift: int, k: int) -> pa.Table:
    """Patch one input's rows to the merged id space (see module doc)."""
    n = t.num_rows
    t = t.set_column(
        t.schema.get_field_index("rpart"),
        "rpart",
        pa.array(np.full(n, k, np.int32), pa.int32()),
    )
    if shift == 0:
        return t
    enc_col = t["doc_ids_enc"].to_pylist()
    off_col = t["block_id_offsets"].to_pylist()
    bl_col = t["block_last"].to_pylist()
    new_enc, new_off, new_bl = [], [], []
    for enc, offs, bl in zip(enc_col, off_col, bl_col):
        e2, o2 = _shift_encoded_ids(enc, offs, shift)
        new_enc.append(e2)
        new_off.append(o2)
        new_bl.append([x + shift for x in bl])
    t = t.set_column(
        t.schema.get_field_index("doc_ids_enc"),
        "doc_ids_enc",
        pa.array(new_enc, pa.binary()),
    )
    t = t.set_column(
        t.schema.get_field_index("block_id_offsets"),
        "block_id_offsets",
        pa.array(new_off, pa.list_(pa.uint32())),
    )
    t = t.set_column(
        t.schema.get_field_index("block_last"),
        "block_last",
        pa.array(new_bl, pa.list_(pa.uint64())),
    )
    return t


def _merge_part(inputs: list[dict], k: int, out_seg_dir: str) -> dict:
    """Task: merge partition ``k`` of all inputs (segment + dl file).

    ``inputs``: per input ``{seg_dir, stats, shift}`` in merge order.
    """
    seg_file = segment_path(out_seg_dir, k)
    dl_file = doclen_path(out_seg_dir, k)
    if not (os.path.exists(seg_file) and os.path.exists(dl_file)):  # resume skip
        tabs = []
        for inp in inputs:
            t = _load_home_rows(inp["seg_dir"], inp["stats"], k)
            if t is not None:
                tabs.append(_shift_rows(t, inp["shift"], k))
        if tabs:
            merged = pa.concat_tables(tabs)
            terms = np.asarray(merged["term"].to_pylist(), dtype=object)
            firsts = np.array(
                [bl[0] if len(bl) else 0 for bl in merged["block_last"].to_pylist()],
                np.uint64,
            )
            order = np.lexsort((firsts, terms))
            merged = merged.take(pa.array(order))
        else:
            merged = SEGMENT_SCHEMA.empty_table()
        tmp = seg_file + f".tmp-{os.getpid()}"
        pq.write_table(merged, tmp, compression="zstd")
        os.replace(tmp, seg_file)

        dl_tabs = []
        for inp in inputs:
            path = doclen_path(inp["seg_dir"], k)
            if not os.path.exists(path):
                continue
            td = pq.read_table(path)
            if inp["shift"]:
                td = pa.table(
                    {
                        "doc_id": pa.array(
                            td["doc_id"].to_numpy() + np.uint64(inp["shift"]),
                            pa.uint64(),
                        ),
                        "dl": td["dl"],
                    }
                )
            dl_tabs.append(td)
        dlt = (
            pa.concat_tables(dl_tabs)
            if dl_tabs
            else pa.table(
                {"doc_id": pa.array([], pa.uint64()), "dl": pa.array([], pa.uint32())}
            )
        )
        tmp = dl_file + f".tmp-{os.getpid()}"
        pq.write_table(dlt, tmp, compression="zstd")
        os.replace(tmp, dl_file)

    return {"rpart": k, "n_terms": pq.read_metadata(seg_file).num_rows}


def _chain_stats(stats_list: list[dict]) -> dict:
    tot = sum(int(s.get("total_tokens", 0)) for s in stats_list)
    nwt = sum(int(s.get("n_docs_with_terms", 0)) for s in stats_list)
    return {
        "n_docs_with_terms": nwt,
        "total_tokens": tot,
        "avgdl": tot / nwt if nwt else 0.0,
        "heavy_terms": [],
        "n_salt_runs": 1,
        "run_width": 1 << 60,
    }


def merge_many(
    index_dirs: list[str],
    out_root: str,
    *,
    prefix: str = "docs",
    fingerprint: str | None = None,
    publish: bool = True,
    carry_deletes: bool = False,
):
    """Single-pass k-way merge of published builds; returns the merged
    manifest dict.  Each partition is merged by one task reading the
    partition's rows from every input once — no left-fold re-encode.

    ``carry_deletes=False`` (the compaction-intent default) REFUSES
    inputs with live tombstones; ``carry_deletes=True`` carries them
    forward instead — a merge only SHIFTS ids (never compacts holes),
    so each input's tombstoned ids map to ``id + shift`` exactly, and
    their union becomes the merged build's ``deletes.parquet``
    (Lucene keeps deleted docs across merges the same way until a
    rewrite reclaims them).  The serving write path uses this so
    ``_bulk`` keeps working after a ``_delete_by_query``."""
    import ray

    if len(index_dirs) < 2:
        raise ValueError("merge_many needs >= 2 indexes")
    dirs = [mf.current_build(d) or d for d in index_dirs]
    mans = [mf.read_manifest(d) for d in dirs]
    from .deletes import load_delete_ids

    input_deletes = [load_delete_ids(d) for d in dirs]
    if not carry_deletes:
        for d, dels in zip(dirs, input_deletes):
            if len(dels):
                raise ValueError(
                    f"input {d} has live tombstones (deletes.parquet): a merge "
                    "re-ids docs densely, so soft deletes must be compacted "
                    "first — rebuild from the filtered source, then merge "
                    "(or pass carry_deletes=True to shift them forward)"
                )
    for key in ("num_parts", "analyzer", "field", "block_size", "store_positions"):
        vals = {str(m.get(key, False if key == "store_positions" else None)) for m in mans}
        if len(vals) > 1:
            raise ValueError(f"merge inputs disagree on {key}: {sorted(vals)}")
    store_positions = bool(mans[0].get("store_positions", False))
    chain_sets = {tuple(sorted(m.get("chains", {}))) for m in mans}
    if len(chain_sets) > 1:
        raise ValueError(
            f"merge inputs disagree on extra chains: {sorted(chain_sets)}"
        )
    extra_chains = sorted(next(iter(chain_sets)))
    num_parts = int(mans[0]["num_parts"])

    if fingerprint is None:
        # hash the FULL concatenation — truncating the concatenation
        # itself collides for >8 inputs sharing a prefix, and the
        # resume-skip in _merge_part would then silently reuse another
        # merge's segment files
        import hashlib

        cat = "\0".join(m["fingerprint"] for m in mans)
        fingerprint = "m" + hashlib.sha1(cat.encode()).hexdigest()[:16]
    bdir = mf.build_dir(out_root, prefix, fingerprint)

    shifts = []
    acc = 0
    for m in mans:
        shifts.append(acc)
        acc += int(m["n_docs"])
    n_total = acc

    merge_task = ray.remote(num_cpus=1)(_merge_part)
    chains_out: dict[str, dict] = {}
    for chain_name in [None, *extra_chains]:
        seg_name = "segments" if chain_name is None else f"segments-{chain_name}"
        out_seg = os.path.join(bdir, seg_name)
        os.makedirs(out_seg, exist_ok=True)
        inputs = []
        for d, m, s in zip(dirs, mans, shifts):
            stats = m if chain_name is None else m["chains"][chain_name]
            stats = {**stats, "num_parts": num_parts}
            inputs.append(
                {"seg_dir": os.path.join(d, seg_name), "stats": stats, "shift": s}
            )
        inputs_ref = ray.put(inputs)
        ray.get([merge_task.remote(inputs_ref, k, out_seg) for k in range(num_parts)])
        if chain_name is not None:
            chains_out[chain_name] = _chain_stats(
                [m["chains"][chain_name] for m in mans]
            )

    # merged docs store: hardlink the first input's partitions (shift
    # 0), rewrite the rest with shifted ids — one task per
    # (input, docpart), mirroring the segment round above.  The driver
    # only lists directories; all corpus-scale bytes move in workers.
    docs_dir = os.path.join(bdir, "docs")
    os.makedirs(docs_dir, exist_ok=True)
    copy_task = ray.remote(num_cpus=1)(_copy_docpart)
    jobs = []
    part_off = 0
    for d, s in zip(dirs, shifts):
        src = os.path.join(d, "docs")
        parts = sorted(x for x in os.listdir(src) if x.startswith("docpart="))
        for pd in parts:
            k = int(pd.split("=")[1]) + part_off
            jobs.append(
                copy_task.remote(
                    os.path.join(src, pd), os.path.join(docs_dir, f"docpart={k}"), s
                )
            )
        part_off += len(parts)
    ray.get(jobs)

    # vector sidecars ride along: knn/hybrid keep serving on the merged
    # build instead of silently dying after an incremental update
    from .vectors import carry_sidecars

    carry_sidecars(dirs, shifts, n_total, bdir)

    man = {
        **{
            k: mans[0][k]
            for k in (
                "prefix",
                "field",
                "analyzer",
                "num_parts",
                "block_size",
                "bm25_k1",
                "bm25_b",
            )
        },
        "store_positions": store_positions,
        "fingerprint": fingerprint,
        "n_docs": n_total,
        **_chain_stats(mans),
        "chains": chains_out,
        "merged_from": [m["fingerprint"] for m in mans],
        "partitions": [],
    }
    if carry_deletes:
        shifted = [
            dels.astype(np.int64) + s
            for dels, s in zip(input_deletes, shifts)
            if len(dels)
        ]
        if shifted:
            from .deletes import DELETES_FILE

            merged_dels = np.unique(np.concatenate(shifted))
            tmp = os.path.join(bdir, DELETES_FILE + f".tmp-{os.getpid()}")
            pq.write_table(
                pa.table({"doc_id": pa.array(merged_dels, pa.int64())}),
                tmp,
                compression="zstd",
            )
            os.replace(tmp, os.path.join(bdir, DELETES_FILE))
    mf.write_manifest(bdir, man)
    if publish:
        mf.publish(out_root, f"{prefix}-{fingerprint}")
    return man


def merge_indexes(
    base_dir: str,
    delta_dir: str,
    out_root: str,
    *,
    prefix: str = "docs",
    fingerprint: str | None = None,
    publish: bool = True,
):
    """Merge two published builds (k=2 case of :func:`merge_many`)."""
    return merge_many(
        [base_dir, delta_dir],
        out_root,
        prefix=prefix,
        fingerprint=fingerprint,
        publish=publish,
    )


def _copy_docpart(src_dir: str, out_dir: str, id_offset: int) -> int:
    """Task body: copy ONE input docpart directory into the merged docs
    store — hardlink fast-path for shift 0, id-shift rewrite otherwise.
    Atomic per file (tmp + replace); existing outputs are a resume skip."""
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for f in sorted(os.listdir(src_dir)):
        src_f = os.path.join(src_dir, f)
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
            tmp = dst_f + f".tmp-{os.getpid()}"
            pq.write_table(t, tmp, compression="zstd")
            os.replace(tmp, dst_f)
        n += 1
    return n
