"""Shuffle-spill integrity: no batch may be lost or overwritten.

Regression for a silent-data-loss bug: spill file names derived from
(worker pid, per-instance sequence) collide when Ray re-deserializes
the map callable per task — the sequence restarts while the pid
persists, and later tasks overwrite earlier tasks' files.  Names are
now content-derived (min doc_id / first-row digest), which is also
idempotent under task retries.

The test forces many batches per worker (small batch_size, more blocks
than CPUs) and asserts exact row conservation end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from docs_indexer_ray.index.build import build_index
from docs_indexer_ray.query.reader import IndexReader
from docs_indexer_ray.stages.extract import ExtractAssemble
from docs_indexer_ray.stages.tokenize import Tokenizer, TokenizeSpill
from docs_indexer_ray.synth import rich_pages_table


def test_tokenize_spill_conserves_rows(ray_session, tmp_path):
    import ray.data

    pages = rich_pages_table(300, dup_every=0)
    docs = ExtractAssemble()(pages)
    docs = docs.append_column(
        "doc_id", pa.array(np.arange(docs.num_rows, dtype=np.uint64))
    ).select(["doc_id", "text"])

    expected = Tokenizer(field="text", chain="english", num_parts=8)(docs).num_rows

    spill = str(tmp_path / "spill")
    import os

    os.makedirs(spill)
    (
        ray.data.from_arrow(docs)
        .repartition(10)  # more tasks than the 4 test CPUs
        .map_batches(
            TokenizeSpill(spill, field="text", chain="english", num_parts=8),
            batch_format="pyarrow",
            batch_size=16,  # many batches per task
        )
        .take_all()
    )
    assert pads.dataset(spill).count_rows() == expected


def test_full_build_conserves_docs_under_many_batches(ray_session, tmp_path):
    """End-to-end: many small input blocks → every doc lands in the
    store and every posting in the index (checked via match_all + a
    term whose df must equal n_docs)."""
    import ray.data

    pages = rich_pages_table(240, dup_every=0)
    ds = ray.data.from_arrow(pages).repartition(12)
    res = build_index(
        ds, str(tmp_path / "idx"), fingerprint="spill", num_parts=8, salt_heavy=False
    )
    assert res["n_docs"] == 240
    reader = IndexReader(str(tmp_path / "idx"))
    # 'page' appears in every rich body's url path segment catch-all
    tp = reader.postings("page")
    assert tp is not None and tp.df == 240
    assert int(reader.doclens.astype(np.int64).sum()) == res["total_tokens"]


def test_stale_spill_files_are_ignored(ray_session, tmp_path):
    """A crashed earlier attempt can leave content-named spill files
    with DIFFERENT batch boundaries in the spill dir; the reduce must
    read only the just-written lineage file list or postings double-
    count silently (df/tf inflation)."""
    import shutil

    import numpy as np
    import ray.data

    from docs_indexer_ray.index.build import build_index
    from docs_indexer_ray.query.reader import IndexReader
    from docs_indexer_ray.synth import rich_pages_table

    pages = rich_pages_table(30, dup_every=0)
    kw = dict(num_parts=8, salt_heavy=False, chain="simple", field="body")

    # clean reference build
    build_index(ray.data.from_arrow(pages), str(tmp_path / "ref"), fingerprint="r", **kw)
    ref = IndexReader(str(tmp_path / "ref"))

    # simulate the crash: pre-seed the scratch with a stale spill file
    # whose name no fresh batch will reproduce (different boundaries)
    scratch = tmp_path / "scratch"
    spill = scratch / "spill-simple"
    spill.mkdir(parents=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    stale = pa.table(
        {
            "term": pa.array(["page"] * 5).dictionary_encode(),
            "doc_id": pa.array(np.arange(5, dtype=np.uint64)),
            "tf": pa.array(np.full(5, 7, np.uint32)),
            "dl": pa.array(np.full(5, 9, np.uint32)),
            "rpart": pa.array(np.full(5, 0, np.int32)),
            "dlc": pa.array([True] * 5),
        }
    )
    pq.write_table(stale, spill / "spill-999999999999-5.parquet")

    build_index(
        ray.data.from_arrow(pages),
        str(tmp_path / "out"),
        fingerprint="o",
        scratch_dir=str(scratch),
        **kw,
    )
    got = IndexReader(str(tmp_path / "out"))

    # identical statistics and postings — the stale file contributed 0
    assert got.manifest["total_tokens"] == ref.manifest["total_tokens"]
    for term in ("page", "node", "the"):
        a, b = got.decode_all(term), ref.decode_all(term)
        if a is None:
            assert b is None
            continue
        assert (a[0] == b[0]).all() and (a[1] == b[1]).all()


def test_extract_spill_tag_covers_full_batch(ray_session, tmp_path):
    """Two DIFFERENT batches sharing first/last url, first warc_ts and
    row count must spill to DIFFERENT files — an endpoint-only tag let
    the second os.replace silently drop the first batch's rows."""
    import pyarrow as pa

    from docs_indexer_ray.stages.docstore import _ExtractSpill

    def batch(mid_url, mid_ts):
        return pa.table(
            {
                "url": pa.array(
                    ["https://s/a/", mid_url, "https://s/z/"], pa.string()
                ),
                "warc_ts": pa.array([1, mid_ts, 3], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "html": pa.array(
                    [b"<html><body><p>x</p></body></html>"] * 3, pa.binary()
                ),
                "text": pa.array([""] * 3, pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
            }
        )

    import os

    sd = str(tmp_path / "spill")
    os.makedirs(sd)
    sp = _ExtractSpill(sd, ["https://s/m/"], "docs")
    sp(batch("https://s/b/", 2))
    sp(batch("https://s/c/", 2))   # differs only in the middle url
    sp(batch("https://s/b/", 9))   # differs only in a middle timestamp
    files = [f for f in os.listdir(sd) if f.endswith(".parquet")]
    assert len(files) == 3, files
