"""Compaction / reindex equivalence: expunging soft deletes must be
indistinguishable from a from-scratch build over the surviving pages,
and a docs-store reindex must equal a fresh build with the new
settings."""

import os

import numpy as np
import pyarrow as pa
import pytest


def _build(pages, root, **kw):
    import ray.data

    from docs_indexer_ray.index.build import build_index

    kw.setdefault("num_parts", 6)
    kw.setdefault("chain", "simple")
    kw.setdefault("field", "body")
    return build_index(ray.data.from_arrow(pages), root, **kw)


def test_compact_equals_fresh_build_over_survivors(ray_session, tmp_path):
    from docs_indexer_ray.index import manifest as mf
    from docs_indexer_ray.index.compact import compact_index
    from docs_indexer_ray.index.deletes import add_deletes, load_delete_ids
    from docs_indexer_ray.query.bm25 import topk
    from docs_indexer_ray.query.reader import IndexReader
    from docs_indexer_ray.synth import rich_pages_table

    pages = rich_pages_table(60, dup_every=0)
    src = str(tmp_path / "src")
    _build(pages, src, fingerprint="s")

    # tombstone 9 docs (incl. doc 0 and a contiguous run)
    victims = [0, 7, 8, 9, 23, 31, 40, 41, 58]
    add_deletes(src, victims)

    out = str(tmp_path / "compacted")
    man = compact_index(src, out)
    assert man["n_docs"] == 60 - len(victims)

    # fresh build over the SURVIVING pages (same url order)
    r_src = IndexReader(src)
    dead_urls = set(
        r_src.fetch_docs(victims, columns=["doc_id", "url"])["url"].to_pylist()
    )
    keep = pa.array([u not in dead_urls for u in pages["url"].to_pylist()])
    fresh_root = str(tmp_path / "fresh")
    _build(pages.filter(keep), fresh_root, fingerprint="f")

    rc, rf = IndexReader(out), IndexReader(fresh_root)
    assert rc.n_docs == rf.n_docs
    assert rc.match_all_count() == rf.match_all_count()
    # no tombstones survive compaction
    assert len(load_delete_ids(out)) == 0
    # statistics identical
    assert rc.avgdl == rf.avgdl
    for t in ["node", "pools", "the", "cluster"]:
        assert rc.term_df(t) == rf.term_df(t), t
    # identical hits AND scores (fresh statistics, remapped dense ids)
    for q in (["node", "pools"], ["quota"], ["the", "changelog"]):
        assert topk(rc, q, k=10) == topk(rf, q, k=10), q
    # same stored docs in the same id order
    tc = rc.fetch_docs(list(range(rc.n_docs)), columns=["doc_id", "url"])
    tf_ = rf.fetch_docs(list(range(rf.n_docs)), columns=["doc_id", "url"])
    assert sorted(zip(tc["doc_id"].to_pylist(), tc["url"].to_pylist())) == sorted(
        zip(tf_["doc_id"].to_pylist(), tf_["url"].to_pylist())
    )

    # compaction is resumable/idempotent: second call short-circuits to
    # the same fingerprint dir and stays equivalent
    man2 = compact_index(src, out)
    assert man2["fingerprint"] == man["fingerprint"]
    assert topk(IndexReader(out), ["node", "pools"], k=5) == topk(
        rf, ["node", "pools"], k=5
    )


def test_compact_resume_reuses_finished_docparts(ray_session, tmp_path):
    """An interrupted compaction resumes: already-written output
    docparts are reused (mtime unchanged), and the finished build is
    still correct."""
    import time as _time

    from docs_indexer_ray.index import manifest as mf
    from docs_indexer_ray.index.compact import compact_index
    from docs_indexer_ray.index.deletes import add_deletes
    from docs_indexer_ray.query.reader import IndexReader
    from docs_indexer_ray.synth import rich_pages_table

    pages = rich_pages_table(40, dup_every=0)
    src = str(tmp_path / "src")
    _build(pages, src, fingerprint="s")
    add_deletes(src, [3, 17, 25])

    out = str(tmp_path / "cmp")
    man1 = compact_index(src, out, publish=False)
    bdir = mf.build_dir(out, man1["prefix"], man1["fingerprint"])
    docs_dir = os.path.join(bdir, "docs")
    # simulate interruption AFTER the docs rewrite: drop the manifest +
    # segments, keep docs — rerun must reuse the docpart files
    import shutil

    shutil.rmtree(os.path.join(bdir, "segments"))
    os.remove(os.path.join(bdir, "manifest.json"))
    before = {
        p: os.path.getmtime(os.path.join(docs_dir, p, f))
        for p in os.listdir(docs_dir)
        for f in os.listdir(os.path.join(docs_dir, p))
    }
    _time.sleep(0.05)
    man2 = compact_index(src, out)
    after = {
        p: os.path.getmtime(os.path.join(docs_dir, p, f))
        for p in os.listdir(docs_dir)
        for f in os.listdir(os.path.join(docs_dir, p))
    }
    assert before == after  # resume skip: no docpart rewritten
    assert man2["fingerprint"] == man1["fingerprint"]
    r = IndexReader(out)
    assert r.n_docs == 37 and r.match_all_count() == 37


def test_reindex_new_chain_equals_fresh_build(ray_session, tmp_path):
    from docs_indexer_ray.index.compact import reindex_index
    from docs_indexer_ray.index.deletes import add_deletes
    from docs_indexer_ray.query.bm25 import topk
    from docs_indexer_ray.query.phrase import match_phrase
    from docs_indexer_ray.query.reader import IndexReader
    from docs_indexer_ray.synth import rich_pages_table

    pages = rich_pages_table(50, dup_every=0)
    src = str(tmp_path / "src")
    _build(pages, src, fingerprint="s")

    # reindex: same docs, english chain + positions
    out = str(tmp_path / "reidx")
    man = reindex_index(src, out, chain="english", store_positions=True)
    assert man["analyzer"] == "english" and man["store_positions"] is True

    fresh_root = str(tmp_path / "fresh")
    _build(pages, fresh_root, fingerprint="f", chain="english", store_positions=True)

    rr, rf = IndexReader(out), IndexReader(fresh_root)
    assert rr.n_docs == rf.n_docs and rr.avgdl == rf.avgdl
    for q in (["node", "pool"], ["cluster"]):
        assert topk(rr, q, k=10) == topk(rf, q, k=10), q
    assert match_phrase(rr, ["node", "pool"]) == match_phrase(rf, ["node", "pool"])

    # tombstoned source refuses reindex (would resurrect deletes)
    add_deletes(src, [1, 2])
    with pytest.raises(ValueError, match="tombstones"):
        reindex_index(src, str(tmp_path / "nope"))


def test_incremental_update_equals_full_rebuild(ray_session, tmp_path):
    """Nightly-delta flow: base over half the corpus + incremental
    update with the FULL corpus (overlap must be skipped) ≡ a
    from-scratch build over everything — same hits per url; and a
    second update with nothing new is a no-op."""
    import ray.data

    from docs_indexer_ray.index import manifest as mf
    from docs_indexer_ray.pipelines.incremental import incremental_update
    from docs_indexer_ray.query.bm25 import topk
    from docs_indexer_ray.query.reader import IndexReader
    from docs_indexer_ray.synth import rich_pages_table

    pages = rich_pages_table(60, dup_every=0)
    urls = pages["url"].to_pylist()
    half = pa.array([u <= sorted(urls)[29] for u in urls])
    base_root = str(tmp_path / "base")
    _build(pages.filter(half), base_root, fingerprint="b")

    out_root = str(tmp_path / "merged")
    for mode in ("exact", "bloom"):
        man = incremental_update(
            base_root,
            ray.data.from_arrow(pages),  # full corpus: 30 seen + 30 new
            out_root + mode,
            filter_mode=mode,
            fingerprint="d1" + mode,
        )
        assert man["n_docs"] == 60, mode  # overlap skipped, not duplicated

        fresh_root = str(tmp_path / ("fresh" + mode))
        _build(pages, fresh_root, fingerprint="f")
        rm, rf = IndexReader(out_root + mode), IndexReader(fresh_root)
        assert rm.n_docs == rf.n_docs
        for q in (["node", "pools"], ["the", "changelog"]):
            def urls_of(reader, hits):
                t = reader.fetch_docs([d for d, _ in hits], columns=["doc_id", "url"])
                m = dict(zip(t["doc_id"].to_pylist(), t["url"].to_pylist()))
                return [(m[d], round(s, 9)) for d, s in hits]

            assert urls_of(rm, topk(rm, q, k=10)) == urls_of(rf, topk(rf, q, k=10)), (
                mode,
                q,
            )

    # idempotent: updating again with the same corpus changes nothing
    man2 = incremental_update(
        out_root + "exact",
        ray.data.from_arrow(pages),
        str(tmp_path / "noop"),
        fingerprint="d2",
    )
    assert man2["n_docs"] == 60
    assert man2["fingerprint"] == mf.read_manifest(
        mf.current_build(out_root + "exact")
    )["fingerprint"]


def test_incremental_updates_same_second_dont_collide(ray_session, tmp_path):
    """Two incremental updates within the same wall-clock second must
    not share a delta build dir (the old second-resolution fingerprint
    made the second update resume the FIRST batch's segment files —
    wrong docs indexed, silently)."""
    import pyarrow as pa
    import ray.data

    from docs_indexer_ray.index.build import build_index
    from docs_indexer_ray.pipelines.incremental import incremental_update
    from docs_indexer_ray.query.reader import IndexReader
    from docs_indexer_ray.synth import rich_pages_table

    root = str(tmp_path / "fastidx")
    build_index(
        ray.data.from_arrow(rich_pages_table(20, dup_every=0)), root,
        fingerprint="base", num_parts=2, chain="simple", field="body",
    )

    def page(url, body):
        return pa.table(
            {
                "url": pa.array([url], pa.string()),
                "warc_ts": pa.array([1], pa.int64()).cast(pa.timestamp("us")),
                "html": pa.array(
                    [f"<html><body><p>{body}</p></body></html>".encode()],
                    pa.binary(),
                ),
                "text": pa.array([""], pa.string()),
                "lang": pa.array(["en"], pa.string()),
            }
        )

    # back-to-back, no sleep — lands in the same strftime second
    incremental_update(root, ray.data.from_arrow(page("https://f/1/", "quokka")), root)
    incremental_update(root, ray.data.from_arrow(page("https://f/2/", "wombat")), root)

    reader = IndexReader(root)
    from docs_indexer_ray.query.facets import match_doc_ids

    assert len(match_doc_ids(reader, ["quokka"])) == 1
    assert len(match_doc_ids(reader, ["wombat"])) == 1  # was 0 pre-fix


def test_filter_docpart_ignores_stale_tmp_and_stray_files(tmp_path):
    """A crashed prior task's *.tmp-<pid> in the OUTPUT docpart must be
    removed on resume (directory-discovery readers would ingest it as
    data), and non-.parquet strays in the SOURCE must never be read or
    linked."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docs_indexer_ray.index.compact import _filter_docpart

    src = tmp_path / "src" / "docpart=0"
    out = tmp_path / "out" / "docpart=0"
    src.mkdir(parents=True)
    out.mkdir(parents=True)
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.uint64()),
                  "body": pa.array(["a", "b", "c"])})
    pq.write_table(t, src / "part-0.parquet")
    # stray files a crashed run could leave in either directory
    (src / "part-0.parquet.tmp-999").write_bytes(b"truncated garbage")
    (out / "part-0.parquet.tmp-999").write_bytes(b"truncated garbage")

    n = _filter_docpart(str(src), str(out), np.array([1], np.int64))
    assert n == 2
    names = sorted(p.name for p in out.iterdir())
    assert names == ["part-0.parquet"]  # stale tmp removed, no stray copied
    got = pq.read_table(out / "part-0.parquet")
    assert got["doc_id"].to_pylist() == [0, 1]  # re-id'd dense
    assert got["body"].to_pylist() == ["a", "c"]
