"""Incremental merge: merge(build(A), build(B)) ≡ build(A ∪ B).

Doc ids differ between the merged and from-scratch indexes (base ids +
shifted delta ids vs global url rank), so equivalence is checked on
(url, score): identical BM25 statistics (N, avgdl, df, tf, dl) must
yield identical scores per document.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from docs_indexer_ray.functions.analyzer import Analyzer
from docs_indexer_ray.index.build import build_index
from docs_indexer_ray.index.merge import merge_indexes
from docs_indexer_ray.query.bm25 import score_topk
from docs_indexer_ray.query.reader import IndexReader
from docs_indexer_ray.synth import rich_pages_table

QUERIES = ["node pools", "quota namespace limit", "helm upgrade changelog", "page"]


def _url_map(index_dir: str) -> dict[int, str]:
    t = pads.dataset(os.path.join(index_dir, "docs"), partitioning="hive").to_table(
        columns=["doc_id", "url"]
    )
    return dict(zip(t["doc_id"].to_pylist(), t["url"].to_pylist()))


def _results_by_url(root: str, k: int = 50) -> dict[str, list[tuple[str, float]]]:
    from docs_indexer_ray.index import manifest as mf

    reader = IndexReader(root)
    urls = _url_map(mf.current_build(root))
    an = Analyzer("english")
    out = {}
    for q in QUERIES:
        hits = score_topk(reader, an(q), k=k)
        out[q] = sorted((urls[d], round(s, 9)) for d, s in hits)
    return out


@pytest.mark.parametrize("salt", [False, True])
def test_merge_equals_full_build(ray_session, tmp_path, salt):
    import ray.data

    pages = rich_pages_table(60, dup_every=0)
    half_a = pages.slice(0, 30)
    half_b = pages.slice(30)

    kw = dict(
        num_parts=8,
        salt_heavy=salt,
        heavy_df_ratio=0.2,
        n_salt_runs=4,
    )
    build_index(ray.data.from_arrow(half_a), str(tmp_path / "a"), fingerprint="a", **kw)
    build_index(ray.data.from_arrow(half_b), str(tmp_path / "b"), fingerprint="b", **kw)
    build_index(ray.data.from_arrow(pages), str(tmp_path / "full"), fingerprint="f", **kw)

    man = merge_indexes(str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m"))
    assert man["n_docs"] == 60

    merged = _results_by_url(str(tmp_path / "m"))
    full = _results_by_url(str(tmp_path / "full"))
    for q in QUERIES:
        assert merged[q] == full[q], q


def test_merge_stats_add(ray_session, tmp_path):
    import ray.data

    pages = rich_pages_table(40, dup_every=0)
    build_index(
        ray.data.from_arrow(pages.slice(0, 25)),
        str(tmp_path / "a"),
        fingerprint="a",
        num_parts=8,
        salt_heavy=False,
    )
    build_index(
        ray.data.from_arrow(pages.slice(25)),
        str(tmp_path / "b"),
        fingerprint="b",
        num_parts=8,
        salt_heavy=False,
    )
    man = merge_indexes(str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m"))
    reader = IndexReader(str(tmp_path / "m"))
    assert reader.n_docs == 40
    # every doc has a norm after the merge (carriers survived the shift)
    assert (reader.doclens > 0).all()


@pytest.mark.parametrize("k_inputs", [3, 4])
def test_merge_many_equals_full_build(ray_session, tmp_path, k_inputs):
    import ray.data

    from docs_indexer_ray.index.merge import merge_many

    n = 48
    pages = rich_pages_table(n, dup_every=0)
    step = n // k_inputs
    parts = [pages.slice(i * step, step if i < k_inputs - 1 else n - i * step)
             for i in range(k_inputs)]
    kw = dict(num_parts=8, salt_heavy=False)
    for i, part in enumerate(parts):
        build_index(
            ray.data.from_arrow(part), str(tmp_path / f"p{i}"), fingerprint=f"p{i}", **kw
        )
    build_index(ray.data.from_arrow(pages), str(tmp_path / "full"), fingerprint="f", **kw)

    man = merge_many(
        [str(tmp_path / f"p{i}") for i in range(k_inputs)], str(tmp_path / "m")
    )
    assert man["n_docs"] == n
    merged = _results_by_url(str(tmp_path / "m"))
    full = _results_by_url(str(tmp_path / "full"))
    for q in QUERIES:
        assert merged[q] == full[q], q


def test_merge_carries_extra_chains(ray_session, tmp_path):
    """A multi-field build's trigram/reverse posting tables survive the
    merge (previously they were silently dropped — suggesters died)."""
    import ray.data

    pages = rich_pages_table(40, dup_every=0)
    kw = dict(num_parts=8, salt_heavy=False, extra_chains=["trigram"])
    build_index(
        ray.data.from_arrow(pages.slice(0, 20)), str(tmp_path / "a"), fingerprint="a", **kw
    )
    build_index(
        ray.data.from_arrow(pages.slice(20)), str(tmp_path / "b"), fingerprint="b", **kw
    )
    build_index(ray.data.from_arrow(pages), str(tmp_path / "full"), fingerprint="f", **kw)

    man = merge_indexes(str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m"))
    assert "trigram" in man["chains"]

    merged = IndexReader(str(tmp_path / "m"), chain="trigram")
    full = IndexReader(str(tmp_path / "full"), chain="trigram")
    # suggester surface: same shingle dictionary with the same dfs
    assert merged.prefix_terms("node ", limit=5) == full.prefix_terms("node ", limit=5)
    assert merged.prefix_terms("quota", limit=5) == full.prefix_terms("quota", limit=5)


def test_merge_chain_mismatch_raises(ray_session, tmp_path):
    import ray.data

    pages = rich_pages_table(20, dup_every=0)
    build_index(
        ray.data.from_arrow(pages.slice(0, 10)),
        str(tmp_path / "a"),
        fingerprint="a",
        num_parts=8,
        salt_heavy=False,
        extra_chains=["trigram"],
    )
    build_index(
        ray.data.from_arrow(pages.slice(10)),
        str(tmp_path / "b"),
        fingerprint="b",
        num_parts=8,
        salt_heavy=False,
    )
    with pytest.raises(ValueError, match="chains"):
        merge_indexes(str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m"))


def test_merge_preserves_positions(ray_session, tmp_path):
    """Phrase queries work identically on merged vs full positions
    builds (position streams are shift-invariant; only doc ids move)."""
    import ray.data

    from docs_indexer_ray.query.phrase import match_phrase

    pages = rich_pages_table(40, dup_every=0)
    kw = dict(num_parts=8, salt_heavy=False, chain="simple", field="body",
              store_positions=True)
    build_index(
        ray.data.from_arrow(pages.slice(0, 20)), str(tmp_path / "a"), fingerprint="a", **kw
    )
    build_index(
        ray.data.from_arrow(pages.slice(20)), str(tmp_path / "b"), fingerprint="b", **kw
    )
    build_index(ray.data.from_arrow(pages), str(tmp_path / "full"), fingerprint="f", **kw)
    merge_indexes(str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m"))

    def by_url(root, phrase):
        urls = _url_map(__import__("docs_indexer_ray.index.manifest", fromlist=["m"]).current_build(root))
        return sorted((urls[d], f) for d, f in match_phrase(IndexReader(root), phrase))

    for phrase in (["node", "pools"], ["per", "namespace"]):
        assert by_url(str(tmp_path / "m"), phrase) == by_url(str(tmp_path / "full"), phrase)

    # the merged manifest carries the flag — a reader of the merged
    # index can still tell it has positions
    from docs_indexer_ray.index import manifest as mf

    man = mf.read_manifest(mf.current_build(str(tmp_path / "m")))
    assert man["store_positions"] is True


def test_merge_positions_mismatch_raises(ray_session, tmp_path):
    """Merging a positions build with a non-positions build must fail
    fast at the agreement check, not late inside concat with a schema
    error (which would leave a mixed, partially-positioned index)."""
    import ray.data

    pages = rich_pages_table(20, dup_every=0)
    kw = dict(num_parts=8, salt_heavy=False, chain="simple", field="body")
    build_index(
        ray.data.from_arrow(pages.slice(0, 10)), str(tmp_path / "a"),
        fingerprint="a", store_positions=True, **kw
    )
    build_index(
        ray.data.from_arrow(pages.slice(10)), str(tmp_path / "b"),
        fingerprint="b", store_positions=False, **kw
    )
    with pytest.raises(ValueError, match="store_positions"):
        merge_indexes(str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m"))


def test_merge_carry_deletes_shifts_tombstones(ray_session, tmp_path):
    """carry_deletes=True: each input's tombstones map to id+shift in
    the merged build (a merge shifts, never compacts) and stay hidden
    from every query; default still refuses tombstoned inputs."""
    import numpy as np
    import ray.data

    from docs_indexer_ray.index import manifest as mf
    from docs_indexer_ray.index.deletes import add_deletes, load_delete_ids
    from docs_indexer_ray.index.merge import merge_many
    from docs_indexer_ray.query.reader import IndexReader

    pages = rich_pages_table(40, dup_every=0)
    roots = []
    for i, half in enumerate((pages.slice(0, 20), pages.slice(20))):
        r = str(tmp_path / f"cd{i}")
        build_index(
            ray.data.from_arrow(half), r, fingerprint=f"cd{i}",
            num_parts=4, chain="english", field="body",
        )
        roots.append(r)
    # tombstone doc 3 in input 0 and doc 5 in input 1
    add_deletes(mf.current_build(roots[0]), [3])
    add_deletes(mf.current_build(roots[1]), [5])

    with pytest.raises(ValueError, match="tombstones"):
        merge_many(roots, str(tmp_path / "refuse"), fingerprint="r")

    out = str(tmp_path / "cdm")
    man = merge_many(roots, out, fingerprint="cdm", carry_deletes=True)
    shift = 20  # input 0 has 20 docs
    got = load_delete_ids(mf.current_build(out)).tolist()
    assert got == [3, 5 + shift]
    reader = IndexReader(out)
    assert reader.match_all_count() == int(man["n_docs"]) - 2
    # the tombstoned urls never surface
    urls = _url_map(mf.current_build(out))
    an = Analyzer("english")
    dead = {urls[3], urls[5 + shift]}
    for q in QUERIES:
        hits = score_topk(reader, an(q), k=50)
        assert not ({urls[d] for d, _ in hits} & dead)
