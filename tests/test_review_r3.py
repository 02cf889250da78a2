"""Regressions for the round-3 review findings over the newest ops:
empty-batch filter masks, curate text_col threading, survivor_path,
openapi out_col collision, k-means duplicate-partial fold, and the
capped-mode miss contract of ngram_jaccard_pairs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs far "
    "away to find some other animals that live in the forest with "
    "many different kinds of trees and plants growing near the river "
    "bank where water flows gently downstream past the old stone "
    "bridge that people built many years ago for crossing safely"
)


def test_gopher_filter_passes_empty_blocks(ray_session):
    """A 0-row Arrow block must stream through, not crash on a
    null-typed filter mask."""
    import ray

    from docs_indexer_ray.ops.textstats import gopher_filter

    ds = ray.data.from_arrow([_docs([]), _docs([GOOD])])
    out = gopher_filter(ds, min_words=10).take_all()
    assert [r["doc_id"] for r in out] == [0]


def test_filter_clean_passes_empty_blocks(ray_session):
    import ray

    from docs_indexer_ray.ops.decontaminate import filter_clean, ngram_set

    grams = ngram_set(["an eval question that is long enough here ok"], n=5)
    ds = ray.data.from_arrow([_docs([]), _docs([GOOD])])
    out = filter_clean(ds, grams, n=5).take_all()
    assert [r["doc_id"] for r in out] == [0]


def test_ngram_jaccard_text_col(ray_session):
    """text_col is honored end-to-end: identical pairs whether the
    text lives in 'text' or 'body' — and a decoy 'text' column must
    NOT be consulted."""
    import ray

    from docs_indexer_ray.ops.dedup import ngram_jaccard_pairs

    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon eta",
        "one two three four five six",
    ]
    base = ngram_jaccard_pairs(
        ray.data.from_arrow(_docs(texts)), n=2, threshold=0.3
    ).take_all()
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "body": pa.array(texts, pa.string()),
            # decoy: identical strings — would emit 3 bogus pairs
            "text": pa.array(["same decoy text here"] * 3, pa.string()),
        }
    )
    out = ngram_jaccard_pairs(
        ray.data.from_arrow(tbl), n=2, threshold=0.3, text_col="body"
    ).take_all()
    key = lambda r: (r["a"], r["b"])
    assert sorted(map(key, out)) == sorted(map(key, base)) == [(0, 1)]


def test_curate_text_col_and_survivor_path(ray_session, tmp_path):
    """curate_corpus over a non-default text column, with and without
    survivor_path, returns the same training order."""
    import ray

    from docs_indexer_ray.pipelines.curate import curate_corpus

    texts = [GOOD, GOOD, GOOD + " extra tail words here now"] + [
        f"document number {i} " + GOOD for i in range(5)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "body": pa.array(texts, pa.string()),
        }
    )

    def run(**kw):
        out = curate_corpus(
            ray.data.from_arrow(tbl),
            jaccard_threshold=0.9,
            min_words=10,
            text_col="body",
            **kw,
        ).take_all()
        return [r["doc_id"] for r in out]

    a = run()
    b = run(survivor_path=str(tmp_path / "survivors"))
    assert a == b
    assert 0 in a and 1 not in a  # exact dup dropped, keeper kept


def test_openapi_out_col_replaces_existing(ray_session):
    import ray

    from docs_indexer_ray.functions.openapi import openapi_properties_text

    tbl = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["old text"], pa.string()),
            "schema": pa.array(
                ["properties:\n  name:\n    description: The name\n"],
                pa.string(),
            ),
        }
    )
    out = openapi_properties_text(ray.data.from_arrow(tbl))
    t = pa.concat_tables(
        [pa.table(b) if not isinstance(b, pa.Table) else b for b in
         out.iter_batches(batch_format="pyarrow", batch_size=None)]
    )
    assert t.column_names.count("text") == 1
    assert "name" in t["text"][0].as_py()
    assert "old text" not in t["text"][0].as_py()


def test_fit_kmeans_fold_handles_duplicate_partials():
    """The driver fold must accumulate duplicate cluster ids within one
    table (np.add.at), not last-write-wins fancy indexing: two partial
    tables concatenated into one block repeat cluster ids."""
    # replicate the fold body over a synthetic concatenated-partial table
    k, d = 3, 4
    counts = np.zeros(k, np.int64)
    sums = np.zeros((k, d), np.float64)
    t = pa.table(
        {
            "cluster": pa.array([0, 1, 0, 1, 2], pa.int64()),
            "count": pa.array([2, 3, 4, 5, 6], pa.int64()),
            "sum": pa.array(
                [[1.0] * d, [2.0] * d, [3.0] * d, [4.0] * d, [5.0] * d],
                pa.large_list(pa.float64()),
            ),
        }
    )
    cl = t["cluster"].to_numpy(zero_copy_only=False)
    np.add.at(counts, cl, t["count"].to_numpy(zero_copy_only=False))
    np.add.at(sums, cl, np.array(t["sum"].to_pylist(), np.float64))
    assert counts.tolist() == [6, 8, 6]
    assert sums[0, 0] == 4.0 and sums[1, 0] == 6.0


def test_fit_kmeans_invariant_to_block_layout(ray_session):
    """End-to-end: same centroids whether the corpus arrives as one
    block or many (the fold must be layout-independent)."""
    import ray

    from docs_indexer_ray.ops.cluster import fit_kmeans

    rng = np.random.default_rng(7)
    emb = rng.normal(size=(60, 8))
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(60)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in emb], pa.large_list(pa.float64())
            ),
        }
    )
    one = fit_kmeans(ray.data.from_arrow(tbl), n_clusters=4, iters=3)
    many = fit_kmeans(
        ray.data.from_arrow([tbl.slice(i * 6, 6) for i in range(10)]),
        n_clusters=4,
        iters=3,
    )
    assert np.allclose(one, many, atol=1e-9)


def test_capped_mode_miss_contract_pinned(ray_session):
    """The documented capped-mode contract: a pair is absent iff its
    EVERY shared gram is hot.  Docs A,B share only a hot gram but are
    each candidates via cool-gram pairs — A-B is (by contract) missed;
    the cool-gram pairs survive with exact values."""
    import ray

    from docs_indexer_ray.ops.dedup import ngram_jaccard_pairs

    hot = "hot shared gram"
    # A=0 pairs with C=2 via cool grams; B=1 pairs with D=3 likewise.
    # A and B share ONLY the hot gram (present in every doc).
    texts = [
        f"{hot} alpha beta gamma delta",  # A
        f"{hot} one two three four",  # B
        f"{hot} alpha beta gamma epsilon",  # C
        f"{hot} one two three five",  # D
    ] + [f"{hot} filler{i} pad{i} x{i} y{i}" for i in range(8)]
    ds = ray.data.from_arrow(_docs(texts))

    exact = ngram_jaccard_pairs(ds, n=3, threshold=0.1, hot_gram_cap=None)
    exact_pairs = {(r["a"], r["b"]): r["jaccard"] for r in exact.take_all()}
    assert (0, 1) in exact_pairs  # via the hot gram only

    capped = ngram_jaccard_pairs(ds, n=3, threshold=0.1, hot_gram_cap=3)
    capped_pairs = {(r["a"], r["b"]): r["jaccard"] for r in capped.take_all()}
    # contract: the only missing pairs are those whose every shared
    # gram is hot; every emitted value is exact (matches exact mode)
    assert (0, 2) in capped_pairs and (1, 3) in capped_pairs
    assert (0, 1) not in capped_pairs
    for k, v in capped_pairs.items():
        assert v == pytest.approx(exact_pairs[k], abs=0)
