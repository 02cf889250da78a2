"""Block-max WAND must equal exact TAAT when posting lists span many
blocks — regression for the BMW skip bound (advancing past the pivot
set's minimum block boundary, never an iterator's own).

``block_size=8`` over a 300-doc corpus forces multi-block posting
lists (df ≈ docs for the template vocabulary), heavy score ties, and
real block skips at every k.
"""

from __future__ import annotations

import pytest

from docs_indexer_ray.functions.analyzer import Analyzer
from docs_indexer_ray.index.build import build_index
from docs_indexer_ray.query.bm25 import score_topk, wand_topk
from docs_indexer_ray.query.reader import IndexReader
from docs_indexer_ray.synth import rich_pages_table

QUERIES = [
    "node pools",
    "quota namespace limit cpu ram",
    "helm upgrade changelog rollout",
    "worker nodes immutable",
    "page paragraphs text",
    "stub redirects",
]


@pytest.fixture(scope="module")
def small_block_index(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("bmw"))
    pages = ray.data.from_arrow(rich_pages_table(300, dup_every=0))
    build_index(
        pages,
        out,
        fingerprint="bmw",
        block_size=8,
        salt_heavy=True,
        heavy_df_ratio=0.15,
    )
    return IndexReader(out)


def test_multiblock_wand_equals_exact(small_block_index):
    reader = small_block_index
    an = Analyzer("english")
    assert reader.n_docs == 300
    for q in QUERIES:
        terms = an(q)
        for k in (1, 2, 5, 10, 50, 200):
            exact = score_topk(reader, terms, k=k)
            wand = wand_topk(reader, terms, k=k)
            assert [(d, round(s, 10)) for d, s in exact] == [
                (d, round(s, 10)) for d, s in wand
            ], (q, k)


def test_multiblock_posting_lists_actually_multiblock(small_block_index):
    tp = small_block_index.postings("page")
    assert tp is not None and tp.n_blocks > 3
