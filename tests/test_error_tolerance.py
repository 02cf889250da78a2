"""Per-row error tolerance: a poisoned pages table must still build,
with the bad rows degraded, tagged, and counted (SURVEY §4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from docs_indexer_ray.index.build import build_index
from docs_indexer_ray.query.reader import IndexReader
from docs_indexer_ray.stages.extract import ExtractAssemble
from docs_indexer_ray.synth import rich_pages_table


def _poisoned_pages() -> pa.Table:
    t = rich_pages_table(20, dup_every=0)
    html = t["html"].to_pylist()
    html[3] = None  # null payload
    html[7] = None
    t = t.set_column(t.schema.get_field_index("html"), "html", pa.array(html, pa.binary()))
    return t


def test_extract_batch_degrades_not_raises():
    out = ExtractAssemble()(_poisoned_pages())
    errs = out["extract_error"].to_pylist()
    assert errs.count("extract:null") == 2
    assert sum(e is not None for e in errs) == 2
    bad = out.filter(pa.compute.is_valid(out["extract_error"]))
    assert all(b == "" for b in bad["body"].to_pylist())


def test_build_counts_errors_and_serves(ray_session, tmp_path):
    import ray.data

    res = build_index(
        ray.data.from_arrow(_poisoned_pages()),
        str(tmp_path / "idx"),
        fingerprint="err1",
        salt_heavy=False,
    )
    assert res["n_docs"] == 20  # bad rows kept (dedup-able, queryable store)
    assert res["n_extract_errors"] == 2
    reader = IndexReader(str(tmp_path / "idx"))
    assert reader.match_all_count() == 20
    # degraded docs have no tokens → absent from postings, dl == 0
    from docs_indexer_ray.functions.analyzer import Analyzer
    from docs_indexer_ray.query.bm25 import topk

    hits = topk(reader, Analyzer("english")("node pools"), k=20)
    assert hits  # good rows still searchable
