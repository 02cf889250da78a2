"""End-to-end corpus curation — the composed pipeline a 100 TB
training-data run actually executes, built entirely from the engine's
individually-oracled operators:

1. **exact dedup** (`ops/dedup.py::exact_dedup_apply`) — keep-first
   per exact text; (md5, id) through one shuffle, dup-scale dropped
   set broadcast.
2. **near-dup removal** — n-gram-Jaccard pairs
   (`ngram_jaccard_pairs`) → transitive closure
   (`connected_components`) → canonical member per cluster
   (`canonical_docs`, output-scale broadcast).
3. **quality filter** (`ops/textstats.py::gopher_filter`) — the
   Gopher rules as a streaming row filter.
4. **benchmark decontamination**
   (`ops/decontaminate.py::filter_clean`) — drop docs sharing any
   dirty n-gram with a broadcast eval set (GPT-3 rule).
5. **reproducible training order** (`ops/sample.py::seeded_shuffle`)
   — md5(seed:id) sort, a value property of the data.

Every stage is streaming or one-shuffle; the only cross-stage
materialization is the exact-dedup survivor set, which downstream is
consumed twice (gram explode + canonical filter) — at corpus scale
point the pipeline at Parquet and pass ``survivor_path`` so stage-1
output is written once and re-READ instead of held in the object
store (the docs-store pattern); in-memory ``materialize()`` is the
single-box default.

Because every stage is deterministic and SQL-replayable (the
near-dup leg uses the exact Jaccard path, not MinHash), the ENTIRE
composed pipeline is verified hash-exact against one DuckDB query —
see ``__ray_entry__.py::q_curate`` / ``oracle_sql()['curate']``.
"""

from __future__ import annotations

from ..ops.components import canonical_docs, connected_components
from ..ops.decontaminate import filter_clean, ngram_set
from ..ops.dedup import exact_dedup_apply, ngram_jaccard_pairs
from ..ops.sample import seeded_shuffle
from ..ops.textstats import gopher_filter

__all__ = ["curate_corpus"]


def curate_corpus(
    ds,
    eval_texts=(),
    *,
    jaccard_n: int = 3,
    jaccard_threshold: float = 0.5,
    min_words: int = 50,
    decontam_n: int = 13,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    gopher_kwargs: dict | None = None,
    hot_gram_cap: int | None | str = "auto",
    survivor_path: str | None = None,
):
    """Run the five-stage curation chain over ``ds`` and return the
    surviving corpus in the seed-deterministic training order (all
    input columns preserved).

    ``survivor_path``: optional directory; when given, stage-1 output
    is written there as Parquet once and re-READ by the two downstream
    consumers instead of being held in the object store — the
    corpus-scale configuration (see the module docstring)."""
    # 1. exact dedup (keep-first)
    survivors = exact_dedup_apply(ds, key=text_col, id_col=id_col)
    # consumed twice below (gram explode + canonical filter): hold the
    # survivor set once instead of re-running the digest passes
    if survivor_path is not None:
        import ray.data as rd

        survivors.write_parquet(survivor_path)
        survivors = rd.read_parquet(survivor_path)
    else:
        survivors = survivors.materialize()

    # 2. near-dup: exact n-gram Jaccard → components → canonical-only
    pairs = ngram_jaccard_pairs(
        survivors,
        n=jaccard_n,
        threshold=jaccard_threshold,
        id_col=id_col,
        hot_gram_cap=hot_gram_cap,
        text_col=text_col,
    )
    comp = connected_components(pairs, a="a", b="b")
    canon = canonical_docs(survivors, comp, id_col=id_col)

    # 3. quality (Gopher rules, streaming row filter)
    quality = gopher_filter(
        canon, min_words=min_words, text_col=text_col, **(gopher_kwargs or {})
    )

    # 4. decontamination vs the broadcast eval-gram set
    clean = (
        filter_clean(
            quality,
            ngram_set(list(eval_texts), n=decontam_n),
            n=decontam_n,
            text_col=text_col,
        )
        if eval_texts
        else quality
    )

    # 5. reproducible training order
    return seeded_shuffle(clean, seed=seed, key=id_col)
