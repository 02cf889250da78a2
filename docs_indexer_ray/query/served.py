"""Query serving tier: a pool of Ray actors each holding reader state.

The reference serves queries from OpenSearch (a long-lived process
with loaded segment state); the rebuild's equivalent is an actor pool
where each actor loads an :class:`IndexReader` ONCE in ``__init__``
(term dictionary, norms array, postings cache, file handles) and
answers queries from warm state — the actor-pool rule for stateful
stages applied to the read path (SURVEY §7 step 7).

Two tiers:

* :class:`QueryService` — replica pool: every actor holds the whole
  index; provides query *throughput* (concurrent queries).
* :class:`ShardedQueryService` — capacity/latency tier: each actor
  serves a doc-id RANGE shard (its norms slice + range-limited posting
  decode — ``IndexReader(doc_range=…)`` + ``bm25.score_topk_range``).
  BM25 scores are globally comparable because N/avgdl/df are global
  statistics, so the per-shard top-k merge is **exact** (tested ≡ the
  local reader).  This removes the dense-TAAT O(n_docs) per-query
  floor: each shard pays O(n_docs / n_shards) and shards score in
  parallel.

Everything dispatched through :class:`QueryService` is exactly the
library's local query path (`bm25.topk`, `phrase.phrase_topk`,
`suggest.Suggester`), so results are identical to a local reader by
construction (tested).
"""

from __future__ import annotations

import numpy as np

__all__ = ["QueryActor", "QueryService", "ShardQueryActor", "ShardedQueryService"]


class QueryActor:
    """One serving actor: reader + analyzer + suggester, loaded once."""

    def __init__(self, index_root: str, chain: str | None = None):
        from ..functions.analyzer import Analyzer
        from .reader import IndexReader

        self.reader = IndexReader(index_root, chain=chain)
        self.analyzer = Analyzer(self.reader.chain)
        self._suggester = None

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        from .bm25 import topk

        return topk(self.reader, self.analyzer(query), k=k)

    def phrase(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        from .phrase import phrase_topk

        return phrase_topk(self.reader, self.analyzer(query), k=k)

    def suggest(self, query: str, n: int = 3) -> list[tuple[str, float]]:
        from .suggest import Suggester

        if self._suggester is None:
            self._suggester = Suggester(self.reader)
        return self._suggester.suggest(query, max_suggestions=n)

    def match_all_count(self) -> int:
        return self.reader.match_all_count()


class QueryService:
    """Round-robin pool of :class:`QueryActor` s.

    ``topk``/``phrase``/``suggest`` return Ray ObjectRefs (callers
    batch with ``ray.get``); ``topk_many`` fans a query list across
    the pool and gathers.
    """

    def __init__(self, index_root: str, n_actors: int = 2, chain: str | None = None):
        import ray

        actor_cls = ray.remote(num_cpus=1)(QueryActor)
        self._actors = [
            actor_cls.remote(index_root, chain) for _ in range(max(1, n_actors))
        ]
        self._i = 0

    def _next(self):
        a = self._actors[self._i % len(self._actors)]
        self._i += 1
        return a

    def topk(self, query: str, k: int = 10):
        return self._next().topk.remote(query, k)

    def phrase(self, query: str, k: int = 10):
        return self._next().phrase.remote(query, k)

    def suggest(self, query: str, n: int = 3):
        return self._next().suggest.remote(query, n)

    def topk_many(self, queries: list[str], k: int = 10) -> list[list[tuple[int, float]]]:
        import ray

        return ray.get([self.topk(q, k) for q in queries])

    def shutdown(self) -> None:
        import ray

        for a in self._actors:
            ray.kill(a)
        self._actors = []


class ShardQueryActor:
    """One doc-range shard: norms slice + range-limited posting decode,
    loaded once.  Returns its shard's exact top-k (global statistics →
    globally comparable scores)."""

    def __init__(self, index_root: str, lo: int, hi: int, chain: str | None = None):
        from ..functions.analyzer import Analyzer
        from .reader import IndexReader

        self.reader = IndexReader(index_root, chain=chain, doc_range=(lo, hi))
        self.analyzer = Analyzer(self.reader.chain)
        self._masks: dict[str, np.ndarray] = {}
        # soft deletes: each shard holds only ITS range's live mask
        # (None when the build has no tombstones — the common case)
        dels = self.reader.deleted_ids()
        in_range = dels[(dels >= lo) & (dels < hi)]
        if len(in_range):
            live = np.ones(max(0, hi - lo), dtype=bool)
            live[in_range - lo] = False
            self._live: np.ndarray | None = live
        else:
            self._live = None

    def topk_partial(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        from .bm25 import score_topk_range

        return score_topk_range(
            self.reader, self.analyzer(query), k=k, allowed_mask=self._live
        )

    def phrase_partial(self, query: str) -> list[tuple[int, int]]:
        """This shard's exact phrase matches (doc_id, phrase_freq) —
        range-limited positional decode, tombstones dropped by the
        phrase module's shared delete filter."""
        from .phrase import match_phrase_range

        return match_phrase_range(self.reader, self.analyzer(query))

    def _allowed_mask(self, predicate: tuple) -> np.ndarray:
        """Shard-local allowed bitmap for a stored-field predicate
        ``(column, op, value)`` — built ONCE per predicate from this
        shard's slice of the docs store (parquet row-group stats prune
        the scan to the shard's doc range; doc ids are written sorted)
        and memoized for the actor's lifetime.  The corpus-wide filter
        state lives sharded with the fleet — never on the driver."""
        key = repr(predicate)
        mask = self._masks.get(key)
        if mask is None:
            import pyarrow.dataset as pads

            col, op, val = predicate
            lo, hi = self.reader.doc_lo, self.reader.doc_hi
            f = pads.field(col)
            expr = {
                ">=": f >= val,
                ">": f > val,
                "<=": f <= val,
                "<": f < val,
                "==": f == val,
                "!=": f != val,
            }[op]
            import os

            dset = pads.dataset(
                os.path.join(self.reader.index_dir, "docs"), partitioning="hive"
            )
            t = dset.to_table(
                filter=(pads.field("doc_id") >= lo)
                & (pads.field("doc_id") < hi)
                & expr,
                columns=["doc_id"],
            )
            mask = np.zeros(max(0, hi - lo), dtype=bool)
            mask[t["doc_id"].to_numpy().astype(np.int64) - lo] = True
            self._masks[key] = mask
        return mask

    def filtered_topk_partial(
        self, query: str, predicate: tuple, k: int = 10
    ) -> list[tuple[int, float]]:
        from .bm25 import score_topk_range

        mask = self._allowed_mask(predicate)
        if self._live is not None:
            mask = mask & self._live
        return score_topk_range(
            self.reader,
            self.analyzer(query),
            k=k,
            allowed_mask=mask,
        )


class ShardedQueryService:
    """Doc-range-sharded serving: ``n_shards`` actors each hold one
    contiguous doc-id range; a query fans out to every shard and the
    per-shard top-k lists merge exactly (score desc, doc asc).

    Scale: shard count ⇒ per-query latency ∝ n_docs / n_shards (the
    dense-TAAT floor divides by the fleet) and per-actor memory holds
    only a norms slice.  On a multi-node cluster Ray spreads the
    actors; the merge is O(n_shards · k) on the caller.

    ``num_cpus`` defaults to 0.25 so a shard fleet larger than the
    node's CPU count still schedules (actors are mostly idle between
    queries; an unschedulable actor would deadlock every ``ray.get``).
    On a dedicated serving cluster pass ``num_cpus=1`` to pin one core
    per shard."""

    def __init__(
        self,
        index_root: str,
        n_shards: int = 4,
        chain: str | None = None,
        num_cpus: float = 0.25,
    ):
        import ray

        from ..index import manifest as mf

        bdir = mf.current_build(index_root) or index_root
        n_docs = int(mf.read_manifest(bdir)["n_docs"])
        n_shards = max(1, min(n_shards, max(1, n_docs)))
        bounds = np.linspace(0, n_docs, n_shards + 1).astype(np.int64)
        actor_cls = ray.remote(num_cpus=num_cpus)(ShardQueryActor)
        self._actors = [
            actor_cls.remote(index_root, int(bounds[i]), int(bounds[i + 1]), chain)
            for i in range(n_shards)
        ]

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        import ray

        from .bm25 import merge_shard_topk

        parts = ray.get([a.topk_partial.remote(query, k) for a in self._actors])
        return merge_shard_topk(parts, k)

    def match_phrase(self, query: str) -> list[tuple[int, int]]:
        """Exact phrase query across the fleet: positional matching is
        per-doc local, so the per-shard results over disjoint doc
        ranges concatenate (doc asc) to exactly the full-reader
        ``match_phrase`` — each shard decoded only its overlapping
        posting blocks, dividing the positional-decode cost by the
        fleet the same way the BM25 tier divides dense TAAT."""
        import ray

        parts = ray.get([a.phrase_partial.remote(query) for a in self._actors])
        return [hit for part in parts for hit in part]

    def filtered_topk(
        self, query: str, predicate: tuple, k: int = 10
    ) -> list[tuple[int, float]]:
        """Filtered relevance query, fully distributed: each shard
        builds (once) and applies its own slice of the allowed bitmap
        — no corpus-scale id set ever reaches the caller.  Scores use
        global statistics (Lucene filtered-query semantics), so the
        cross-shard merge stays exact."""
        import ray

        from .bm25 import merge_shard_topk

        parts = ray.get(
            [a.filtered_topk_partial.remote(query, predicate, k) for a in self._actors]
        )
        return merge_shard_topk(parts, k)

    def topk_many(
        self, queries: list[str], k: int = 10
    ) -> list[list[tuple[int, float]]]:
        import ray

        from .bm25 import merge_shard_topk

        refs = [[a.topk_partial.remote(q, k) for a in self._actors] for q in queries]
        return [merge_shard_topk(ray.get(r), k) for r in refs]

    def shutdown(self) -> None:
        import ray

        for a in self._actors:
            ray.kill(a)
        self._actors = []
