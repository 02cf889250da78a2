"""Query serving tier: a pool of Ray actors each holding reader state.

The reference serves queries from OpenSearch (a long-lived process
with loaded segment state); the rebuild's equivalent is an actor pool
where each actor loads an :class:`IndexReader` ONCE in ``__init__``
(term dictionary, norms array, postings cache, file handles) and
answers queries from warm state — the actor-pool rule for stateful
stages applied to the read path (SURVEY §7 step 7).

Scale story: on a real cluster each actor serves a shard — a doc-id
range (norms + docs store slice) and/or a term-hash range (dictionary
+ segment files); a thin merger combines per-shard top-k (BM25 scores
are globally comparable because N/avgdl/df are global statistics, so
per-shard top-k merge is exact).  Single-node, every actor holds the
whole (small) index and the pool provides query *throughput*
(concurrent queries across cores) rather than capacity.

Everything dispatched through :class:`QueryService` is exactly the
library's local query path (`bm25.topk`, `phrase.phrase_topk`,
`suggest.Suggester`), so results are identical to a local reader by
construction (tested).
"""

from __future__ import annotations

__all__ = ["QueryActor", "QueryService"]


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
