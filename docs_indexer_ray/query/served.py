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

    def search(
        self,
        query: str,
        k: int = 10,
        fields: tuple[str, ...] = ("url", "title"),
        highlight_field: str | None = None,
        syntax: bool = False,
    ):
        """Assembled ``_search`` response from this replica's warm
        reader — exactly ``query.search.search_response``."""
        from .search import search_response

        return search_response(
            self.reader,
            query,
            k=k,
            fields=fields,
            highlight_field=highlight_field,
            syntax=syntax,
        )

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

    def search(self, query: str, k: int = 10, **kw):
        """Assembled ``_search`` response ObjectRef from the next
        replica (fields/highlight_field/syntax kwargs pass through)."""
        return self._next().search.remote(query, k, **kw)

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

    def ping(self) -> tuple[int, int]:
        """Liveness probe (``ShardedQueryService.revive``): this
        shard's ``(doc_lo, doc_hi)`` — no reader work."""
        return (int(self.reader.doc_lo), int(self.reader.doc_hi))

    def topk_partial(
        self,
        query: str,
        k: int = 10,
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """This shard's exact top-k — the local tier's adaptive
        planner applied per shard: block-max WAND (``wand_topk`` with
        ``doc_range`` — cursors skip straight to the shard) when the
        query is selective enough that skipping beats the shard-sized
        dense pass, vectorized TAAT otherwise.  WAND replays the dense
        scorer's float accumulation exactly, so either plan merges
        bit-identically across shards.  Tombstones and cursors force
        TAAT (same rule as the local planner)."""
        from .bm25 import score_topk_range, wand_topk

        terms = self.analyzer(query)
        lo, hi = self.reader.doc_lo, self.reader.doc_hi
        if after is None and self._live is None:
            n = max(1, self.reader.n_docs)
            sum_df = 0
            for t in set(terms):
                tp = self.reader.postings(t)
                if tp is not None:
                    sum_df += tp.df
            # expected range-local postings ≈ global df × range share;
            # the measured crossover (~5 ns/doc dense floor vs ~6 µs
            # per WAND cursor step) is df_range ≲ shard/1024 — NO
            # lower floor here: on a sub-1M-doc shard the dense pass
            # is already sub-ms and the floor only misroutes (measured
            # 0.54 ms dense vs 0.96 ms WAND at shard=125k, df=1005)
            est = sum_df * (hi - lo) / n
            if est <= (hi - lo) // 1024:
                return wand_topk(
                    self.reader, terms, k=k, doc_range=(lo, hi)
                )
        return score_topk_range(
            self.reader,
            terms,
            k=k,
            allowed_mask=self._live,
            after=after,
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

    def _matched_local(self, query: str, syntax: bool = False) -> np.ndarray:
        """Matched doc offsets WITHIN this shard, live only — the facet
        candidate set.  Match-any (OR) over analyzed terms by default
        (mirroring ``facets.match_doc_ids``, decoding only the posting
        blocks overlapping the range); ``syntax=True`` uses the full
        query_string match mask instead (bool/phrase/fuzzy/wildcard),
        so aggregations can follow the REAL query semantics."""
        lo, hi = self.reader.doc_lo, self.reader.doc_hi
        if syntax:
            from .qstring import _eval_range, parse_query_string

            node = parse_query_string(query, self.analyzer)
            _, match = _eval_range(self.reader, node)
            if self._live is not None:
                match = match & self._live
            return np.flatnonzero(match)
        parts = []
        for term in set(self.analyzer(query)):
            tp = self.reader.postings(term)
            if tp is None:
                continue
            ids, _ = tp.decode_range(lo, hi)
            if len(ids):
                parts.append(ids.astype(np.int64) - lo)
        if not parts:
            return np.empty(0, np.int64)
        matched = np.unique(np.concatenate(parts))
        if self._live is not None:
            matched = matched[self._live[matched]]
        return matched

    def _col_slice(self, col: str):
        """This shard's doc-range slice of stored column ``col`` —
        the memoized ``reader.stored_column`` (position ``i`` = doc
        ``lo + i``; one row-group-pruned docs-store scan per column
        per actor lifetime).  Corpus-wide column state lives sharded
        with the fleet."""
        return self.reader.stored_column(col)

    def facet_terms_partial(self, query: str, col: str, syntax: bool = False):
        """Per-key matched-doc counts within this shard →
        ``(value:string, partial:int64)``; counts over disjoint doc
        ranges SUM exactly, so the service-side merge reproduces
        ``facets.terms_facet`` bit-for-bit."""
        import pyarrow as pa

        matched = self._matched_local(query, syntax=syntax)
        if not len(matched):
            return pa.table(
                {"value": pa.array([], pa.string()),
                 "partial": pa.array([], pa.int64())}
            )
        keys = self._col_slice(col).take(pa.array(matched))
        agg = pa.table({"value": keys}).group_by("value").aggregate([([], "count_all")])
        return pa.table(
            {
                "value": agg["value"].cast(pa.string()),
                "partial": agg["count_all"].cast(pa.int64()),
            }
        )

    def facet_values_partial(
        self, query: str, col: str, kind: str, arg=None, syntax: bool = False
    ):
        """Generic bucket-aggregation partial (``facets.value_histogram``
        over this shard's matched values): ``(key, partial)`` rows —
        distinct-key-scale, never doc-scale — that SUM exactly across
        disjoint doc ranges.  One method serves date_histogram /
        histogram / range / exact-cardinality / exact-percentiles."""
        import pyarrow as pa

        from .facets import value_histogram

        matched = self._matched_local(query, syntax=syntax)
        vals = self._col_slice(col).take(pa.array(matched))
        return value_histogram(vals, kind, arg)

    def facet_bucket_sums_partial(
        self, query: str, col: str, kind: str, arg, val_col: str,
        syntax: bool = False,
    ):
        """Bucket count + metric-sum partial for pipeline aggregations
        (``facets.value_bucket_sums`` over this shard's matched key /
        metric slices): ``(key, n, sm)`` rows — distinct-key-scale —
        whose columns SUM exactly across disjoint doc ranges."""
        import pyarrow as pa

        from .facets import value_bucket_sums

        matched = self._matched_local(query, syntax=syntax)
        idx = pa.array(matched)
        return value_bucket_sums(
            self._col_slice(col).take(idx),
            self._col_slice(val_col).take(idx),
            kind,
            arg,
        )

    def facet_composite_partial(
        self, query: str, col: str, after, size: int, syntax: bool = False
    ):
        """Composite-agg page partial: this shard's ``size`` SMALLEST
        distinct matched keys strictly after ``after`` (native column
        order; null keys dropped — OpenSearch ``missing_bucket:
        false``) with their shard-local counts → ``(value: native
        type, partial)``.

        Why ≤ size rows is enough: a key cut from this shard's window
        has ≥ size smaller keys IN THIS SHARD alone, so it cannot be
        in the global first-``size`` page; conversely any key on the
        global page lies within EVERY holding shard's window, so its
        count sums exactly from the returned partials (the
        ``facets.composite_facet`` argument).  The page cursor is what
        bounds per-shard work — a near-unique key column ships
        O(size) rows per page, never key-cardinality."""
        import pyarrow as pa

        from .facets import composite_page

        matched = self._matched_local(query, syntax=syntax)
        # the shared kernel validates the cursor even on an empty
        # match (so an out-of-type cursor 400s identically on both
        # backends regardless of the match set)
        keys = (
            self._col_slice(col).take(pa.array(matched))
            if len(matched)
            else self._col_slice(col).slice(0, 0)
        )
        return composite_page(keys, after, size)

    def facet_top_hits_partial(
        self, query: str, group_col: str, sort_col: str, k: int,
        ascending: bool = False, syntax: bool = False,
        values: list | None = None,
    ):
        """``top_hits`` sub-agg partial: this shard's top-``k`` matched
        docs PER BUCKET of ``group_col`` by ``sort_col`` (doc id
        tie-break in the sort direction) → ``(value, doc_id, s)``
        rows, ≤ k per bucket — re-applying the same kernel to the
        concatenated shard partials is the exact global answer
        (``ops/windows.head_k_per_key`` idempotence).

        ``sort_col`` ``"_doc"``/``"_id"`` sorts by doc id (the
        OpenSearch default-sort pseudo-fields — not stored columns).
        ``values`` restricts to the rendered bucket keys so a
        high-cardinality group column ships ≤ |values|·k rows per
        shard, not cardinality·k."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..ops.windows import head_k_per_key

        matched = self._matched_local(query, syntax=syntax)
        idx = pa.array(matched)
        ids = pa.array(matched + np.int64(self.reader.doc_lo), pa.int64())
        s = (
            ids
            if sort_col in ("_doc", "_id")
            else self._col_slice(sort_col).take(idx)
        )
        t = pa.table(
            {
                "value": self._col_slice(group_col).take(idx).cast(pa.string()),
                "s": s,
                "doc_id": ids,
            }
        )
        if values is not None:
            t = t.filter(pc.is_in(t["value"], value_set=pa.array(
                [str(v) for v in values], pa.string()
            )))
        return head_k_per_key(t, "value", "s", k, ascending)

    def facet_terms_stats_partial(
        self, query: str, key_col: str, val_col: str, syntax: bool = False
    ):
        """terms + stats SUB-aggregation partial: per in-shard bucket
        of ``key_col``, (count, min, max, sum) of ``val_col`` over the
        matched docs — one Arrow groupby over the memoized column
        slices, ≤ distinct-keys rows out, distributive combiners so
        the fleet fold (``facets.fold_terms_stats``) is exact."""
        import pyarrow as pa

        matched = self._matched_local(query, syntax=syntax)
        idx = pa.array(matched)
        t = pa.table(
            {
                "value": self._col_slice(key_col).take(idx).cast(pa.string()),
                "v": self._col_slice(val_col).take(idx).cast(pa.float64()),
            }
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "value": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "mn": pa.array([], pa.float64()),
                    "mx": pa.array([], pa.float64()),
                    "sm": pa.array([], pa.float64()),
                }
            )
        agg = t.group_by("value").aggregate(
            [([], "count_all"), ("v", "min"), ("v", "max"), ("v", "sum")]
        )
        return pa.table(
            {
                "value": agg["value"],
                "n": agg["count_all"].cast(pa.int64()),
                "mn": agg["v_min"],
                "mx": agg["v_max"],
                "sm": agg["v_sum"],
            }
        )

    def facet_stats_partial(self, query: str, col: str, syntax: bool = False) -> tuple:
        """``(n, min, max, sum)`` of numeric column ``col`` over this
        shard's matches — one constant-size tuple per shard; count/sum
        add and min/max fold exactly across disjoint ranges."""
        matched = self._matched_local(query, syntax=syntax)
        if not len(matched):
            return (0, None, None, None)
        import pyarrow as pa

        v = (
            self._col_slice(col)
            .take(pa.array(matched))
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        return (len(v), float(v.min()), float(v.max()), float(v.sum()))

    def query_string_partial(
        self,
        qs: str,
        k: int = 10,
        default_operator: str = "or",
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """This shard's quantized query_string top-k — every leaf
        decodes only its overlapping posting blocks; global statistics
        make the cross-shard merge exact."""
        from .qstring import query_string_topk_range

        return query_string_topk_range(
            self.reader,
            qs,
            k=k,
            default_operator=default_operator,
            analyzer=self.analyzer,
            live_mask=self._live,
            after=after,
        )

    def span_near_partial(self, terms: list[str], slop: int) -> list[tuple[int, int]]:
        """This shard's unordered span matches ``(doc_id, min_window)``
        — block-pruned positional decode, same division as phrases."""
        from .phrase import span_near_range

        return span_near_range(self.reader, terms, slop=slop)

    def count_partial(self, query: str, syntax: bool = False) -> int:
        """Live matched-doc count within this shard — match-any over
        the analyzed terms, or the full query_string match mask with
        ``syntax=True`` (bool/phrase/fuzzy/wildcard semantics)."""
        return int(len(self._matched_local(query, syntax=syntax)))

    def rank_count_partial(
        self,
        query: str,
        k: int = 10,
        syntax: bool = False,
        default_operator: str = "or",
        after: tuple[float, int] | None = None,
    ) -> tuple[list[tuple[int, float]], int]:
        """Phase-1 top-k AND the live match count in ONE round trip —
        a ``_search`` response needs both, and two fan-outs double the
        fleet latency for no reason (the values are exactly
        ``topk_partial``/``query_string_partial`` + ``count_partial``,
        so the merged results stay pinned to the two-call path).
        ``after`` pages the rank phase; the count stays the FULL match
        count (OpenSearch ``hits.total`` is cursor-independent)."""
        hits = (
            self.query_string_partial(query, k, default_operator, after=after)
            if syntax
            else self.topk_partial(query, k, after=after)
        )
        return hits, self.count_partial(query, syntax=syntax)

    def sort_partial(
        self,
        query: str,
        col: str,
        desc: bool,
        n: int,
        syntax: bool = False,
        default_operator: str = "or",
        after: tuple | None = None,
    ):
        """Field-``sort`` phase 1, shard-local (``query/sortq.py``):
        this shard's top-``n`` ``(doc_id, key)`` in field order over
        the query's match set, plus its TRUE match count — the sort
        column slice is the memoized ``reader.stored_column``, the
        comparator per-doc-local, so the service's page-scale re-sort
        merge is exact."""
        from .sortq import sort_rows_range

        return sort_rows_range(
            self.reader, query, col,
            desc=desc, n=n, syntax=syntax,
            default_operator=default_operator,
            after=after, live=self._live, analyzer=self.analyzer,
        )

    def fetch_partial(
        self,
        doc_ids: list[int],
        fields: tuple[str, ...],
        query: str | None = None,
        highlight_field: str | None = None,
        width: int = 160,
        syntax: bool = False,
        hl_tags: tuple = ("<em>", "</em>"),
    ):
        """OpenSearch's FETCH phase, shard-local: stored fields (+ the
        densest highlighted snippet) for hits this shard OWNS —
        document bodies never leave the shard; only the assembled rows
        travel.  ``query`` (analyzed with this shard's chain — or with
        ``syntax=True`` parsed as query_string and reduced to its
        POSITIVE terms) drives the snippet term set."""
        import pyarrow as pa

        need = list(
            dict.fromkeys(
                list(fields) + ([highlight_field] if highlight_field else [])
            )
        )
        t = self.reader.fetch_docs([int(d) for d in doc_ids], ["doc_id"] + need)
        cols = {"doc_id": t["doc_id"].cast(pa.int64())}
        for f in fields:
            cols[f] = t[f].combine_chunks()
        if highlight_field is not None:
            from .highlight import best_snippet

            if syntax:
                from .qstring import parse_query_string, positive_terms

                terms = positive_terms(
                    parse_query_string(query or "", self.analyzer)
                )
            else:
                terms = set(self.analyzer(query or ""))
            cols["snippet"] = pa.array(
                [
                    best_snippet(
                        x or "", "", chain=self.reader.chain, width=width,
                        pre=hl_tags[0], post=hl_tags[1], terms=terms
                    )
                    for x in t[highlight_field].to_pylist()
                ],
                pa.string(),
            )
        return pa.table(cols)

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
        n_replicas: int = 1,
    ):
        import ray

        from ..index import manifest as mf

        # resolve the build ONCE and pin every actor (initial and
        # revived) to it: a publish between construction and a later
        # revive() must never mix two builds' doc-id ranges in one
        # fleet (the bounds below are THIS build's n_docs)
        bdir = mf.current_build(index_root) or index_root
        n_docs = int(mf.read_manifest(bdir)["n_docs"])
        n_shards = max(1, min(n_shards, max(1, n_docs)))
        bounds = np.linspace(0, n_docs, n_shards + 1).astype(np.int64)
        actor_cls = ray.remote(num_cpus=num_cpus)(ShardQueryActor)
        self._bounds = bounds
        index_root = bdir
        # n_replicas > 1 is OpenSearch's primary+replica read scaling:
        # a Ray actor serves ONE request at a time, so concurrent
        # queries otherwise queue behind each shard — every fan-out
        # picks one replica per doc range, round-robin
        self._groups = [
            [
                actor_cls.remote(
                    index_root, int(bounds[i]), int(bounds[i + 1]), chain
                )
                for _ in range(max(1, n_replicas))
            ]
            for i in range(n_shards)
        ]
        self._rr = 0
        # revive() re-creates dead replicas from this recipe
        self._spawn = lambda i: actor_cls.remote(
            index_root, int(bounds[i]), int(bounds[i + 1]), chain
        )

    @property
    def _actors(self):
        """One replica per doc-range shard, rotated per access — every
        existing fan-out (``for a in self._actors`` / ``_actors[s]``)
        transparently load-balances across replicas.  The lock-free
        counter bump is intentionally racy: it only influences replica
        CHOICE, never correctness (replicas are identical readers)."""
        self._rr += 1
        r = self._rr
        return [g[r % len(g)] for g in self._groups]

    def revive(self, timeout_s: float = 5.0) -> int:
        """Replace CONFIRMED-DEAD shard replicas (node loss, OOM-kill,
        explicit ``ray.kill``) with fresh actors over the SAME pinned
        build — the operational recovery path: a query that hits a
        dead actor raises ``RayActorError`` LOUDLY (never silently
        partial — a missing shard would mean silently missing doc
        ranges); the operator (or the REST layer's one-retry
        self-heal) calls ``revive()`` and retries.

        All replicas are pinged CONCURRENTLY and waited once under a
        single deadline (a partitioned fleet stalls ~``timeout_s``
        total, not per-actor).  Only a ping that FAILS with
        ``RayActorError`` marks a replica dead — Ray errors a dead
        actor's calls promptly, while a ping that merely hasn't
        answered is an actor BUSY with in-flight work and must not be
        replaced (dropping the live handle would kill its running
        query).  A hung-but-alive actor is therefore left alone: busy
        and hung are indistinguishable from outside; escalate with
        ``shutdown()`` + a fresh service.  Returns the number of
        replicas replaced."""
        import ray

        probes = [
            (i, j, actor.ping.remote())
            for i, group in enumerate(self._groups)
            for j, actor in enumerate(group)
        ]
        ray.wait([r for _, _, r in probes],
                 num_returns=len(probes), timeout=timeout_s)
        replaced = 0
        for i, j, ref in probes:
            try:
                ray.get(ref, timeout=0.001)
            except ray.exceptions.GetTimeoutError:
                continue  # busy, not dead
            except ray.exceptions.RayActorError:
                self._groups[i][j] = self._spawn(i)
                replaced += 1
        return replaced

    def topk(
        self,
        query: str,
        k: int = 10,
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        import ray

        from .bm25 import merge_shard_topk

        parts = ray.get(
            [a.topk_partial.remote(query, k, after) for a in self._actors]
        )
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

    def query_string(
        self,
        qs: str,
        k: int = 10,
        default_operator: str = "or",
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """The full ``query_string`` language on the fleet
        (``query/qstring.py``): each shard parses + evaluates over its
        doc range only (range-limited posting/positional decode —
        O(its share) per leaf), and the quantized per-shard top-k
        lists merge exactly, the same division the plain BM25 tier
        gets.  Pinned identical to the local
        ``query_string_topk``."""
        import ray

        from .bm25 import merge_shard_topk

        parts = ray.get(
            [
                a.query_string_partial.remote(qs, k, default_operator, after)
                for a in self._actors
            ]
        )
        return merge_shard_topk(parts, k)

    def search(
        self,
        query: str,
        k: int = 10,
        fields: tuple[str, ...] = ("url", "title"),
        highlight_field: str | None = None,
        width: int = 160,
        syntax: bool = False,
        default_operator: str = "or",
        from_: int = 0,
        after: tuple[float, int] | None = None,
        sort: tuple[str, str] | None = None,
        hl_tags: tuple = ("<em>", "</em>"),
    ):
        """OpenSearch two-phase QUERY-THEN-FETCH on the fleet: phase 1
        is the exact cross-shard top-k merge (plain match, or the full
        ``query_string`` language with ``syntax=True``); phase 2
        routes each hit's stored-field fetch + snippet highlight to
        the shard that OWNS its doc range — fetch work (and the
        memoized docs-slice reads behind it) stays sharded with the
        fleet, and the shards serve their hits concurrently.  Returns
        the assembled response table ``(rank, doc_id, score,
        *fields[, snippet])`` — pinned identical to the local
        :func:`query.search.search_response` in both modes.

        Pagination: ``from_`` is offset paging (each shard ranks
        ``from_ + k``, the merge slices — cost grows with the offset,
        OpenSearch ``from``/``size``); ``after`` is the stateless
        ``search_after`` cursor (each shard applies the cursor and
        ranks only ``k`` — constant cost per page, the deep-pagination
        path).  Mutually exclusive, like OpenSearch."""
        if from_ and after is not None:
            raise ValueError("from_ and after are mutually exclusive "
                             "(OpenSearch search_after requires from=0)")
        if sort is not None:
            return self._sorted_search(
                query, k, fields, highlight_field, width, syntax,
                default_operator, from_, after, sort, hl_tags,
            )[0]
        hits = (
            self.query_string(query, from_ + k, default_operator, after=after)
            if syntax
            else self.topk(query, from_ + k, after=after)
        )[from_:]
        return self._fetch_phase(
            hits, query, fields, highlight_field, width, syntax,
            rank_start=from_ + 1, hl_tags=hl_tags,
        )

    def _sorted_search(
        self,
        query: str,
        k: int,
        fields: tuple[str, ...],
        highlight_field: str | None,
        width: int,
        syntax: bool,
        default_operator: str,
        from_: int,
        after: tuple | None,
        sort: tuple[str, str],
        hl_tags: tuple = ("<em>", "</em>"),
    ):
        """Field-``sort`` search on the fleet (``query/sortq.py``):
        phase 1 fans ONE ``sort_partial`` to every shard (each ranks
        its top ``from_ + k`` ``(doc_id, key)`` over its memoized sort
        column slice and reports its true match count), the page-scale
        re-sort merge is exact, and phase 2 is the shared fetch phase.
        Returns ``(table, total)`` — the table carries the ordering
        key as a ``sort_key`` column (per-hit ``sort`` values for the
        ``search_after`` cursor); hits score 0.0 (OpenSearch reports
        ``_score: null`` when sorting by field)."""
        import ray

        from .sortq import merge_sorted_pages

        col, order = sort
        parts = ray.get(
            [
                a.sort_partial.remote(
                    query, col, order == "desc", from_ + k, syntax,
                    default_operator, after,
                )
                for a in self._actors
            ]
        )
        rows = merge_sorted_pages(
            [p[0] for p in parts], from_ + k, order == "desc"
        ).slice(from_)
        total = int(sum(p[1] for p in parts))
        hits = [(int(d), 0.0) for d in rows["doc_id"].to_pylist()]
        t = self._fetch_phase(
            hits, query, fields, highlight_field, width, syntax,
            rank_start=from_ + 1, hl_tags=hl_tags,
        )
        return t.append_column("sort_key", rows["key"].combine_chunks()), total

    def search_with_total(
        self,
        query: str,
        k: int = 10,
        fields: tuple[str, ...] = ("url", "title"),
        highlight_field: str | None = None,
        width: int = 160,
        syntax: bool = False,
        default_operator: str = "or",
        from_: int = 0,
        after: tuple[float, int] | None = None,
        sort: tuple[str, str] | None = None,
        hl_tags: tuple = ("<em>", "</em>"),
    ):
        """:meth:`search` plus the TRUE match count, with phase 1
        collecting rank AND count from each shard in ONE fan-out
        (``rank_count_partial``) — a ``_search`` response needs
        ``hits.total`` anyway, and a separate ``count()`` call both
        doubles the fleet round trips and can observe a different
        build across a concurrent reload.  Returns ``(table, total)``,
        the table identical to :meth:`search` (same ``from_``/``after``
        pagination; ``total`` is always the FULL match count)."""
        import ray

        from .bm25 import merge_shard_topk

        if from_ and after is not None:
            raise ValueError("from_ and after are mutually exclusive "
                             "(OpenSearch search_after requires from=0)")
        if sort is not None:
            # the sort fan-out already reports per-shard match counts
            return self._sorted_search(
                query, k, fields, highlight_field, width, syntax,
                default_operator, from_, after, sort, hl_tags,
            )
        parts = ray.get(
            [
                a.rank_count_partial.remote(
                    query, from_ + k, syntax, default_operator, after
                )
                for a in self._actors
            ]
        )
        hits = merge_shard_topk([p[0] for p in parts], from_ + k)[from_:]
        total = int(sum(p[1] for p in parts))
        return (
            self._fetch_phase(
                hits, query, fields, highlight_field, width, syntax,
                rank_start=from_ + 1, hl_tags=hl_tags,
            ),
            total,
        )

    def _fetch_phase(
        self,
        hits: list[tuple[int, float]],
        query: str,
        fields: tuple[str, ...],
        highlight_field: str | None,
        width: int,
        syntax: bool,
        rank_start: int = 1,
        hl_tags: tuple = ("<em>", "</em>"),
    ):
        import pyarrow as pa
        import ray

        # route hits to owning shards (bounds are sorted, right-open)
        per_shard: dict[int, list[int]] = {}
        for d, _ in hits:
            s = int(np.searchsorted(self._bounds, d, side="right")) - 1
            per_shard.setdefault(s, []).append(d)
        parts = ray.get(
            [
                self._actors[s].fetch_partial.remote(
                    ids, tuple(fields), query, highlight_field, width,
                    syntax, hl_tags
                )
                for s, ids in per_shard.items()
            ]
        )
        cols: dict[str, pa.Array] = {
            "rank": pa.array(
                np.arange(rank_start, rank_start + len(hits), dtype=np.int64)
            ),
            "doc_id": pa.array([int(d) for d, _ in hits], pa.int64()),
            "score": pa.array([float(s) for _, s in hits], pa.float64()),
        }
        extra = list(fields) + (["snippet"] if highlight_field else [])
        if not hits:
            # zero-row fetch through a shard so the empty page keeps
            # the STORE's column types (hardcoded pa.string() gave
            # numeric/timestamp fields a different schema than
            # non-empty pages — and diverged from the local
            # search_response; same fix as assemble_hits)
            empty = ray.get(
                self._actors[0].fetch_partial.remote(
                    [], tuple(fields), query, highlight_field, width,
                    syntax, hl_tags
                )
            )
            for f in extra:
                cols[f] = empty[f].combine_chunks()
            return pa.table(cols)
        fetched = pa.concat_tables(parts, promote_options="default")
        row_of = {int(i): r for r, i in enumerate(fetched["doc_id"].to_pylist())}
        order = pa.array([row_of[int(d)] for d, _ in hits], pa.int64())
        fetched = fetched.take(order)
        for f in extra:
            cols[f] = fetched[f].combine_chunks()
        return pa.table(cols)

    def span_near(self, terms: list[str], slop: int = 0) -> list[tuple[int, int]]:
        """Unordered span query across the fleet — per-doc-local
        matching over disjoint ranges concatenates (doc asc) to
        exactly the full-reader ``phrase.span_near``."""
        import ray

        parts = ray.get(
            [a.span_near_partial.remote(list(terms), slop) for a in self._actors]
        )
        return [hit for part in parts for hit in part]

    def count(self, query: str, syntax: bool = False) -> int:
        """OpenSearch ``_count``: live docs matching ANY query term
        (or the full query_string semantics with ``syntax=True``) —
        per-shard counts over disjoint ranges sum exactly."""
        import ray

        return sum(
            ray.get([a.count_partial.remote(query, syntax) for a in self._actors])
        )

    def terms_facet(
        self, query: str, col: str, size: int | None = None, syntax: bool = False
    ):
        """OpenSearch-style ``terms`` aggregation over the matched set,
        computed PER SHARD and merged exactly (counts over disjoint doc
        ranges sum) → ``(value, n_docs)``, count desc / value asc —
        bit-identical to ``facets.terms_facet`` on a local reader, at
        1/n_shards of the per-actor work and with the docs-store column
        slice cached in each shard after the first facet query."""
        import pyarrow as pa
        import ray

        parts = ray.get(
            [a.facet_terms_partial.remote(query, col, syntax) for a in self._actors]
        )
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return pa.table(
                {"value": pa.array([], pa.string()),
                 "n_docs": pa.array([], pa.int64())}
            )
        t = pa.concat_tables(parts, promote_options="default")
        agg = t.group_by("value").aggregate([("partial", "sum")])
        out = pa.table(
            {"value": agg["value"], "n_docs": agg["partial_sum"].cast(pa.int64())}
        ).sort_by([("n_docs", "descending"), ("value", "ascending")])
        return out.slice(0, size) if size is not None else out

    def composite_facet(
        self, query: str, col: str, after, size: int, syntax: bool = False
    ):
        """One composite-agg PAGE over the fleet: each shard returns
        its ``size`` smallest matched keys after the cursor (NATIVE
        column type — see ``facet_composite_partial`` for why that
        window suffices and why counts sum exactly), the merge is a
        ≤ shards×size-row groupby + key-ascending head — per-page
        driver work is page-scale regardless of key cardinality."""
        import pyarrow as pa
        import ray

        parts = ray.get([
            a.facet_composite_partial.remote(query, col, after, size, syntax)
            for a in self._actors
        ])
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return None  # caller renders an empty page
        t = pa.concat_tables(parts, promote_options="default")
        agg = t.group_by("value").aggregate([("partial", "sum")])
        out = pa.table(
            {"value": agg["value"], "n_docs": agg["partial_sum"].cast(pa.int64())}
        ).sort_by("value")
        return out.slice(0, size)

    def stats_facet(self, query: str, col: str, syntax: bool = False):
        """``stats`` aggregation over the matched set — per-shard
        constant-size ``(n, min, max, sum)`` partials folded on the
        caller → one row ``(n_docs, min_v, max_v, sum_v, avg_v)``,
        the schema of ``facets.stats_facet``."""
        import pyarrow as pa
        import ray

        parts = ray.get(
            [a.facet_stats_partial.remote(query, col, syntax) for a in self._actors]
        )
        parts = [p for p in parts if p[0]]
        n = sum(p[0] for p in parts)
        if n == 0:
            return pa.table(
                {
                    "n_docs": pa.array([0], pa.int64()),
                    "min_v": pa.array([None], pa.float64()),
                    "max_v": pa.array([None], pa.float64()),
                    "sum_v": pa.array([None], pa.float64()),
                    "avg_v": pa.array([None], pa.float64()),
                }
            )
        sm = float(sum(p[3] for p in parts))
        return pa.table(
            {
                "n_docs": pa.array([n], pa.int64()),
                "min_v": pa.array([min(p[1] for p in parts)], pa.float64()),
                "max_v": pa.array([max(p[2] for p in parts)], pa.float64()),
                "sum_v": pa.array([sm], pa.float64()),
                "avg_v": pa.array([sm / n], pa.float64()),
            }
        )

    def bucket_facet(
        self, query: str, col: str, kind: str, arg=None, syntax: bool = False
    ):
        """Generic bucket aggregation on the fleet: ONE
        ``facet_values_partial`` fan-out (each shard buckets its
        matched values vectorized — ``facets.value_histogram``), then
        an exact distinct-key-scale sum merge → ``(key, n_docs)``
        sorted by key.  Serves date_histogram / histogram / range /
        the exact value histograms behind cardinality + percentiles."""
        import pyarrow as pa
        import ray

        parts = ray.get(
            [
                a.facet_values_partial.remote(query, col, kind, arg, syntax)
                for a in self._actors
            ]
        )
        live = [p for p in parts if p.num_rows]
        if not live:
            return pa.table(
                {"key": parts[0]["key"], "n_docs": pa.array([], pa.int64())}
            )
        t = pa.concat_tables(live, promote_options="default")
        agg = t.group_by("key").aggregate([("partial", "sum")]).sort_by("key")
        return pa.table(
            {"key": agg["key"], "n_docs": agg["partial_sum"].cast(pa.int64())}
        )

    def top_hits_facet(
        self, query: str, group_col: str, sort_col: str, k: int,
        ascending: bool = False, syntax: bool = False,
        values: list | None = None,
    ):
        """``top_hits`` on the fleet: one partial fan-out (≤ k rows per
        (shard, bucket) — per RENDERED bucket when ``values`` lists
        the terms facet's top keys), then the SAME head-k kernel over
        the concatenated partials — exact by idempotence.  Returns
        ``(value, rank, doc_id, s)``, buckets ascending."""
        import pyarrow as pa
        import ray

        from ..ops.windows import head_k_per_key

        parts = ray.get(
            [
                a.facet_top_hits_partial.remote(
                    query, group_col, sort_col, k, ascending, syntax,
                    values,
                )
                for a in self._actors
            ]
        )
        live = [p for p in parts if p.num_rows]
        if not live:
            return pa.table(
                {
                    "value": pa.array([], pa.string()),
                    "rank": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "s": parts[0]["s"],
                }
            )
        t = pa.concat_tables(live, promote_options="default")
        out = head_k_per_key(t, "value", "s", k, ascending, with_rank=True)
        return out.select(["value", "rank", "doc_id", "s"])

    def bucket_sums_facet(
        self, query: str, col: str, kind: str, arg, val_col: str,
        syntax: bool = False,
    ):
        """Pipeline-agg parent on the fleet: ONE
        ``facet_bucket_sums_partial`` fan-out, exact
        distinct-key-scale (count, sum) merge → ``(key, n, sm)``
        sorted by key — the histogram-with-metric every pipeline
        function reduces over."""
        import pyarrow as pa
        import ray

        parts = ray.get(
            [
                a.facet_bucket_sums_partial.remote(
                    query, col, kind, arg, val_col, syntax
                )
                for a in self._actors
            ]
        )
        live = [p for p in parts if p.num_rows]
        if not live:
            return pa.table(
                {
                    "key": parts[0]["key"],
                    "n": pa.array([], pa.int64()),
                    "sm": pa.array([], pa.int64()),
                }
            )
        t = pa.concat_tables(live, promote_options="default")
        agg = t.group_by("key").aggregate([("n", "sum"), ("sm", "sum")]).sort_by("key")
        return pa.table(
            {
                "key": agg["key"],
                "n": agg["n_sum"].cast(pa.int64()),
                "sm": agg["sm_sum"].cast(pa.int64()),
            }
        )

    def percentiles_facet(
        self,
        query: str,
        col: str,
        qs: list[float] = (25.0, 50.0, 75.0, 95.0, 99.0),
        syntax: bool = False,
    ):
        """EXACT percentiles over the matched set: the per-shard
        value-count histograms merge (distinct-value-scale — the
        Dataset facet's own partial shape, never doc-scale) and the
        shared ``quantile_cont`` interpolation runs once on the
        driver — bit-identical to ``facets.percentiles(approx=False)``
        and its SQL oracle.  For unbounded-cardinality doubles use the
        t-digest variant (``facets.percentiles(approx=True)``)."""
        import numpy as np
        import pyarrow as pa

        from .facets import interpolate_quantiles

        hist = self.bucket_facet(query, col, "values", syntax=syntax)
        if hist.num_rows == 0:
            return pa.table(
                {
                    "pct": pa.array([float(q) for q in qs], pa.float64()),
                    "value": pa.array([None] * len(qs), pa.float64()),
                }
            )
        v = hist["key"].to_numpy(zero_copy_only=False)
        c = hist["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = interpolate_quantiles(v, c, list(qs))
        return pa.table(
            {
                "pct": pa.array([float(q) for q in qs], pa.float64()),
                "value": pa.array(out, pa.float64()),
            }
        )

    def terms_stats_facet(
        self, query: str, key_col: str, val_col: str, syntax: bool = False
    ):
        """terms bucket + stats sub-aggregation on the fleet — ONE
        partial fan-out, the shared exact fold
        (``facets.fold_terms_stats``), identical output schema to the
        Dataset facet: ``(value, n_docs, min_v, max_v, sum_v, avg_v)``
        ordered count desc / key asc."""
        import ray

        from .facets import fold_terms_stats

        parts = ray.get(
            [
                a.facet_terms_stats_partial.remote(
                    query, key_col, val_col, syntax
                )
                for a in self._actors
            ]
        )
        return fold_terms_stats(parts)

    def cardinality_facet(
        self, query: str, col: str, syntax: bool = False
    ) -> int:
        """EXACT distinct count of ``col`` over the matched set — the
        merged value histogram's row count (distinct-scale through the
        merge; the HLL sketch variant in ``ops/sketch.py`` is the
        unbounded-domain alternative)."""
        return int(
            self.bucket_facet(query, col, "distinct", syntax=syntax).num_rows
        )

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

        for group in self._groups:
            for a in group:
                ray.kill(a)
        self._groups = []
