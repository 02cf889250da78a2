"""Connected components over duplicate-pair edges — the dedup endgame.

Pair finders (``ops/dedup.py``: exact, MinHash-LSH, SimHash, n-gram
Jaccard; ``ops/ann.py``: embedding near-dups) emit EDGES; production
dedup needs CLUSTERS: transitive closure of "is a near-duplicate of",
one canonical document kept per cluster.

Two modes, same semantics (equality-tested):

* ``mode="driver"`` (default): edges are the pair finders' OUTPUT —
  dedup yield, not the corpus (10^8 edges ≈ 1.6 GB) — so the
  transitive closure runs as a VECTORIZED numpy fold on the driver:
  per round, ``np.minimum.at`` pushes labels across every edge at
  memory bandwidth, then pointer jumping (``label ← label[label]``)
  halves remaining path lengths; O(log diameter) rounds of
  microsecond-scale array ops.  The edges stream in once
  (output-scale collect, like the facet finals).
* ``mode="distributed"``: the hash-to-min rounds as Ray Data
  operations (Rastogi et al., "Finding Connected Components in
  MapReduce") — a ``hash_join`` (edges × labels) + ``groupby.min``
  edge step and a label self-join pointer jump per round, label-sum
  as the monotone convergence witness.  For edge sets beyond driver
  memory; costs a few full shuffles per round, so only pay it then.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from .join import hash_join

__all__ = ["connected_components", "canonical_docs"]

_LOG = logging.getLogger(__name__)

#: auto-mode switch point: 5·10^7 edges ≈ 800 MB driver working set
#: (nodes + labels + both edge-index arrays) — comfortably inside one
#: driver heap; beyond it the hash-to-min rounds pay their shuffles.
DRIVER_EDGE_BUDGET = 50_000_000


def _valid_edges(t: pa.Table, a: str, b: str) -> pa.Table:
    """Project ``(a, b)`` to int64, DROPPING null-endpoint rows first:
    ``to_numpy`` on a null-bearing column goes through float64, where
    NaN silently casts to INT64_MIN — a pseudo-node that would win
    every min-label fold and corrupt its whole cluster's label."""
    import pyarrow.compute as pc

    av, bv = t[a], t[b]
    if av.null_count or bv.null_count:
        t = t.filter(pc.and_(pc.is_valid(av), pc.is_valid(bv)))
        av, bv = t[a], t[b]
    return pa.table({"a": av.cast(pa.int64()), "b": bv.cast(pa.int64())})


def connected_components(
    pairs_ds,
    a: str = "a",
    b: str = "b",
    max_iter: int = 50,
    num_buckets: int = 32,
    mode: str = "auto",
    driver_edge_budget: int = DRIVER_EDGE_BUDGET,
):
    """Edges ``(a, b)`` → one ``(node, component)`` row per distinct
    endpoint, ``component`` = the minimum node id reachable from it
    (so the canonical member labels its whole cluster).  Returned as
    a Dataset in ``distributed`` mode, an Arrow table in ``driver``
    mode (both output-scale).

    ``mode="auto"`` (default) picks for you from one edge ``count()``.
    The edge set is materialized first, so the count is block metadata
    and the finder lineage executes exactly ONCE; in the distributed
    branch the pinned raw edges are explicitly RELEASED as soon as the
    ``both_dirs`` derivation is materialized, so the transient
    object-store peak is raw + both-directions (~3× edge bytes,
    spillable) only for that one derivation step.  At or under
    ``driver_edge_budget`` edges the vectorized driver fold wins
    outright (no shuffle rounds); above it — a boilerplate-heavy crawl
    can emit 10^10 near-dup edges — the hash-to-min rounds keep every
    array task-sized.  The choice is logged; both modes are
    equality-tested against each other."""
    import ray
    import ray.data

    if mode == "auto":
        pairs_ds = pairs_ds.materialize()
        n_edges = pairs_ds.count()  # metadata on a materialized set
        mode = "driver" if n_edges <= driver_edge_budget else "distributed"
        _LOG.info(
            "connected_components auto mode: %d edges → %s "
            "(driver budget %d)",
            n_edges,
            mode,
            driver_edge_budget,
        )

    if mode == "driver":
        from ..collect import tables_of

        parts = tables_of(
            pairs_ds.map_batches(
                lambda t: _valid_edges(t, a, b),
                batch_format="pyarrow",
            )
        )
        if not parts:
            return pa.table(
                {"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
            )
        t = pa.concat_tables(parts)
        av = t["a"].to_numpy().astype(np.int64)
        bv = t["b"].to_numpy().astype(np.int64)
        nodes = np.unique(np.concatenate([av, bv]))
        ai = np.searchsorted(nodes, av)
        bi = np.searchsorted(nodes, bv)
        label = np.arange(len(nodes), dtype=np.int64)
        for _ in range(max_iter):
            before = label.sum()
            # edge step: both directions, vectorized min-scatter
            np.minimum.at(label, bi, label[ai])
            np.minimum.at(label, ai, label[bi])
            # pointer jumping until this round's chains are flat
            while True:
                nxt = label[label]
                if np.array_equal(nxt, label):
                    break
                label = nxt
            if label.sum() == before:
                return pa.table(
                    {
                        "node": pa.array(nodes, pa.int64()),
                        "component": pa.array(nodes[label], pa.int64()),
                    }
                )
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    if mode != "distributed":
        raise ValueError(f"mode must be driver|distributed, got {mode!r}")

    def both_dirs(t: pa.Table) -> pa.Table:
        t = _valid_edges(t, a, b)
        av = t["a"].combine_chunks()
        bv = t["b"].combine_chunks()
        return pa.table(
            {
                "node": pa.chunked_array([av, bv]).combine_chunks(),
                "peer": pa.chunked_array([bv, av]).combine_chunks(),
            }
        )

    edges = pairs_ds.map_batches(both_dirs, batch_format="pyarrow").materialize()
    # release the (possibly auto-materialized) raw edge blocks NOW —
    # the rounds below only read `edges`; holding both would keep ~3×
    # edge bytes resident for the whole convergence loop
    del pairs_ds

    labels = (
        edges.map_batches(
            lambda t: pa.table({"node": t["node"]}), batch_format="pyarrow"
        )
        .groupby("node")
        .min("node")
        .map_batches(
            lambda t: pa.table(
                {"node": t["node"].cast(pa.int64()), "label": t["node"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    prev_sum = labels.sum("label")

    edge_schema = pa.schema([("node", pa.int64()), ("peer", pa.int64())])
    label_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    jump_schema = pa.schema([("label", pa.int64()), ("parent", pa.int64())])

    def _fold_min(ds):
        return (
            ds.groupby("node")
            .min("label")
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t["node"].cast(pa.int64()),
                        "label": t["min(label)"].cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        )

    for _ in range(max_iter):
        # edge step: every neighbor's label arrives
        msgs = hash_join(
            edges,
            labels,
            on="node",
            num_buckets=num_buckets,
            left_schema=edge_schema,
            right_schema=label_schema,
        ).map_batches(
            lambda t: pa.table(
                {"node": t["peer"].cast(pa.int64()), "label": t["label"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        labels = _fold_min(labels.union(msgs)).materialize()

        # pointer jump: label(x) ← label(label(x)) halves path length
        as_parent = labels.map_batches(
            lambda t: pa.table(
                {"label": t["node"].cast(pa.int64()), "parent": t["label"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        jumped = hash_join(
            labels,
            as_parent,
            on="label",
            num_buckets=num_buckets,
            left_schema=label_schema,
            right_schema=jump_schema,
        ).map_batches(
            lambda t: pa.table(
                {"node": t["node"].cast(pa.int64()), "label": t["parent"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        labels = _fold_min(labels.union(jumped)).materialize()

        cur = labels.sum("label")
        if cur == prev_sum:  # monotone ⇒ fixpoint
            break
        prev_sum = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds the backstop?)"
        )

    return labels.map_batches(
        lambda t: pa.table(
            {"node": t["node"], "component": t["label"]}
        ),
        batch_format="pyarrow",
    )


def canonical_docs(docs_ds, components_tbl: pa.Table, id_col: str = "doc_id"):
    """Drop every non-canonical cluster member: keep a doc iff it is
    not in any cluster, or it IS its cluster's component label (the
    minimum id).  ``components_tbl`` is output-scale (nodes touched by
    pairs), broadcast once as two sorted arrays."""
    import ray

    nodes = np.sort(components_tbl["node"].to_numpy().astype(np.int64))
    comp_by_node = components_tbl.sort_by("node")["component"].to_numpy().astype(np.int64)
    ref = ray.put((nodes, comp_by_node))

    def flt(t: pa.Table) -> pa.Table:
        ns, comps = ray.get(ref)
        if len(ns) == 0:
            return t  # no clusters at all → keep everything
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ns, ids)
        idx_c = np.clip(idx, 0, len(ns) - 1)
        in_cluster = ns[idx_c] == ids
        keep = ~in_cluster | (comps[idx_c] == ids)
        return t.filter(pa.array(keep))

    return docs_ds.map_batches(flt, batch_format="pyarrow")
