"""Distributed PageRank — the iterative-graph-algorithm shape.

Web-corpus curation ranks pages by link structure (PageRank is a
standard quality prior for crawl selection, e.g. Common Crawl's
harmonic-centrality rankings).  This module runs power iteration the
Ray-Data-native way:

* edges are a Dataset ``(src, dst)``; per-node out-degree is computed
  once (one combiner groupby);
* each iteration is ONE hash shuffle: every edge emits
  ``rank(src)/outdeg(src)`` to its dst, ``groupby(dst).sum`` folds
  contributions (partial aggregation inside map_batches before the
  exchange is Ray Data's own combiner), and the damping update
  ``(1-d)/N + d·Σ`` maps over the result;
* dangling mass (nodes with no out-links) is redistributed uniformly
  each round — the standard correction, computed from one tiny
  driver-side scalar per iteration.

Two execution modes, same math:

* ``mode="broadcast"`` (default) — the rank vector is a dense
  node-scale float64 array re-broadcast (``ray.put``) each iteration
  and every edge task reads it zero-copy.  One shuffle per iteration.
  Node-scale is the doclens footprint class: fine to ~10⁸ nodes
  (≈1 GB), NOT fine for a multi-billion-page web graph — the driver
  materializes 8 B/node per iteration.
* ``mode="join"`` — the corpus-scale path: ranks stay a Dataset
  partitioned by node for the whole run.  Each iteration is the
  classic distributed PageRank round (the shape Spark/Pregel use):
  hash-join edges with ranks on ``src`` → per-edge contribution →
  ``groupby(dst).sum`` → left-join back onto the node list for the
  damping update.  Three exchanges per iteration instead of one, but
  nothing node- or corpus-scale ever sits on the driver — only the
  dangling-mass scalar leaves the cluster.

Floats: contribution sums associate in shuffle order, so ranks carry
~1e-15-relative noise versus any fixed-order replay — callers that
need engine-independent output quantize to 1e-9 (established oracle
trick); the SQL oracle unrolls the same K iterations as chained CTEs.
Both modes share every arithmetic expression shape (``rank/od`` per
edge, ``Sum`` fold, ``base + add + d·s`` update), so they agree to
shuffle-order noise (pinned ≤1e-12 in pytest).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["pagerank"]


def pagerank(
    edges_ds,
    n_nodes: int,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    mode: str = "broadcast",
    num_buckets: int = 32,
):
    """``(node, rank)`` after ``iterations`` damped power steps from
    the uniform start.  Nodes are dense ints ``0..n_nodes-1``; nodes
    absent from the edge list are dangling (their mass redistributes
    uniformly).  Returns a pyarrow Table sorted by node.

    ``mode="broadcast"`` re-broadcasts the dense rank vector each
    iteration (one shuffle/iter; driver holds 8 B/node — fine to
    ~10⁸ nodes).  ``mode="join"`` keeps ranks a Dataset end-to-end
    (three exchanges/iter; nothing node-scale on the driver) — use it
    when the node count itself is corpus-scale.  Same float shapes,
    ranks agree to shuffle-order noise."""
    import ray.data
    from ray.data.aggregate import Sum

    if mode == "join":
        return _pagerank_join(
            edges_ds, n_nodes, iterations, damping, src, dst, num_buckets
        )

    # out-degree per src: one combiner groupby, result joined into a
    # per-edge weight column once (edges reused every iteration)
    import ray

    deg = edges_ds.groupby(src).count()
    from ..collect import tables_of

    deg_parts = tables_of(deg)
    # outdeg is node-scale metadata (like doclens); broadcast once.
    # No edges at all is well-defined: every node dangles, ranks stay
    # uniform — never a concat_tables([]) crash.
    outdeg = np.zeros(n_nodes, np.int64)
    if deg_parts:
        deg_tbl = pa.concat_tables(deg_parts)
        outdeg[deg_tbl[src].to_numpy(zero_copy_only=False)] = deg_tbl[
            "count()"
        ].to_numpy(zero_copy_only=False)
    outdeg_ref = ray.put(outdeg)

    # the rank vector lives on the driver between iterations (8 B/node
    # — the mode's documented envelope); each iteration broadcasts it
    # with ONE ray.put.  Wrapping it in a Dataset per iteration (the
    # old shape) only added a node-scale serialize→materialize→collect
    # round-trip that nothing consumed.
    rank = np.full(n_nodes, 1.0 / n_nodes)
    base = (1.0 - damping) / n_nodes

    for _ in range(iterations):
        rank_ref = ray.put(rank)

        def contribute(t: pa.Table) -> pa.Table:
            od = ray.get(outdeg_ref)
            r = ray.get(rank_ref)
            s = t[src].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": t[dst],
                    "c": pa.array(r[s] / od[s]),
                }
            )

        summed = (
            edges_ds.map_batches(contribute, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum(on="c", alias_name="s"))
        )
        sum_parts = tables_of(summed)
        dangling = float(rank[outdeg == 0].sum())
        add = damping * dangling / n_nodes
        new = np.full(n_nodes, base + add)
        if sum_parts:  # no contributions = all-dangling iteration
            sum_tbl = pa.concat_tables(sum_parts)
            nodes = sum_tbl["node"].to_numpy(zero_copy_only=False)
            sums = sum_tbl["s"].to_numpy(zero_copy_only=False)
            new[nodes] = base + add + damping * sums
        rank = new

    return pa.table(
        {
            "node": pa.array(np.arange(n_nodes, dtype=np.int64)),
            "rank": pa.array(rank),
        }
    )


def _pagerank_join(
    edges_ds,
    n_nodes: int,
    iterations: int,
    damping: float,
    src: str,
    dst: str,
    num_buckets: int,
):
    """Join-mode power iteration: ranks are a node-partitioned Dataset
    for the whole run; each iteration is edges⋈ranks → groupby(dst)
    → node-list left-join (the Spark/Pregel round shape).  The only
    values that ever reach the driver are the per-iteration
    dangling-mass scalar and the final sorted result."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from .join import hash_join

    edge_schema = pa.schema([(src, pa.int64()), (dst, pa.int64())])
    deg_schema = pa.schema([(src, pa.int64()), ("count()", pa.int64())])

    # one-time setup joins (edges reused every iteration → materialize)
    deg = edges_ds.groupby(src).count()
    edges_aug = (
        hash_join(
            edges_ds,
            deg,
            on=src,
            how="inner",
            num_buckets=num_buckets,
            left_schema=edge_schema,
            right_schema=deg_schema,
        )
        .map_batches(
            lambda t: pa.table(
                {
                    src: t[src],
                    dst: t[dst],
                    "od": t["count()"],
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # static node list with out-degree (od=0 ⇒ dangling), reused per
    # iteration for the damping update and the dangling-mass scalar
    nodes_only = ray.data.range(n_nodes).map_batches(
        lambda t: pa.table({"node": t["id"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    deg_as_node = deg.map_batches(
        lambda t: pa.table({"node": t[src], "od_r": t["count()"]}),
        batch_format="pyarrow",
    )
    node_ds = (
        hash_join(
            nodes_only,
            deg_as_node,
            on="node",
            how="left",
            num_buckets=num_buckets,
            left_schema=pa.schema([("node", pa.int64())]),
            right_schema=pa.schema([("node", pa.int64()), ("od_r", pa.int64())]),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "od": pc.fill_null(t["od_r"], 0),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    base = (1.0 - damping) / n_nodes
    r0 = 1.0 / n_nodes
    rank_ds = node_ds.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "rank": pa.array(np.full(t.num_rows, r0)),
                "od": t["od"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iterations):
        # dangling mass: the one driver-side scalar per round
        dangling_row = (
            rank_ds.map_batches(
                lambda t: t.filter(
                    pc.equal(t["od"], pa.scalar(0, pa.int64()))
                ).select(["rank"]),
                batch_format="pyarrow",
            ).aggregate(Sum(on="rank", alias_name="dm"))
        )
        dangling = float(dangling_row.get("dm") or 0.0)
        add = damping * dangling / n_nodes

        ranks_as_src = rank_ds.map_batches(
            lambda t: pa.table({src: t["node"], "rank": t["rank"]}),
            batch_format="pyarrow",
        )
        summed = (
            hash_join(
                edges_aug,
                ranks_as_src,
                on=src,
                how="inner",
                num_buckets=num_buckets,
                left_schema=pa.schema(
                    [(src, pa.int64()), (dst, pa.int64()), ("od", pa.int64())]
                ),
                right_schema=pa.schema([(src, pa.int64()), ("rank", pa.float64())]),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t[dst],
                        "c": pc.divide(t["rank"], t["od"].cast(pa.float64())),
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Sum(on="c", alias_name="s"))
        )

        def update(t: pa.Table, _base=base, _add=add) -> pa.Table:
            s = t["s"].to_numpy(zero_copy_only=False)
            s = np.where(np.isnan(s), 0.0, s)
            return pa.table(
                {
                    "node": t["node"],
                    "rank": pa.array(_base + _add + damping * s),
                    "od": t["od"],
                }
            )

        rank_ds = (
            hash_join(
                node_ds,
                summed,
                on="node",
                how="left",
                num_buckets=num_buckets,
                left_schema=pa.schema([("node", pa.int64()), ("od", pa.int64())]),
                right_schema=pa.schema(
                    [("node", pa.int64()), ("s", pa.float64())]
                ),
            )
            .map_batches(update, batch_format="pyarrow")
            .materialize()
        )

    from ..collect import tables_of

    return pa.concat_tables(tables_of(rank_ds.sort("node"))).select(
        ["node", "rank"]
    )

