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

K iterations = K shuffles — exactly the distributed algorithm's cost
model; nothing corpus-scale ever sits on the driver (ranks live in
the Dataset; the driver holds only the dangling-mass scalar).

Floats: contribution sums associate in shuffle order, so ranks carry
~1e-15-relative noise versus any fixed-order replay — callers that
need engine-independent output quantize to 1e-9 (established oracle
trick); the SQL oracle unrolls the same K iterations as chained CTEs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["pagerank"]


def pagerank(
    edges_ds,
    n_nodes: int,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
):
    """``(node, rank)`` after ``iterations`` damped power steps from
    the uniform start.  Nodes are dense ints ``0..n_nodes-1``; nodes
    absent from the edge list are dangling (their mass redistributes
    uniformly).  Returns a pyarrow Table sorted by node.

    At test scale ranks fit one block per iteration; the iteration
    BODY is expressed over Datasets (edge map → groupby sum), so the
    same loop runs with corpus-scale rank/edge partitions — the rank
    vector is carried as a Dataset between rounds, never a driver
    array (only the dangling-mass scalar leaves)."""
    import ray.data
    from ray.data.aggregate import Sum

    # out-degree per src: one combiner groupby, result joined into a
    # per-edge weight column once (edges reused every iteration)
    import ray

    deg = edges_ds.groupby(src).count()
    deg_tbl = pa.concat_tables([ray.get(r) for r in deg.to_arrow_refs()])
    # outdeg is node-scale metadata (like doclens); broadcast once
    outdeg = np.zeros(n_nodes, np.int64)
    outdeg[deg_tbl[src].to_numpy(zero_copy_only=False)] = deg_tbl[
        "count()"
    ].to_numpy(zero_copy_only=False)
    outdeg_ref = ray.put(outdeg)

    rank = np.full(n_nodes, 1.0 / n_nodes)
    rank_ds = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(np.arange(n_nodes, dtype=np.int64)),
                "rank": pa.array(rank),
            }
        )
    )
    base = (1.0 - damping) / n_nodes

    for _ in range(iterations):
        rank_ref = _ranks_to_ref(rank_ds, n_nodes)

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
        sum_tbl = pa.concat_tables(
            [ray.get(ref) for ref in summed.to_arrow_refs()]
        )
        r_now = ray.get(rank_ref)
        dangling = float(r_now[outdeg == 0].sum())
        add = damping * dangling / n_nodes
        new = np.full(n_nodes, base + add)
        nodes = sum_tbl["node"].to_numpy(zero_copy_only=False)
        sums = sum_tbl["s"].to_numpy(zero_copy_only=False)
        new[nodes] = base + add + damping * sums
        rank_ds = ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(np.arange(n_nodes, dtype=np.int64)),
                    "rank": pa.array(new),
                }
            )
        )

    return pa.table(
        {
            "node": pa.array(np.arange(n_nodes, dtype=np.int64)),
            "rank": pa.array(ray.get(_ranks_to_ref(rank_ds, n_nodes))),
        }
    )


def _ranks_to_ref(rank_ds, n_nodes: int):
    """Rank Dataset → broadcast dense vector (node-scale, the same
    footprint class as the reader's doclens)."""
    import ray

    t = pa.concat_tables([ray.get(r) for r in rank_ds.to_arrow_refs()])
    v = np.zeros(n_nodes)
    v[t["node"].to_numpy(zero_copy_only=False)] = t["rank"].to_numpy(
        zero_copy_only=False
    )
    return ray.put(v)
