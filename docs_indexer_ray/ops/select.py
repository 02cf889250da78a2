"""Token-budget data selection — pick the best documents that fit a
training-token budget.

The standard curation endgame (FineWeb-Edu, Dolma, phi-style "textbook"
selection): rank the corpus by a quality score and keep documents from
the top until the cumulative token count reaches the budget.  The hard
distributed part is the GLOBAL prefix sum over the sorted order; this
module does it the scale-correct way:

1. ``Dataset.sort`` on ``(score desc, id asc)`` — one all-to-all (the
   deterministic tie-break makes the kept set engine-independent);
2. per-block cost totals — one tiny ``ray.remote`` round emitting ONE
   scalar per block (never the rows);
3. driver-side cumsum over the **block-count-scale** totals vector →
   each block's starting offset;
4. selection tasks ONLY for blocks whose offset is still under budget
   (a block that starts past the budget is never read again — the
   selection pass costs O(selected prefix), not O(corpus));
5. inside a block: vectorized local cumsum + offset, keep rows while
   ``offset + cumsum ≤ budget`` (greedy prefix, cost of the kept doc
   included).

A SQL window replay (``SUM(cost) OVER (ORDER BY score DESC, id ASC)``)
pins the semantics bit-exactly: costs are int64 so the running sum has
no float association noise, and the float score only participates via
EXACT comparisons (sorting), which every IEEE engine orders the same.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["budget_select"]


def budget_select(
    ds,
    budget: int,
    score_col: str = "score",
    cost_col: str = "n_tokens",
    id_col: str = "doc_id",
):
    """Greedy top-score prefix under a total-cost budget.

    Returns a pyarrow Table ``(id_col, score_col, cost_col,
    cum_cost)`` of the selected documents in selection order —
    ``cum_cost`` (int64, inclusive) never exceeds ``budget``.  A doc is
    kept iff every better-scored doc plus itself still fits.  Ties on
    score break by ``id_col`` asc, so the kept set is deterministic
    across engines and parallelism levels.

    Output is the SELECTED subset (budget-scale, not corpus-scale) —
    callers that want a corpus-wide ``kept`` flag can anti-join the
    ids back.
    """
    import ray

    sorted_ds = ds.sort([score_col, id_col], descending=[True, False])
    refs = sorted_ds.materialize().to_arrow_refs()

    @ray.remote(num_cpus=1)
    def block_total(t: pa.Table) -> int:
        if t.num_rows == 0:
            return 0
        return int(
            np.sum(t[cost_col].to_numpy(zero_copy_only=False).astype(np.int64))
        )

    totals = ray.get([block_total.remote(r) for r in refs])
    offsets = np.zeros(len(totals) + 1, np.int64)
    np.cumsum(np.asarray(totals, np.int64), out=offsets[1:])

    @ray.remote(num_cpus=1)
    def select_block(t: pa.Table, offset: int) -> pa.Table:
        cost = t[cost_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = offset + np.cumsum(cost)
        keep = cum <= budget
        out = t.select([id_col, score_col, cost_col]).filter(pa.array(keep))
        return out.append_column("cum_cost", pa.array(cum[keep], pa.int64()))

    # only blocks that start within budget can contribute — later
    # blocks are never touched (selection cost ∝ selected prefix).
    # <= not <: a zero-cost row whose prefix sum equals the budget
    # exactly must be kept regardless of which block boundary it lands
    # on (the SQL window oracle keeps it; < made the kept set
    # partitioning-dependent)
    tasks = [
        select_block.remote(r, int(offsets[i]))
        for i, r in enumerate(refs)
        if offsets[i] <= budget
    ]
    parts = [t for t in ray.get(tasks) if t.num_rows]
    if not parts:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                score_col: pa.array([], pa.float64()),
                cost_col: pa.array([], pa.int64()),
                "cum_cost": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(parts)
