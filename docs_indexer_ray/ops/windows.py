"""Windowed / sessionized aggregates over an ordered event log.

The reference has no streaming (SURVEY §2.3 — its "incremental" blog
indexer re-reads everything, ``/root/reference/blog.py:1-7`` vs
``blog.py:190-193``), but a training-data engine needs the
stream-shaped operators, expressed the Ray-Data-batch way: the input
is an ordered, partitioned log; windows are computed per key after a
hash shuffle; event-time semantics come from the data, not a clock.

* :func:`tumbling_window` — fixed windows: per-batch **partial
  aggregation** to (key, window) rows inside ``map_batches`` (the
  combiner — a batch of 10k events for a hot user collapses to a
  handful of rows before the shuffle), then one small
  ``groupby((key, window))`` final merge.
* :func:`sessionize` — gap-based sessions: hash shuffle on the key,
  per-key sort by ts, session ids from ``gap > timeout`` boundaries —
  vectorized per partition via the run-boundary trick (one multi-key
  sort, no per-session Python).

Both are deterministic and SQL-replicable (window = epoch-floor;
session = lag-gap + running sum), so the driver's DuckDB oracle checks
them exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "tumbling_window",
    "hopping_window",
    "sessionize",
    "topk_per_group",
    "head_k_per_key",
]


def _key_part(keys: np.ndarray, num_parts: int) -> np.ndarray:
    """Deterministic partition per key — int keys by value, anything
    else by crc32 of its string form (shared by every keyed shuffle in
    this module; a bare ``% num_parts`` broke string keys)."""
    if np.issubdtype(keys.dtype, np.integer):
        return (keys.astype(np.int64) % num_parts).astype(np.int32)
    import zlib

    return np.fromiter(
        (zlib.crc32(str(v).encode()) % num_parts for v in keys),
        np.int32,
        len(keys),
    )


def tumbling_window(
    ds,
    window_s: int = 3600,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """Per (key, window) count + sum; window = floor(epoch / window_s)."""
    from ray.data.aggregate import Count, Sum

    win_us = np.int64(window_s) * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        # numpy FLOOR division (pc.divide truncates toward zero —
        # pre-1970 events would bucket differently from hopping_window
        # and from the pre-Arrow behavior of this function)
        if batch.num_rows and batch[ts_col].null_count:
            # null-ts events can't be windowed (pandas dropped them)
            batch = batch.filter(pc.is_valid(batch[ts_col]))
        ts = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        win = pa.array(ts // win_us, pa.int64())
        agg = (
            pa.table(
                {
                    key: batch[key].combine_chunks(),
                    "window": win,
                    "v": batch[value_col].combine_chunks(),
                }
            )
            .group_by([key, "window"])
            .aggregate([([], "count_all"), ("v", "sum")])
        )
        return pa.table(
            {
                key: agg[key],
                "window": agg["window"],
                "n_part": agg["count_all"].cast(pa.int64()),
                "sum_part": agg["v_sum"],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key, "window"])
        .aggregate(
            Sum("n_part", alias_name="n_events"),
            Sum("sum_part", alias_name="sum_value"),
        )
    )


def hopping_window(
    ds,
    size_s: int = 3600,
    hop_s: int = 900,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """Per (key, window) count + sum for OVERLAPPING windows: window
    ``w`` covers ``[w·hop, w·hop + size)``, so each event lands in
    ``size/hop`` windows.  Same combiner-before-shuffle shape as
    :func:`tumbling_window` — the explode happens inside the partial
    aggregation, so the shuffle still carries (key, window) partials,
    not size/hop × events."""
    from ray.data.aggregate import Sum

    if size_s % hop_s != 0:
        raise ValueError("size_s must be a multiple of hop_s")
    hop_us = np.int64(hop_s) * 1_000_000
    k_windows = size_s // hop_s

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        last = ts // hop_us  # last window containing the event
        # explode to the k hop-windows covering each event — the
        # key/value explode is an Arrow take (type-preserving, no
        # numpy-object detour for string keys)
        off = np.arange(k_windows, dtype=np.int64)
        win = (last[:, None] - off[None, :]).reshape(-1)
        keep = win >= 0  # windows never start before the epoch
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k_windows)[keep])
        agg = (
            pa.table(
                {
                    key: batch[key].combine_chunks().take(idx),
                    "window": pa.array(win[keep], pa.int64()),
                    "v": batch[value_col].combine_chunks().take(idx),
                }
            )
            .group_by([key, "window"])
            .aggregate([([], "count_all"), ("v", "sum")])
        )
        return pa.table(
            {
                key: agg[key],
                "window": agg["window"],
                "n_part": agg["count_all"].cast(pa.int64()),
                "sum_part": agg["v_sum"],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key, "window"])
        .aggregate(
            Sum("n_part", alias_name="n_events"),
            Sum("sum_part", alias_name="sum_value"),
        )
    )


def head_k_per_key(
    t: pa.Table,
    key: str,
    order_col: str,
    k: int,
    ascending: bool = False,
    with_rank: bool = False,
) -> pa.Table:
    """Sort by (key asc, order-cols in the chosen direction), then
    keep each key run's first ``k`` rows — one stable Arrow sort + one
    run-boundary scan, no per-group Python.  Null-key rows are DROPPED
    first (pandas groupby semantics — without the filter each null key
    would seed its own singleton run and bypass the ≤k cap).  The
    shared kernel behind :func:`topk_per_group`'s partial AND final,
    and the serving tier's ``top_hits`` partial/fold
    (``query/served.py``) — per-key top-k composes exactly across
    disjoint doc ranges because re-applying the kernel to concatenated
    ≤k-per-key partials is idempotent."""
    dirn = "ascending" if ascending else "descending"
    if t.num_rows and t[key].null_count:
        t = t.filter(pc.is_valid(t[key]))
    order = [(key, "ascending"), (order_col, dirn)] + [
        (c, dirn) for c in t.column_names if c not in (key, order_col)
    ]
    t = t.sort_by(order)
    n = t.num_rows
    if n == 0:
        return t.append_column("rank", pa.array([], pa.int64())) if with_rank else t
    kcol = t[key].combine_chunks()
    new_key = np.concatenate(
        (
            [True],
            np.asarray(
                pc.not_equal(kcol.slice(1), kcol.slice(0, n - 1)).fill_null(True)
            ),
        )
    )
    starts = np.flatnonzero(new_key)
    lens = np.diff(np.append(starts, n))
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    t = t.filter(pa.array(pos < k))
    if with_rank:
        t = t.append_column("rank", pa.array(pos[pos < k] + 1, pa.int64()))
    return t


def topk_per_group(
    ds,
    key: str,
    order_col: str,
    k: int = 3,
    ascending: bool = False,
    num_parts: int = 32,
):
    """Top-``k`` rows per group by ``order_col`` (ties broken by every
    remaining column for determinism), with a per-batch partial top-k
    BEFORE the shuffle — only ≤ k rows per (batch, key) move — and a
    vectorized per-partition final selection (no per-group Python).
    Output: the selected rows + a 1-based ``rank`` column."""

    def partial(batch: pa.Table) -> pa.Table:
        return head_k_per_key(
            batch.replace_schema_metadata(None), key, order_col, k,
            ascending, with_rank=False,
        )

    def add_part(t: pa.Table) -> pa.Table:
        # drop pandas-roundtrip schema metadata — unhashable schemas
        # make every shuffle reduce task log "Failed to hash the
        # schemas" (see sessionize.add_part)
        t = t.replace_schema_metadata(None)
        keys = t[key].to_numpy(zero_copy_only=False)
        return t.append_column("__gpart", pa.array(_key_part(keys, num_parts)))

    def final(group: pa.Table) -> pa.Table:
        return head_k_per_key(
            group.drop_columns(["__gpart"]), key, order_col, k,
            ascending, with_rank=True,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__gpart")
        .map_groups(final, batch_format="pyarrow")
    )


def sessionize(
    ds,
    timeout_s: int = 1800,
    key: str = "user_id",
    ts_col: str = "ts",
    num_parts: int = 32,
):
    """Gap-based sessions: rows → (key, session_id, n_events,
    session_start, session_end).  ``session_id`` is the key's 0-based
    session ordinal in ts order (deterministic; ties keep event order
    stable by (ts, event_id) sort)."""
    gap_us = np.int64(timeout_s) * 1_000_000

    def add_part(t: pa.Table) -> pa.Table:
        keys = t[key].to_numpy(zero_copy_only=False)
        # drop file-level schema metadata (pandas-written parquet carries
        # b'pandas' json) — unhashable schemas make every shuffle reduce
        # task log a "Failed to hash the schemas" warning
        t = t.replace_schema_metadata(None)
        return t.append_column(
            "__kpart", pa.array(_key_part(keys, num_parts))
        )

    def sessions_of_partition(group: pa.Table) -> pa.Table:
        if group.num_rows and group[ts_col].null_count:
            # a null-ts event has no position in any session (the
            # pandas kernel's NaT rows sorted last and corrupted the
            # gap arithmetic; dropping is the documented semantics,
            # mirrored by the oracle's WHERE ts IS NOT NULL)
            group = group.filter(pc.is_valid(group[ts_col]))
        g = group.sort_by([(key, "ascending"), (ts_col, "ascending")])
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    key: group[key],
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.int64()),
                    "session_end": pa.array([], pa.int64()),
                }
            )
        kcol = g[key].combine_chunks()
        ts = (
            g[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        new_key = np.concatenate(
            (
                [True],
                np.asarray(
                    pc.not_equal(kcol.slice(1), kcol.slice(0, n - 1)).fill_null(True)
                ),
            )
        )
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        new_session = new_key | (gap > gap_us)
        # session ordinal per key: cumulative count of new_session
        # boundaries, reset at each key run (key runs are contiguous
        # after the sort, so "first sid of the run" is a repeat, not a
        # groupby)
        sid_global = np.cumsum(new_session) - 1
        kstarts = np.flatnonzero(new_key)
        klens = np.diff(np.append(kstarts, n))
        sid = sid_global - np.repeat(sid_global[kstarts], klens)
        # per-session aggregates straight off the run boundaries
        sstarts = np.flatnonzero(new_session)
        sends = np.append(sstarts[1:], n) - 1
        return pa.table(
            {
                key: kcol.take(pa.array(sstarts)),
                "session_id": pa.array(sid[sstarts], pa.int64()),
                "n_events": pa.array(sends - sstarts + 1, pa.int64()),
                "session_start": pa.array(ts[sstarts], pa.int64()),
                "session_end": pa.array(ts[sends], pa.int64()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__kpart")
        .map_groups(sessions_of_partition, batch_format="pyarrow")
    )
