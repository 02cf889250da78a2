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
import pandas as pd
import pyarrow as pa

__all__ = ["tumbling_window", "hopping_window", "sessionize", "topk_per_group"]


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
        keys = batch[key].to_numpy(zero_copy_only=False)
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        win = (ts.astype(np.int64) // win_us).astype(np.int64)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({key: keys, "window": win, "v": vals})
        agg = df.groupby([key, "window"], sort=False).agg(
            n_part=("v", "size"), sum_part=("v", "sum")
        )
        agg = agg.reset_index()
        # strip pandas schema metadata before the shuffle (unhashable
        # schemas spam every reduce task's log)
        return pa.Table.from_pandas(
            agg, preserve_index=False
        ).replace_schema_metadata(None)

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
        keys = batch[key].to_numpy(zero_copy_only=False)
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        last = ts.astype(np.int64) // hop_us  # last window containing the event
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        # explode to the k hop-windows covering each event
        off = np.arange(k_windows, dtype=np.int64)
        win = (last[:, None] - off[None, :]).reshape(-1)
        keep = win >= 0  # windows never start before the epoch
        df = pd.DataFrame(
            {
                key: np.repeat(keys, k_windows)[keep],
                "window": win[keep],
                "v": np.repeat(vals, k_windows)[keep],
            }
        )
        agg = df.groupby([key, "window"], sort=False).agg(
            n_part=("v", "size"), sum_part=("v", "sum")
        )
        return pa.Table.from_pandas(
            agg.reset_index(), preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key, "window"])
        .aggregate(
            Sum("n_part", alias_name="n_events"),
            Sum("sum_part", alias_name="sum_value"),
        )
    )


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

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        order = [order_col] + [c for c in batch.columns if c != order_col]
        g = batch.sort_values(order, ascending=ascending, kind="mergesort")
        return g.groupby(key, sort=False).head(k)

    def add_part(t: pa.Table) -> pa.Table:
        # drop pandas-roundtrip schema metadata — unhashable schemas
        # make every shuffle reduce task log "Failed to hash the
        # schemas" (see sessionize.add_part)
        t = t.replace_schema_metadata(None)
        keys = t[key].to_numpy(zero_copy_only=False)
        return t.append_column("__gpart", pa.array(_key_part(keys, num_parts)))

    def final(group: pd.DataFrame) -> pd.DataFrame:
        group = group.drop(columns="__gpart")
        order = [key, order_col] + [
            c for c in group.columns if c not in (key, order_col)
        ]
        asc = [True] + [ascending] * (len(order) - 1)
        g = group.sort_values(order, ascending=asc, kind="mergesort")
        g = g.groupby(key, sort=False).head(k)
        g["rank"] = g.groupby(key, sort=False).cumcount() + 1
        return g

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__gpart")
        .map_groups(final, batch_format="pandas")
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

    def sessions_of_partition(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key, ts_col], kind="mergesort")
        keys = g[key].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        new_session = new_key | (gap > gap_us)
        # session ordinal per key: cumulative count of new_session
        # boundaries, reset at each key run
        sid_global = np.cumsum(new_session) - 1
        key_first_sid = pd.Series(sid_global).groupby(keys).transform("min").to_numpy()
        sid = sid_global - key_first_sid
        df = pd.DataFrame(
            {key: keys, "session_id": sid.astype(np.int64), "ts": ts}
        )
        out = df.groupby([key, "session_id"], sort=False).agg(
            n_events=("ts", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        )
        return out.reset_index()

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__kpart")
        .map_groups(sessions_of_partition, batch_format="pandas")
    )
