"""Join operators: broadcast (map-side) and partitioned hash join.

The reference's only join-like operation is a broadcast dict lookup
(S3→T4: ``last_modified.get(path)``, ``/root/reference/hugo.py:330-331``).
A data engine needs both canonical distributed shapes:

* :func:`broadcast_join` — small side ``ray.put`` once, every map task
  reads it zero-copy from the object store and joins its batch with an
  Arrow hash join.  No shuffle; the right side must fit in worker
  memory.
* :func:`hash_join` — both sides large: each side gets a
  ``bucket = hash(key) % B`` column, the bucket datasets are unioned
  with a side tag, ONE ``groupby(bucket)`` co-locates matching keys,
  and each group joins its two sides with one Arrow hash join.  One
  shuffle total; skew-prone hot keys can be salted by the same
  doc-range trick the postings build uses (not needed for these key
  distributions).

Both paths are Arrow end-to-end (``pyarrow.Table.join`` — vectorized
hash join, no pandas object-dtype round-trip).  Keys may be integers
or strings; anything else is bucketed by its string form.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

__all__ = ["broadcast_join", "hash_join", "asof_join", "range_join"]

_HOW = {"inner": "inner", "left": "left outer", "right": "right outer", "outer": "full outer"}


def _as_table(small) -> pa.Table:
    if isinstance(small, pa.Table):
        return small
    return pa.Table.from_pandas(small, preserve_index=False)


def broadcast_join(
    ds,
    small_df,
    on: str,
    how: str = "inner",
):
    """Join a Dataset against a small in-memory table (broadcast once).

    ``small_df`` may be a ``pyarrow.Table`` or a pandas ``DataFrame``.

    Only ``inner`` and ``left`` are valid here: the join runs per
    BATCH, so right/full-outer would re-emit every unmatched small-side
    row once per block (and null-padded even when another block matches
    it).  Use :func:`hash_join` for right/outer semantics."""
    import ray

    if how not in ("inner", "left"):
        raise ValueError(
            f"broadcast_join supports how='inner'|'left', got {how!r} — "
            "a per-batch join cannot decide 'unmatched on the small "
            "side' globally; use hash_join for right/outer"
        )
    join_type = _HOW[how]
    ref = ray.put(_as_table(small_df))

    def join_batch(batch: pa.Table) -> pa.Table:
        small = ray.get(ref)
        return batch.join(small, keys=on, join_type=join_type)

    return ds.map_batches(join_batch, batch_format="pyarrow")


def _bucket_of(col: pa.ChunkedArray | pa.Array, num_buckets: int) -> np.ndarray:
    """Deterministic bucket per key value (ints by value, strings by
    crc32, everything else by its string form)."""
    if pa.types.is_integer(col.type):
        keys = col.to_numpy(zero_copy_only=False).astype(np.int64)
        return (keys % num_buckets).astype(np.int32)
    vals = col.to_pylist()
    return np.fromiter(
        (
            zlib.crc32(v.encode() if isinstance(v, str) else str(v).encode())
            % num_buckets
            for v in vals
        ),
        np.int32,
        len(vals),
    )


def hash_join(
    left,
    right,
    on: str,
    num_buckets: int = 32,
    how: str = "inner",
    suffixes: tuple[str, str] = ("_l", "_r"),
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Partitioned hash join of two Datasets on one key column.

    ``union`` needs one schema, so each side is padded with the other
    side's columns as nulls before the tag; the per-bucket join then
    re-selects each side's true columns and runs one Arrow hash join.
    Size ``num_buckets`` to ~2× the reducer slots of the cluster.

    Pass ``left_schema`` / ``right_schema`` (``pyarrow.Schema``) when
    the caller knows them statically — ``Dataset.schema()`` otherwise
    has to execute part of the upstream pipeline just to find out, and
    returns nothing useful for a pipeline whose sample block is empty.
    """
    join_type = _HOW[how]
    left_schema = left_schema if left_schema is not None else left.schema()
    right_schema = right_schema if right_schema is not None else right.schema()
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    types = {
        **dict(zip(right_schema.names, right_schema.types)),
        **dict(zip(left_schema.names, left_schema.types)),
    }
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]

    def tag(side: int, have: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            bucket = _bucket_of(t[on], num_buckets)
            for c in all_cols:
                if c not in have:
                    t = t.append_column(c, pa.nulls(t.num_rows, types[c]))
            t = t.select(all_cols)
            t = t.append_column("__bucket", pa.array(bucket))
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, np.int8))
            )

        return fn

    both = left.map_batches(tag(0, left_cols), batch_format="pyarrow").union(
        right.map_batches(tag(1, right_cols), batch_format="pyarrow")
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        l = group.filter(pa.array(side == 0)).select(left_cols)
        r = group.filter(pa.array(side == 1)).select(right_cols)
        return l.join(
            r,
            keys=on,
            join_type=join_type,
            left_suffix=suffixes[0],
            right_suffix=suffixes[1],
        )

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def asof_join(
    left,
    right,
    on: str,
    left_ts: str,
    right_ts: str,
    num_buckets: int = 32,
    direction: str = "backward",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Distributed AS-OF join (time-series point-in-time lookup): for
    every left row, the single right row with the same ``on`` key and
    the greatest ``right_ts`` ≤ ``left_ts`` (``direction="backward"``;
    ``"forward"`` takes the smallest ≥).  Unmatched left rows keep
    nulls — left-join semantics, like DuckDB/kdb ASOF JOIN.

    Shape: the same ONE-shuffle bucket co-location as
    :func:`hash_join` (hash both sides by key, union with a side tag,
    ``groupby(bucket)``), then each bucket runs ``pandas.merge_asof``
    with ``by=key`` — a vectorized C kernel over the bucket's rows,
    never the driver.  The right side must be unique per
    ``(key, right_ts)`` (pre-aggregate first; enforced per bucket so
    ties can't pick an engine-dependent winner).

    Timestamps may be Arrow timestamps or any ordered numeric; both
    ``ts`` columns must be the same type.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    left_schema = left_schema if left_schema is not None else left.schema()
    right_schema = right_schema if right_schema is not None else right.schema()
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    overlap = (set(left_cols) & set(right_cols)) - {on}
    if overlap:
        raise ValueError(
            f"rename overlapping non-key columns before asof_join: {sorted(overlap)}"
        )
    types = {
        **dict(zip(right_schema.names, right_schema.types)),
        **dict(zip(left_schema.names, left_schema.types)),
    }
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]

    def tag(side: int, have: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            t = t.replace_schema_metadata(None)
            bucket = _bucket_of(t[on], num_buckets)
            for c in all_cols:
                if c not in have:
                    t = t.append_column(c, pa.nulls(t.num_rows, types[c]))
            t = t.select(all_cols)
            t = t.append_column("__bucket", pa.array(bucket))
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, np.int8))
            )

        return fn

    both = left.map_batches(tag(0, left_cols), batch_format="pyarrow").union(
        right.map_batches(tag(1, right_cols), batch_format="pyarrow")
    )

    right_val_cols = [c for c in right_cols if c != on]

    out_cols = left_cols + [c for c in right_cols if c != on]

    def join_bucket(group: pa.Table) -> pa.Table:
        import pandas as pd

        # split sides in ARROW: each side's true columns are non-null
        # there, so ints stay ints (the union's null padding would
        # degrade them to float64 in a pandas group)
        side = group["__side"].to_numpy(zero_copy_only=False)
        l = group.filter(pa.array(side == 0)).select(left_cols).to_pandas()
        r = (
            group.filter(pa.array(side == 1))
            .select([on, right_ts] + [c for c in right_val_cols if c != right_ts])
            .to_pandas()
        )
        if r.duplicated([on, right_ts]).any():
            raise ValueError(
                f"asof_join right side not unique per ({on}, {right_ts}) — "
                "pre-aggregate the right side first"
            )
        # right int VALUE columns go nullable BEFORE the merge: one
        # unmatched left row would otherwise float64-convert the whole
        # column, silently corrupting 64-bit ids above 2^53 (the merge
        # keys themselves never null, so they stay plain int64)
        for c in r.columns:
            if c not in (on, right_ts) and r[c].dtype.kind in "iu":
                r[c] = r[c].astype("Int64")
        out = pd.merge_asof(
            l.sort_values([left_ts, *left_cols], kind="mergesort"),
            r.sort_values(right_ts, kind="mergesort"),
            left_on=left_ts,
            right_on=right_ts,
            by=on,
            direction=direction,
        )
        # unmatched left rows hold NaN in the right columns — restore
        # nullable Arrow types (a bucket with no misses would otherwise
        # emit int64 while its neighbor emits float64: schema drift)
        arrays = []
        for c in out_cols:
            typ = types[c]
            s = out[c]
            if pa.types.is_integer(typ) and s.dtype.kind == "f":
                s = s.astype("Int64")
            arrays.append(pa.array(s, type=typ, from_pandas=True))
        return pa.table(dict(zip(out_cols, arrays)))

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def range_join(
    ds,
    intervals,
    on: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
):
    """Interval (range) join: every ``(row, interval)`` pair with
    ``lo ≤ row[on] < hi`` — the banding/bucketing join (price bands,
    SLA windows, histogram buckets), overlapping intervals included
    (a row lands in EVERY containing interval).

    Scale shape: the interval side of a range join is dimension
    metadata — orders of magnitude smaller than the fact stream — so
    it broadcasts once (``ray.put``; same budget class as
    :func:`broadcast_join`'s small side).  Per batch the fact values
    sort ONCE (argsort); each interval then contributes one
    ``[searchsorted(lo), searchsorted(hi))`` slice of the sorted
    order — O(n log n + m log n + output) per batch, fully
    vectorized, no per-row Python.  For interval tables too large to
    broadcast, pre-bucket BOTH sides on a coarse value grid and run
    this join per bucket (the standard distributed range-join
    partitioning; overlapping intervals replicate into every grid
    cell they touch).

    Column names of ``ds`` and ``intervals`` must be disjoint
    (raises otherwise); the interval row's columns (including
    ``lo``/``hi``) ride along on every emitted pair.  Inner
    semantics: rows inside no interval are dropped.
    """
    import ray

    iv = _as_table(intervals)
    iv_ref = ray.put(iv)

    def fn(t: pa.Table) -> pa.Table:
        iv = ray.get(iv_ref)
        clash = set(iv.column_names) & set(t.column_names)
        if clash:
            raise ValueError(f"range_join column collision: {sorted(clash)}")
        v = t[on].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        sv = v[order]
        los = iv[lo_col].to_numpy(zero_copy_only=False)
        his = iv[hi_col].to_numpy(zero_copy_only=False)
        l = np.searchsorted(sv, los, side="left")
        r = np.searchsorted(sv, his, side="left")
        n_per = np.maximum(r - l, 0)
        if int(n_per.sum()) == 0:
            take_rows = np.array([], np.int64)
        else:
            take_rows = np.concatenate(
                [order[a:b] for a, b in zip(l, r) if b > a]
            )
        take_iv = np.repeat(np.arange(iv.num_rows, dtype=np.int64), n_per)
        left = t.take(pa.array(take_rows, pa.int64()))
        right = iv.take(pa.array(take_iv, pa.int64()))
        cols = {c: left[c] for c in left.column_names}
        cols.update({c: right[c] for c in right.column_names})
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
