"""Join operators: broadcast (map-side) and partitioned hash join.

The reference's only join-like operation is a broadcast dict lookup
(S3→T4: ``last_modified.get(path)``, ``/root/reference/hugo.py:330-331``).
A data engine needs both canonical distributed shapes:

* :func:`broadcast_join` — small side ``ray.put`` once, every map task
  reads it zero-copy from the object store and joins its batch with a
  pandas merge.  No shuffle; the right side must fit in worker memory.
* :func:`hash_join` — both sides large: each side gets a
  ``bucket = hash(key) % B`` column, the bucket datasets are unioned
  with a side tag, ONE ``groupby(bucket)`` co-locates matching keys,
  and each group joins its two sides locally.  One shuffle total;
  skew-prone hot keys can be salted by the same doc-range trick the
  postings build uses (not needed for these key distributions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["broadcast_join", "hash_join"]


def broadcast_join(
    ds,
    small_df: pd.DataFrame,
    on: str,
    how: str = "inner",
):
    """Join a Dataset against a small in-memory table (broadcast once)."""
    import ray

    ref = ray.put(small_df)

    def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(ref)
        return batch.merge(small, on=on, how=how)

    return ds.map_batches(join_batch, batch_format="pandas")


def hash_join(
    left,
    right,
    on: str,
    num_buckets: int = 32,
    how: str = "inner",
    suffixes: tuple[str, str] = ("_l", "_r"),
):
    """Partitioned hash join of two Datasets on an integer key.

    ``union`` needs one schema, so each side is padded with the other
    side's columns as nulls before the tag; the per-bucket join then
    re-selects each side's true columns.
    """
    left_schema = left.schema()
    right_schema = right.schema()
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    types = {
        **dict(zip(right_schema.names, right_schema.types)),
        **dict(zip(left_schema.names, left_schema.types)),
    }
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]

    def tag(side: int, have: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            keys = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
            for c in all_cols:
                if c not in have:
                    t = t.append_column(c, pa.nulls(t.num_rows, types[c]))
            t = t.select(all_cols)
            t = t.append_column(
                "__bucket", pa.array((keys % num_buckets).astype(np.int32))
            )
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, np.int8))
            )

        return fn

    both = left.map_batches(tag(0, left_cols), batch_format="pyarrow").union(
        right.map_batches(tag(1, right_cols), batch_format="pyarrow")
    )

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group.loc[group["__side"] == 0, left_cols]
        r = group.loc[group["__side"] == 1, right_cols]
        return l.merge(r, on=on, how=how, suffixes=suffixes)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")
