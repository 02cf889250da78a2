"""Block collection helper.

``tables_of(ds)`` materializes a Dataset once (no schema-probe
re-execution — see the materialize-first rule, commit 96f9813) and
returns its non-empty Arrow tables: Ray aggregates nondeterministically
emit 0-row blocks whose schema is EMPTY, which poisons
``pa.concat_tables`` — every collector must drop them."""

from __future__ import annotations

import pyarrow as pa

__all__ = ["tables_of"]


def tables_of(ds) -> list[pa.Table]:
    import ray

    return [
        t
        for t in (ray.get(r) for r in ds.materialize().to_arrow_refs())
        if t.num_rows and t.num_columns
    ]
