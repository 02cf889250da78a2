"""OpenAPIv3 / CRD schema → indexable text (reference parity S6/T7).

The reference keeps two currently-uncalled functions from its removed
api-spec indexer: ``read_crd`` (YAML file → dict,
``/root/reference/hugo.py:357-360``) and ``collect_properties_text``
(depth-first walk of an OpenAPIv3 ``properties`` hierarchy emitting
each description and property name, ``hugo.py:363-375``, pinned by
``hugo_test.py:152-186``).  Re-implemented here so a reference user's
api-spec pipeline has a home: the pure functions match the reference's
emission order exactly, and :func:`openapi_properties_text` lifts them
into a streaming ``map_batches`` stage over a YAML/JSON schema column.

The walk is ITERATIVE (explicit stack) — crawled schemas nest
arbitrarily deep, and one pathological document must not blow the
recursion limit of a whole Ray task (the same guard the markdown
blockquote and Porter y-run walks needed)."""

from __future__ import annotations

import yaml

try:  # pragma: no cover - env-dependent
    from yaml import CSafeLoader as _Loader
except ImportError:  # pragma: no cover
    from yaml import SafeLoader as _Loader

__all__ = ["read_crd", "collect_properties_text", "openapi_properties_text"]


def read_crd(path: str) -> dict | None:
    """Parse one CRD/OpenAPI YAML file to a dict (reference S6,
    ``hugo.py:357-360``).  SafeLoader — crawled manifests are untrusted
    input, so the reference's full ``yaml.Loader`` (arbitrary Python
    object construction) is deliberately narrowed."""
    with open(path, "rb") as f:
        return yaml.load(f, Loader=_Loader)


def collect_properties_text(schema: dict) -> list[str]:
    """Depth-first: a node's ``description`` first, then each property
    name followed by that property's own emission, in schema order —
    the exact sequence ``hugo_test.py:168-186`` pins.

    Non-dict nodes (crawled junk: a string where a schema should be)
    contribute nothing instead of raising."""
    out: list[str] = []
    # stack of iterators over (emit-name, node) pairs; names emit before
    # their subtree, matching the recursive definition's order
    if not isinstance(schema, dict):
        return out
    stack = [iter([(None, schema)])]
    while stack:
        try:
            name, node = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if name is not None:
            out.append(name)
        if not isinstance(node, dict):
            continue
        desc = node.get("description")
        if desc is not None:
            out.append(desc)
        props = node.get("properties")
        if isinstance(props, dict):
            stack.append(iter(list(props.items())))
    return out


def openapi_properties_text(ds, schema_col: str = "schema", out_col: str = "text"):
    """Streaming stage: parse a YAML/JSON schema string column and emit
    the space-joined properties text alongside every input column —
    one ``map_batches`` pass, no shuffle.  Unparseable or non-mapping
    documents yield an empty string (per-row degrade, never a failed
    task — the reference's log-and-continue posture)."""
    import pyarrow as pa

    def extract(batch: pa.Table) -> pa.Table:
        texts: list[str] = []
        for raw in batch[schema_col].to_pylist():
            if raw is None:
                texts.append("")
                continue
            if isinstance(raw, bytes):
                raw = raw.decode("utf-8", errors="replace")
            try:
                doc = yaml.load(raw, Loader=_Loader)
            except yaml.YAMLError:
                texts.append("")
                continue
            texts.append(" ".join(str(p) for p in collect_properties_text(doc)))
        col = pa.array(texts, pa.string())
        if out_col in batch.column_names:
            # replace, never append a duplicate name (Arrow allows
            # duplicates; downstream batch[out_col] would be ambiguous)
            return batch.set_column(
                batch.column_names.index(out_col), out_col, col
            )
        return batch.append_column(out_col, col)

    return ds.map_batches(extract, batch_format="pyarrow")
