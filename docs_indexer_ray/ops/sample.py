"""Deterministic corpus sampling — a value-property subsample.

Training-data pipelines routinely carve reproducible subsets ("take
1/16 of the crawl") that must be stable across reruns, cluster sizes
and partitionings.  Random sampling can't give that; hashing a key
column can: ``sample_by_hash`` keeps a row iff the md5 of its key
starts with one of ``16 × rate`` hex digits — a pure function of the
row, so ANY parallelism level selects the identical subset, and the
selection composes with resume/retry for free.  The same predicate is
one line of ANSI SQL (``substr(md5(key), 1, 1) IN (…)``), so the
driver's DuckDB oracle checks it bit-exactly.

For rates that aren't multiples of 1/16, ``bits`` controls the hex
prefix width (rate granularity ``16^-bits``).

Cost note: md5-per-row is the DELIBERATE price of SQL replicability
(DuckDB ``md5()`` pins the oracle bit-exactly); at ~1 µs/row it is
far from the pipeline's bottleneck, but a parity-free variant should
swap in the vectorized splitmix64 from ``ops/sketch.py``.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

__all__ = [
    "sample_by_hash",
    "stratified_sample_by_hash",
    "temperature_resample",
    "hash_prefixes",
    "seeded_shuffle",
]

_HEX = "0123456789abcdef"


def hash_prefixes(rate: float, bits: int = 1) -> frozenset[str]:
    """The lexicographically-first hex prefixes covering ``rate``."""
    n_slots = 16**bits
    keep = round(rate * n_slots)
    if not 0 < keep <= n_slots:
        raise ValueError(f"rate {rate} not representable with {bits} hex digit(s)")

    def gen(b: int):
        if b == 0:
            yield ""
            return
        for c in _HEX:
            for rest in gen(b - 1):
                yield c + rest

    return frozenset(list(gen(bits))[:keep])


def sample_by_hash(ds, key: str = "text", rate: float = 1 / 16, bits: int = 1):
    """Keep rows whose ``md5(key)`` falls in the first ``rate`` of the
    hash space (hex-prefix buckets).  Deterministic, parallelism- and
    partitioning-invariant; selection is per-row (streams, no shuffle).
    """
    prefixes = hash_prefixes(rate, bits)

    def flt(t: pa.Table) -> pa.Table:
        # null keys are DROPPED, matching the SQL oracle where
        # md5(NULL) IS NULL (str(None) would hash every null into one
        # all-or-nothing 'None' bucket)
        keep = [
            v is not None
            and hashlib.md5(
                (v if isinstance(v, str) else str(v)).encode("utf-8")
            ).hexdigest()[:bits]
            in prefixes
            for v in t[key].to_pylist()
        ]
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(flt, batch_format="pyarrow")


def stratified_sample_by_hash(
    ds,
    key: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    bits: int = 1,
):
    """Per-stratum deterministic subsample: each row's keep-rate is
    chosen by its ``group_col`` value (``rates[group]``, else
    ``default_rate``), selection by the same md5 hex-prefix value
    property as :func:`sample_by_hash` — so every stratum's subset is
    parallelism-invariant AND nested (a 2/16 sample contains the 1/16
    sample).  The standard class-rebalancing op for training-data
    pipelines (downsample boilerplate strata, keep rare ones whole).
    Streams per row; no shuffle."""
    pref = {
        g: (hash_prefixes(r, bits) if r > 0 else frozenset())
        for g, r in rates.items()
    }
    dflt = hash_prefixes(default_rate, bits) if default_rate > 0 else frozenset()

    def flt(t: pa.Table) -> pa.Table:
        groups = t[group_col].to_pylist()
        keys = t[key].to_pylist()
        keep = []
        for g, v in zip(groups, keys):
            allowed = pref.get(g, dflt)
            if not allowed or v is None:  # null key: md5(NULL) IS NULL
                keep.append(False)
                continue
            s = v if isinstance(v, str) else str(v)
            keep.append(hashlib.md5(s.encode("utf-8")).hexdigest()[:bits] in allowed)
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(flt, batch_format="pyarrow")


def temperature_resample(
    ds,
    group_col: str,
    key: str = "text",
    alpha: float = 0.5,
    out_frac: float = 0.5,
    bits: int = 2,
    counts: dict | None = None,
):
    """Temperature-weighted mixture resampling across sources — the
    multilingual/multi-source rebalancing rule (α-scaled sampling,
    Devlin et al. 2019 §multilingual; UniMax, Chung et al. 2023):
    source ``s`` with ``n_s`` docs gets target share
    ``p_s ∝ n_s^α`` (α<1 flattens the mixture toward rare sources),
    i.e. keep-rate ``r_s = min(1, out_frac · N · n_s^α / Σ n^α / n_s)``.

    Rates snap to the md5 hex-prefix grid (``16^bits`` slots —
    ``slots_s = round(r_s · 16^bits)``) and selection reuses
    :func:`stratified_sample_by_hash`'s value property, so the chosen
    subset is parallelism-invariant, nested across reruns with higher
    ``out_frac``, and replayable in SQL (prefix-string compare against
    ``to_hex(slots)``).  Float contract: ``n^α`` is libm ``pow``;
    ``Σ n^α`` is summed in SORTED group order; slot rounding happens
    once, on the rate — all mirrored by the oracle's expression
    shapes.

    Pass 1 is a tiny combiner ``groupby(count)`` (or supply
    ``counts``); pass 2 streams.  Returns ``(sampled_ds, rates)``
    where ``rates`` maps group → snapped rate."""
    n_slots = 16**bits
    if counts is None:
        from ray.data.aggregate import Count

        rows = ds.groupby(group_col).aggregate(Count(alias_name="cnt")).take_all()
        counts = {r[group_col]: int(r["cnt"]) for r in rows}
    total = sum(counts.values())
    sumw = sum(c**alpha for _, c in sorted(counts.items()))
    rates: dict[str, float] = {}
    for g, c in counts.items():
        r = min(1.0, out_frac * total * (c**alpha) / sumw / c)
        rates[g] = round(r * n_slots) / n_slots
    return (
        stratified_sample_by_hash(
            ds, key=key, group_col=group_col, rates=rates, bits=bits
        ),
        rates,
    )


def seeded_shuffle(ds, seed: int, key: str = "doc_id"):
    """Deterministic seeded global shuffle — the reproducible
    training-order step.

    Orders the corpus by ``md5(seed || ':' || key)`` (ties broken by
    the key itself, so duplicates can't reorder non-deterministically):
    the permutation is a pure function of (seed, data) — identical at
    any parallelism, resumable, and replayable by one line of SQL
    (``ORDER BY md5(seed || ':' || key)``), unlike
    ``Dataset.random_shuffle`` whose layout depends on the run.

    Shape at scale: compute the hash per row in a streaming
    ``map_batches``, then ONE ``sort`` all-to-all on it — the same
    exchange ``random_shuffle`` pays, but with a value-property order.
    The hash column is dropped after the sort.
    """
    import pyarrow.compute as _pc  # noqa: F401  (parity with module style)

    def add_key(t: pa.Table) -> pa.Table:
        vals = t[key].to_pylist()
        hs = [
            hashlib.md5(f"{seed}:{v}".encode("utf-8")).hexdigest() for v in vals
        ]
        # drop parquet pandas metadata before the sort exchange — Ray's
        # reduce-side schema dedup can't hash it and logs per task
        return t.replace_schema_metadata(None).append_column(
            "__shuffle_key", pa.array(hs, pa.string())
        )

    shuffled = ds.map_batches(add_key, batch_format="pyarrow").sort(
        ["__shuffle_key", key]
    )
    return shuffled.map_batches(
        lambda t: t.drop_columns(["__shuffle_key"]), batch_format="pyarrow"
    )
