"""Deterministic synthesis of the ``pages`` input table.

The engine's input contract (BASELINE.json input_hint) is a Parquet
table of Common-Crawl-style web pages::

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

No such table ships in ``/root/testdata``, so it is synthesised
deterministically (no randomness, no external data) two ways:

* :func:`pages_from_documents` — derives pages from the driver's
  ``documents.parquet`` with **SQL-replicable** rules, so every derived
  column can be recomputed by a DuckDB oracle over the ``documents``
  view (this is what ``__ray_entry__.queries`` / ``oracle_sql`` use):

  - ``url      = 'https://docs.test/d/' || lpad(doc_id, 6, '0') || '/'``
  - ``warc_ts  = TIMESTAMP '2025-01-01' + doc_id * INTERVAL 1 second``
  - ``html     = b'<html><body><p>' + escape(text) + b'</p></body></html>'``
  - ``text``/``lang`` carried through.
  - Every ``doc_id % DUP_EVERY == 0`` page additionally gets a *newer*
    duplicate crawl (same url, ``warc_ts + 1 hour``, body
    ``text || ' refresh'``) so last-writer-wins dedup is exercised;
    the post-dedup body is ``CASE WHEN doc_id % 10 = 0 THEN
    text || ' refresh' ELSE text END``.

  The HTML wrap has no whitespace between tags and escapes ``& < >``
  only, so the reference extractor (``common.py:33-38`` semantics — all
  text nodes joined by ``''`` with entities decoded) returns the
  original ``text`` byte-identically.

* :func:`rich_pages_table` — a small in-memory corpus exercising the
  *full* reference extraction surface (YAML front matter, Hugo
  shortcodes, fenced code, pipe tables, heading anchors, malformed
  front matter, mixed-case urls, duplicate urls) per FIXTURES.md §1.
  Used by the pytest suite, not by the SQL oracle.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

DUP_EVERY = 10
BASE_URL = "https://docs.test"
BASE_TS_US = 1735689600_000_000  # 2025-01-01T00:00:00Z in microseconds
HOUR_US = 3600_000_000

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def wrap_html(text: str) -> bytes:
    """The SQL-replicable HTML wrap (see module docstring)."""
    return (
        b"<html><body><p>"
        + _html.escape(text, quote=False).encode("utf-8")
        + b"</p></body></html>"
    )


def url_for(doc_id: int) -> str:
    return f"{BASE_URL}/d/{doc_id:06d}/"


def _pages_batch(batch: pa.Table, *, dup_every: int, text_suffix: str, ts_shift_us: int) -> pa.Table:
    """documents batch → pages batch (optionally the duplicate crawl)."""
    return _pages_rows(
        batch["doc_id"].to_numpy(zero_copy_only=False),
        batch["text"].to_pylist(),
        batch["lang"].to_pylist(),
        dup_every=dup_every,
        text_suffix=text_suffix,
        ts_shift_us=ts_shift_us,
    )


def _pages_rows(
    doc_ids, texts: list, langs: list, *, dup_every: int, text_suffix: str, ts_shift_us: int
) -> pa.Table:
    """Core of :func:`_pages_batch` over already-converted columns, so
    the synth fan-out (full + dup crawl × expand copies) converts the
    large text column to Python ONCE per batch, not once per emission."""
    if dup_every:
        keep = doc_ids % dup_every == 0
        doc_ids = doc_ids[keep]
        texts = [t for t, k in zip(texts, keep) if k]
        langs = [l for l, k in zip(langs, keep) if k]
    urls = [url_for(int(d)) for d in doc_ids]
    out_texts = [t + text_suffix for t in texts]
    htmls = [wrap_html(t) for t in out_texts]
    ts = (BASE_TS_US + doc_ids.astype(np.int64) * 1_000_000 + ts_shift_us)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def pages_from_documents(
    sf_dir: str,
    *,
    dup_every: int = DUP_EVERY,
    expand: int = 1,
    text_repeat: int = 1,
):
    """``documents.parquet`` → streaming ``pages`` Dataset (see module docstring).

    ``expand`` > 1 replicates the corpus deterministically (distinct
    urls / doc ranges, ``' copyK'`` body suffix) for benchmarking at
    larger row counts without external data.  All copies and duplicate
    crawls are emitted from ONE ``map_batches`` stage — a chained
    ``union`` of per-copy datasets is quadratic in Ray's planner.
    """
    import ray
    import ray.data

    # the seed table is one file with ONE row group — the read is a
    # single task no matter what, and every map fused behind it would
    # serialize.  The table is tiny (thousands of rows), so an explicit
    # repartition to 2 blocks per CPU is free and gives the fused
    # synth+extract chain real parallelism.
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    base = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        # pandas-written parquet carries dict schema metadata that makes
        # every repartition reduce task log "Failed to hash the schemas"
        .map_batches(
            lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .repartition(2 * cpus)
    )
    stride = 10_000_000  # doc_id offset per expansion copy

    def synth(b: pa.Table) -> pa.Table:
        # convert the (large) text column to Python ONCE per batch —
        # every expansion copy and the dup crawl reuse the same lists
        texts = b["text"].to_pylist()
        if text_repeat > 1:
            # benchmark knob: replicate bodies to realistic web-page
            # sizes (the seed docs are ~250 chars; crawl pages are KBs)
            texts = [" ".join([t] * text_repeat) for t in texts]
        langs = b["lang"].to_pylist()
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        for k in range(expand):
            suffix = f" copy{k}" if k else ""
            kids = ids + k * stride
            parts.append(
                _pages_rows(
                    kids, texts, langs, dup_every=0, text_suffix=suffix, ts_shift_us=0
                )
            )
            if dup_every:
                parts.append(
                    _pages_rows(
                        kids,
                        texts,
                        langs,
                        dup_every=dup_every,
                        text_suffix=suffix + " refresh",
                        ts_shift_us=HOUR_US,
                    )
                )
        return pa.concat_tables(parts)

    # batch_size=None → one batch per repartitioned block.  An explicit
    # batch_size here is counted in SEED rows by Ray's task bundler, so
    # any value above rows/(2·cpus) coalesces blocks and silently caps
    # the fused synth→extract chain at a handful of tasks (measured: 3
    # tasks at 16 CPUs with batch_size=2048 — the whole build's extract
    # phase stopped scaling).
    return base.map_batches(synth, batch_format="pyarrow", batch_size=None)




def synthetic_url_boundaries(
    sf_dir: str, num_parts: int, expand: int = 1
) -> list[str]:
    """Url-range boundaries for :func:`pages_from_documents` output,
    computed from the seed table's ids alone (urls are a pure function
    of doc_id, and duplicate crawls share urls) — avoids a full
    synthesis pass just to sample urls.  Boundary choice affects only
    partition balance, never doc ids (global url rank)."""
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy(zero_copy_only=False)
    urls = sorted(
        url_for(int(d) + k * 10_000_000) for k in range(expand) for d in ids
    )
    if len(urls) < num_parts * 4:
        return urls[: num_parts - 1]
    idx = np.linspace(0, len(urls) - 1, num_parts + 1).astype(int)[1:-1]
    return [urls[i] for i in idx]


# ---------------------------------------------------------------------------
# Rich corpus for the pytest suite (FIXTURES.md §1) — markdown-ish bodies
# wrapped in HTML, exercising the reference extractor test surface.
# ---------------------------------------------------------------------------

_RICH_BODIES = [
    # 0: full front matter + headings + shortcode + code fence
    (
        "---\ntitle: Node pools\ndescription: About node pools\n"
        "date: 2024-03-01\ncategories: [basics]\n---\n"
        "## Overview {#overview}\n\n"
        "Node pools group worker nodes with the same configuration.\n\n"
        "{{< note >}}Pools are immutable.{{< /note >}}\n\n"
        "```yaml\nkind: NodePool\nreplicas: 3\n```\n"
    ),
    # 1: front matter + pipe table
    (
        "---\ntitle: Quotas\n---\n"
        "| Resource | Limit |\n|----------|-------|\n| CPU | 64 |\n| RAM | 256 |\n\n"
        "Quotas apply per namespace.\n"
    ),
    # 2: no front matter at all
    "Plain page without front matter.\n\nJust two paragraphs of text.\n",
    # 3: malformed front matter (YAML error between fences)
    "---\ntitle: [unclosed\n---\nBody after broken front matter.\n",
    # 4: empty body, description fallback
    "---\ntitle: Stub\ndescription: A stub page kept for redirects.\n---\n",
    # 5: shortcodes both styles, emphasis
    (
        "---\ntitle: Releases\n---\n"
        "{{% warning %}}**Always** read the changelog.{{% /warning %}}\n\n"
        "Upgrade with `helm upgrade` and *watch* the rollout.\n"
    ),
]


def rich_pages_rows(n: int = 60, dup_every: int = 9) -> list[dict]:
    """Deterministic list of pages rows cycling the rich bodies.

    Mixed-case url path segments exercise URI lowercasing
    (reference ``hugo_test.py:130-138``); every ``dup_every``-th url
    gets a second, newer crawl with a ``Revised.`` paragraph appended.
    """
    rows = []
    for i in range(n):
        body = _RICH_BODIES[i % len(_RICH_BODIES)]
        seg = f"Sec{i % 7}" if i % 3 == 0 else f"sec{i % 7}"
        url = f"{BASE_URL}/{seg}/page-{i:04d}/"
        html = (
            b"<html><head><!-- crawl --></head><body>"
            + _html.escape(body, quote=False).encode()
            + b"</body></html>"
        )
        rows.append(
            {
                "url": url,
                "warc_ts": BASE_TS_US + i * 1_000_000,
                "html": html,
                "text": body,
                "lang": "en",
            }
        )
        if dup_every and i % dup_every == 0:
            body2 = body + "\nRevised.\n"
            rows.append(
                {
                    "url": url,
                    "warc_ts": BASE_TS_US + i * 1_000_000 + HOUR_US,
                    "html": (
                        b"<html><head><!-- crawl --></head><body>"
                        + _html.escape(body2, quote=False).encode()
                        + b"</body></html>"
                    ),
                    "text": body2,
                    "lang": "en",
                }
            )
    return rows


def rich_pages_table(n: int = 60, dup_every: int = 9) -> pa.Table:
    rows = rich_pages_rows(n, dup_every)
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array(
                np.array([r["warc_ts"] for r in rows], np.int64), pa.timestamp("us")
            ),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
