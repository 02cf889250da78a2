"""Multimodal column plumbing: binary payloads through actor-pool stages.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Ray-side plumbing here — schema, actor-pool stage shape, small
batch sizes for wide binary rows, output layout — is real and tested;
the actual codec work is STUBBED (decode libraries are not in this
environment): :class:`ImageDecodeStub` raises ``NotImplementedError``
unless ``fake=True``, in which case it produces a deterministic fake
decode (dimensions/checksum derived from the bytes) so the pipeline
shape can be exercised end-to-end.

Pattern notes for the real thing at scale: the decoder class loads its
codec once in ``__init__`` (actor pool via ``concurrency=``), batches
stay small (``batch_size≈32``) because each row may be megabytes, and
outputs keep ``batch_format="pyarrow"`` so binary never round-trips
through pandas object dtype.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

__all__ = [
    "ImageDecodeStub",
    "ImageResizeStub",
    "ImageEmbedStub",
    "FrameSampleStub",
    "synth_media_table",
    "decode_images",
    "resize_images",
    "embed_images",
    "sample_frames",
]


def synth_media_table(n: int = 64, kind: str = "image") -> pa.Table:
    """Deterministic fake media rows: (media_id, kind, payload, n_bytes).

    ``kind="video"`` payloads carry a fake frame count in the header so
    the frame-sample stage has structure to exercise."""
    ids = np.arange(n, dtype=np.int64)
    if kind == "video":
        # header byte 7 = fake frame count; filler is PRINTABLE ASCII
        # so the whole payload is valid UTF-8 — that (plus the ASCII
        # frame suffix in FrameSampleStub) is what lets DuckDB's
        # VARCHAR-only md5 replay the frame checksums in the driver
        # oracle (the mm_decode_docs trick)
        payloads = [
            b"FAKEVID" + bytes([8 + i % 24])
            + bytes([32 + i % 95]) * (200 + 53 * (i % 11))
            for i in range(n)
        ]
    else:
        payloads = [
            (b"FAKEIMG" + bytes([i % 251]) * (100 + 37 * (i % 13))) for i in range(n)
        ]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array(np.array([len(p) for p in payloads], np.int64)),
        }
    )


class ImageDecodeStub:
    """Actor-pool decode stage. ``__init__`` = per-actor setup (the
    real codec load would live here); ``__call__`` = per batch.

    With ``fake=False`` (the honest default) every call raises
    ``NotImplementedError`` — no image library ships in this
    environment.  ``fake=True`` yields a deterministic stand-in:
    width/height from a checksum, a fixed 3-channel layout.
    """

    def __init__(self, fake: bool = False, target_size: int = 64, dims_from: str = "crc"):
        self.fake = fake
        self.target_size = target_size
        # "crc" (default): dims from a crc32 of the payload;
        # "size": dims from the byte length — the SQL-expressible
        # variant the driver oracle checks (octet_length is ANSI,
        # crc32 is not)
        self.dims_from = dims_from

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires an image codec library (not available); "
                "construct with fake=True for the deterministic stand-in"
            )
        payloads = batch["payload"].to_pylist()
        widths, heights, checksums = [], [], []
        for p in payloads:
            seed = len(p) if self.dims_from == "size" else zlib.crc32(p)
            widths.append(16 + seed % 64)
            heights.append(16 + (seed >> 8 if self.dims_from == "crc" else seed // 7) % 64)
            checksums.append(hashlib.md5(p).hexdigest())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(np.array(widths, np.int32)),
                "height": pa.array(np.array(heights, np.int32)),
                "channels": pa.array(np.full(len(payloads), 3, np.int32)),
                "resized_to": pa.array(
                    np.full(len(payloads), self.target_size, np.int32)
                ),
                "checksum": pa.array(checksums, pa.string()),
            }
        )


class ImageResizeStub:
    """Actor-pool resize stage: payload → resized payload + metadata.

    Real version: decode → resample to ``(width, height)`` → re-encode,
    codec handles held per actor.  The stub (``fake=True``) emits a
    deterministic truncated/padded payload of ``width*height*3 // 64``
    bytes so downstream schema/size behavior is exercised; honest
    ``NotImplementedError`` otherwise."""

    def __init__(self, width: int = 64, height: int = 64, fake: bool = False):
        self.width, self.height, self.fake = width, height, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image resize requires an image codec library (not available); "
                "construct with fake=True for the deterministic stand-in"
            )
        target = max(1, self.width * self.height * 3 // 64)
        out = []
        for p in batch["payload"].to_pylist():
            q = (p * (target // max(1, len(p)) + 1))[:target]
            out.append(q)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out, pa.binary()),
                "width": pa.array(np.full(batch.num_rows, self.width, np.int32)),
                "height": pa.array(np.full(batch.num_rows, self.height, np.int32)),
            }
        )


class ImageEmbedStub:
    """Actor-pool feature-extraction stage: payload → embedding vector.

    Real version: a vision model loaded ONCE in ``__init__`` (weights
    on the actor, batched forward in ``__call__``).  The stub derives a
    deterministic unit vector from payload bytes (seeded by checksum)
    — downstream ANN ops consume it unchanged, so the full
    decode→embed→kNN pipeline is testable without a model."""

    def __init__(self, dim: int = 16, fake: bool = False):
        self.dim, self.fake = dim, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image embedding requires a vision model (not available); "
                "construct with fake=True for the deterministic stand-in"
            )
        vecs = []
        for p in batch["payload"].to_pylist():
            rs = np.random.RandomState(zlib.crc32(p) & 0x7FFFFFFF)
            v = rs.normal(size=self.dim)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32).tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        )


class FrameSampleStub:
    """Actor-pool video frame-sampling stage: one input row → N frame
    rows (``flat_map`` semantics inside ``map_batches``).

    Real version: demux/seek every ``every_n``-th frame.  The stub
    reads the fake frame count from the synthetic header and emits
    deterministic per-frame checksum rows; honest
    ``NotImplementedError`` otherwise."""

    def __init__(self, every_n: int = 4, fake: bool = False):
        self.every_n, self.fake = every_n, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "frame sampling requires a video demuxer (not available); "
                "construct with fake=True for the deterministic stand-in"
            )
        ids_out, frame_out, sums = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            n_frames = p[7] if len(p) > 7 else 0
            for f in range(0, n_frames, self.every_n):
                ids_out.append(mid)
                frame_out.append(f)
                # ASCII ':<frame>' suffix (not raw LE32): with a valid-
                # UTF-8 payload the digest replays as SQL
                # md5(payload || ':' || frame)
                sums.append(
                    hashlib.md5(p + b":" + str(f).encode()).hexdigest()
                )
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "frame": pa.array(frame_out, pa.int32()),
                "checksum": pa.array(sums, pa.string()),
            }
        )


def _mm_stage(cls, ds, concurrency: int, batch_size: int, **kw):
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_images(
    ds,
    fake: bool = False,
    concurrency: int = 2,
    batch_size: int = 32,
    dims_from: str = "crc",
):
    """The actor-pool decode stage over a media Dataset."""
    return _mm_stage(
        ImageDecodeStub, ds, concurrency, batch_size, fake=fake, dims_from=dims_from
    )


def resize_images(
    ds,
    width: int = 64,
    height: int = 64,
    fake: bool = False,
    concurrency: int = 2,
    batch_size: int = 32,
):
    """Actor-pool resize stage (small batches — rows are megabytes)."""
    return _mm_stage(
        ImageResizeStub, ds, concurrency, batch_size, width=width, height=height, fake=fake
    )


def embed_images(
    ds, dim: int = 16, fake: bool = False, concurrency: int = 2, batch_size: int = 32
):
    """Actor-pool feature-extraction stage; output feeds the ANN ops."""
    return _mm_stage(ImageEmbedStub, ds, concurrency, batch_size, dim=dim, fake=fake)


def sample_frames(
    ds, every_n: int = 4, fake: bool = False, concurrency: int = 2, batch_size: int = 16
):
    """Actor-pool frame-sample stage (row → N frame rows)."""
    return _mm_stage(FrameSampleStub, ds, concurrency, batch_size, every_n=every_n, fake=fake)
