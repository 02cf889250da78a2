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

__all__ = ["ImageDecodeStub", "synth_media_table", "decode_images"]


def synth_media_table(n: int = 64) -> pa.Table:
    """Deterministic fake media rows: (media_id, kind, payload, n_bytes)."""
    ids = np.arange(n, dtype=np.int64)
    payloads = [
        (b"FAKEIMG" + bytes([i % 251]) * (100 + 37 * (i % 13))) for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "kind": pa.array(["image"] * n, pa.string()),
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

    def __init__(self, fake: bool = False, target_size: int = 64):
        self.fake = fake
        self.target_size = target_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires an image codec library (not available); "
                "construct with fake=True for the deterministic stand-in"
            )
        payloads = batch["payload"].to_pylist()
        widths, heights, checksums = [], [], []
        for p in payloads:
            crc = zlib.crc32(p)
            widths.append(16 + crc % 64)
            heights.append(16 + (crc >> 8) % 64)
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


def decode_images(ds, fake: bool = False, concurrency: int = 2, batch_size: int = 32):
    """The actor-pool decode stage over a media Dataset."""
    return ds.map_batches(
        ImageDecodeStub,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
