"""Build state, per-partition lineage, and atomic publish.

Re-creates the reference's index lifecycle (K3–K5 of SURVEY §2.1) for a
filesystem index:

* **state = build name**: the reference encodes "is this input already
  indexed?" in the OpenSearch index *name* ``{prefix}-{git sha}`` and
  exits early when it exists (``/root/reference/hugo.py:378-385,
  424-427``, ``docs/design.md:9-19``).  Here the build name is
  ``{prefix}-{input fingerprint}`` — a digest of the input files'
  (path, size, mtime) — and :func:`is_current` gives the same
  short-circuit.
* **atomic publish**: the reference repoints the ``{prefix}`` alias to
  the new index and deletes the old one only after a fully successful
  build (``hugo.py:464-483``) so readers always see a complete index.
  Here :func:`publish` atomically ``os.replace``-s a ``CURRENT`` file
  containing the build name; readers resolve ``CURRENT`` → build dir.
  :func:`gc` removes unreferenced build dirs (the old-index delete).
* **lineage**: ``manifest.json`` records, per segment partition, the
  row/term/posting counts and byte sizes returned by the segment
  encoder, plus global stats — a rerun of the same build skips
  partitions whose segment files exist (``index/segments.py``).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

__all__ = [
    "input_fingerprint",
    "build_dir",
    "is_current",
    "write_manifest",
    "read_manifest",
    "publish",
    "current_build",
    "gc",
    "ensure_phase_config",
]


def ensure_phase_config(out_dir: str, cfg: dict) -> bool:
    """Make a resumable phase output dir safe to resume INTO.

    Per-partition resume (skip files that already exist) is only sound
    when the interrupted run used the SAME layout config — partition
    count, block size, salting plan… all of which are derived from the
    cluster size and so can differ between the interrupted run and the
    resume (an 8-CPU retry of a 32-CPU build halves ``num_parts``).
    Files keyed by the old scheme would be silently skipped-over AND
    left behind for readers: duplicated postings for some terms,
    missing docs for others.

    Contract: call BEFORE any task writes into ``out_dir``.  If the
    dir holds a ``_PHASE_CONFIG.json`` equal to ``cfg`` → resume is
    valid (returns True).  Otherwise (different config, or files from
    a pre-config engine version) the dir is wiped and re-created with
    the new config recorded (returns False).  The config write is
    atomic so a crash between wipe and write re-wipes next run.
    """
    cfg_path = os.path.join(out_dir, "_PHASE_CONFIG.json")
    canon = json.dumps(cfg, sort_keys=True, default=str)
    if os.path.isdir(out_dir):
        try:
            with open(cfg_path) as f:
                if f.read() == canon:
                    return True
        except FileNotFoundError:
            pass
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    tmp = cfg_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(canon)
    os.replace(tmp, cfg_path)
    return False


def input_fingerprint(paths: list[str], config: str = "") -> str:
    """Digest of the input fragments' (path, size, mtime) — the analog
    of the reference's git tip SHA (``hugo.py:401-413``) — mixed with
    the index format version (and any caller ``config``) so an index
    built by an older engine is never served as current."""
    from .. import INDEX_FORMAT_VERSION

    h = hashlib.sha256()
    h.update(f"fmt={INDEX_FORMAT_VERSION}|{config}\n".encode())
    for p in sorted(paths):
        st = os.stat(p)
        # nanosecond mtime: whole-second truncation let an input
        # rewritten in-place within one second (same size) fingerprint
        # identically — skip_if_current then served the stale build
        h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:16]


def build_dir(root: str, prefix: str, fingerprint: str) -> str:
    return os.path.join(root, f"{prefix}-{fingerprint}")


def current_build(root: str) -> str | None:
    try:
        with open(os.path.join(root, "CURRENT")) as f:
            name = f.read().strip()
    except FileNotFoundError:
        return None
    path = os.path.join(root, name)
    return path if os.path.isdir(path) else None


def is_current(root: str, prefix: str, fingerprint: str) -> bool:
    """The reference's check_index short-circuit (``hugo.py:378-385``)."""
    cur = current_build(root)
    return cur is not None and os.path.basename(cur) == f"{prefix}-{fingerprint}"


def write_manifest(bdir: str, manifest: dict) -> None:
    tmp = os.path.join(bdir, f"manifest.json.tmp-{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    os.replace(tmp, os.path.join(bdir, "manifest.json"))


def read_manifest(bdir: str) -> dict:
    with open(os.path.join(bdir, "manifest.json")) as f:
        return json.load(f)


def publish(root: str, name: str) -> None:
    """Atomic ``CURRENT`` swap — the alias repoint (``hugo.py:473-479``)."""
    tmp = os.path.join(root, f"CURRENT.tmp-{os.getpid()}")
    with open(tmp, "w") as f:
        f.write(name + "\n")
    os.replace(tmp, os.path.join(root, "CURRENT"))


def gc(root: str, in_progress_grace_s: float = 21600.0) -> list[str]:
    """Delete build dirs not referenced by CURRENT (``hugo.py:469-472``).

    Guards against racing a live build: ``_``-prefixed work dirs
    (incremental's ``_delta`` tree) are never touched, and a dir with
    NO manifest.json yet (a build still running — the manifest is the
    last file written) is only removed once older than
    ``in_progress_grace_s`` (crashed-build debris).  Completed
    unpublished builds are removed regardless of age, as before."""
    import time as _time

    cur = current_build(root)
    removed = []
    now = _time.time()
    for entry in os.listdir(root):
        path = os.path.join(root, entry)
        if not os.path.isdir(path) or path == cur or entry.startswith("_"):
            continue
        if not os.path.exists(os.path.join(path, "manifest.json")):
            try:
                age = now - os.path.getmtime(path)
            except OSError:
                continue
            if age < in_progress_grace_s:
                continue  # likely a build in flight — leave it alone
        shutil.rmtree(path)
        removed.append(entry)
    return removed
