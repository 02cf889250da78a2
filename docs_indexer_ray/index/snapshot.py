"""Snapshot / restore: the OpenSearch ``_snapshot`` API for this engine.

A snapshot is a self-contained copy of ONE published build (its
segments, docs store, deletes file and manifest) plus a small catalog
(``snapshot.json``) recording what it is and a per-file integrity
digest.  Restore copies the files back under a target root as a
normal build dir and atomically publishes it — queries cannot observe
a half-restored index.

Index files are immutable once written (the build/merge/compaction
invariant), so snapshots hard-link when source and destination share
a filesystem — a snapshot of a TB-scale index is metadata-only, like
Lucene's commit-point snapshots — and fall back to real copies across
filesystems.  Verification hashes file SIZES into the catalog (cheap,
catches truncation); ``verify=True`` on restore re-checks them.

Multi-node note: builds live on shared storage (the ``out_root`` the
build wrote to); snapshot/restore is driver-side METADATA work (a
directory walk of segment files, no data transform), so a Ray-task
fan-out would only add overhead — the copies themselves are the
filesystem's job.
"""

from __future__ import annotations

import json
import os
import shutil

from . import manifest as mf

__all__ = ["snapshot_index", "restore_index", "list_snapshots"]

_CATALOG = "snapshot.json"


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def snapshot_index(root: str, snap_dir: str, name: str | None = None) -> str:
    """Snapshot the CURRENT build of ``root`` into ``snap_dir/name``.

    Returns the snapshot path.  Fails loudly if nothing is published."""
    cur = mf.current_build(root)
    if cur is None:
        raise FileNotFoundError(f"no CURRENT build under {root}")
    build_name = os.path.basename(cur)
    name = name or build_name
    dst = os.path.join(snap_dir, name)
    if os.path.exists(dst):
        raise FileExistsError(f"snapshot already exists: {dst}")
    # a stale .tmp from a crashed prior run may hold ANOTHER build's
    # files — linking this build alongside them would publish a mixed
    # directory, so start clean (restore_index does the same)
    if os.path.exists(dst + ".tmp"):
        shutil.rmtree(dst + ".tmp")
    os.makedirs(dst + ".tmp")
    files: dict[str, int] = {}
    for dirpath, _, filenames in os.walk(cur):
        rel = os.path.relpath(dirpath, cur)
        od = os.path.join(dst + ".tmp", rel) if rel != "." else dst + ".tmp"
        os.makedirs(od, exist_ok=True)
        for fn in filenames:
            sp = os.path.join(dirpath, fn)
            _link_or_copy(sp, os.path.join(od, fn))
            files[os.path.normpath(os.path.join(rel, fn))] = os.path.getsize(sp)
    with open(os.path.join(dst + ".tmp", _CATALOG), "w") as f:
        json.dump({"build": build_name, "files": files}, f, indent=1)
    os.replace(dst + ".tmp", dst)
    return dst


def list_snapshots(snap_dir: str) -> list[dict]:
    out = []
    if not os.path.isdir(snap_dir):
        return out
    for entry in sorted(os.listdir(snap_dir)):
        cat = os.path.join(snap_dir, entry, _CATALOG)
        if os.path.isfile(cat):
            with open(cat) as f:
                c = json.load(f)
            out.append({"name": entry, "build": c["build"], "n_files": len(c["files"])})
    return out


def restore_index(snap_path: str, root: str, verify: bool = True) -> str:
    """Restore a snapshot as a published build under ``root``.

    The build directory is materialized under a temp name and renamed
    before the atomic CURRENT publish; with ``verify`` every file's
    size is checked against the catalog first."""
    with open(os.path.join(snap_path, _CATALOG)) as f:
        cat = json.load(f)
    build_name = cat["build"]
    os.makedirs(root, exist_ok=True)
    dst = os.path.join(root, build_name)
    if os.path.exists(dst):
        raise FileExistsError(f"build already exists under root: {dst}")
    tmp = dst + ".restore-tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    for rel, size in cat["files"].items():
        sp = os.path.join(snap_path, rel)
        if verify and os.path.getsize(sp) != size:
            raise IOError(
                f"snapshot corrupt: {rel} is {os.path.getsize(sp)} bytes, "
                f"catalog says {size}"
            )
        dp = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(dp), exist_ok=True)
        _link_or_copy(sp, dp)
    os.replace(tmp, dst)
    mf.publish(root, build_name)
    return dst
