"""Commit manifests for stage-then-swap parquet writes — the missing
transaction marker.

The reference gets write atomicity from Postgres transactions
(migrations apply atomically via sqlx::migrate!, cli/src/main.rs:73);
this engine's copy-on-write emulation (merge_upsert, compact_to, the
WebDataset shard export) swaps plain directories, and a crash between
stage and swap — or a reader racing a swap — could silently observe a
half-updated table. Table formats solve this with a manifest/commit
log (Delta's _delta_log, Iceberg's metadata.json): data files are
written first, then ONE atomic pointer flip publishes them, and
readers trust only published files. This module is that protocol
without the format dependency:

  - :func:`write_commit_manifest` snapshots the table's data files
    (relative path + size + an aggregate digest) into
    ``_spectraplex_commit.json``, written tmp-then-rename — the POSIX
    rename is the atomic commit point;
  - :func:`validate_commit_manifest` proves a directory matches its
    manifest EXACTLY (no missing files, no unexpected files) and
    raises :class:`TableInconsistentError` naming every deviation —
    a crash mid-swap is detected, never silently read;
  - :func:`read_committed` reads exactly the manifest's file list
    (``basePath`` preserves partition columns), so a reader racing a
    writer either sees the old committed snapshot in full or fails
    loudly — never a mix.

Why size+path, not content hashes: staged files are never modified in
place (Spark writers emit fresh ``part-<uuid>`` names; swaps move whole
files), so a same-path-same-size different-content file cannot arise
from this write protocol; hashing 100 TB to commit it would dominate
the write. The aggregate digest over the sorted (path, size) list
still pins the snapshot identity for audit trails.

Crash matrix (pytest-pinned in tests/test_commit.py):
  - killed after stage, before swap: target untouched, old manifest
    valid → readers see the old table; the orphan ``__staged_*`` dir
    is inert and re-running the write is safe.
  - killed mid-swap: manifest mismatches the directory → validate and
    read_committed raise TableInconsistentError (named files), and
    the staged directory still holds a complete copy for recovery.
  - killed after swap, before manifest refresh: same detection; the
    swap itself completed, so re-running write_commit_manifest after
    verifying the merge output (or re-running the idempotent merge)
    recommits.
"""

from __future__ import annotations

import hashlib
import json
import os

MANIFEST_NAME = "_spectraplex_commit.json"


class TableInconsistentError(RuntimeError):
    """The table directory does not match its commit manifest."""


def _data_files(table_dir: str) -> dict[str, int]:
    """Relative path -> size for every data file under table_dir.
    Underscore/dot-prefixed entries (manifests, _SUCCESS markers,
    _config sidecars, hidden files) are metadata, not data."""
    out: dict[str, int] = {}
    for root, dirs, files in os.walk(table_dir):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            out[os.path.relpath(p, table_dir)] = os.path.getsize(p)
    return out


def _digest(files: dict[str, int]) -> str:
    h = hashlib.md5()
    for rel in sorted(files):
        h.update(f"{rel}:{files[rel]}\n".encode("utf-8"))
    return h.hexdigest()


def write_commit_manifest(table_dir: str) -> dict:
    """Snapshot table_dir's data files into the commit manifest.
    tmp-write + fsync + rename: the rename IS the commit point."""
    files = _data_files(table_dir)
    manifest = {
        "version": 1,
        "n_files": len(files),
        "n_bytes": sum(files.values()),
        "files": files,
        "digest": _digest(files),
    }
    final = os.path.join(table_dir, MANIFEST_NAME)
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, final)
    return manifest


def has_commit_manifest(table_dir: str) -> bool:
    return os.path.exists(os.path.join(table_dir, MANIFEST_NAME))


def validate_commit_manifest(table_dir: str) -> dict:
    """Prove table_dir matches its manifest exactly; return the
    manifest. Raises TableInconsistentError naming every missing /
    size-changed / unexpected file (a crash mid-swap leaves at least
    one of those)."""
    path = os.path.join(table_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        raise TableInconsistentError(
            f"{table_dir}: no {MANIFEST_NAME} — table was never committed "
            "(or the commit marker was lost); refusing to trust the "
            "directory listing"
        )
    with open(path) as fh:
        manifest = json.load(fh)
    actual = _data_files(table_dir)
    expected = manifest["files"]
    missing = sorted(set(expected) - set(actual))
    unexpected = sorted(set(actual) - set(expected))
    resized = sorted(
        rel for rel in set(expected) & set(actual) if expected[rel] != actual[rel]
    )
    if missing or unexpected or resized:
        raise TableInconsistentError(
            f"{table_dir} does not match its commit manifest "
            f"(mid-swap crash or concurrent uncommitted write): "
            f"missing={missing[:5]}{'...' if len(missing) > 5 else ''} "
            f"unexpected={unexpected[:5]}{'...' if len(unexpected) > 5 else ''} "
            f"resized={resized[:5]}{'...' if len(resized) > 5 else ''}"
        )
    return manifest


def read_committed(spark, table_dir: str):
    """Read exactly the committed snapshot: validate, then scan the
    manifest's file list with basePath so partition columns survive.
    A reader racing a swap sees the old snapshot or fails loudly —
    never a mixed table."""
    manifest = validate_commit_manifest(table_dir)
    paths = [os.path.join(table_dir, rel) for rel in sorted(manifest["files"])]
    if not paths:
        raise TableInconsistentError(f"{table_dir}: committed manifest lists no files")
    return spark.read.option("basePath", table_dir).parquet(*paths)
