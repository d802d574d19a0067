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


class EpochCollisionError(TableInconsistentError):
    """Two writers raced the same epoch number (or a dead writer's claim
    is still on disk). The epoch protocol is single-writer per table;
    this error makes a violation LOUD instead of letting a
    last-rename-wins overwrite silently orphan a batch."""


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


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _fsync_dir(path: str) -> None:
    """fsync the DIRECTORY containing a just-renamed commit point.

    ``os.rename`` only makes the commit point atomic; its durability is
    a directory-metadata change that POSIX does not persist until the
    directory itself is fsynced. Without this, a power loss can roll
    back a 'committed' rename — and in squash_epochs the subsequent
    unlinks could survive while the rename did not, leaving committed
    data files that validate_epochs can no longer protect (review
    finding). Best-effort on filesystems that refuse O_RDONLY dir
    opens (the rename is still atomic there; only power-loss
    durability degrades to the platform default)."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:  # pragma: no cover - non-POSIX dir-open semantics
        return
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def write_commit_manifest(table_dir: str, content_hashes: bool = False) -> dict:
    """Snapshot table_dir's data files into the commit manifest.
    tmp-write + fsync + rename: the rename IS the commit point.

    ``content_hashes=True`` additionally records a per-file sha256 —
    opt-in because hashing re-reads every byte (at 100 TB that doubles
    the write's I/O; the (path, size) default is sound for this write
    protocol, see the module docstring). Use it for archival tables
    where a byte-corrupting fault with preserved length must be caught
    at validate() time rather than by parquet footer checksums at read
    time."""
    files = _data_files(table_dir)
    manifest = {
        "version": 1,
        "n_files": len(files),
        "n_bytes": sum(files.values()),
        "files": files,
        "digest": _digest(files),
    }
    if content_hashes:
        manifest["sha256"] = {
            rel: _sha256(os.path.join(table_dir, rel)) for rel in files
        }
    final = os.path.join(table_dir, MANIFEST_NAME)
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, final)
    _fsync_dir(table_dir)  # make the commit point durable, not just atomic
    return manifest


def has_commit_manifest(table_dir: str) -> bool:
    return os.path.exists(os.path.join(table_dir, MANIFEST_NAME))


def validate_commit_manifest(table_dir: str, verify_content: bool = False) -> dict:
    """Prove table_dir matches its manifest exactly; return the
    manifest. Raises TableInconsistentError naming every missing /
    size-changed / unexpected file (a crash mid-swap leaves at least
    one of those). ``verify_content=True`` re-hashes every file against
    the manifest's recorded sha256 (requires a manifest written with
    ``content_hashes=True``; raises if the manifest carries none —
    silently skipping the check the caller asked for would be worse)."""
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
    if verify_content:
        recorded = manifest.get("sha256")
        if not recorded:
            raise TableInconsistentError(
                f"{table_dir}: verify_content requested but the manifest "
                "carries no content hashes — recommit with "
                "write_commit_manifest(..., content_hashes=True)"
            )
        corrupt = sorted(
            rel
            for rel in expected
            if _sha256(os.path.join(table_dir, rel)) != recorded[rel]
        )
        if corrupt:
            raise TableInconsistentError(
                f"{table_dir}: content hash mismatch (byte corruption with "
                f"preserved length): {corrupt[:5]}"
                f"{'...' if len(corrupt) > 5 else ''}"
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


# ---------------------------------------------------------------------------
# Epoch manifests for APPEND-ONLY sinks (bronze/silver, sources/io.py).
#
# Stage-then-swap tables get one manifest per publish; append-only
# tables grow by batches, so a single whole-table manifest would go
# stale on every append. The epoch protocol commits each batch
# separately: after a batch's data files land, ONE epoch manifest
# (``_spectraplex_epochs/epoch-%06d.json``, tmp+fsync+rename — the
# rename is the commit point) lists exactly the files that batch
# added. The committed table IS the union of the epoch manifests:
#
#   - a writer killed between Spark's job commit and the epoch write
#     leaves data files covered by no epoch — committed readers do not
#     see them (validate_epochs names them; adopt_uncommitted rolls
#     them forward, sound because Spark's FileOutputCommitter only
#     exposes complete task outputs at job commit);
#   - a writer killed BEFORE job commit leaves only ``_temporary``
#     droppings, which the underscore rule already excludes;
#   - a reader racing an append sees the previous epochs in full —
#     never a torn batch.
#
# Single-writer protocol, like merge_upsert — but violations are
# DETECTED, not assumed away: the epoch tmp file is an O_EXCL claim on
# its epoch number, held until the commit rename, and the committer
# re-checks for an already-committed manifest before renaming. Two
# interleaved appenders therefore either serialize (one adopts the
# other's landed files into its epoch; the replay commits nothing) or
# fail loudly with EpochCollisionError — a last-rename-wins overwrite
# that silently orphans a batch cannot happen.
# Epoch 0 BOOTSTRAPS a legacy table: the first commit covers every
# data file present (prior history + the first committed batch).
# ---------------------------------------------------------------------------

EPOCH_DIR = "_spectraplex_epochs"


def _epoch_num(basename: str) -> int:
    """Epoch number from ``epoch-<digits>.json`` — ALL digits, not a
    fixed slice: past epoch 999999 the %06d format grows to 7+ digits
    and a [6:12] slice would silently drop the last digit (review
    finding)."""
    return int(basename[len("epoch-") : -len(".json")])


def _epoch_paths(table_dir: str) -> list[str]:
    d = os.path.join(table_dir, EPOCH_DIR)
    if not os.path.isdir(d):
        return []
    # numeric sort: lexicographic order breaks at the 6→7 digit
    # boundary ('epoch-1000000' < 'epoch-999999'), and every ordered
    # iteration (as_of break, change feed, squash boundary) relies on
    # epoch order
    return sorted(
        (
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.startswith("epoch-") and f.endswith(".json")
        ),
        key=lambda p: _epoch_num(os.path.basename(p)),
    )


def _next_epoch_number(table_dir: str) -> int:
    paths = _epoch_paths(table_dir)
    if not paths:
        return 0
    return max(_epoch_num(os.path.basename(p)) for p in paths) + 1


def committed_epoch_files(
    table_dir: str, as_of_epoch: int | None = None
) -> dict[str, int]:
    """Union of committed epochs' file lists (rel path -> size).
    ``as_of_epoch=N`` stops after epoch N — the table as it stood at
    that commit (epochs are append-only, so old snapshots stay
    readable: time travel for free).

    ``as_of_epoch`` is VALIDATED (review finding r13, the
    read_epoch_changes rule): a number past the newest committed epoch
    used to silently return the full current table — masking corrupted
    consumer bookkeeping as a successful time-travel read — and a
    number inside a squashed range now names the re-baseline remedy
    instead of failing downstream with 'lists no files'."""
    out: dict[str, int] = {}
    seen: list[int] = []
    for p in _epoch_paths(table_dir):
        with open(p) as fh:
            m = json.load(fh)
        if as_of_epoch is not None and m["epoch"] > as_of_epoch:
            lo = m.get("squashed_from", m["epoch"])
            if lo <= as_of_epoch:  # as-of falls INSIDE a squashed range
                raise TableInconsistentError(
                    f"{table_dir}: epochs [{lo}, {m['epoch']}] were "
                    f"squashed into one manifest — the as-of-"
                    f"{as_of_epoch} snapshot is retired; re-baseline the "
                    f"consumer from epoch {m['epoch']}"
                )
            break
        seen.append(m["epoch"])
        out.update(m["files"])
    else:  # no break: every manifest is <= as_of_epoch (or no bound)
        if as_of_epoch is not None and (not seen or max(seen) < as_of_epoch):
            newest = max(seen) if seen else None
            raise TableInconsistentError(
                f"{table_dir}: requested snapshot as of epoch "
                f"{as_of_epoch} but the newest committed epoch is "
                f"{newest} — a silent full-table read would mask the "
                "caller's bookkeeping bug"
            )
    return out


def commit_append_epoch(table_dir: str) -> dict | None:
    """Commit the files an append batch just added: diff the directory
    against the union of prior epochs and publish the delta as the
    next epoch. Returns the epoch manifest, or None if the batch added
    nothing (a replayed no-op append commits no epoch)."""
    committed = committed_epoch_files(table_dir)
    new = {
        rel: size
        for rel, size in _data_files(table_dir).items()
        if rel not in committed
    }
    if not new:
        return None
    # max+1, NOT len(): after squash_epochs the manifest COUNT is
    # smaller than the highest epoch number, and len() would eventually
    # renumber a new epoch onto an existing file — clobbering committed
    # history. Without a squash the two are equal.
    n = _next_epoch_number(table_dir)
    manifest = {
        "version": 1,
        "epoch": n,
        "n_files": len(new),
        "n_bytes": sum(new.values()),
        "files": new,
        "digest": _digest(new),
    }
    d = os.path.join(table_dir, EPOCH_DIR)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"epoch-{n:06d}.json")
    tmp = final + ".tmp"
    # CONCURRENT-WRITER CONTRACT (loud, not lucky): the tmp file doubles
    # as an exclusive CLAIM on epoch number n. O_EXCL creation is atomic
    # on POSIX, and a claim is only released by the rename below, so two
    # interleaved appenders serialize: the second either fails to claim
    # (the first still holds tmp) or claims a freed tmp and then finds
    # the first's committed manifest at `final` — both are
    # EpochCollisionError, never a silent last-rename-wins overwrite.
    # A claim left by a DEAD writer blocks its epoch number; after
    # verifying the writer is gone, clear_stale_epoch_claims() frees it.
    try:
        fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise EpochCollisionError(
            f"{table_dir}: epoch {n} is claimed by another writer ({tmp} "
            "exists). The epoch protocol is single-writer per table — "
            "serialize appenders; if the other writer is dead, run "
            "clear_stale_epoch_claims() and retry."
        ) from None
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    if os.path.exists(final):
        # Another writer claimed-and-committed n while we computed ours
        # (its whole claim→rename window fit before our O_EXCL claim).
        os.unlink(tmp)
        raise EpochCollisionError(
            f"{table_dir}: epoch {n} was committed by another writer while "
            "this append was staging — concurrent appenders detected; "
            "serialize writers and retry this batch."
        )
    os.rename(tmp, final)
    _fsync_dir(d)  # make the epoch commit durable, not just atomic
    return manifest


def clear_stale_epoch_claims(table_dir: str) -> list[str]:
    """Remove claim files (``epoch-*.json.tmp``) left by dead writers so
    their epoch numbers become claimable again. Call ONLY after verifying
    no appender is alive — a live writer's claim is what serializes
    concurrent appends. Returns the removed paths."""
    d = os.path.join(table_dir, EPOCH_DIR)
    if not os.path.isdir(d):
        return []
    removed = []
    for f in sorted(os.listdir(d)):
        if f.startswith("epoch-") and f.endswith(".json.tmp"):
            p = os.path.join(d, f)
            os.remove(p)
            removed.append(p)
    return removed


def validate_epochs(table_dir: str) -> dict:
    """Prove every committed epoch's files are present at their
    recorded sizes; return {'files': union, 'epochs': n,
    'uncommitted': [rel, ...]} where ``uncommitted`` lists data files
    in the directory that no epoch covers (a writer died between job
    commit and epoch commit — candidates for adopt_uncommitted).
    Raises TableInconsistentError if a COMMITTED file is missing or
    resized (epochs are append-only history; that never happens under
    the protocol)."""
    if not _epoch_paths(table_dir):
        raise TableInconsistentError(
            f"{table_dir}: no epoch manifests under {EPOCH_DIR} — table has "
            "no committed appends; refusing to trust the directory listing"
        )
    committed = committed_epoch_files(table_dir)
    actual = _data_files(table_dir)
    missing = sorted(set(committed) - set(actual))
    resized = sorted(
        rel for rel in set(committed) & set(actual) if committed[rel] != actual[rel]
    )
    if missing or resized:
        raise TableInconsistentError(
            f"{table_dir}: committed epoch files deviate (append-only "
            f"history violated): missing={missing[:5]}"
            f"{'...' if len(missing) > 5 else ''} resized={resized[:5]}"
            f"{'...' if len(resized) > 5 else ''}"
        )
    return {
        "files": committed,
        "epochs": len(_epoch_paths(table_dir)),
        "uncommitted": sorted(set(actual) - set(committed)),
    }


def read_committed_epochs(spark, table_dir: str, as_of_epoch: int | None = None):
    """Read exactly the union of committed epochs (basePath preserves
    partition columns). Files from a torn append — present on disk but
    committed by no epoch — are invisible. ``as_of_epoch=N`` reads the
    table as of that commit (append-only epochs never rewrite old
    files, so every historical snapshot remains intact until a
    compaction rewrites the table)."""
    state = validate_epochs(table_dir)
    files = (
        state["files"]
        if as_of_epoch is None
        else committed_epoch_files(table_dir, as_of_epoch)
    )
    if not files:
        raise TableInconsistentError(
            f"{table_dir}: committed epochs list no files"
            + (f" as of epoch {as_of_epoch}" if as_of_epoch is not None else "")
        )
    paths = [os.path.join(table_dir, rel) for rel in sorted(files)]
    return spark.read.option("basePath", table_dir).parquet(*paths)


def read_epoch_changes(
    spark, table_dir: str, from_epoch: int, to_epoch: int | None = None
) -> "object":
    """CHANGE FEED for the append-only protocol: exactly the rows
    committed by epochs in (from_epoch, to_epoch] — the incremental
    consumer's contract (a downstream job remembers the last epoch it
    processed and reads only what landed since; Delta's
    readChangeFeed for a table whose only change type is insert).

    Implemented as a file-list diff of the epoch manifests, so the scan
    reads ONLY the new files — cost tracks the delta, never the table.
    Raises if the requested range reaches behind a squash boundary
    (those per-epoch file lists are gone — the documented retention
    trade) or past the newest epoch."""
    if to_epoch is not None and to_epoch < from_epoch:
        raise ValueError(
            f"read_epoch_changes: inverted range ({from_epoch}, {to_epoch}] "
            "— a silent empty frame here would mask caller bookkeeping bugs"
        )
    paths = _epoch_paths(table_dir)
    if not paths:
        raise TableInconsistentError(f"{table_dir}: no epoch manifests")
    files: dict[str, int] = {}
    seen: list[int] = []
    for p in paths:
        with open(p) as fh:
            m = json.load(fh)
        lo = m.get("squashed_from", m["epoch"])
        if lo <= from_epoch < m["epoch"]:
            raise TableInconsistentError(
                f"{table_dir}: epochs ({from_epoch}, {m['epoch']}] were "
                "squashed into one manifest — per-epoch deltas before the "
                "squash boundary are retired; re-baseline the consumer "
                f"from epoch {m['epoch']}"
            )
        seen.append(m["epoch"])
        if m["epoch"] <= from_epoch:
            continue
        if to_epoch is not None and m["epoch"] > to_epoch:
            break
        files.update(m["files"])
    hi = max(seen)
    if from_epoch > hi or (to_epoch is not None and to_epoch > hi):
        raise TableInconsistentError(
            f"{table_dir}: requested epochs ({from_epoch}, {to_epoch}] but "
            f"newest committed epoch is {hi}"
        )
    if not files:
        # Empty delta: derive the schema from a COMMITTED file, never by
        # scanning the raw directory — a torn/uncommitted data file with a
        # divergent or corrupt footer must not fail or skew an otherwise
        # valid empty feed (r9 ADVICE). Any committed file works: epochs
        # never change the schema.
        committed: list[str] = []
        for p in paths:
            with open(p) as fh:
                committed.extend(json.load(fh)["files"])
        if not committed:
            raise TableInconsistentError(
                f"{table_dir}: empty change feed on a table whose manifests "
                "commit no files — no schema source exists"
            )
        return (
            spark.read.option("basePath", table_dir)
            .parquet(os.path.join(table_dir, sorted(committed)[-1]))
            .limit(0)
        )
    return spark.read.option("basePath", table_dir).parquet(
        *[os.path.join(table_dir, rel) for rel in sorted(files)]
    )


def adopt_uncommitted(table_dir: str) -> dict | None:
    """Roll a torn append forward: commit every data file no epoch
    covers as a new epoch. Sound because files only become visible at
    Spark job commit (complete task outputs); call after verifying the
    writer is dead. Returns the new epoch manifest or None if nothing
    was orphaned."""
    return commit_append_epoch(table_dir)


def squash_epochs(table_dir: str, keep_last: int = 16) -> dict | None:
    """Manifest retention: merge all but the last ``keep_last`` epoch
    manifests into one base manifest. A table appended every few
    minutes accrues unbounded manifest files, and every validate/read
    opens ALL of them — squashing bounds that metadata cost. DATA files
    are never touched (every old epoch's files are still part of the
    current table; appends never delete), only manifests merge, so the
    CURRENT table and every snapshot at-or-after the squash boundary
    read identically. Time travel OLDER than the boundary is retired —
    the retention trade, same as Delta/Iceberg snapshot expiration.

    Crash-safe and idempotent: the squashed manifest atomically
    REPLACES the boundary epoch's file (its union includes that
    epoch), then the older manifests are deleted; a crash between the
    two leaves the union unchanged (epoch file lists are disjoint), and
    a re-run finishes the cleanup. Returns the squashed manifest, or
    None if there was nothing to squash."""
    paths = _epoch_paths(table_dir)
    if len(paths) <= max(keep_last, 1):
        return None
    validate_epochs(table_dir)  # prove history intact before rewriting it
    to_squash = paths[: len(paths) - keep_last]
    union: dict[str, int] = {}
    first = last = None
    for p in to_squash:
        with open(p) as fh:
            m = json.load(fh)
        if first is None:
            first = m.get("squashed_from", m["epoch"])
        last = m["epoch"]
        union.update(m["files"])
    manifest = {
        "version": 1,
        "epoch": last,
        "squashed_from": first,
        "n_files": len(union),
        "n_bytes": sum(union.values()),
        "files": union,
        "digest": _digest(union),
    }
    tmp = to_squash[-1] + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, to_squash[-1])  # atomic replace of the boundary epoch
    # Durability ORDER matters here: the boundary rename must hit disk
    # BEFORE the older manifests are unlinked — otherwise a power loss
    # could persist the unlinks but not the rename, leaving the boundary
    # file with its old single-epoch content and the squashed history
    # gone (committed data files would then read as 'uncommitted', and
    # vacuum_uncommitted would delete them).
    _fsync_dir(os.path.dirname(to_squash[-1]))
    for p in to_squash[:-1]:
        os.remove(p)
    _fsync_dir(os.path.dirname(to_squash[-1]))
    return manifest


def vacuum_uncommitted(table_dir: str) -> list[str]:
    """The abandon alternative to adopt_uncommitted: DELETE every data
    file no epoch covers, so the directory again equals the committed
    union (and raw-directory readers — including the idempotent-append
    anti-join — converge with the committed view, after which the
    abandoned batch CAN be re-appended). Call only after verifying the
    writer is dead; returns the deleted relative paths. Committed
    files are never touched (validate_epochs first proves they're all
    present, so a bad epoch dir aborts before any delete)."""
    orphans = validate_epochs(table_dir)["uncommitted"]
    for rel in orphans:
        os.remove(os.path.join(table_dir, rel))
    # drop now-empty partition dirs so the listing stays clean
    for root, dirs, files in os.walk(table_dir, topdown=False):
        if root != table_dir and not os.listdir(root):
            os.rmdir(root)
    return orphans
