"""MERGE INTO (upsert + delete) over plain parquet — the CDC write
path, emulated the way every copy-on-write table format implements it.

The reference's only write semantic is insert-or-ignore
(``ON CONFLICT DO NOTHING``, repo.rs:26), covered by the idempotent
sinks. A real pipeline also needs UPSERT (late corrections, backfills)
and DELETE (GDPR erasure, retractions) — in lakehouse formats that is
``MERGE INTO``; without a table format in this environment the same
semantics are built from the two primitives Spark does have:
an anti-join rewrite and a staged swap.

Semantics (one call): rows of ``updates`` carry the key plus the new
payload and an ``_op`` column — 'upsert' (insert-or-replace) or
'delete'. The merged table is
``target \\ keys(updates)  ∪  upserts(updates)``.

Scale design — PARTITION-SCOPED copy-on-write, the part that matters
at 100 TB: when the table is partitioned and ``partition_col`` is
given, only the partitions that actually contain updated keys are
rewritten (the updates frame's distinct partition values, plus — by
default — a key-probe of the target for keys whose stored partition
differs; see ``probe_moved_keys``); untouched partitions are never
rewritten. A merge touching
1 of 10,000 daily partitions costs 1/10,000 of the table, exactly like
Delta/Iceberg/Hudi copy-on-write file pruning (their granularity is
the file; a partition is the portable approximation). The rewrite of
an affected partition is one anti-join (updates side broadcast when
batch-sized) + one union + one write to a STAGED directory, then a
directory swap — Spark cannot overwrite a dataset it is reading, and
stage-then-swap at the manifest level is how every table format
commits (compact_to's discipline).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from spectraplex_spark.sources.commit import (
    TableInconsistentError,
    validate_commit_manifest,
    write_commit_manifest,
)

OP_COL = "_op"
INTENT_NAME = "_spectraplex_intent.json"

# Spark's partitioned writer names directories via Hive path escaping
# (ExternalCatalogUtils.escapePathName): control chars and this set are
# %XX-encoded, and NULL/empty partition values become the Hive default
# sentinel. The swap must use the SAME names or it silently misses the
# real directories (rewrites deleted, merge a no-op).
_ESCAPED_CHARS = set('"#%\'*/:=?\\{[]^\x7f') | {chr(c) for c in range(1, 32)}
_HIVE_NULL_PART = "__HIVE_DEFAULT_PARTITION__"


def _escape_path_name(name: str) -> str:
    return "".join(
        "%{:02X}".format(ord(ch)) if ch in _ESCAPED_CHARS else ch for ch in name
    )


def _partition_dir(partition_col: str, value) -> str:
    """The directory name Spark's writer produces for this partition
    value — Hive path escaping plus the NULL/empty sentinel, booleans
    lowercased the way Spark stringifies them."""
    if value is None or value == "":
        return f"{_escape_path_name(partition_col)}={_HIVE_NULL_PART}"
    s = ("true" if value else "false") if isinstance(value, bool) else str(value)
    return f"{_escape_path_name(partition_col)}={_escape_path_name(s)}"


def _inference_safe(text: str) -> bool:
    """True iff a partition directory's value text survives Spark's
    partition-type inference and comes back with the SAME lexical form.

    Numeric-LOOKING strings that don't round-trip ('01', '+1', '1.10')
    are the poison case: the reader infers 1 / 1.1, every predicted
    directory name drifts from the real one, and the staged cross-checks
    can't see it because prediction and staged output drift TOGETHER —
    the old partition would silently survive the swap (review finding).
    """
    import re

    if re.fullmatch(r"[+-]?\d+", text):
        if len(text.lstrip("+-")) > 38:
            # exceeds DECIMAL(38): Spark falls through to DOUBLE and the
            # value reads back as '1e+41'-style scientific notation —
            # permanent lexical drift (review finding r13, verified on
            # Spark 4.1.2)
            return False
        try:
            return str(int(text)) == text
        except ValueError:  # pragma: no cover - astronomically long digits
            return False
    # DATE / TIMESTAMP inference (review finding r13): Spark also tries
    # both on partition values.  The drift class, pinned by a probe
    # matrix on Spark 4.1.2 (BASELINE.md r13): a padded timestamp with
    # a SINGLE-digit fraction infers as TIMESTAMP and its read-back
    # str() emits 6-digit microseconds ('...56.5' → '...56.500000',
    # '...56.0' → '...56') — permanent lexical drift.  Everything else
    # date/timestamp-shaped either round-trips (padded dates,
    # seconds-precision timestamps) or is NOT inferred at all and
    # survives as the identical string (probed: '2024-1-1', 2+-digit
    # fractions incl. '.500000'/'.000000', 'T' separator, no-seconds,
    # unpadded hour, leading/trailing whitespace, invalid months).
    m = re.fullmatch(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.(\d+))?", text)
    if m:
        frac = m.group(2)
        return frac is None or len(frac) != 1
    # Spark's fallback is Double.parseDouble, which ALSO accepts
    # exponent-only forms without a dot ('1e5' → 100000.0) and the
    # Infinity/NaN spellings — all of which drift on read-back, so they
    # must hit the float round-trip check / hard reject too (r11 ADVICE:
    # the old pattern required a decimal point and let '1e5' through).
    num = r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?"

    def java_double_parses(t: str) -> bool:
        """Whether Double.parseDouble accepts ``t`` (pre-trimmed): the
        Double.valueOf grammar — EXACT-case NaN/Infinity (parseDouble
        is case-sensitive: 'nan'/'inf'/'INFINITY' all throw and stay
        safe strings), decimal forms with an optional f/F/d/D type
        suffix ('123d' → 123.0; the suffix attaches to NUMERIC
        literals only, so 'NaNd' does NOT parse), and hexadecimal
        float literals ('0x1p3' → 8.0)."""
        if re.fullmatch(r"[+-]?(Infinity|NaN)", t):
            return True
        core = t[:-1] if t and t[-1] in "fFdD" else t
        if re.fullmatch(num, core):
            return True
        return bool(
            re.fullmatch(r"[+-]?0[xX][0-9a-fA-F]*\.?[0-9a-fA-F]*[pP][+-]?\d+", core)
        )

    # parseDouble TRIMS like String.trim (chars ≤ U+0020) before
    # parsing, while int/long/decimal inference throws on whitespace —
    # so ' 1' infers as DOUBLE 1.0 and the directory name drifts.  Any
    # whitespace-wrapped value whose trimmed core parses is unsafe;
    # a trimmed core that does NOT parse falls through every inference
    # and survives as the identical string.
    trimmed = re.sub(r"^[\x00-\x20]+|[\x00-\x20]+$", "", text)
    if trimmed != text:
        # (date/timestamp inference does NOT trim — probed: a
        # whitespace-wrapped date survives as the identical string —
        # so only the parseDouble trim matters here)
        return not java_double_parses(trimmed)
    if re.fullmatch(r"[+-]?(Infinity|NaN)", text):
        return False  # reads back as Infinity/NaN, not the string
    if java_double_parses(text) and not re.fullmatch(num, text):
        return False  # suffix / hex forms: str(float) never emits them
    if re.fullmatch(num, text) and ("." in text or "e" in text or "E" in text):
        try:
            return str(float(text)) == text
        except (ValueError, OverflowError):
            return False
    return True


def _write_intent(staged_dir: str, intent: dict) -> None:
    """WAL record inside the staged dir (underscore-prefixed: excluded
    from data-file manifests), written tmp-then-rename BEFORE any swap
    step so recover_merge can roll the swap forward."""
    final = os.path.join(staged_dir, INTENT_NAME)
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(intent, fh, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, final)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_col: str,
    partition_col: str | None = None,
    probe_moved_keys: bool = True,
) -> dict[str, int]:
    """Apply ``updates`` (payload columns + ``_op`` in {'upsert',
    'delete'}) to the parquet table at ``target_path``. Returns
    counts: upserted / deleted / partitions_rewritten.

    Duplicate keys within one updates batch are invalid (which payload
    wins would be arbitrary) and raise.

    ``probe_moved_keys`` (default True) guards the partition-scoped
    path against keys that MOVE partitions: an upsert whose
    ``partition_col`` value differs from the row's currently-stored
    partition (or a delete carrying a stale partition value) must also
    rewrite the OLD partition, else the key survives there as a stale
    duplicate. The probe is one broadcast semi-join of the target
    against the update keys, reading only (key_col, partition_col) —
    column-pruned but NOT partition-pruned (it must look everywhere by
    definition). Workloads whose partition value is immutable per key
    (e.g. event-date partitioning keyed by event id) can pass
    ``probe_moved_keys=False`` to keep the fully partition-pruned
    read; that flag is a CONTRACT that keys never change partition."""
    # A trailing slash would place the staged/old siblings INSIDE the
    # target (breaking the whole-table rename with EINVAL after the
    # intent landed, and hiding them from _siblings/recover_merge).
    target_path = target_path.rstrip("/") or target_path
    from spectraplex_spark.sources.commit import EPOCH_DIR

    if os.path.isdir(os.path.join(target_path, EPOCH_DIR)):
        raise TableInconsistentError(
            f"{target_path}: carries append-epoch manifests ({EPOCH_DIR}) "
            "— merge_upsert rewrites files the epochs still reference, "
            "which would both break the epoch read path and make the next "
            "append double-commit the rewritten rows. Squash/retire the "
            "epoch history (or rebuild the table) before merging."
        )
    # persist: updates feeds the _op check, both counts, the partition
    # probe, and the final anti-join/union — without it every guard
    # re-executes the (possibly non-deterministic) lineage, and the
    # batch the guards validated need not be the batch that merges.
    updates = updates.persist()
    # try/finally, not hand-enumerated unpersists: any exception path
    # (unreadable target, failed staged write, OSError mid-swap) must
    # release the cached batch too (review finding r13).
    try:
        return _merge_upsert_impl(
            spark, target_path, updates, key_col, partition_col, probe_moved_keys
        )
    finally:
        updates.unpersist()


def _merge_upsert_impl(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_col: str,
    partition_col: str | None,
    probe_moved_keys: bool,
) -> dict[str, int]:
    ops = updates.select(F.col(OP_COL)).distinct().collect()
    bad = [r[0] for r in ops if r[0] not in ("upsert", "delete")]
    if bad:
        raise ValueError(f"unknown _op values {bad!r}: use 'upsert' or 'delete'")
    n_updates = updates.count()
    if updates.select(key_col).distinct().count() != n_updates:
        raise ValueError(
            "updates batch has duplicate keys — which payload wins would "
            "be arbitrary; pre-aggregate to one row per key (e.g. latest "
            "by a CDC sequence column) before merging."
        )
    if updates.filter(F.col(key_col).isNull()).count():
        raise ValueError(
            "updates batch carries a NULL merge key: the anti-join never "
            "matches NULL (a null-key upsert would duplicate, a null-key "
            "delete would silently no-op) — repair or drop those rows."
        )
    target = spark.read.parquet(target_path)
    upserts = updates.filter(F.col(OP_COL) == "upsert").drop(OP_COL)
    # Schema guard (review finding r13, the idempotent_append rule for
    # the REWRITE path): unionByName silently coerces mismatched column
    # types (long+double → double; long+string → bigint with
    # unparseable payloads becoming NULL — verified on Spark 4.1.2), so
    # a drifted updates batch would rewrite the affected partitions
    # under a forked parquet schema and corrupt later whole-table reads.
    # The partition column compares by NAME only (the idempotent_append
    # rule): its read-back type comes from partition-value INFERENCE —
    # a NULL-only partition reads back NullType, numeric-looking values
    # read back int/date — which legitimately differs from the written
    # type without any payload hazard.
    tgt_types = {
        f.name: f.dataType
        for f in target.schema.fields
        if f.name != partition_col
    }
    upd_types = {
        f.name: f.dataType
        for f in upserts.schema.fields
        if f.name != partition_col
    }
    if tgt_types != upd_types or {f.name for f in target.schema.fields} != {
        f.name for f in upserts.schema.fields
    }:
        diffs = sorted(set(tgt_types) | set(upd_types))
        detail = ", ".join(
            f"{c}: target={tgt_types.get(c, '<absent>')} "
            f"updates={upd_types.get(c, '<absent>')}"
            for c in diffs
            if tgt_types.get(c) != upd_types.get(c)
        ) or "column name sets differ"
        raise TableInconsistentError(
            f"{target_path}: updates schema does not match the target "
            f"({detail}) — unionByName would silently coerce and fork "
            "the table's parquet schema across partitions; cast the "
            "updates batch to the target schema first."
        )
    n_up = upserts.count()
    n_del = n_updates - n_up

    if partition_col is not None:
        # refuse partition values whose directory text would not survive
        # partition-type inference: every downstream prediction
        # (_partition_dir over READ-BACK values) would silently drift
        from urllib.parse import unquote

        prefix = f"{_escape_path_name(partition_col)}="
        for d in os.listdir(target_path):
            if not d.startswith(prefix) or not os.path.isdir(
                os.path.join(target_path, d)
            ):
                continue
            text = unquote(d[len(prefix):])
            if text != _HIVE_NULL_PART and not _inference_safe(text):
                raise TableInconsistentError(
                    f"{target_path}: partition directory {d!r} holds a "
                    f"value ({text!r}) that Spark's partition-type "
                    "inference canonicalizes to a different lexical form "
                    "— the partition-scoped swap cannot predict directory "
                    "names for this table. Store the value in canonical "
                    "form (e.g. no leading zeros) or merge with "
                    "partition_col=None (whole-table swap)."
                )
        parts = updates.select(F.col(partition_col).alias("_p")).distinct()
        if probe_moved_keys:
            # key-probe: partitions where the updated keys CURRENTLY
            # live — catches partition-moving upserts / stale-partition
            # deletes that would otherwise leave the old copy behind
            current = (
                target.join(
                    F.broadcast(updates.select(key_col)), key_col, "left_semi"
                )
                .select(F.col(partition_col).alias("_p"))
                .distinct()
            )
            parts = parts.unionByName(current).distinct()
        affected = [r[0] for r in parts.collect()]
        # the partition predicate PRUNES the rewrite read: untouched
        # partitions are never rewritten (verified in tests via file
        # mtimes). isin() never matches NULL — a NULL partition value
        # needs an explicit isNull branch or its rows silently escape
        # the rewrite scope.
        non_null = [v for v in affected if v is not None]
        pred = F.col(partition_col).isin(non_null)
        if len(non_null) < len(affected):
            pred = pred | F.col(partition_col).isNull()
        scoped_target = target.filter(pred)
        affected_dirs = sorted({_partition_dir(partition_col, v) for v in affected})
        # partition values actually PRESENT in the target scope —
        # needed below to verify the escaping prediction for
        # deletion-only partitions, which Spark never re-writes (so the
        # staged-dir cross-check can't see them). Partition-pruned +
        # partition-column-only (values come from directory names).
        present_vals = {
            r[0] for r in scoped_target.select(partition_col).distinct().collect()
        }
        n_parts = len(affected)
    else:
        scoped_target = target
        n_parts = 1

    merged_scope = scoped_target.join(
        F.broadcast(updates.select(key_col)), key_col, "left_anti"
    ).unionByName(upserts)

    staged = f"{target_path}__staged_{uuid.uuid4().hex[:8]}"
    writer = merged_scope.write.mode("overwrite")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.parquet(staged)
    if partition_col is not None:
        prefix = f"{_escape_path_name(partition_col)}="

        def _has_parquet(d: str) -> bool:
            return os.path.isdir(d) and any(
                f.endswith(".parquet") for f in os.listdir(d)
            )

        # A merge that deletes the table's LAST row leaves zero data
        # files — an UNREADABLE dataset (UNABLE_TO_INFER_SCHEMA;
        # hypothesis-caught r12).  The keep-footer (one empty
        # schema-bearing file in the first affected partition) is
        # staged HERE, before the intent record, so it rides the
        # normal rewrite swap — which also makes recover_merge's
        # partition-mode replay reproduce it (review finding r13: the
        # old post-swap footer was invisible to recovery, so a crash
        # between the swap loop and the footer write recovered into
        # the unreadable zero-file state and committed it).
        table_will_empty = not any(
            _has_parquet(os.path.join(staged, d))
            for d in os.listdir(staged)
            if d.startswith(prefix)
        ) and not any(
            _has_parquet(os.path.join(target_path, d))
            for d in os.listdir(target_path)
            if d.startswith(prefix) and d not in set(affected_dirs)
        )
        if table_will_empty:
            spark.createDataFrame(
                [], scoped_target.drop(partition_col).schema
            ).repartition(1).write.mode("overwrite").parquet(
                os.path.join(staged, affected_dirs[0])
            )
        # every directory Spark actually wrote must be one we predicted
        # — an escaping mismatch here would make the swap silently skip
        # real data, so it fails loudly instead
        staged_parts = sorted(
            d for d in os.listdir(staged) if d.startswith(prefix)
        )
        unexpected = [d for d in staged_parts if d not in set(affected_dirs)]
        if unexpected:
            shutil.rmtree(staged)
            raise TableInconsistentError(
                f"staged partition dirs {unexpected!r} don't match the "
                f"predicted escaped names {affected_dirs!r} — partition-"
                "value escaping drift; merge aborted before any swap"
            )
        # The staged check above only covers partitions Spark re-wrote.
        # A DELETION-ONLY partition (all rows removed → no staged
        # subdir) rides entirely on the _partition_dir prediction: if
        # the predicted name drifted from what Spark's writer produced,
        # the swap would silently skip removing the old directory and
        # the deleted rows would survive. Every value PRESENT in the
        # scope was read from a real directory, so its predicted dir
        # must exist under target_path — abort loudly on a miss.
        missing = sorted(
            d
            for d in {_partition_dir(partition_col, v) for v in present_vals}
            if d not in set(staged_parts)
            and not os.path.isdir(os.path.join(target_path, d))
        )
        if missing:
            shutil.rmtree(staged)
            raise TableInconsistentError(
                f"predicted deletion-only partition dirs {missing!r} not "
                "found under the target — partition-value escaping drift "
                "on a pure-deletion partition; merge aborted before any "
                "swap (the old rows would otherwise silently survive)"
            )
    # WAL: the intent record makes the staged dir self-describing, so
    # recover_merge can roll an interrupted swap FORWARD — including
    # pure-deletion partitions that leave no staged subdirectory.
    # "affected" holds FULL escaped dir names (e.g. "day=2024%2F01")
    # so recovery never re-derives escaping from raw values.
    _write_intent(
        staged,
        {
            "mode": "whole" if partition_col is None else "partitions",
            "partition_col": partition_col,
            "affected": [] if partition_col is None else affected_dirs,
            # partitions WITH staged data are rewrites; affected
            # partitions WITHOUT are pure deletions (recovery must
            # re-delete them, not mistake the old dir for a finished
            # swap)
            "staged_parts": [] if partition_col is None else staged_parts,
        },
    )

    if partition_col is None:
        # whole-table swap
        old = f"{target_path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(target_path, old)
        os.rename(staged, target_path)
    else:
        # swap ONLY the affected partition directories; untouched
        # partitions are never read or written (verified in tests via
        # file mtimes)
        old = None
        for part in affected_dirs:
            dst = os.path.join(target_path, part)
            src = os.path.join(staged, part)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            if os.path.exists(src):
                os.rename(src, dst)
        # (the last-row-delete keep-footer was STAGED before the intent
        # record above, so the swap loop just moved it in — and a
        # crash-recovery replay of the same intent reproduces it)
    # commit point: refresh the manifest AFTER the swap; until this
    # rename lands, validate/read_committed reject the directory as
    # mid-swap (sources/commit.py crash matrix) — the staged/old copy
    # is only discarded once the new snapshot is committed
    if partition_col is None:
        intent_in_target = os.path.join(target_path, INTENT_NAME)
        if os.path.exists(intent_in_target):  # rode along in the rename
            os.remove(intent_in_target)
    write_commit_manifest(target_path)
    if partition_col is None:
        shutil.rmtree(old)
    else:
        shutil.rmtree(staged)
    return {"upserted": n_up, "deleted": n_del, "partitions_rewritten": n_parts}


def _siblings(target_path: str, tag: str) -> list[str]:
    parent = os.path.dirname(os.path.abspath(target_path)) or "."
    base = os.path.basename(target_path.rstrip("/"))
    return sorted(
        os.path.join(parent, d)
        for d in os.listdir(parent)
        if d.startswith(f"{base}__{tag}_")
    )


def recover_merge(target_path: str) -> str:
    """Bring a merge target back to a committed state after a crash,
    rolling the interrupted swap FORWARD from the staged copy's intent
    record (the WAL written before any swap step). Returns what was
    done. State machine (every state a kill can leave, pytest-pinned):

      clean           — manifest valid: drop orphan staged/old dirs.
                        Includes a fully-staged merge whose swap never
                        STARTED: it never reached its commit point, so
                        it rolls back (staged copy abandoned; re-run
                        the merge) — the canonical uncommitted-
                        transaction outcome.
      completed-merge — partition swap finished but the commit-manifest
                        refresh didn't land (staged + intent present):
                        re-apply the intent (idempotent — partitions
                        already moved stay moved, pure-deletion
                        partitions are re-deleted), commit, drop staged.
      whole-forward   — whole-table swap interrupted: target missing →
                        rename staged in; target present but
                        uncommitted with a staged copy → replace it;
                        then commit and drop the old copy.
      commit-forward  — whole-table swap fully applied (old copy still
                        beside the table, no staged) but uncommitted:
                        write the manifest, drop old.
      rolled-back     — only the old copy survived (target and staged
                        both gone): restore old as target (its manifest
                        is intact).

    Anything else raises — automatic recovery must never guess."""
    staged_dirs = _siblings(target_path, "staged")
    old_dirs = _siblings(target_path, "old")
    target_exists = os.path.exists(target_path)

    def _committed() -> bool:
        try:
            validate_commit_manifest(target_path)
            return True
        except TableInconsistentError:
            return False

    if target_exists and _committed():
        for d in (*staged_dirs, *old_dirs):
            shutil.rmtree(d)
        return "clean"

    if len(staged_dirs) > 1:
        raise TableInconsistentError(
            f"{target_path}: {len(staged_dirs)} staged dirs — concurrent "
            "writers are outside this protocol; resolve by hand"
        )

    if staged_dirs:
        staged = staged_dirs[0]
        intent_path = os.path.join(staged, INTENT_NAME)
        if not os.path.exists(intent_path):
            raise TableInconsistentError(
                f"{staged}: staged dir without an intent record (pre-WAL "
                "writer or partial stage) — remove it by hand and re-run "
                "the merge"
            )
        with open(intent_path) as fh:
            intent = json.load(fh)
        if intent["mode"] == "whole":
            if target_exists:
                shutil.rmtree(target_path)  # uncommitted half-state
            # RENAME FIRST, remove the intent after (it rides along
            # inside the renamed dir) — merge_upsert's own order. The
            # old remove-then-rename order had a crash window leaving a
            # staged dir with no intent and NO target: the next recovery
            # run would refuse the only complete copy (review finding).
            os.rename(staged, target_path)
            carried = os.path.join(target_path, INTENT_NAME)
            if os.path.exists(carried):
                os.remove(carried)
            write_commit_manifest(target_path)
            for d in old_dirs:
                shutil.rmtree(d)
            return "whole-forward"
        # partition mode: re-apply the recorded swap, idempotently.
        # intent["affected"] carries full escaped dir names already.
        staged_parts = set(intent["staged_parts"])
        for part in intent["affected"]:
            dst = os.path.join(target_path, part)
            src = os.path.join(staged, part)
            if part in staged_parts:  # rewrite: move unless already moved
                if os.path.exists(src):
                    if os.path.exists(dst):
                        shutil.rmtree(dst)
                    os.rename(src, dst)
            else:  # pure deletion: the emptied partition must not survive
                if os.path.exists(dst):
                    shutil.rmtree(dst)
        write_commit_manifest(target_path)
        shutil.rmtree(staged)
        for d in old_dirs:
            shutil.rmtree(d)
        return "completed-merge"

    if target_exists and old_dirs:
        # whole-table swap fully applied but never committed
        leftover = os.path.join(target_path, INTENT_NAME)
        if os.path.exists(leftover):  # rode along in the rename
            os.remove(leftover)
        write_commit_manifest(target_path)
        for d in old_dirs:
            shutil.rmtree(d)
        return "commit-forward"

    if not target_exists and old_dirs:
        os.rename(old_dirs[0], target_path)  # old manifest intact
        validate_commit_manifest(target_path)
        for d in old_dirs[1:]:
            shutil.rmtree(d)
        return "rolled-back"

    raise TableInconsistentError(
        f"{target_path}: no committed manifest, no staged copy, no old "
        "copy — nothing to recover from automatically"
    )

