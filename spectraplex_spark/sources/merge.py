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

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from spectraplex_spark.sources.commit import write_commit_manifest

OP_COL = "_op"


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
    target = spark.read.parquet(target_path)
    upserts = updates.filter(F.col(OP_COL) == "upsert").drop(OP_COL)
    n_up = upserts.count()
    n_del = n_updates - n_up

    if partition_col is not None:
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
        # mtimes)
        scoped_target = target.filter(F.col(partition_col).isin(affected))
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

    if partition_col is None:
        # whole-table swap
        old = f"{target_path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(target_path, old)
        os.rename(staged, target_path)
        shutil.rmtree(old)
    else:
        # swap ONLY the affected partition directories; untouched
        # partitions are never read or written (verified in tests via
        # file mtimes)
        for v in affected:
            part = f"{partition_col}={v}"
            dst = os.path.join(target_path, part)
            src = os.path.join(staged, part)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            if os.path.exists(src):
                os.rename(src, dst)
    # commit point: refresh the manifest AFTER the swap; until this
    # rename lands, validate/read_committed reject the directory as
    # mid-swap (sources/commit.py crash matrix) — the staged copy is
    # only discarded once the new snapshot is committed
    write_commit_manifest(target_path)
    if partition_col is not None:
        shutil.rmtree(staged)
    return {"upserted": n_up, "deleted": n_del, "partitions_rewritten": n_parts}
