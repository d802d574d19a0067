"""Commit-manifest protocol (sources/commit.py): the crash matrix for
stage-then-swap parquet writes. The reference gets this atomicity from
Postgres transactions; the parquet emulation must DETECT every
half-committed state and publish atomically (tmp+rename).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest

from spectraplex_spark.sources.commit import (
    MANIFEST_NAME,
    TableInconsistentError,
    has_commit_manifest,
    read_committed,
    validate_commit_manifest,
    write_commit_manifest,
)
from spectraplex_spark.sources.merge import merge_upsert

SCHEMA = "k long, v string, part string"


def _seed(spark, path):
    rows = [(i, f"v{i}", "a" if i < 5 else "b") for i in range(10)]
    spark.createDataFrame(rows, SCHEMA).write.partitionBy("part").parquet(path)
    return rows


def _updates(spark):
    return spark.createDataFrame(
        [(2, "v2_new", "a", "upsert"), (42, "v42", "b", "upsert")],
        "k long, v string, part string, _op string",
    )


def test_merge_publishes_a_valid_manifest(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    merge_upsert(spark, path, _updates(spark), "k", partition_col="part")
    m = validate_commit_manifest(path)
    assert m["n_files"] == len(
        [f for f in glob.glob(f"{path}/part=*/*") if not os.path.basename(f).startswith(("_", "."))]
    )
    got = {(r["k"], r["v"]) for r in read_committed(spark, path).collect()}
    assert (2, "v2_new") in got and (42, "v42") in got and len(got) == 11
    # partition column survives the explicit-file-list read
    assert "part" in read_committed(spark, path).columns


def test_crash_between_stage_and_swap_leaves_old_table_committed(spark, tmp_path):
    """Writer dies after staging, before any swap: the orphan staged
    dir is inert — readers still validate and read the OLD snapshot."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    write_commit_manifest(path)
    before = {(r["k"], r["v"]) for r in read_committed(spark, path).collect()}
    # simulate the crash: a fully-written staged directory appears
    # beside the target and the writer never returns
    staged = f"{path}__staged_deadbeef"
    spark.read.parquet(path).write.partitionBy("part").parquet(staged)
    validate_commit_manifest(path)  # old table still consistent
    after = {(r["k"], r["v"]) for r in read_committed(spark, path).collect()}
    assert after == before  # reader sees the old snapshot, whole


def test_crash_mid_swap_is_detected_not_silently_read(spark, tmp_path):
    """Writer dies after replacing SOME partition dirs: the directory
    no longer matches the manifest — validate and read_committed must
    raise, never hand back a mixed table."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    write_commit_manifest(path)
    # simulate a half-swap: partition 'a' replaced with fresh files,
    # partition 'b' still old, manifest not yet refreshed
    shutil.rmtree(os.path.join(path, "part=a"))
    spark.createDataFrame([(2, "v2_new", "a")], SCHEMA).write.parquet(
        os.path.join(path, "part=a")
    )
    with pytest.raises(TableInconsistentError, match="mid-swap|manifest"):
        validate_commit_manifest(path)
    with pytest.raises(TableInconsistentError):
        read_committed(spark, path)


def test_truncated_file_is_detected(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    write_commit_manifest(path)
    victim = glob.glob(f"{path}/part=a/*.parquet")[0]
    with open(victim, "ab") as fh:
        fh.write(b"garbage")  # size drift = partial write
    with pytest.raises(TableInconsistentError, match="resized"):
        validate_commit_manifest(path)


def test_uncommitted_table_is_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    assert not has_commit_manifest(path)
    with pytest.raises(TableInconsistentError, match="never committed"):
        read_committed(spark, path)


def test_manifest_write_is_atomic_tmp_then_rename(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    write_commit_manifest(path)
    assert not os.path.exists(os.path.join(path, MANIFEST_NAME + ".tmp"))
    m = json.load(open(os.path.join(path, MANIFEST_NAME)))
    assert m["digest"] == validate_commit_manifest(path)["digest"]
    # recommit after a legitimate rewrite replaces the manifest in place
    write_commit_manifest(path)
    validate_commit_manifest(path)


def test_webdataset_export_publishes_and_reader_validates(spark, tmp_path):
    from spectraplex_spark.sources.webdataset import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id long, text string"
    )
    out = str(tmp_path / "wds")
    write_webdataset_shards(docs, out, samples_per_shard=10)
    validate_commit_manifest(out)
    assert read_webdataset_shards(spark, out).count() == 20
    os.remove(sorted(glob.glob(f"{out}/*.tar"))[0])  # half-exported set
    with pytest.raises(TableInconsistentError):
        read_webdataset_shards(spark, out).count()


def test_compact_to_publishes(spark, tmp_path):
    from spectraplex_spark.sources.layout import compact_to

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.createDataFrame([(i, f"v{i}", "a") for i in range(50)], SCHEMA).repartition(
        8
    ).write.parquet(src)
    compact_to(spark, src, dst, rows_per_file=100)
    assert read_committed(spark, dst).count() == 50


# ---- recover_merge: the crash-state machine -----------------------------

def _intent(staged, mode, pcol=None, affected=(), staged_parts=()):
    from spectraplex_spark.sources.merge import _write_intent

    _write_intent(
        staged,
        {
            "mode": mode,
            "partition_col": pcol,
            "affected": list(affected),
            "staged_parts": list(staged_parts),
        },
    )


def test_recover_clean_removes_orphans(spark, tmp_path):
    from spectraplex_spark.sources.merge import recover_merge

    path = str(tmp_path / "t")
    _seed(spark, path)
    merge_upsert(spark, path, _updates(spark), "k", partition_col="part")
    os.makedirs(f"{path}__old_dead1")
    assert recover_merge(path) == "clean"
    assert not os.path.exists(f"{path}__old_dead1")
    validate_commit_manifest(path)


def test_recover_untouched_target_abandons_uncommitted_staged(spark, tmp_path):
    """Crash BEFORE any swap step: the transaction never reached its
    commit point, so recovery rolls BACK — the staged copy is dropped,
    the committed table is untouched, and the caller re-runs the merge
    (the canonical uncommitted-WAL-transaction outcome)."""
    from spectraplex_spark.sources.merge import recover_merge

    path = str(tmp_path / "t")
    _seed(spark, path)
    write_commit_manifest(path)
    before = {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()}
    staged = f"{path}__staged_crash1"
    spark.createDataFrame([(2, "v2_new", "a")], SCHEMA).write.partitionBy(
        "part"
    ).parquet(staged)
    _intent(staged, "partitions", "part", ["a", "b"], ["part=a"])
    assert recover_merge(path) == "clean"
    assert not os.path.exists(staged)
    assert {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()} == before


def test_recover_partition_swap_rolls_forward(spark, tmp_path):
    """Crash MID-swap (the deletion of 'b' applied, the rewrite of 'a'
    not yet): manifest invalid → recovery applies the remaining
    rewrite AND keeps the pure deletion (the intent's
    affected-without-staged-data case), then commits."""
    import shutil as sh

    from spectraplex_spark.sources.merge import recover_merge

    path = str(tmp_path / "t")
    _seed(spark, path)  # parts a (k 0-4) and b (k 5-9)
    write_commit_manifest(path)
    staged = f"{path}__staged_crash1"
    spark.createDataFrame([(2, "v2_new", "a")], SCHEMA).write.partitionBy(
        "part"
    ).parquet(staged)
    _intent(staged, "partitions", "part", ["a", "b"], ["part=a"])
    sh.rmtree(os.path.join(path, "part=b"))  # the deletion step ran
    assert recover_merge(path) == "completed-merge"
    validate_commit_manifest(path)
    got = {(r["k"], r["v"], r["part"]) for r in spark.read.parquet(path).collect()}
    assert got == {(2, "v2_new", "a")}  # a rewritten, b stays deleted
    assert not os.path.exists(staged)


def test_recover_partition_swap_half_done_is_idempotent(spark, tmp_path):
    """Crash AFTER 'a' moved but before 'b' was deleted: recovery must
    keep the already-moved partition and finish the deletion."""
    import shutil as sh

    from spectraplex_spark.sources.merge import recover_merge

    path = str(tmp_path / "t")
    _seed(spark, path)
    write_commit_manifest(path)
    staged = f"{path}__staged_crash2"
    spark.createDataFrame([(2, "v2_new", "a")], SCHEMA).write.partitionBy(
        "part"
    ).parquet(staged)
    _intent(staged, "partitions", "part", ["a", "b"], ["part=a"])
    # simulate: swap of 'a' already happened
    sh.rmtree(os.path.join(path, "part=a"))
    os.rename(os.path.join(staged, "part=a"), os.path.join(path, "part=a"))
    assert recover_merge(path) == "completed-merge"
    got = {(r["k"], r["v"], r["part"]) for r in spark.read.parquet(path).collect()}
    assert got == {(2, "v2_new", "a")}
    validate_commit_manifest(path)


def test_recover_whole_table_target_missing(spark, tmp_path):
    from spectraplex_spark.sources.merge import recover_merge

    path = str(tmp_path / "t")
    _seed(spark, path)
    write_commit_manifest(path)
    old = f"{path}__old_crash3"
    staged = f"{path}__staged_crash3"
    spark.createDataFrame([(99, "v99", "a")], SCHEMA).write.parquet(staged)
    _intent(staged, "whole")
    os.rename(path, old)  # crash between the two renames
    assert recover_merge(path) == "whole-forward"
    got = {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(99, "v99")}
    validate_commit_manifest(path)
    assert not os.path.exists(old) and not os.path.exists(staged)


def test_recover_whole_table_uncommitted_target(spark, tmp_path):
    """Crash after the new table renamed in but before the manifest
    refresh: old copy still beside it, no staged — commit forward."""
    from spectraplex_spark.sources.merge import recover_merge

    path = str(tmp_path / "t")
    _seed(spark, path)
    write_commit_manifest(path)
    old = f"{path}__old_crash4"
    os.rename(path, old)
    spark.createDataFrame([(99, "v99", "a")], SCHEMA).write.parquet(path)
    assert recover_merge(path) == "commit-forward"
    got = {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(99, "v99")}
    validate_commit_manifest(path)
    assert not os.path.exists(old)


def test_recover_rolled_back_restores_old(spark, tmp_path):
    from spectraplex_spark.sources.merge import recover_merge

    path = str(tmp_path / "t")
    _seed(spark, path)
    write_commit_manifest(path)
    old = f"{path}__old_crash5"
    os.rename(path, old)  # target vanished, no staged anywhere
    assert recover_merge(path) == "rolled-back"
    assert spark.read.parquet(path).count() == 10
    validate_commit_manifest(path)


def test_recover_refuses_to_guess(spark, tmp_path):
    from spectraplex_spark.sources.merge import recover_merge

    path = str(tmp_path / "t")
    _seed(spark, path)  # no manifest, no staged, no old
    with pytest.raises(TableInconsistentError, match="nothing to recover"):
        recover_merge(path)
