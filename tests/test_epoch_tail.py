"""The epoch-tail streaming source (streaming/epoch_tail.py): epoch
numbers as Spark stream offsets over the append-epoch protocol."""

from __future__ import annotations

import time

import pytest

from spectraplex_spark.sources.io import idempotent_append
from spectraplex_spark.streaming.epoch_tail import (
    EpochTailDataSource,
    _EpochTailStreamReader,
)

SCHEMA = "id long, v string, part string"


def _batch(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}", "a" if i % 2 == 0 else "b") for i in range(lo, hi)], SCHEMA
    )


def _drain(spark, path, checkpoint, sink_dir):
    q = (
        spark.readStream.format("epoch_tail")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["id"], r["v"], r["part"])
        for r in spark.read.parquet(sink_dir).collect()
    }


def test_tail_resumes_from_checkpoint_exactly_once(spark, tmp_path):
    """A restarted query resumes after its committed epoch: the second
    drain appends ONLY the epochs committed since — no duplicates, no
    gaps (the parquet sink accumulates, so a replayed epoch would show up
    as a duplicate id). Partition-directory values surface as string
    columns."""
    spark.dataSource.register(EpochTailDataSource)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    for lo in range(0, 30, 10):  # epochs 0,1,2
        idempotent_append(_batch(spark, lo, lo + 10), path, partition_by=("part",))

    got1 = _drain(spark, path, ckpt, sink)
    assert {g[0] for g in got1} == set(range(30))
    assert len(got1) == 30
    assert {g[2] for g in got1} == {"a", "b"}  # partition col round-trips

    for lo in (30, 40):  # epochs 3,4
        idempotent_append(_batch(spark, lo, lo + 10), path, partition_by=("part",))
    got2 = _drain(spark, path, ckpt, sink)
    assert {g[0] for g in got2} == set(range(50))  # old + delta
    assert len(got2) == 50  # and NOTHING replayed twice


def test_stale_checkpoint_behind_squash_boundary_fails_loudly(spark, tmp_path):
    from spectraplex_spark.sources.commit import squash_epochs

    path = str(tmp_path / "t")
    for lo in range(0, 40, 10):  # epochs 0..3
        idempotent_append(_batch(spark, lo, lo + 10), path, partition_by=("part",))
    squash_epochs(path, keep_last=1)
    reader = _EpochTailStreamReader({"path": path})
    with pytest.raises(RuntimeError, match="re-baseline"):
        reader.partitions({"epoch": 0}, {"epoch": 3})
    # post-boundary deltas still served: one partition per committed file
    parts = reader.partitions({"epoch": 2}, {"epoch": 3})
    assert len(parts) >= 1
    rows = [r for p in parts for r in reader.read(p)]
    assert {r[0] for r in rows} == set(range(30, 40))


def test_backpressure_caps_epochs_per_batch(spark, tmp_path):
    """max_epochs_per_batch bounds how far latestOffset advances per
    trigger — a backlog drains over several micro-batches instead of one
    giant one. A fresh query's Spark call sequence starts with
    initialOffset (that arms the cap: committed == from_epoch)."""
    path = str(tmp_path / "t")
    for lo in range(0, 40, 10):  # epochs 0..3
        idempotent_append(_batch(spark, lo, lo + 10), path, partition_by=("part",))
    reader = _EpochTailStreamReader({"path": path, "max_epochs_per_batch": 2})
    assert reader.initialOffset() == {"epoch": -1}
    assert reader.latestOffset() == {"epoch": 1}
    assert reader.latestOffset() == {"epoch": 3}
    assert reader.latestOffset() == {"epoch": 3}  # caught up: no advance


def test_backpressure_never_regresses_after_restart(spark, tmp_path):
    """Restart + cap: a restarted query does NOT call initialOffset — the
    checkpointed offset is invisible to the reader — so a capped
    latestOffset based on from_epoch could return an offset BEHIND the
    checkpoint (checkpoint at 3, cap 2 → epoch 1), regressing the offset
    log and replanning epochs already written to a sink. The first
    post-restart latestOffset must be uncapped; afterwards every observed
    offset (partitions/commit) clamps the cap's floor up."""
    path = str(tmp_path / "t")
    for lo in range(0, 60, 10):  # epochs 0..5
        idempotent_append(_batch(spark, lo, lo + 10), path, partition_by=("part",))

    # restart flavor A: all batches committed → latestOffset is called first
    reader = _EpochTailStreamReader({"path": path, "max_epochs_per_batch": 2})
    off = reader.latestOffset()
    assert off == {"epoch": 5}  # uncapped: never behind any possible checkpoint
    assert reader.latestOffset() == {"epoch": 5}  # cap re-armed, no regression

    # restart flavor B: a pending batch is replayed first via partitions()
    reader = _EpochTailStreamReader({"path": path, "max_epochs_per_batch": 2})
    reader.partitions({"epoch": 2}, {"epoch": 3})  # replayed pending batch
    assert reader.latestOffset() == {"epoch": 5}  # capped from 3, not from -1

    # restart flavor C: commit() reveals the floor
    reader = _EpochTailStreamReader({"path": path, "max_epochs_per_batch": 2})
    reader.commit({"epoch": 4})
    assert reader.latestOffset() == {"epoch": 5}

    # monotonicity invariant under every interleaving: offsets never shrink
    reader = _EpochTailStreamReader({"path": path, "max_epochs_per_batch": 1})
    seen = [reader.latestOffset()["epoch"]]
    for _ in range(3):
        seen.append(reader.latestOffset()["epoch"])
    assert seen == sorted(seen)


def test_tail_yields_declared_order_across_reordered_epochs(spark, tmp_path):
    """The append schema guard allows a later epoch to write the SAME
    columns in a DIFFERENT parquet physical order; tailing such a table
    must yield every epoch in the declared stream order, not the file's
    physical order (else same-typed columns silently transpose)."""
    spark.dataSource.register(EpochTailDataSource)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    idempotent_append(_batch(spark, 0, 5), path, partition_by=("part",))
    # epoch 1: same columns, reordered (v before id) — legal per io.py guard
    reordered = spark.createDataFrame(
        [(f"v{i}", i, "a" if i % 2 == 0 else "b") for i in range(5, 10)],
        "v string, id long, part string",
    )
    assert idempotent_append(reordered, path, partition_by=("part",)) == 5
    got = _drain(spark, path, ckpt, sink)
    assert got == {
        (i, f"v{i}", "a" if i % 2 == 0 else "b") for i in range(10)
    }


def test_schema_derived_from_committed_files(spark, tmp_path):
    path = str(tmp_path / "t")
    idempotent_append(_batch(spark, 0, 5), path, partition_by=("part",))
    # a torn raw file must not influence the schema
    with open(f"{path}/part=a/torn.parquet", "wb") as fh:
        fh.write(b"\x00garbage\x00")
    ds = EpochTailDataSource(options={"path": path})
    assert ds.schema() == "id long, v string, part string"


def _wait(cond, timeout=60):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.5)
    return False


def test_capped_stream_restart_no_duplicates_end_to_end(spark, tmp_path):
    """The r10 ADVICE #1 scenario through REAL Spark offset-log machinery
    (not reader-level calls): a stream with max_epochs_per_batch drains a
    backlog over several micro-batches, is STOPPED mid-history with its
    checkpoint at some epoch, more epochs land, and the restarted query
    must produce every row EXACTLY once into an accumulate-only parquet
    sink — the pre-fix capped latestOffset could return an offset behind
    the checkpoint after restart, re-planning already-written epochs as
    duplicates."""
    spark.dataSource.register(EpochTailDataSource)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    for lo in range(0, 40, 10):  # epochs 0..3
        idempotent_append(_batch(spark, lo, lo + 10), path, partition_by=("part",))

    def run_stream(expect_ids):
        q = (
            spark.readStream.format("epoch_tail")
            .option("path", path)
            .option("max_epochs_per_batch", "1")  # cap binds per trigger
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        def sink_ids():
            try:
                return {r["id"] for r in spark.read.parquet(sink).collect()}
            except Exception:  # sink not readable until the first batch
                return set()

        try:
            assert _wait(lambda: sink_ids() == expect_ids, timeout=90), sorted(
                sink_ids()
            )
        finally:
            q.stop()

    # first run drains the 4-epoch backlog one epoch per micro-batch
    run_stream(set(range(40)))
    # new epochs while the query is down; the checkpoint sits at epoch 3
    for lo in (40, 50):
        idempotent_append(_batch(spark, lo, lo + 10), path, partition_by=("part",))
    # restart: the capped source must move FORWARD only
    run_stream(set(range(60)))
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 60, f"duplicates written: {len(rows)} rows for 60 ids"


def test_tail_composes_with_tokenizer_encode(spark, tmp_path):
    """The source composes with Arrow-batched operators like any other
    stream: tail an epoch table of documents, unigram-encode each
    micro-batch (mapInPandas, broadcast cost table), land to parquet —
    pieces are right and a second drain encodes ONLY the new epoch."""
    from spectraplex_spark.operators.unigram import unigram_encode

    spark.dataSource.register(EpochTailDataSource)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    cost = {"a": 10, "b": 10, "ab": 15}

    def drain():
        stream = (
            spark.readStream.format("epoch_tail").option("path", path).load()
        )
        q = (
            unigram_encode(stream, cost, max_word_len=12)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["id"]: list(r["unigram_pieces"])
            for r in spark.read.parquet(sink).collect()
        }

    idempotent_append(
        spark.createDataFrame([(1, "ab ab"), (2, "ba")], "id long, text string"),
        path,
    )
    got = drain()
    assert got == {1: ["ab", "ab"], 2: ["b", "a"]}
    idempotent_append(
        spark.createDataFrame([(3, "abab")], "id long, text string"), path
    )
    got = drain()
    assert got == {1: ["ab", "ab"], 2: ["b", "a"], 3: ["ab", "ab"]}


def test_epoch_to_epoch_replication_exactly_once(spark, tmp_path):
    """The composition the source exists for: tail table A as a stream
    and land each micro-batch into table B with idempotent_append —
    epoch-to-epoch replication. Across a restart (with new epochs in
    between) B must equal A exactly once: Spark's checkpoint dedupes at
    the source (epoch offsets) AND the sink's anti-join dedupes any
    replayed uncommitted batch — the two halves of exactly-once."""
    from spectraplex_spark.sources.commit import read_committed_epochs

    spark.dataSource.register(EpochTailDataSource)
    src, dst = str(tmp_path / "a"), str(tmp_path / "b")
    ckpt = str(tmp_path / "ckpt")
    for lo in range(0, 20, 10):
        idempotent_append(_batch(spark, lo, lo + 10), src, partition_by=("part",))

    def land(batch_df, _epoch_id):
        idempotent_append(batch_df, dst)

    def replicate():
        q = (
            spark.readStream.format("epoch_tail")
            .option("path", src)
            .load()
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    replicate()
    assert read_committed_epochs(spark, dst).count() == 20
    idempotent_append(_batch(spark, 20, 30), src, partition_by=("part",))
    replicate()
    got = read_committed_epochs(spark, dst)
    assert got.count() == 30  # delta landed once, nothing twice
    assert {r["id"] for r in got.collect()} == set(range(30))


def test_declared_schema_partition_cols_must_trail(spark, tmp_path):
    """A user schema placing a partition column mid-schema (or dropping
    it) would silently transpose positionally-yielded columns — the
    reader must refuse it at construction (review finding)."""
    import pytest as _pytest

    from spectraplex_spark.sources.commit import commit_append_epoch
    from spectraplex_spark.streaming.epoch_tail import _EpochTailStreamReader

    t = str(tmp_path / "t")
    (
        spark.range(4)
        .selectExpr("id", "CAST(id % 2 AS STRING) AS day", "id * 2 AS v")
        .write.partitionBy("day")
        .parquet(t)
    )
    commit_append_epoch(t)
    # fine: partition column last
    _EpochTailStreamReader({"path": t}, ["id", "v", "day"])
    # partition column mid-schema → loud
    with _pytest.raises(ValueError, match="partition columns"):
        _EpochTailStreamReader({"path": t}, ["id", "day", "v"])
    # partition column omitted → loud
    with _pytest.raises(ValueError, match="partition columns"):
        _EpochTailStreamReader({"path": t}, ["id", "v"])
