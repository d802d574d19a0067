"""Streaming Python Data Source (streaming/replay_source.py): offset
management, checkpoint resume without duplicates, composition with the
Yellowstone decoder into the bronze seam.
"""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F

from spectraplex_spark.streaming.replay_source import GrpcReplayDataSource
from tests.test_yellowstone import encode_g1_update


def _append_frames(log_path, first_seq, n):
    with open(log_path, "a", encoding="utf-8") as fh:
        for i in range(n):
            frame = encode_g1_update(slot=1000 + first_seq + i)
            fh.write(
                json.dumps(
                    {"seq": first_seq + i, "frame_b64": base64.b64encode(frame).decode()}
                )
                + "\n"
            )


def _drain(spark, log_path, out, ckpt, batch_size=None):
    reader = spark.readStream.format("grpc_replay").option("path", log_path)
    if batch_size:
        reader = reader.option("batch_size", batch_size)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_reads_frames_and_decodes_to_bronze(spark, tmp_path):
    spark.dataSource.register(GrpcReplayDataSource)
    log = str(tmp_path / "wire.jsonl")
    _append_frames(log, 0, 5)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, log, out, ckpt)
    frames = spark.read.parquet(out)
    assert sorted(r["seq"] for r in frames.collect()) == list(range(5))
    # compose with the wire decoder: 5 tx frames -> 5 bronze rows
    from spectraplex_spark.streaming.yellowstone import decode_yellowstone

    bronze = decode_yellowstone(frames, value_col="frame")
    assert bronze.count() == 5


def test_checkpoint_resume_skips_committed_offsets(spark, tmp_path):
    spark.dataSource.register(GrpcReplayDataSource)
    log = str(tmp_path / "wire.jsonl")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _append_frames(log, 0, 3)
    _drain(spark, log, out, ckpt)
    # relay appends more; SAME checkpoint must resume after seq 2
    _append_frames(log, 3, 4)
    _drain(spark, log, out, ckpt)
    seqs = sorted(r["seq"] for r in spark.read.parquet(out).collect())
    assert seqs == list(range(7))  # no duplicates, no gaps


def test_batch_size_bounds_microbatches(spark, tmp_path):
    """batch_size is the per-micro-batch backpressure bound: a
    processing-time trigger drains 7 frames as 3+3+1 batches (an
    availableNow trigger consumes only the first read() window of a
    simple stream reader — one bounded batch per drain, which the
    resume test exercises)."""
    import time

    spark.dataSource.register(GrpcReplayDataSource)
    log = str(tmp_path / "wire.jsonl")
    _append_frames(log, 0, 7)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("grpc_replay")
        .option("path", log)
        .option("batch_size", 3)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 7:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    assert sorted(r["seq"] for r in spark.read.parquet(out).collect()) == list(range(7))
    # at least 3 micro-batches committed (3+3+1)
    import os

    commits = [f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")]
    assert len(commits) >= 3


def test_missing_path_option_raises(spark):
    spark.dataSource.register(GrpcReplayDataSource)
    with pytest.raises(Exception, match="path"):
        q = (
            spark.readStream.format("grpc_replay")
            .load()
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def test_empty_log_yields_empty_stream(spark, tmp_path):
    spark.dataSource.register(GrpcReplayDataSource)
    log = str(tmp_path / "nonexistent.jsonl")  # relay not started yet
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, log, out, ckpt)
    try:
        n = spark.read.parquet(out).count()
    except Exception:
        n = 0  # no output files written at all
    assert n == 0
