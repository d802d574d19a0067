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


def test_torn_final_line_is_deferred_not_fatal(tmp_path):
    """A partially appended last line (reader racing the relay) is
    invisible to the current scan and completes by the next one."""
    import base64
    import json

    log = str(tmp_path / "relay.jsonl")
    with open(log, "w") as fh:
        fh.write(json.dumps({"seq": 1, "frame_b64": base64.b64encode(b"a").decode()}) + "\n")
        fh.write('{"seq": 2, "frame_b')  # torn: no newline, mid-JSON

    from spectraplex_spark.streaming.replay_source import _GrpcReplayStreamReader

    r = _GrpcReplayStreamReader({"path": log})
    rows, last = r._scan(-1, None)
    assert [s for s, _ in rows] == [1]
    assert last == 1
    with open(log, "a") as fh:  # the relay finishes the line
        fh.write('64": "' + base64.b64encode(b"b").decode() + '"}\n')
    rows, last = r._scan(1, None)
    assert [s for s, _ in rows] == [2]
    assert last == 2


def test_out_of_order_seq_raises_loudly(tmp_path):
    """A non-increasing seq violates the relay contract; the old scan
    silently lost such frames forever — it must raise instead."""
    import base64
    import json

    import pytest as _pytest

    log = str(tmp_path / "relay.jsonl")
    enc = base64.b64encode(b"x").decode()
    with open(log, "w") as fh:
        for seq in (1, 5, 3):
            fh.write(json.dumps({"seq": seq, "frame_b64": enc}) + "\n")

    from spectraplex_spark.streaming.replay_source import _GrpcReplayStreamReader

    r = _GrpcReplayStreamReader({"path": log})
    with _pytest.raises(ValueError, match="seq-ordered"):
        r._scan(-1, None)


def test_incremental_scan_cache_and_rotation_fallback(tmp_path):
    """Consecutive scans resume from the cached byte offset (no O(N^2)
    re-parse); a truncated/rotated log falls back to a full scan."""
    import base64
    import json

    log = str(tmp_path / "relay.jsonl")
    enc = base64.b64encode(b"x").decode()

    def append(seqs):
        with open(log, "a") as fh:
            for s in seqs:
                fh.write(json.dumps({"seq": s, "frame_b64": enc}) + "\n")

    from spectraplex_spark.streaming.replay_source import _GrpcReplayStreamReader

    r = _GrpcReplayStreamReader({"path": log})
    append([1, 2])
    rows, last = r._scan(-1, None)
    assert last == 2 and r._pos_cache[0] == 2 and r._pos_cache[1] > 0
    append([3])
    rows, last = r._scan(2, None)  # resumes from the cache
    assert [s for s, _ in rows] == [3]
    # rotation: replace with a shorter file — cached offset now invalid
    with open(log, "w") as fh:
        fh.write(json.dumps({"seq": 10, "frame_b64": enc}) + "\n")
    rows, last = r._scan(3, None)
    assert [s for s, _ in rows] == [10]


def test_read_between_offsets_early_stop(tmp_path):
    import base64
    import json

    log = str(tmp_path / "relay.jsonl")
    enc = base64.b64encode(b"x").decode()
    with open(log, "w") as fh:
        for s in range(1, 50):
            fh.write(json.dumps({"seq": s, "frame_b64": enc}) + "\n")

    from spectraplex_spark.streaming.replay_source import _GrpcReplayStreamReader

    r = _GrpcReplayStreamReader({"path": log})
    got = [s for s, _ in r.readBetweenOffsets({"seq": 2}, {"seq": 5})]
    assert got == [3, 4, 5]


def test_crlf_relay_log_does_not_drift_pos_cache(tmp_path):
    """r11 ADVICE: the old scan iterated data.splitlines() (which also
    splits on \\r / \\r\\n) while charging len(raw)+1 bytes per line, so a
    CRLF-written relay log drifted _pos_cache one byte per line and the
    next cached-resume seek landed mid-line.  The scan must charge the
    exact bytes consumed, so cached resumes keep parsing cleanly."""
    import base64
    import json

    log = str(tmp_path / "relay.jsonl")
    enc = base64.b64encode(b"x").decode()

    def append(seqs):
        with open(log, "ab") as fh:
            for s in seqs:
                fh.write(json.dumps({"seq": s, "frame_b64": enc}).encode() + b"\r\n")

    from spectraplex_spark.streaming.replay_source import _GrpcReplayStreamReader

    r = _GrpcReplayStreamReader({"path": log})
    append([1, 2])
    rows, last = r._scan(-1, None)
    assert [s for s, _ in rows] == [1, 2]
    # the cached position must equal the true byte size of what was read
    import os as _os

    assert r._pos_cache == (2, _os.path.getsize(log))
    append([3, 4])
    rows, last = r._scan(2, None)  # cached resume lands ON a line start
    assert [s for s, _ in rows] == [3, 4]
    assert r._pos_cache == (4, _os.path.getsize(log))


def test_lone_carriage_return_inside_line_is_not_a_split(tmp_path):
    """A stray \\r inside a line (not part of a terminator) must not
    split the record: only \\n terminates relay frames."""
    import base64

    log = str(tmp_path / "relay.jsonl")
    enc = base64.b64encode(b"x").decode()
    with open(log, "wb") as fh:
        # valid JSON with no embedded \r, then a CR-terminated line
        fh.write(('{"seq": 1, "frame_b64": "%s"}\r\n' % enc).encode())
        fh.write(('{"seq": 2, "frame_b64": "%s"}\n' % enc).encode())

    from spectraplex_spark.streaming.replay_source import _GrpcReplayStreamReader

    r = _GrpcReplayStreamReader({"path": log})
    rows, last = r._scan(-1, None)
    assert [s for s, _ in rows] == [1, 2]
    assert last == 2
