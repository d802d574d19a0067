"""Stateful streaming sessionization vs its batch oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from spectraplex_spark.operators.temporal import sessionize
from spectraplex_spark.plans.registry import table
from spectraplex_spark.streaming.sessions import streaming_sessionize

GAP = 1800


def test_streaming_sessions_match_batch(spark, tmp_path):
    import time

    import numpy as np

    events = table(spark, "/root/testdata/sf0.001", "events").filter(
        F.col("user_id") < 10
    )
    src = tmp_path / "src"
    src.mkdir()
    # replay in EVENT-TIME order across files (the watermark contract:
    # disorder must stay within the watermark delay; the file source
    # reads files in modification-time order) — several chunks →
    # several micro-batches → state must survive batch boundaries
    pdf = events.select("user_id", "ts").orderBy("ts").toPandas()
    for i, chunk in enumerate(np.array_split(pdf, 6)):
        chunk.to_parquet(
            src / f"part-{i}.parquet",
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        time.sleep(0.05)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_sessionize(stream, gap_seconds=GAP, watermark="0 seconds")
    sink = str(tmp_path / "out")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(sink).collect()
    }

    batch = sessionize(events, key="user_id", ts="ts", gap_seconds=GAP)
    max_ts = events.agg(F.max("ts")).head()[0]
    # append mode emits a session only once the final watermark (max ts,
    # 0s delay) passes session_end + gap — the still-open tail sessions
    # never emit in a finite replay
    expect_closed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
        if (max_ts - r.session_end).total_seconds() * 1_000_000 >= 0
        and (max_ts - r.session_end).total_seconds() > GAP
    }
    assert got == expect_closed
    assert len(got) > 0
