"""Stateful running balance (streaming/stateful.py): multi-batch state
accumulation, exactness vs batch, and the transformWithStateInPandas
environment gate. Cross-engine grading is in test_oracle_parity.py
(stateful_balance_replay).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from spectraplex_spark.streaming.stateful import (
    stream_running_balance,
    stream_running_balance_tws,
    tws_available,
)

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_batch(spark, path, rows, mtime):
    df = spark.createDataFrame(rows, EV_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            full = os.path.join(path, f)
            if os.path.getmtime(full) > mtime:
                os.utime(full, (mtime, mtime))


def test_multibatch_state_accumulates_exactly(spark, tmp_path):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    src = str(tmp_path / "src")
    base = time.time() - 1000
    b1 = [(1, t0, 7, "click", 10.05), (2, t0, 7, "view", 0.10), (3, t0, 8, "view", 1.23)]
    b2 = [(4, t0, 7, "click", 2.50), (5, t0, 9, "view", 0.01)]
    _write_batch(spark, src, b1, base)
    _write_batch(spark, src, b2, base + 10)
    schema = spark.createDataFrame([], EV_SCHEMA).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream_running_balance(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    # final snapshot per user = max n_events row
    final = {
        r["user_id"]: (r["balance_cents"], r["n_events"])
        for r in out.orderBy("user_id", "n_events").collect()
    }
    assert final[7] == (1265, 3)  # 10.05 + 0.10 + 2.50 → exact cents
    assert final[8] == (123, 1)
    assert final[9] == (1, 1)
    # user 7 got TWO snapshots (one per batch), batch-1 snapshot first
    u7 = sorted(
        (r["n_events"], r["balance_cents"])
        for r in out.filter(F.col("user_id") == 7).collect()
    )
    assert u7 == [(2, 1015), (3, 1265)]


def test_tws_gate_is_pinned_to_environment(spark):
    """transformWithStateInPandas needs protobuf; this container lacks
    it — the probe must say so and the wrapper must raise the
    actionable error (not an opaque worker crash)."""
    ev = spark.createDataFrame([], EV_SCHEMA)
    if tws_available():
        pytest.skip("protobuf present — TWS path active in this env")
    with pytest.raises(RuntimeError, match="protobuf"):
        stream_running_balance_tws(ev)


def test_null_value_and_null_user_handled_like_the_batch_oracle(spark, tmp_path):
    """Review finding r12: a NULL value must contribute NOTHING to the
    balance (the oracle's SUM skips NULLs; the old NaN->int64 cast
    poisoned the state with INT64_MIN forever) while still counting in
    n_events; a NULL user_id is a legal group, not a poison pill."""
    import datetime as dt

    from spectraplex_spark.streaming.stateful import stream_running_balance

    T0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 7, T0, "e", 1.25),
        (2, 7, T0, "e", None),   # NULL value: +0 cents, +1 event
        (3, None, T0, "e", 2.0),  # NULL user: its own group
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string, value double"
    )
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_running_balance(stream)
        .writeStream.format("parquet")
        .option("path", f"{tmp_path}/out")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r["user_id"]: (r["balance_cents"], r["n_events"])
        for r in spark.read.parquet(f"{tmp_path}/out").collect()
    }
    assert got == {7: (125, 2), None: (200, 1)}
