"""Stream-stream interval join + watermarked dedup (streaming/joins.py):
multi-batch watermark progression with controlled arrival order, replay
idempotence, state-bound semantics. Single-batch replay grading is in
the catalog (stream_interval_join_replay / stream_dedup_replay).
"""

from __future__ import annotations

import datetime
import os
import time

from pyspark.sql import functions as F

from spectraplex_spark.streaming.joins import (
    stream_dedup_within_watermark,
    stream_interval_join,
)

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _t(minute):
    return datetime.datetime(2024, 1, 1, 0, minute, 0)


def _write_batch(spark, path, rows, mtime):
    """One parquet file per micro-batch; file mtime pins arrival order
    (FileStreamSource orders by modification time)."""
    df = spark.createDataFrame(rows, EV_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            full = os.path.join(path, f)
            if os.path.getmtime(full) > mtime:
                os.utime(full, (mtime, mtime))


def _run(stream_df, out, ckpt):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_interval_join_multibatch_matches_batch_join(spark, tmp_path):
    src = str(tmp_path / "src")
    base = time.time() - 1000
    # time-ordered arrival: clicks early, errors later
    _write_batch(spark, src, [(1, _t(0), 7, "click", 0.0), (2, _t(1), 8, "click", 0.0)], base)
    _write_batch(spark, src, [(3, _t(5), 7, "error", 0.0), (4, _t(30), 8, "error", 0.0)], base + 10)
    _write_batch(spark, src, [(5, _t(40), 7, "error", 0.0)], base + 20)

    schema = spark.createDataFrame([], EV_SCHEMA).schema
    rs = lambda: spark.readStream.schema(schema).option(  # noqa: E731
        "maxFilesPerTrigger", 1
    ).parquet(src)
    clicks = rs().filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    errors = rs().filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    joined = stream_interval_join(
        clicks, errors, on="user_id", upper="10 minutes", right_watermark="1 hour"
    ).select("click_id", "error_id")
    _run(joined, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    got = {
        (r["click_id"], r["error_id"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # only (1,3): user 7 error at +5min; user 8's error is +29min > bound,
    # user 7's second error at +40min also out of bound
    assert got == {(1, 3)}


def test_dedup_multibatch_replay_emits_once(spark, tmp_path):
    src = str(tmp_path / "src")
    base = time.time() - 1000
    rows = [(i, _t(i), i % 3, "view", float(i)) for i in range(6)]
    _write_batch(spark, src, rows, base)          # batch 1: originals
    _write_batch(spark, src, rows[:4], base + 10)  # batch 2: redelivery
    schema = spark.createDataFrame([], EV_SCHEMA).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    deduped = stream_dedup_within_watermark(
        stream, ["event_id"], watermark="2 hours"
    ).select("event_id")
    _run(deduped, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    out = [r["event_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()]
    assert sorted(out) == list(range(6))  # every id exactly once


def test_dedup_within_single_batch_collapses_duplicates(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(1, _t(0), 1, "view", 1.0), (1, _t(0), 1, "view", 1.0), (2, _t(1), 1, "view", 2.0)]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(src)
    schema = spark.createDataFrame([], EV_SCHEMA).schema
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = stream_dedup_within_watermark(stream, ["event_id"]).select("event_id")
    _run(deduped, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    out = sorted(r["event_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect())
    assert out == [1, 2]


def test_left_outer_interval_join_emits_closed_unmatched(spark, tmp_path):
    """Left-outer mode: an unmatched click emits NULL-padded once the
    global watermark passes its close point (needs a later batch to
    flush); a click near the stream's end stays withheld. A matched
    click emits normally."""
    src = str(tmp_path / "src")
    base = time.time() - 1000
    # batch 1: clicks — user 7 will match, user 8 never will
    _write_batch(spark, src, [(1, _t(0), 7, "click", 0.0), (2, _t(1), 8, "click", 0.0)], base)
    # batch 2: error for user 7 within the 10-min bound
    _write_batch(spark, src, [(3, _t(5), 7, "error", 0.0)], base + 10)
    # batch 3+4: watermark advancers (user 99 both sides, far future)
    far1 = _t(0) + datetime.timedelta(minutes=300)
    far2 = _t(0) + datetime.timedelta(minutes=310)
    _write_batch(spark, src, [(8, far1, 99, "click", 0.0), (9, far1, 99, "error", 0.0)], base + 20)
    _write_batch(spark, src, [(10, far2, 99, "click", 0.0), (11, far2, 99, "error", 0.0)], base + 30)

    schema = spark.createDataFrame([], EV_SCHEMA).schema
    rs = lambda: spark.readStream.schema(schema).option(  # noqa: E731
        "maxFilesPerTrigger", 1
    ).parquet(src)
    clicks = rs().filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    errors = rs().filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    joined = stream_interval_join(
        clicks, errors, on="user_id", upper="10 minutes",
        right_watermark="15 minutes", how="left_outer",
    )
    out = str(tmp_path / "out")
    _run(joined.select("click_id", "error_id", "user_id"), out, str(tmp_path / "ckpt"))
    got = {
        (r["click_id"], r["error_id"])
        for r in spark.read.parquet(out).filter(F.col("user_id") < 99).collect()
    }
    # user 7 matched; user 8 closed unmatched (watermark passed _t(1)+10min)
    assert got == {(1, 3), (2, None)}


def test_left_outer_rejects_bad_mode(spark):
    import pytest

    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="left_outer"):
        stream_interval_join(df, df, on="value", how="full")


def _two_sided_fixture(spark, tmp_path):
    """clicks: user 7 (matches), user 8 (never matched); errors: user 7
    (the match), user 9 (no click ever) — plus two far-future
    watermark-advancer batches on both sides (user 99)."""
    src = str(tmp_path / "src")
    base = time.time() - 1000
    _write_batch(spark, src, [(1, _t(0), 7, "click", 0.0), (2, _t(1), 8, "click", 0.0)], base)
    _write_batch(spark, src, [(3, _t(5), 7, "error", 0.0), (4, _t(5), 9, "error", 0.0)], base + 10)
    far1 = _t(0) + datetime.timedelta(minutes=300)
    far2 = _t(0) + datetime.timedelta(minutes=310)
    _write_batch(spark, src, [(8, far1, 99, "click", 0.0), (9, far1, 99, "error", 0.0)], base + 20)
    _write_batch(spark, src, [(10, far2, 99, "click", 0.0), (11, far2, 99, "error", 0.0)], base + 30)
    schema = spark.createDataFrame([], EV_SCHEMA).schema
    rs = lambda: spark.readStream.schema(schema).option(  # noqa: E731
        "maxFilesPerTrigger", 1
    ).parquet(src)
    clicks = rs().filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    errors = rs().filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    return clicks, errors


def test_full_outer_interval_join_emits_both_unmatched_sides(spark, tmp_path):
    """Full-outer mode: the matched pair emits; the never-matched click
    AND the never-matched error both emit NULL-padded once closed —
    and the join key on an unmatched RIGHT row is the coalesced
    right-side value, never NULL."""
    clicks, errors = _two_sided_fixture(spark, tmp_path)
    joined = stream_interval_join(
        clicks, errors, on="user_id", upper="10 minutes",
        right_watermark="15 minutes", how="full_outer",
    )
    out = str(tmp_path / "out")
    _run(joined.select("click_id", "error_id", "user_id"), out, str(tmp_path / "ckpt"))
    rows = spark.read.parquet(out).filter(F.col("user_id") < 99).collect()
    got = {(r["click_id"], r["error_id"]) for r in rows}
    assert got == {(1, 3), (2, None), (None, 4)}
    by_err = {r["error_id"]: r["user_id"] for r in rows}
    assert by_err[4] == 9  # coalesced key on the unmatched right row
    assert all(r["user_id"] is not None for r in rows)


def test_right_outer_interval_join_emits_unmatched_errors(spark, tmp_path):
    """Right-outer mode: matched pair plus the never-matched error;
    the unmatched click is dropped."""
    clicks, errors = _two_sided_fixture(spark, tmp_path)
    joined = stream_interval_join(
        clicks, errors, on="user_id", upper="10 minutes",
        right_watermark="15 minutes", how="right_outer",
    )
    out = str(tmp_path / "out")
    _run(joined.select("click_id", "error_id", "user_id"), out, str(tmp_path / "ckpt"))
    rows = spark.read.parquet(out).filter(F.col("user_id") < 99).collect()
    got = {(r["click_id"], r["error_id"]) for r in rows}
    assert got == {(1, 3), (None, 4)}
    assert all(r["user_id"] is not None for r in rows)


def test_interval_join_guards_are_loud(spark):
    """Review finding r12: the undersized-watermark silent-match-loss
    and the ambiguous-shared-column hazards are now plan-time errors."""
    import pytest as _pytest

    from spectraplex_spark.streaming.joins import (
        _interval_seconds,
        stream_interval_join,
    )

    assert _interval_seconds("5 hours") == 18000
    assert _interval_seconds("90 seconds") == 90
    with _pytest.raises(ValueError, match="interval spec"):
        _interval_seconds("5 fortnights")

    schema = "event_id long, user_id long, ts timestamp"
    l = spark.readStream.format("rate").load().selectExpr(
        "value AS event_id", "value AS user_id", "timestamp AS ts"
    )
    r = l.selectExpr("event_id AS error_id", "user_id", "ts")
    # An under-span right watermark is LEGAL (state retention derives
    # from the left watermark + condition, verified by probe — r12
    # ADVICE); it warns about the disorder-allowance trade-off instead
    # of rejecting the configuration.
    with _pytest.warns(UserWarning, match="right_watermark"):
        stream_interval_join(
            l, r, on="user_id", upper="4 hours", right_watermark="30 minutes"
        )
    r_shared = l.selectExpr("event_id", "user_id", "ts")  # event_id collides
    with _pytest.raises(ValueError, match="share non-key columns"):
        stream_interval_join(
            l, r_shared, on="user_id", upper="10 minutes",
            right_watermark="1 hours",
        )
    del schema
