"""Scale probes for the streaming/stateful family — state growth and
wall-clock at 1× vs 10×, under real watermark progression (the r6
verdict asked for state-size evidence, not just batch cost).

Run:  python -m spectraplex_spark.testing.probe_streaming_scale
Prints one markdown table per probe (recorded in BASELINE.md).

What "flat" must mean per probe:
  - interval join / watermarked dedup: final state rows track the
    WATERMARK HORIZON (arrival rate × horizon), not total input — the
    property that makes the query runnable forever;
  - stateful balance: state rows == distinct keys, cost ~linear in
    input, flat per key;
  - span gate: probe cost for a FIXED batch stays flat as the history
    behind the index grows 10× (partition-pruned probes), while the
    index itself grows linearly (it must — it is the history).
"""

from __future__ import annotations

import datetime
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _t(minute):
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(minutes=minute)


def _write_batch(spark, path, rows, mtime):
    df = spark.createDataFrame(rows, EV_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            full = os.path.join(path, f)
            if os.path.getmtime(full) > mtime:
                os.utime(full, (mtime, mtime))


def _run_collect_state(stream_df, out, ckpt):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    state_rows = None
    for p in reversed(q.recentProgress):
        ops = p.get("stateOperators") or []
        if ops:
            state_rows = sum(op.get("numRowsTotal", 0) for op in ops)
            break
    return state_rows


def probe_interval_join(spark, scale: int) -> dict:
    """12 micro-batches spanning 120 minutes of event time; clicks
    joined to errors within 10 minutes; right watermark 30 minutes.
    State must track the horizon, not the stream."""
    from spectraplex_spark.streaming.joins import stream_interval_join

    tmp = tempfile.mkdtemp(prefix=f"ivj{scale}x_")
    try:
        src = os.path.join(tmp, "src")
        n_keys = 200 * scale
        base = time.time() - 10_000
        total = 0
        eid = 0
        for b in range(12):  # batch b covers minutes [10b, 10b+10)
            rows = []
            for u in range(n_keys):
                m = 10 * b + (u % 10)
                rows.append((eid, _t(m), u, "click", 0.0))
                rows.append((eid + 1, _t(m + 3), u, "error", 0.0))
                eid += 2
            total += len(rows)
            _write_batch(spark, src, rows, base + b * 10)
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
            right_watermark="30 minutes",
        ).select("click_id", "error_id")
        t0 = time.time()
        state = _run_collect_state(joined, os.path.join(tmp, "out"), os.path.join(tmp, "ck"))
        wall = time.time() - t0
        matched = spark.read.parquet(os.path.join(tmp, "out")).count()
        return {"input_rows": total, "matched": matched, "state_rows": state, "wall_s": round(wall, 2)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def probe_left_outer_join(spark, scale: int) -> dict:
    """Left-outer variant of the interval-join probe: every 5th key
    never gets an error, so its clicks must emit NULL-padded once the
    watermark closes them (two trailing advancer batches flush the
    tail). State must still track the horizon; unmatched must equal
    the planted no-error clicks (minus none — the advancers close all
    real rows)."""
    from spectraplex_spark.streaming.joins import stream_interval_join

    tmp = tempfile.mkdtemp(prefix=f"loj{scale}x_")
    try:
        src = os.path.join(tmp, "src")
        n_keys = 200 * scale
        base = time.time() - 10_000
        total = unmatched_planted = 0
        eid = 0
        for b in range(12):
            rows = []
            for u in range(n_keys):
                m = 10 * b + (u % 10)
                rows.append((eid, _t(m), u, "click", 0.0))
                eid += 1
                if u % 5 == 0:
                    unmatched_planted += 1
                else:
                    rows.append((eid, _t(m + 3), u, "error", 0.0))
                    eid += 1
            total += len(rows)
            _write_batch(spark, src, rows, base + b * 10)
        for j, m in enumerate((600, 660)):  # advance + flush
            _write_batch(
                spark, src,
                [(eid + 2 * j, _t(m), -1, "click", 0.0),
                 (eid + 2 * j + 1, _t(m), -2, "error", 0.0)],
                base + 200 + j * 10,
            )
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
            right_watermark="30 minutes", how="left_outer",
        ).select("click_id", "error_id", "user_id")
        t0 = time.time()
        state = _run_collect_state(joined, os.path.join(tmp, "out"), os.path.join(tmp, "ck"))
        wall = time.time() - t0
        out = spark.read.parquet(os.path.join(tmp, "out")).filter(F.col("user_id") >= 0)
        unmatched = out.filter(F.col("error_id").isNull()).count()
        return {
            "input_rows": total,
            "unmatched_emitted": unmatched,
            "unmatched_planted": unmatched_planted,
            "state_rows": state,
            "wall_s": round(wall, 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def probe_full_outer_join(spark, scale: int) -> dict:
    """Full-outer variant: every 5th key's clicks never get an error
    (unmatched LEFT) and every 7th key gets errors with no click
    (unmatched RIGHT). Both unmatched families must emit NULL-padded
    exactly once after the advancers close them — with the join key
    COALESCED on the right-unmatched rows — and state must still track
    the watermark horizon, not the stream."""
    from spectraplex_spark.streaming.joins import stream_interval_join

    tmp = tempfile.mkdtemp(prefix=f"foj{scale}x_")
    try:
        src = os.path.join(tmp, "src")
        n_keys = 200 * scale
        base = time.time() - 10_000
        total = planted_left = planted_right = 0
        eid = 0
        for b in range(12):
            rows = []
            for u in range(n_keys):
                m = 10 * b + (u % 10)
                if u % 7 == 3:
                    rows.append((eid, _t(m + 3), u, "error", 0.0))
                    eid += 1
                    planted_right += 1
                    continue
                rows.append((eid, _t(m), u, "click", 0.0))
                eid += 1
                if u % 5 == 0:
                    planted_left += 1
                else:
                    rows.append((eid, _t(m + 3), u, "error", 0.0))
                    eid += 1
            total += len(rows)
            _write_batch(spark, src, rows, base + b * 10)
        for j, m in enumerate((600, 660)):  # advance + flush
            _write_batch(
                spark, src,
                [(eid + 2 * j, _t(m), -1, "click", 0.0),
                 (eid + 2 * j + 1, _t(m), -2, "error", 0.0)],
                base + 200 + j * 10,
            )
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
            right_watermark="30 minutes", how="full_outer",
        ).select("click_id", "error_id", "user_id")
        t0 = time.time()
        state = _run_collect_state(joined, os.path.join(tmp, "out"), os.path.join(tmp, "ck"))
        wall = time.time() - t0
        raw = spark.read.parquet(os.path.join(tmp, "out"))
        # BEFORE the sentinel filter (NULL >= 0 would hide them): the
        # coalesced key contract says no emitted row has a NULL key
        null_keys = raw.filter(F.col("user_id").isNull()).count()
        out = raw.filter(F.col("user_id") >= 0)
        return {
            "input_rows": total,
            "unmatched_left": out.filter(
                F.col("error_id").isNull() & F.col("click_id").isNotNull()
            ).count(),
            "planted_left": planted_left,
            "unmatched_right": out.filter(
                F.col("click_id").isNull() & F.col("error_id").isNotNull()
            ).count(),
            "planted_right": planted_right,
            "null_keys": null_keys,  # must be 0: coalesced join key
            "state_rows": state,
            "wall_s": round(wall, 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def probe_dedup(spark, scale: int) -> dict:
    """12 batches over 120 minutes, every event sent twice (adjacent
    batches), watermark 30 minutes: state is the keys inside the
    horizon, survivors are exactly the distinct keys."""
    from spectraplex_spark.streaming.joins import stream_dedup_within_watermark

    tmp = tempfile.mkdtemp(prefix=f"ddp{scale}x_")
    try:
        src = os.path.join(tmp, "src")
        n_per_batch = 1_000 * scale
        base = time.time() - 10_000
        total = 0
        for b in range(12):
            rows = []
            for i in range(n_per_batch):
                k = b * n_per_batch + i
                rows.append((k, _t(10 * b + (i % 10)), k % 997, "e", 0.0))
                rows.append((k, _t(10 * b + (i % 10)), k % 997, "e", 0.0))  # dup
            total += len(rows)
            _write_batch(spark, src, rows, base + b * 10)
        schema = spark.createDataFrame([], EV_SCHEMA).schema
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        dd = stream_dedup_within_watermark(stream, ["event_id"], watermark="30 minutes")
        t0 = time.time()
        state = _run_collect_state(dd, os.path.join(tmp, "out"), os.path.join(tmp, "ck"))
        wall = time.time() - t0
        out_rows = spark.read.parquet(os.path.join(tmp, "out")).count()
        return {"input_rows": total, "survivors": out_rows, "state_rows": state, "wall_s": round(wall, 2)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def probe_stateful_balance(spark, scale: int) -> dict:
    """10× keys (the r6 probe fixed keys and scaled events; the verdict
    asked for key-scaling): distinct users 1.5k → 15k, state rows must
    equal distinct keys."""
    from spectraplex_spark.streaming.stateful import stream_running_balance

    tmp = tempfile.mkdtemp(prefix=f"bal{scale}x_")
    try:
        src = os.path.join(tmp, "src")
        n_users = 1_500 * scale
        base = time.time() - 10_000
        total = 0
        for b in range(4):
            rows = [
                (b * n_users + u, _t(b), u, "e", float((u + b) % 50) / 7.0)
                for u in range(n_users)
            ]
            total += len(rows)
            _write_batch(spark, src, rows, base + b * 10)
        schema = spark.createDataFrame([], EV_SCHEMA).schema
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        bal = stream_running_balance(stream)
        t0 = time.time()
        state = _run_collect_state(bal, os.path.join(tmp, "out"), os.path.join(tmp, "ck"))
        wall = time.time() - t0
        latest = (
            spark.read.parquet(os.path.join(tmp, "out"))
            .groupBy("user_id").agg(F.max("n_events").alias("n"))
        )
        n_keys = latest.count()
        return {"input_rows": total, "distinct_keys": n_keys, "state_rows": state, "wall_s": round(wall, 2)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def probe_funnel_skew(spark, scale: int) -> dict:
    """Power-law-user stressor for the watermarked funnel (r12 verdict
    task #6): the state bound is PER USER (arrival-rate × delay), so
    the realistic 100 TB failure mode is one hot user whose pending
    buffer dominates a batch — not more rows overall.  ONE user gets
    ``2_000 × scale`` in-delay events spread over 5 batches (watermark
    held behind them, so the buffer only grows), beside 100 cold users;
    a final far-future sentinel advances the watermark and forces the
    full seal of the giant buffer.

    What to read off the sweep: per-batch cost for the hot key is
    O(B log B) in its CURRENT buffer (sort + provisional fold) plus an
    O(B) Arrow state round-trip, so total cost while the watermark
    stalls grows ~quadratically in the per-user buffer — the documented
    reason ``delay_s`` (not history) must bound the buffer.  The probe
    also cross-checks exactness: the hot user's final reached equals
    the pure batch fold."""
    from spectraplex_spark.streaming.funnel import _advance, stream_funnel_watermarked

    steps = ["view", "click", "purchase"]
    tmp = tempfile.mkdtemp(prefix=f"funskew{scale}x_")
    try:
        src = os.path.join(tmp, "src")
        hot_total = 2_000 * scale
        per_batch = hot_total // 5
        base_mt = time.time() - 10_000
        hot_events = []
        eid = 0
        for b in range(5):
            rows = []
            for i in range(per_batch):
                # in-delay, deliberately scrambled order within the hour
                t = _t(((b * per_batch + i) * 37) % 60)
                tp = steps[(i * 7) % 3]
                hot_events.append((t, tp))
                rows.append((eid, t, 0, tp, 0.0))
                eid += 1
            for u in range(1, 101):  # the cold tail
                rows.append((eid, _t(u % 60), u, steps[u % 3], 0.0))
                eid += 1
            _write_batch(spark, src, rows, base_mt + b * 10)
        # sentinel: far-future event advances the watermark past the hour
        _write_batch(
            spark, src, [(eid, _t(600), 999, "view", 0.0)], base_mt + 60
        )
        eid += 1
        # the watermark lags one batch AND the stateful fn only runs for
        # keys present in the batch — a post-sentinel hot-user event
        # (inside the new watermark) makes the giant buffer actually
        # SEAL, so the seal cost is measured, not skipped
        seal_ev = (_t(590), "view")
        hot_events.append(seal_ev)
        _write_batch(
            spark, src, [(eid, seal_ev[0], 0, seal_ev[1], 0.0)], base_mt + 70
        )
        eid += 1
        schema = spark.createDataFrame([], EV_SCHEMA).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        fun = stream_funnel_watermarked(
            stream, steps, window_s=7200, delay_s=3600
        )
        t0 = time.time()
        q = (
            fun.writeStream.format("parquet")
            .option("path", os.path.join(tmp, "out"))
            .option("checkpointLocation", os.path.join(tmp, "ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        snaps = spark.read.parquet(os.path.join(tmp, "out")).collect()
        hot = [r for r in snaps if r["user_id"] == 0]
        best = max(hot, key=lambda r: r["n_seen"])
        want = _advance(
            [None, None, None],
            [(int(t.timestamp() * 1_000_000), tp) for t, tp in hot_events],
            steps,
            7200 * 1_000_000,
        )
        assert best["reached"] == sum(x is not None for x in want), (
            best["reached"],
            want,
        )
        return {
            "hot_user_events": hot_total,
            "max_pending": max(r["pending"] for r in hot),
            "final_sealed": best["reached_sealed"],
            "reached==batch_fold": True,
            "wall_s": round(wall, 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def probe_span_gate(spark, scale: int) -> dict:
    """History 2k → 20k docs behind the index, then ONE fixed 200-doc
    probe batch: probe cost must stay flat (partition-pruned buckets),
    index size grows linearly by design."""
    from spectraplex_spark.streaming.spans_incremental import spans_filter_batch

    tmp = tempfile.mkdtemp(prefix=f"spg{scale}x_")
    try:
        idx = os.path.join(tmp, "idx")
        n_hist = 2_000 * scale
        words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta"]

        def text(i):
            body = " ".join(words[(i + j) % 8] + str((i * 7 + j * 3) % 50) for j in range(30))
            boiler = "subscribe to our newsletter today for updates"
            return body + (" " + boiler if i % 5 == 0 else "")

        hist = spark.createDataFrame(
            [(i, text(i)) for i in range(n_hist)], "doc_id long, text string"
        )
        t0 = time.time()
        spans_filter_batch(hist, idx, k=6).count()  # ingest history
        ingest = time.time() - t0
        probe = spark.createDataFrame(
            [(10_000_000 + i, text(i)) for i in range(200)], "doc_id long, text string"
        )
        t0 = time.time()
        hits = spans_filter_batch(probe, idx, k=6).count()
        probe_s = time.time() - t0
        import glob

        idx_bytes = sum(os.path.getsize(f) for f in glob.glob(f"{idx}/grams/**/*.parquet", recursive=True))
        return {
            "history_docs": n_hist,
            "ingest_s": round(ingest, 2),
            "probe_batch_s": round(probe_s, 2),
            "probe_hits": hits,
            "index_mb": round(idx_bytes / 1e6, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    from spectraplex_spark.session import get_spark

    spark = get_spark("probe_streaming_scale", shuffle_partitions=16)
    probes = [
        ("stream_interval_join", probe_interval_join),
        ("stream_left_outer_join", probe_left_outer_join),
        ("stream_full_outer_join", probe_full_outer_join),
        ("dedup_within_watermark", probe_dedup),
        ("stateful_balance (10x keys)", probe_stateful_balance),
        ("funnel_skew (10x hot-user buffer)", probe_funnel_skew),
        ("span gate (10x history)", probe_span_gate),
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, fn in probes:
        if only and only not in name:
            continue
        r1 = fn(spark, 1)
        r10 = fn(spark, 10)
        print(f"\n### {name}")
        keys = list(r1)
        print("| scale | " + " | ".join(keys) + " |")
        print("|" + "---|" * (len(keys) + 1))
        print("| 1x | " + " | ".join(str(r1[k]) for k in keys) + " |")
        print("| 10x | " + " | ".join(str(r10[k]) for k in keys) + " |")


if __name__ == "__main__":
    main()
