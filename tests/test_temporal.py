"""Unit tests for the temporal operators' edge paths not exercised by
the catalog parity suite (asof tolerance; see ADVICE round 1: the
tolerance path previously failed analysis for numeric input because
timestamp arithmetic requires an interval)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from spectraplex_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _frames(spark):
    prices = spark.createDataFrame(
        [
            ("SOL", _ts("2026-01-01 00:00:00"), 100.0),
            ("SOL", _ts("2026-01-01 01:00:00"), 110.0),
        ],
        "asset string, ts timestamp, price double",
    )
    trades = spark.createDataFrame(
        [
            (1, "SOL", _ts("2026-01-01 00:30:00")),  # 30min after 1st price
            (2, "SOL", _ts("2026-01-01 03:00:00")),  # 2h after 2nd price
            (3, "SOL", _ts("2025-12-31 00:00:00")),  # before any price
        ],
        "trade_id long, asset string, ts timestamp",
    )
    return prices, trades


def test_asof_numeric_tolerance_seconds(spark):
    prices, trades = _frames(spark)
    out = {
        r.trade_id: r.asof_price
        for r in asof_join(
            trades, prices, "asset", "ts", "ts", ["price"], tolerance=3600
        ).collect()
    }
    assert out == {1: 100.0, 2: None, 3: None}  # trade 2's match is 2h stale


def test_asof_interval_column_tolerance(spark):
    prices, trades = _frames(spark)
    out = {
        r.trade_id: r.asof_price
        for r in asof_join(
            trades,
            prices,
            "asset",
            "ts",
            "ts",
            ["price"],
            tolerance=F.expr("INTERVAL 3 HOURS"),
        ).collect()
    }
    assert out == {1: 100.0, 2: 110.0, 3: None}


def test_asof_no_tolerance_carries_forever(spark):
    prices, trades = _frames(spark)
    out = {
        r.trade_id: r.asof_price
        for r in asof_join(trades, prices, "asset", "ts", "ts", ["price"]).collect()
    }
    assert out == {1: 100.0, 2: 110.0, 3: None}


def test_builtin_session_window_equals_manual_gap_split(spark):
    """The demotion contract for session_window_builtin (r12): Spark's
    native session_window must produce the SAME sessions as the manual
    lag/gap-split build (sessionize) — start = first event, end = last
    event + gap, same membership — including the exact-boundary case
    (an event exactly gap seconds after the previous one stays in the
    session on BOTH paths; both graded oracles use strict '>')."""
    import datetime as dt

    from pyspark.sql import functions as F

    from spectraplex_spark.operators.temporal import sessionize

    T0 = dt.datetime(2024, 1, 1)
    gap = 1800
    rows = [
        (1, 0), (1, 100), (1, 100 + gap),        # exact boundary: merges
        (1, 100 + gap + gap + 1),                # gap+1 after: breaks
        (2, 0), (2, 2 * gap + 5),                # clean break
        (3, 7),                                  # singleton
    ]
    df = spark.createDataFrame(
        [(i, u, T0 + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    builtin = {
        (r["user_id"], r["start"], r["end"], r["n"])
        for r in df.groupBy("user_id", F.session_window("ts", f"{gap} seconds"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("session_window.start").alias("start"),
            F.col("session_window.end").alias("end"),
            "n",
        )
        .collect()
    }
    manual = {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"] + dt.timedelta(seconds=gap),
            r["n_events"],
        )
        for r in sessionize(
            df, key="user_id", ts="ts", gap_seconds=gap
        ).collect()
    }
    assert builtin == manual
    assert len(builtin) == 5  # u1: 2 sessions, u2: 2, u3: 1
