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
