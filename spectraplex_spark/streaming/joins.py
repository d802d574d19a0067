"""Stream-stream joins and watermarked dedup — the two Structured
Streaming operators the reference's subscription pipeline would need
next (its gRPC stream stub, adapters/src/solana_grpc.rs:19-23, emits
tx AND account-update families; correlating them is a stream-stream
join, and at-least-once transports demand dedup-with-bounded-state).

Both are thin, deliberately: the operator IS Spark's symmetric
hash-join / dedup state machinery — the value here is pinning the
CONTRACT (watermarks, time bounds, state eviction) and making the
semantics gradable:

  - ``stream_interval_join``: inner equi-join with an event-time
    interval bound (right.ts in [left.ts + lower, left.ts + upper]).
    Both sides MUST be watermarked — the time bound plus the
    watermarks is what lets Spark evict join state; without them an
    unbounded stream accumulates forever (the 100 TB streaming
    failure mode). Append mode; matches emit exactly once.
  - ``stream_dedup_within_watermark``: dropDuplicatesWithinWatermark
    over key columns — exactly-once landing semantics on an
    at-least-once transport with BOUNDED state (the batch-side
    idempotent_append's streaming twin: the anti-join there scans the
    target table; this keeps only a watermark-deep key set in state).

Grading: replayed through availableNow file streams in the catalog
(stream_interval_join_replay / stream_dedup_replay) against batch SQL
twins; multi-batch watermark progression is pytest-covered with
time-ordered file arrival (tests/test_streaming_joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    left_watermark: str = "0 seconds",
    right_watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: rows with equal ``on`` key and
    right_ts in [left_ts + lower, left_ts + upper].

    The right watermark must cover the interval width (Spark evicts a
    right row once its ts drops ``upper`` behind the left watermark;
    an undersized watermark silently loses matches — the default here
    is upper-plus-slack for the catalog's 10-minute bound). Column
    name collisions: left keeps its names, right's ts is suffixed.

    ``how``: 'inner' or 'left_outer'. Left-outer adds the
    late-accounting semantics (clicks that never got an error, orders
    that never settled): an unmatched left row emits NULL-padded only
    once the GLOBAL watermark (min across both inputs) passes
    left_ts + upper — i.e. when no future right row could match — and
    that emission happens in a trigger AFTER the watermark advance, so
    a replay must feed at least one batch after the last real data
    (the catalog replay appends sentinel batches; a single-batch
    availableNow run would withhold every unmatched row)."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    # Event-time columns must be TIMESTAMP (Spark rejects TIMESTAMP_NTZ
    # watermarks; the driver's events.ts ships as NTZ). Session tz is
    # pinned UTC, so the cast is the identity (pipeline.py precedent).
    left = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    right = right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    r_ts = f"{right_ts}_right"
    rw = rw.withColumnRenamed(right_ts, r_ts)
    cond = (
        (lw[on] == rw[on])
        & (F.col(r_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(r_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how).drop(rw[on])


def stream_dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once landing on an at-least-once transport: drop rows
    whose key columns repeat within the watermark horizon. State is
    the key set no deeper than the watermark — bounded by arrival
    rate x horizon, never by stream length (the property that makes
    this runnable forever; plain dropDuplicates on a stream grows
    without bound)."""
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
