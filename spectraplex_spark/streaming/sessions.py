"""Custom stateful streaming operator: sessionization via
applyInPandasWithState (the mandate's escape hatch for semantics the
built-in streaming operators can't express).

Semantics match ``operators.temporal.sessionize`` (its batch form is the
oracle): events on the same key chain into a session while consecutive
gaps stay <= gap; a session emits when it CLOSES — either a later event
arrives beyond the gap, or the event-time watermark passes
session_end + gap (timeout). State per key is exactly one open session
(start, end, count) — bounded regardless of stream length, the property
that matters at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# open-session state: (start_us, end_us, n)
_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1_000)


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((s, e, n))
            state.remove()
        else:
            times: list[int] = []
            for pdf in pdfs:
                times.extend(_us(t) for t in pdf["ts"])
            times.sort()
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            for t in times:
                if cur is None:
                    cur = [t, t, 0]
                elif t - cur[1] > gap_us:
                    closed.append(tuple(cur))
                    cur = [t, t, 0]
                cur[1] = max(cur[1], t)
                cur[2] += 1
            if cur is not None:
                state.update(tuple(cur))
                # fire once the watermark passes session_end + gap;
                # clamped: late-arriving (below-watermark) events can put
                # the natural deadline behind the current watermark, which
                # setTimeoutTimestamp rejects — fire on the next batch
                # instead.
                deadline_ms = cur[1] // 1000 + gap_seconds * 1000
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s * 1000) for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e * 1000) for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def streaming_sessionize(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Closed sessions per key from an event-time stream."""
    # Event-time watermarks require TIMESTAMP (not TIMESTAMP_NTZ, which
    # the driver's events.ts now is); UTC session makes the cast identity.
    events_stream = events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events_stream.withWatermark(ts_col, watermark)
        .select(F.col(key_col).alias("user_id"), F.col(ts_col).alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_OUTPUT,
            stateStructType=_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
