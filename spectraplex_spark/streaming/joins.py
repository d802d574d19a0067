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



_INTERVAL_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _interval_seconds(spec: str) -> int:
    """Seconds in a '<n> <unit>' interval string (the subset Spark's
    watermark/INTERVAL syntax shares); loud on anything else so the
    watermark-coverage guard can never silently pass a typo."""
    parts = spec.strip().lower().split()
    if len(parts) != 2 or parts[1] not in _INTERVAL_UNITS:
        raise ValueError(
            f"unsupported interval spec {spec!r}: expected '<n> "
            f"<{'|'.join(sorted(set(_INTERVAL_UNITS)))}>'"
        )
    return int(parts[0]) * _INTERVAL_UNITS[parts[1]]


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

    The right watermark sets the right stream's disorder allowance —
    how far a right row may trail the right max event time before the
    watermark contract permits dropping it (the default here is
    upper-plus-slack for the catalog's 10-minute bound; see the guard
    note below for why an undersized delay warns rather than raises).
    Column name collisions: left keeps its names, right's ts is
    suffixed.

    ``how``: 'inner', 'left_outer', 'right_outer' or 'full_outer' —
    the four stream-stream modes Spark's symmetric hash join supports
    under watermarks + a time bound. The outer modes add the
    late-accounting semantics (clicks that never got an error, errors
    no click explains, or both at once): an unmatched row emits
    NULL-padded only once the GLOBAL watermark (min across both
    inputs) passes the point where no future partner could match —
    left rows close at left_ts + upper, right rows close at
    right_ts - lower — and that emission happens in a trigger AFTER
    the watermark advance, so a replay must feed at least one batch
    after the last real data (the catalog replays append sentinel
    batches; a single-batch availableNow run would withhold every
    unmatched row). In the right/full modes the join key of an
    unmatched RIGHT row arrives on the right side only, so the output
    ``on`` column is the coalesce of the two key columns — NULL only
    when the row's OWN key is NULL (a NULL key never matches anything,
    so such rows can only ever emit as unmatched; the old "never NULL"
    claim was wrong for them — review finding r12).

    Guards: the two inputs must share NO column names besides ``on``/
    the ts columns (loud ValueError — Spark would otherwise emit
    ambiguous duplicate columns; callers pre-project disjoint
    payloads).  A ``right_watermark`` below the join span only warns
    (r12 ADVICE, verified empirically): Spark derives each side's state
    retention and late-row threshold from the OTHER side's input
    watermark plus the join condition, not from the side's own delay —
    a probe replay (right delay 60s, span 600s, right stream run 20min
    ahead) still matched an 11-minutes-trailing right row, so an
    undersized right delay does NOT evict right state early.  What the
    right delay DOES set is the right stream's own disorder allowance
    (how far a right row may trail the right maximum event time before
    the watermark contract permits dropping it) and, through the global
    watermark, how early LEFT rows can close — so a span-sized delay is
    still the safe default for trailing right streams, and the warning
    names that trade-off instead of rejecting a legal configuration."""
    modes = ("inner", "left_outer", "right_outer", "full_outer")
    if how not in modes:
        raise ValueError(f"how must be one of {modes}, got {how!r}")
    span_s = _interval_seconds(upper) - min(_interval_seconds(lower), 0)
    if _interval_seconds(right_watermark) < span_s:
        import warnings

        warnings.warn(
            f"stream_interval_join: right_watermark {right_watermark!r} is "
            f"smaller than the join span ({span_s}s). This does not evict "
            "right-side state early (retention is derived from the left "
            "watermark + the condition), but right rows trailing the right "
            "stream's max event time by more than the delay become late "
            "data the watermark contract may drop; size the delay to the "
            "right stream's expected disorder (the catalog uses "
            "upper + slack).",
            stacklevel=2,
        )
    shared = (set(left.columns) & set(right.columns)) - {on, left_ts, right_ts}
    if shared:
        raise ValueError(
            "stream_interval_join: inputs share non-key columns "
            f"{sorted(shared)} — the join would emit ambiguous duplicates; "
            "pre-project disjoint payload columns"
        )
    # Event-time columns must be TIMESTAMP (Spark rejects TIMESTAMP_NTZ
    # watermarks; the driver's events.ts ships as NTZ). Session tz is
    # pinned UTC, so the cast is the identity (pipeline.py precedent).
    left = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    right = right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    r_ts = f"{right_ts}_right"
    r_on = f"{on}_right"
    rw = rw.withColumnRenamed(right_ts, r_ts).withColumnRenamed(on, r_on)
    cond = (
        (F.col(on) == F.col(r_on))
        & (F.col(r_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(r_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    joined = lw.join(rw, cond, how)
    if how in ("right_outer", "full_outer"):
        joined = joined.withColumn(on, F.coalesce(F.col(on), F.col(r_on)))
    return joined.drop(r_on)


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
    without bound).

    Determinism contract: WHICH copy survives is arrival-order
    (batch-layout) dependent — Spark keeps the first-arriving one.
    For transports that redeliver BIT-IDENTICAL rows (the idempotent
    relay/epoch sources here) output content is therefore exact; a
    transport that re-stamps retries (different ts/payload per copy)
    gets deterministic KEYS but arrival-dependent non-key columns —
    canonicalize upstream if that matters (review note r12)."""
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
