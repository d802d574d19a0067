"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded range self-join — implemented as compositions of existing
DataFrame ops (the mandate's preferred strategy (a)), in their
scalable shapes.

As-of join (``asof_join``): for each left row, the latest right row with
``right.ts <= left.ts`` per key. The classic need here is enriching
ledger entries with the most recent prior price — the reference's
``fiat_value`` column that it declares but never populates
(core/src/models.rs:43, always None at solana_parser.rs:38,78).
Implementation: union both sides tagged, one window over (key, ts) with
``last(value, ignoreNulls)`` carry-forward, keep left rows. Exactly ONE
shuffle on the key — no range-condition join explosion, no per-key
driver loop; this is the shape that survives 100 TB (state = one carried
row per key within each sorted partition).

Range self-join (``close_pairs``): pairs of events on the same key
within a time epsilon. Naive form is an inequality join (quadratic
blow-up); the scalable form buckets time into epsilon-sized cells and
joins only (cell, cell+1) neighborhoods, then applies the exact
predicate — candidates are bounded by local density, not n².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: Column | int | float | None = None,
) -> DataFrame:
    """Left as-of join: latest right values with right_ts <= left_ts.

    Right (key, right_ts) pairs should be unique (e.g. a price series);
    at equal timestamps the right row is considered visible to the left
    row. ``tolerance`` (seconds as int/float, or an interval Column)
    nulls out matches older than left_ts - tolerance. Numeric seconds
    are converted to an interval — timestamp arithmetic requires one;
    a bare numeric column would fail analysis.
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),  # right sorts first at equal ts
        F.struct(*[F.col(c) for c in value_cols], F.col(right_ts).alias("_rt")).alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    tagged_l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tagged_r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in lcols],
    )
    w = (
        W.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = (
        tagged_r.unionByName(tagged_l)
        .withColumn("_carried", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        tol = (
            F.make_interval(secs=F.lit(float(tolerance)))
            if isinstance(tolerance, (int, float))
            else tolerance
        )
        carried = carried.withColumn(
            "_carried",
            F.when(
                F.col("_carried._rt")
                >= F.col("_t").cast("timestamp") - tol,
                F.col("_carried"),
            ),
        )
    out = carried.select(
        *lcols, *[F.col(f"_carried.{c}").alias(f"asof_{c}") for c in value_cols]
    )
    return out


def _epoch_us(col):
    """Microseconds-since-epoch for TIMESTAMP *or* TIMESTAMP_NTZ input
    (the driver's events.ts has shipped as both across test-data
    generations). ``unix_micros`` only accepts TIMESTAMP, so NTZ goes
    through a cast; the session timezone is pinned to UTC, so the cast
    is the identity interpretation — and every use below is a
    difference, where any fixed-offset interpretation cancels anyway."""
    return F.unix_micros(col.cast("timestamp"))


def close_pairs(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    epsilon_seconds: int,
) -> DataFrame:
    """Pairs (a, b) on the same key with 0 < ts_b - ts_a <= epsilon.

    Bucketed band join: each row lands in bucket floor(epoch/eps); a's
    bucket joins b's (bucket, bucket+1), then the exact range predicate
    filters. Shuffle keys are (key, bucket) — candidate volume is
    per-bucket density², never global n².
    """
    eps_us = F.lit(epsilon_seconds * 1_000_000).cast("long")
    base = df.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        (_epoch_us(F.col(ts)) / eps_us).cast("long").alias("_b"),
        F.col(id_col).alias("_id"),
    )
    a = base.select(
        F.col("_k"), F.col("_b"), F.col("_ts").alias("ts_a"), F.col("_id").alias("id_a")
    )
    # b joins into its own bucket and the previous one (a is earlier)
    b = base.select(
        F.col("_k"),
        F.explode(F.array(F.col("_b"), F.col("_b") - 1)).alias("_b"),
        F.col("_ts").alias("ts_b"),
        F.col("_id").alias("id_b"),
    )
    # microsecond-exact range predicate (integer arithmetic, no float)
    cond = (F.col("ts_b") > F.col("ts_a")) & (
        _epoch_us(F.col("ts_b")) - _epoch_us(F.col("ts_a")) <= eps_us
    )
    return (
        a.join(b, ["_k", "_b"])
        .filter(cond)
        .select(F.col("_k").alias(key), "id_a", "id_b", "ts_a", "ts_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
) -> DataFrame:
    """Batch sessionization: events on the same key belong to one session
    while consecutive gaps stay <= gap. Session id = running count of
    gap-breaks (window lag + cumulative sum — one shuffle on the key).
    Output: one row per session with start/end/count.

    The streaming twin is ``streaming.sessions.streaming_sessionize``
    (applyInPandasWithState); this batch form is its oracle.
    """
    w_order = W.partitionBy(key).orderBy(ts)
    # microsecond-exact gap compare (unix_timestamp would truncate to
    # whole seconds and misclassify boundary gaps)
    is_break = (
        F.when(
            _epoch_us(F.col(ts)) - _epoch_us(F.lag(ts).over(w_order))
            > gap_seconds * 1_000_000,
            1,
        )
        .otherwise(0)
    )
    w_run = w_order.rowsBetween(W.unboundedPreceding, W.currentRow)
    with_session = df.withColumn("_brk", is_break).withColumn(
        "session_id", F.sum("_brk").over(w_run)
    )
    return (
        with_session.groupBy(key, "session_id")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def enrich_fiat_value(silver: DataFrame, prices: DataFrame) -> DataFrame:
    """Populate the silver ledger's ``fiat_value`` — the column the
    reference declares but always leaves None (core/src/models.rs:43,
    solana_parser.rs:38,78) — by as-of joining a price series
    (asset_symbol, price_ts, price) and multiplying the entry amount by
    the latest price at-or-before the entry's creation time.

    Entries with no prior price keep a null fiat_value (the reference's
    Option semantics). One shuffle on asset_symbol; price series are
    tiny relative to the ledger, so the union side is negligible.
    """
    enriched = asof_join(
        silver,
        prices,
        key="asset_symbol",
        left_ts="created_at",
        right_ts="price_ts",
        value_cols=["price"],
    )
    out_cols = [c for c in silver.columns if c != "fiat_value"]
    return enriched.select(
        *out_cols,
        (F.col("asof_price") * F.col("amount")).cast(silver.schema["fiat_value"].dataType).alias("fiat_value"),
    ).select(*silver.columns)


def scd2_intervals(
    changes: DataFrame,
    key: str,
    ts: str,
    attr_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Change events → SCD type-2 validity intervals: one row per
    version with [valid_from, valid_to) and an is_current flag — the
    standard warehouse shape for dimension history, as ONE window pass.

    Each key's events sort by time; valid_to is the next event's
    timestamp (lead), open-ended (null) for the latest version. One
    shuffle on the key — no self-join, no per-key driver loop; at scale
    this is exactly the shape that backfills a dimension table from a
    CDC/event log. Pass ``tiebreak`` (a unique column) when timestamps
    can collide — windows need a total order to be deterministic.
    """
    order = [ts, tiebreak] if tiebreak else [ts]
    w = W.partitionBy(key).orderBy(*order)
    return changes.select(
        F.col(key),
        *[F.col(c) for c in attr_cols],
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
