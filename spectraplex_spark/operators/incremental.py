"""Incremental aggregate maintenance — the materialized-view pattern
the silver→report path needs at 100 TB, where "recompute the rollup
over all history" stops being an option.

State design: keep the report as MERGEABLE partial state (counts and
exact decimal sums — both associative and commutative), not as final
values. A new batch is aggregated alone (touching only its own rows)
and merged into the stored state with a key-wise sum; averages/ratios
are derived at read time from the merged state. The merge is one
shuffle over the (tiny) state keys, independent of history size.

Why decimal state: IEEE double sums are order-dependent, so
incrementally-merged doubles drift from a full recompute; DECIMAL(38,6)
sums are exact and order-independent, making merge(full-split) ==
full-recompute bit-for-bit — which is exactly what the catalog entry's
DuckDB oracle asserts (the oracle is the plain full aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spectraplex_spark.plans.relational import dec6

STATE_KEYS = ["day", "event_type"]


def daily_rollup_state(events: DataFrame) -> DataFrame:
    """Aggregate a batch of events into mergeable per-(day, type) state:
    row count + exact decimal value sum."""
    return events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec6(F.col("value"))).alias("sum_value"),
    )


def merge_rollup_states(*states: DataFrame) -> DataFrame:
    """Key-wise merge of rollup states (count+sum are associative /
    commutative, so any merge order — and any number of increments —
    yields the identical state)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*STATE_KEYS).agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").alias("sum_value"),
    )


def stream_maintain_rollup(
    events_stream: DataFrame, state_path: str, checkpoint_dir: str
):
    """Streaming materialized-view maintenance: each micro-batch
    aggregates alone and merges into the stored state (read-modify-
    write), so the maintained view equals the batch recompute after any
    sequence of micro-batches — mergeability makes the batch split
    irrelevant.

    The merged frame is localCheckpoint-ed before the overwrite because
    the write would otherwise lazily re-read the path it is deleting.
    Durability note: checkpointing makes restarts resume at batch
    granularity, but a crash BETWEEN state write and checkpoint commit
    could re-apply one batch — the portable protocol accepts that
    window; on a real deployment the state table should be a
    transactional format (Delta/Iceberg MERGE) which closes it.
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        from spectraplex_spark.sources.io import _target_exists

        spark = batch_df.sparkSession
        batch_state = daily_rollup_state(batch_df)
        # Only a MISSING state path means "first batch". A corrupt or
        # transiently unreadable state file must fail the batch (the
        # checkpoint will retry it) — swallowing the read error here
        # would overwrite the path with just the current batch and
        # silently destroy all accumulated rollup state.
        if _target_exists(spark, state_path):
            prior = spark.read.parquet(state_path)
            merged = merge_rollup_states(prior, batch_state)
        else:
            merged = batch_state
        merged.localCheckpoint().write.mode("overwrite").parquet(state_path)

    return (
        events_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def finalize_rollup(state: DataFrame) -> DataFrame:
    """State → report: derived mean plus canonical double images of the
    decimal sums (read-time projection — never stored)."""
    return state.select(
        F.col("day"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_value").cast("double").alias("sum_value"),
        (F.col("sum_value").cast("double") / F.col("n")).alias("mean_value"),
    )
