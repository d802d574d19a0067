"""Incremental rollup maintenance: merge of any batch split — including
splits that straddle a day and out-of-order merges — must equal the
full recompute exactly (decimal state is order-independent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spectraplex_spark.operators.incremental import (
    daily_rollup_state,
    finalize_rollup,
    merge_rollup_states,
)
from spectraplex_spark.plans.registry import table

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return {
        (r.day, r.event_type, r.n, r.sum_value, r.mean_value) for r in df.collect()
    }


def test_merge_equals_recompute_across_odd_splits(spark):
    events = table(spark, SF_DIR, "events")
    full = _canon(finalize_rollup(daily_rollup_state(events)))

    # mid-DAY cutoffs: the same day lands in multiple batches, so the
    # key-wise merge must actually combine partial sums
    cuts = ["2024-01-04 13:00:00", "2024-01-11 07:30:00", "2024-01-19 22:15:00"]
    bounds = [None, *cuts, None]
    chunks = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        c = events
        if lo is not None:
            c = c.filter(F.col("ts") >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            c = c.filter(F.col("ts") < F.lit(hi).cast("timestamp"))
        chunks.append(daily_rollup_state(c))
    assert sum(c.count() for c in [events]) == events.count()

    # merge in a scrambled order, pairwise then all-at-once
    scrambled = merge_rollup_states(chunks[2], chunks[0], chunks[3], chunks[1])
    assert _canon(finalize_rollup(scrambled)) == full
    pairwise = merge_rollup_states(
        merge_rollup_states(chunks[1], chunks[3]),
        merge_rollup_states(chunks[2], chunks[0]),
    )
    assert _canon(finalize_rollup(pairwise)) == full


def test_streaming_maintained_view_equals_batch_recompute(spark, tmp_path):
    """Replay events as a stream of micro-batches maintaining the state
    table; the final finalized view must equal the batch rollup exactly,
    whatever the micro-batch boundaries were."""
    from spectraplex_spark.operators.incremental import stream_maintain_rollup

    events = table(spark, SF_DIR, "events")
    src = str(tmp_path / "src")
    events.repartition(5).write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    state_path = str(tmp_path / "state")
    q = stream_maintain_rollup(stream, state_path, str(tmp_path / "ckpt")).start()
    q.awaitTermination(120)

    maintained = _canon(finalize_rollup(spark.read.parquet(state_path)))
    batch = _canon(finalize_rollup(daily_rollup_state(events)))
    assert maintained == batch


def test_empty_increment_is_identity(spark):
    events = table(spark, SF_DIR, "events")
    state = daily_rollup_state(events)
    empty = daily_rollup_state(events.filter(F.lit(False)))
    assert _canon(finalize_rollup(merge_rollup_states(state, empty))) == _canon(
        finalize_rollup(state)
    )
