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
    # the four chunks PARTITION the events (review finding r12: the old
    # assert compared events.count() to itself — dead code)
    assert sum(c.agg(F.sum("n")).collect()[0][0] or 0 for c in chunks) == events.count()

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

    from spectraplex_spark.operators.incremental import read_rollup_state

    maintained = _canon(finalize_rollup(read_rollup_state(spark, state_path)))
    batch = _canon(finalize_rollup(daily_rollup_state(events)))
    assert maintained == batch


def test_empty_increment_is_identity(spark):
    events = table(spark, SF_DIR, "events")
    state = daily_rollup_state(events)
    empty = daily_rollup_state(events.filter(F.lit(False)))
    assert _canon(finalize_rollup(merge_rollup_states(state, empty))) == _canon(
        finalize_rollup(state)
    )


def test_rollup_state_protocol_crash_and_retry_safety(spark, tmp_path):
    """The versioned-pointer protocol (review finding r12: the old
    in-place overwrite deleted state before committing, so a crash
    mid-overwrite reset all history):

      - a torn version write WITHOUT a pointer swap is invisible;
      - a checkpoint retry of an already-committed batch is a no-op
        (closes the old double-apply window);
      - vacuum keeps at most current + previous versions;
      - a corrupt pointer fails loudly instead of guessing."""
    import os

    import pytest as _pytest

    from spectraplex_spark.operators.incremental import (
        apply_rollup_batch,
        read_rollup_state,
    )

    events = table(spark, SF_DIR, "events")
    b1 = events.filter(F.col("event_id") % 2 == 0)
    b2 = events.filter(F.col("event_id") % 2 == 1)
    sp = str(tmp_path / "state")

    apply_rollup_batch(b1, 0, sp)
    apply_rollup_batch(b2, 1, sp)
    want = _canon(finalize_rollup(read_rollup_state(spark, sp)))
    assert want == _canon(finalize_rollup(daily_rollup_state(events)))

    # retry of batch 1 (crash after pointer swap, before checkpoint
    # commit) must be a no-op — the old protocol double-counted here
    apply_rollup_batch(b2, 1, sp)
    assert _canon(finalize_rollup(read_rollup_state(spark, sp))) == want

    # torn write: a half-baked version dir with NO pointer swap (crash
    # mid-write) leaves the committed state untouched and readable
    os.makedirs(os.path.join(sp, "v99"))
    open(os.path.join(sp, "v99", "part-garbage.parquet"), "wb").write(b"xx")
    assert _canon(finalize_rollup(read_rollup_state(spark, sp))) == want
    # ...and the next real batch supersedes it cleanly
    apply_rollup_batch(b1.limit(0), 2, sp)
    assert _canon(finalize_rollup(read_rollup_state(spark, sp))) == want

    # vacuum: only current + previous version dirs survive
    vdirs = sorted(n for n in os.listdir(sp) if n.startswith("v"))
    assert len(vdirs) <= 2 and "v2" in vdirs

    # corrupt pointer: loud refusal, never a silent reset
    with open(os.path.join(sp, "_CURRENT"), "w") as fh:
        fh.write("garbage")
    with _pytest.raises(ValueError, match="corrupt state pointer"):
        read_rollup_state(spark, sp)


def test_replayed_stream_behind_pointer_refuses_loudly(spark, tmp_path):
    """A batch_id BELOW the committed pointer means the checkpoint was
    deleted/reset (replay restarts at 0) or the state_path belongs to a
    different query; merging would double-count every rollup. The old
    code only special-cased batch_id == ptr (r14 review finding)."""
    import pytest

    from spectraplex_spark.operators.incremental import apply_rollup_batch

    state = str(tmp_path / "state")
    ev = table(spark, "/root/testdata/sf0.001", "events").limit(20)
    apply_rollup_batch(ev, 0, state)
    apply_rollup_batch(ev, 1, state)
    apply_rollup_batch(ev, 1, state)  # retry of committed batch: no-op
    with pytest.raises(RuntimeError, match="behind the committed state"):
        apply_rollup_batch(ev, 0, state)  # reset checkpoint replay
