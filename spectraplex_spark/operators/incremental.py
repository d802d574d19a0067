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


def _pointer_path(state_path: str) -> str:
    import os

    return os.path.join(state_path, "_CURRENT")


def _read_pointer(state_path: str) -> tuple[str, int] | None:
    """(current version dir, batch_id that produced it), or None."""
    import os

    try:
        with open(_pointer_path(state_path)) as fh:
            ver = fh.read().strip()
    except FileNotFoundError:
        return None
    if not ver.startswith("v"):
        raise ValueError(
            f"stream_maintain_rollup: corrupt state pointer {ver!r} at "
            f"{state_path!r} — refusing to guess (a wrong guess silently "
            "destroys or double-counts accumulated state)"
        )
    return os.path.join(state_path, ver), int(ver[1:])


def _swap_pointer(state_path: str, batch_id: int) -> None:
    """Atomic pointer swap: tmp + fsync + rename + DIRECTORY fsync (the
    commit.py WAL discipline, all four steps). The rename is the single
    commit point; the directory fsync makes it DURABLE — without it the
    rename and the vacuum's unlink of the superseded version dir are
    independently reorderable on power loss, and the surviving pointer
    could name a directory the vacuum already deleted (review finding
    r13; commit.py's _fsync_dir exists for exactly this)."""
    import os

    from spectraplex_spark.sources.commit import _fsync_dir

    tmp = _pointer_path(state_path) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"v{batch_id}")
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, _pointer_path(state_path))
    _fsync_dir(state_path)


def read_rollup_state(spark, state_path: str) -> DataFrame:
    """Read the CURRENT committed rollup state (pointer-resolved)."""
    ptr = _read_pointer(state_path)
    if ptr is None:
        raise FileNotFoundError(f"no committed rollup state at {state_path!r}")
    return spark.read.parquet(ptr[0])


def apply_rollup_batch(batch_df: DataFrame, batch_id: int, state_path: str) -> None:
    """One committed state increment (the foreachBatch body, exposed so
    the crash/retry protocol is directly testable)."""
    import os
    import shutil

    spark = batch_df.sparkSession
    os.makedirs(state_path, exist_ok=True)
    ptr = _read_pointer(state_path)
    if ptr is not None and ptr[1] == batch_id:
        return  # checkpoint retry of an already-committed batch: no-op
    if ptr is not None and batch_id < ptr[1]:
        # A batch id BELOW the committed pointer means the stream's
        # checkpoint was deleted/reset (replay restarts at 0) or this
        # state_path belongs to a different query — merging would
        # re-aggregate history into already-counted state, permanently
        # double-counting every rollup with no error anywhere.  Same
        # refuse-to-guess discipline as the torn-swap recovery below
        # (r14 review finding).
        raise RuntimeError(
            f"{state_path!r}: incoming batch_id {batch_id} is behind the "
            f"committed state v{ptr[1]} — the streaming checkpoint was "
            "reset or points at a different state; merging would "
            "double-count. Start a NEW state_path for a replayed "
            "stream, or restore the matching checkpoint."
        )
    batch_state = daily_rollup_state(batch_df)
    if ptr is not None:
        prior = spark.read.parquet(ptr[0])
        merged = merge_rollup_states(prior, batch_state)
    else:
        merged = batch_state
    new_dir = os.path.join(state_path, f"v{batch_id}")
    merged.write.mode("overwrite").parquet(new_dir)
    _swap_pointer(state_path, batch_id)
    # vacuum: keep current + the immediately superseded version
    keep = {f"v{batch_id}"} | ({os.path.basename(ptr[0])} if ptr else set())
    for name in os.listdir(state_path):
        if name.startswith("v") and name not in keep:
            shutil.rmtree(os.path.join(state_path, name), ignore_errors=True)


def stream_maintain_rollup(
    events_stream: DataFrame, state_path: str, checkpoint_dir: str
):
    """Streaming materialized-view maintenance: each micro-batch
    aggregates alone and merges into the stored state, so the
    maintained view equals the batch recompute after any sequence of
    micro-batches — mergeability makes the batch split irrelevant.
    Read the result with :func:`read_rollup_state`.

    Durability protocol (review finding r12 — the old in-place parquet
    ``overwrite`` DELETED the state before the write job committed, so
    a crash mid-overwrite left a missing path that the retry read as
    "first batch", silently resetting all accumulated state — the
    exact mode the old comment claimed was impossible):

      - each batch writes a NEW version directory ``v{batch_id}``
        (overwrite of that directory is retry-idempotent);
      - a ``_CURRENT`` pointer file commits it atomically
        (tmp + fsync + rename);
      - a retry of a batch whose version is ALREADY current is a
        no-op — the pointer carries the batch id, which also closes
        the old protocol's documented double-apply window between
        state write and checkpoint commit;
      - superseded version dirs older than the previous one are
        vacuumed opportunistically (the previous version is kept so a
        reader that resolved the pointer just before a swap can still
        finish its scan).

    The pointer rename is atomic on a real filesystem; on an object
    store without atomic rename, front the state with a transactional
    table format instead (the same seam merge.py documents).
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        apply_rollup_batch(batch_df, batch_id, state_path)

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
