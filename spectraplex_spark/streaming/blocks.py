"""Block-metadata consumers — what a subscriber does with the
Yellowstone block-meta frames (`decode_yellowstone_blocks`): verify
chain continuity and surface throughput stats.

The reference describes subscribing to block metadata (README.md:3)
and lands nothing with it; the canonical consumer needs are (a) gap /
reorg detection — does each block's ``parent_slot`` point at the
previous block we saw, and does ``parent_blockhash`` match that
block's ``blockhash``? — and (b) per-block throughput
(``executed_transaction_count``) rollups, both of which are single
window/aggregation passes.

Scale shape: one global ordering by slot. Block metadata is ~one row
per 400 ms of chain time (tiny forever), so a single-partition window
is NOT the anti-pattern it would be on a fact table; for multi-chain
deployments partition the window by chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def slot_continuity(blocks: DataFrame) -> DataFrame:
    """Per block (ordered by slot): the previously seen block and two
    continuity verdicts — ``has_gap`` (parent_slot is not the previous
    seen slot: skipped slots or missed frames) and ``hash_mismatch``
    (parent_blockhash disagrees with the previous block's blockhash:
    a fork/reorg signal even when slots are contiguous). First block
    has no predecessor → both verdicts null.

    At-least-once redelivery (a subscription reconnect replaying the
    same frame) is collapsed BEFORE the window: a duplicate (slot,
    blockhash) row would otherwise see itself as its predecessor and
    raise a spurious has_gap + hash_mismatch alarm with no chain
    anomaly — and equal-slot rows would make lag()'s ordering (hence
    which row alarms) partition-order dependent (r14 review finding).
    TWO frames with the same slot but DIFFERENT blockhashes survive the
    dedup deliberately: that is a real fork signal, and the blockhash
    tiebreaker keeps their window order deterministic."""
    blocks = blocks.dropDuplicates(["slot", "blockhash"])
    w = Window.orderBy("slot", "blockhash")
    prev_slot = F.lag("slot").over(w)
    prev_hash = F.lag("blockhash").over(w)
    return blocks.select(
        "slot",
        "blockhash",
        "parent_slot",
        "parent_blockhash",
        prev_slot.alias("prev_slot"),
        F.when(prev_slot.isNotNull(), F.col("parent_slot") != prev_slot).alias(
            "has_gap"
        ),
        F.when(prev_hash.isNotNull(), F.col("parent_blockhash") != prev_hash).alias(
            "hash_mismatch"
        ),
    )


def block_throughput(blocks: DataFrame, bucket_slots: int = 100) -> DataFrame:
    """Executed-transaction throughput per ``bucket_slots``-slot bucket:
    one partial-aggregatable groupBy (slot-ranged buckets, so the
    shuffle key count is bounded by chain length / bucket)."""
    bucket = (F.col("slot") / bucket_slots).cast("bigint").alias("slot_bucket")
    return blocks.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("executed_transaction_count").cast("bigint").alias("n_transactions"),
        F.min("slot").alias("first_slot"),
        F.max("slot").alias("last_slot"),
    )
