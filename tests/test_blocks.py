"""Block-metadata consumer tests: continuity verdicts and throughput
rollup, plus the wire→decode→verify composition."""

from __future__ import annotations

from spectraplex_spark.streaming.blocks import block_throughput, slot_continuity
from spectraplex_spark.streaming.yellowstone import decode_yellowstone_blocks
from tests.test_yellowstone import _FRAME_SCHEMA, encode_block_meta


def _blocks(spark, rows):
    return spark.createDataFrame(
        rows,
        "slot long, blockhash string, parent_slot long, parent_blockhash string,"
        " executed_transaction_count long",
    )


def test_continuity_flags_gaps_and_forks(spark):
    rows = [
        (10, "h10", 9, "h9", 5),
        (11, "h11", 10, "h10", 5),   # clean
        (13, "h13", 12, "h12", 5),   # gap: parent 12, prev seen 11
        (14, "h14", 13, "hX", 5),    # contiguous but wrong parent hash
    ]
    out = {r["slot"]: r for r in slot_continuity(_blocks(spark, rows)).collect()}
    assert out[10]["has_gap"] is None and out[10]["hash_mismatch"] is None
    assert out[11]["has_gap"] is False and out[11]["hash_mismatch"] is False
    assert out[13]["has_gap"] is True
    assert out[14]["has_gap"] is False and out[14]["hash_mismatch"] is True


def test_throughput_buckets(spark):
    rows = [(s, f"h{s}", s - 1, f"h{s-1}", 10) for s in range(0, 250, 10)]
    out = {r["slot_bucket"]: r for r in block_throughput(_blocks(spark, rows)).collect()}
    assert out[0]["n_blocks"] == 10 and out[0]["n_transactions"] == 100
    assert out[2]["first_slot"] == 200 and out[2]["last_slot"] == 240


def test_wire_to_continuity_end_to_end(spark):
    frames = spark.createDataFrame(
        [
            (None, encode_block_meta(slot=100, blockhash="A" * 8, parent_slot=99,
                                     parent_blockhash="Z" * 8), "t", 0, 0),
            (None, encode_block_meta(slot=101, blockhash="B" * 8, parent_slot=100,
                                     parent_blockhash="A" * 8), "t", 0, 1),
            (None, encode_block_meta(slot=103, blockhash="C" * 8, parent_slot=102,
                                     parent_blockhash="Q" * 8), "t", 0, 2),
            (None, b"junk", "t", 0, 3),
        ],
        _FRAME_SCHEMA,
    )
    out = {r["slot"]: r for r in
           slot_continuity(decode_yellowstone_blocks(frames)).collect()}
    assert out[101]["has_gap"] is False and out[101]["hash_mismatch"] is False
    assert out[103]["has_gap"] is True


def test_redelivered_frame_raises_no_false_alarms(spark):
    """At-least-once redelivery (a reconnect replaying a block frame)
    must not alarm: the duplicate used to see itself as its predecessor
    -> spurious has_gap + hash_mismatch with no chain anomaly (r14
    review finding). A same-slot DIFFERENT-hash frame (a real fork)
    still survives the dedup and alarms."""
    rows = [
        (10, "h10", 9, "h9", 5),
        (11, "h11", 10, "h10", 5),
        (11, "h11", 10, "h10", 5),   # exact redelivery: collapsed
    ]
    out = slot_continuity(_blocks(spark, rows)).collect()
    assert len(out) == 2
    by_slot = {r["slot"]: r for r in out}
    assert by_slot[11]["has_gap"] is False and by_slot[11]["hash_mismatch"] is False

    fork = rows[:2] + [(11, "h11b", 10, "h10", 5)]  # same slot, new hash
    out2 = sorted(
        slot_continuity(_blocks(spark, fork)).collect(),
        key=lambda r: (r["slot"], r["blockhash"]),
    )
    assert len(out2) == 3  # the fork row is NOT collapsed
    assert out2[2]["blockhash"] == "h11b" and out2[2]["has_gap"] is True
