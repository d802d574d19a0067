"""Account-update consumer tests: the latest-state pick, the idempotent
streaming landing, and the full wire→decode→land→serve composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from spectraplex_spark.streaming.accounts import (
    account_state_view,
    land_account_updates,
    latest_account_state,
    stream_account_updates,
)
from tests.test_yellowstone import _FRAME_SCHEMA, encode_account_update, WALLET_B58


def _upd(spark, rows):
    return spark.createDataFrame(
        rows, "pubkey string, slot long, write_version long, lamports long"
    )


def test_latest_state_picks_max_slot_then_write_version(spark):
    upd = _upd(
        spark,
        [
            ("A", 10, 1, 100),
            ("A", 10, 2, 200),  # same slot, later write_version wins
            ("A", 9, 9, 50),    # earlier slot loses despite bigger wv
            ("B", 5, 1, 777),
        ],
    )
    out = {r["pubkey"]: r for r in latest_account_state(upd).collect()}
    assert out["A"]["lamports"] == 200 and out["A"]["write_version"] == 2
    assert out["B"]["lamports"] == 777


def test_landing_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "updates")
    upd = _upd(spark, [("A", 1, 1, 10), ("B", 1, 2, 20)])
    assert land_account_updates(upd, path) == 2
    assert land_account_updates(upd, path) == 0  # replay: anti-join no-op
    later = _upd(spark, [("A", 2, 3, 30)])
    assert land_account_updates(later, path) == 1
    state = {r["pubkey"]: r["lamports"] for r in account_state_view(spark, path).collect()}
    assert state == {"A": 30, "B": 20}


def test_wire_to_state_end_to_end(spark, tmp_path):
    """Yellowstone account frames → streaming decode → idempotent land →
    current-state view, with a junk frame dropped on the way."""
    src = tmp_path / "frames"
    spark.createDataFrame(
        [
            (None, encode_account_update(lamports=111, slot=10, write_version=1), "t", 0, 0),
            (None, encode_account_update(lamports=222, slot=11, write_version=2), "t", 0, 1),
            (None, b"junk", "t", 0, 2),
        ],
        _FRAME_SCHEMA,
    ).write.parquet(str(src))
    stream = spark.readStream.schema(_FRAME_SCHEMA).parquet(str(src))
    q = stream_account_updates(
        stream, str(tmp_path / "updates"), str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)
    state = account_state_view(spark, str(tmp_path / "updates")).collect()
    assert len(state) == 1
    assert state[0]["pubkey"] == WALLET_B58
    assert state[0]["lamports"] == 222  # slot 11 supersedes slot 10


def test_failover_updates_with_colliding_write_versions_both_land(spark, tmp_path):
    """r13 review: write_version is a validator-LOCAL counter — after a
    subscription failover a fresh validator can reuse a write_version
    for a DIFFERENT update. The landing id includes the slot, so both
    land and the view serves the (slot, write_version)-latest state
    instead of the stale pre-failover value forever."""
    path = str(tmp_path / "updates")
    assert land_account_updates(_upd(spark, [("P", 100, 555, 1)]), path) == 1
    # failover: same write_version, different slot, different payload
    assert land_account_updates(_upd(spark, [("P", 200, 555, 9)]), path) == 1
    # a true replay of either is still a no-op
    assert land_account_updates(_upd(spark, [("P", 200, 555, 9)]), path) == 0
    state = {r["pubkey"]: r["lamports"] for r in account_state_view(spark, path).collect()}
    assert state == {"P": 9}


def test_account_state_view_is_total_before_first_batch(spark, tmp_path):
    """r13 review: a serving endpoint querying the view before the
    first batch lands gets an EMPTY state view on the declared schema,
    not an AnalysisException."""
    out = account_state_view(spark, str(tmp_path / "never_written"))
    assert out.count() == 0
    assert "pubkey" in out.columns and "write_version" in out.columns
