"""Streaming funnel (streaming/funnel.py): batch-fold equivalence on
in-order multi-batch replay, the arrival-order (late event) contract,
and state persistence across batches.  Cross-engine grading is in
test_oracle_parity.py (stream_funnel_replay)."""

from __future__ import annotations

import datetime as dt

import pytest

from spectraplex_spark.operators.analytics import funnel_steps
from spectraplex_spark.streaming.funnel import _advance, stream_funnel

T0 = dt.datetime(2024, 1, 1)
STEPS = ["view", "click", "purchase"]
SCHEMA = "event_id long, user_id long, ts timestamp_ntz, event_type string"


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, u, T0 + dt.timedelta(seconds=s), t) for i, (u, s, t) in enumerate(rows)],
        SCHEMA,
    )


def _drain(spark, tmp, batches, window_s=1000, max_files=1):
    """Write each batch as its own file, stream with one file per
    trigger, return the LATEST snapshot per user.  FileStreamSource
    orders files by MODIFICATION TIME — mtimes are pinned strictly
    increasing per batch so coarse filesystem timestamps can never
    reorder the arrival sequence the tests encode (review finding)."""
    import glob as _glob
    import os as _os

    src = f"{tmp}/src"
    for i, rows in enumerate(batches):
        _df(spark, rows).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
        t = 1_700_000_000 + i * 60  # strictly increasing, minute apart
        for f in _glob.glob(f"{src}/*.parquet"):
            if _os.path.getmtime(f) > t - 60:  # only the new batch's files
                _os.utime(f, (t, t))
    stream = spark.readStream.schema(_df(spark, []).schema).option(
        "maxFilesPerTrigger", max_files
    ).parquet(src)
    q = (
        stream_funnel(stream, STEPS, window_s=window_s)
        .writeStream.format("parquet")
        .option("path", f"{tmp}/out")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    snaps = spark.read.parquet(f"{tmp}/out").collect()
    latest: dict[int, int] = {}
    for r in snaps:
        latest[r["user_id"]] = max(latest.get(r["user_id"], 0), r["reached"])
    return latest


def test_in_order_multibatch_equals_batch_fold(spark, tmp_path):
    """Batches split at a time boundary (in-order arrival): the
    streaming state machine must equal the batch funnel exactly."""
    b1 = [(1, 0, "view"), (1, 10, "click"), (2, 0, "view"), (3, 5, "view")]
    b2 = [(1, 20, "purchase"), (2, 30, "click"), (3, 2000, "click")]
    got = _drain(spark, str(tmp_path), [b1, b2])
    batch = {
        r["user_id"]: r["reached"]
        for r in funnel_steps(_df(spark, b1 + b2), STEPS, window_s=1000).collect()
    }
    assert got == batch
    assert got[1] == 3 and got[2] == 2 and got[3] == 1


def test_late_event_is_ignored_slots_fill_once(spark, tmp_path):
    """A click arriving in a LATER batch but time-preceding the state's
    anchor does not reopen the prefix — the documented k-BIGINT-state
    trade (the batch fold, seeing all events sorted, would count it
    only if it followed the anchor in time; here it precedes it)."""
    b1 = [(1, 100, "view")]
    b2 = [(1, 50, "click")]  # arrives late, time-precedes the anchor
    got = _drain(spark, str(tmp_path), [b1, b2])
    assert got[1] == 1  # not advanced by the time-preceding click
    # the batch fold agrees here: t=50 click is NOT strictly after t=100
    batch = {
        r["user_id"]: r["reached"]
        for r in funnel_steps(_df(spark, b1 + b2), STEPS, window_s=1000).collect()
    }
    assert batch[1] == 1


def test_arrival_order_divergence_is_the_documented_one(spark, tmp_path):
    """The ONE divergence mode: a step-2 event arrives BEFORE the
    anchor exists (batch 1), the anchor arrives later (batch 2) —
    streaming missed the click forever; the batch fold (time order)
    counts neither... but a LATER in-window click still advances both.
    Pin the exact behavior so it can never silently change."""
    b1 = [(1, 50, "click")]          # no anchor yet -> ignored
    b2 = [(1, 10, "view")]           # anchor arrives (time-earlier)
    b3 = [(1, 60, "click")]          # in-window, after the anchor
    got = _drain(spark, str(tmp_path), [b1, b2, b3])
    assert got[1] == 2
    batch = {
        r["user_id"]: r["reached"]
        for r in funnel_steps(
            _df(spark, b1 + b2 + b3), STEPS, window_s=1000
        ).collect()
    }
    # the batch fold sees time order (view@10, click@50) and also lands 2
    assert batch[1] == 2


def test_window_enforced_across_batches(spark, tmp_path):
    b1 = [(1, 0, "view")]
    b2 = [(1, 2000, "click")]  # outside the 1000s window of the anchor
    got = _drain(spark, str(tmp_path), [b1, b2])
    assert got[1] == 1


def test_checkpoint_resume_preserves_state(spark, tmp_path):
    """Kill the query between batches and restart from the checkpoint:
    per-user step state must survive the restart (batch 2's click
    advances the anchor landed before the stop), and no snapshot is
    re-emitted for the already-committed batch."""
    src = f"{tmp_path}/src"
    _df(spark, [(1, 0, "view"), (2, 0, "view")]).coalesce(1).write.parquet(src)

    def run_once():
        stream = spark.readStream.schema(_df(spark, []).schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream_funnel(stream, STEPS, window_s=1000)
            .writeStream.format("parquet")
            .option("path", f"{tmp_path}/out")
            .option("checkpointLocation", f"{tmp_path}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    run_once()  # drains batch 1, commits the checkpoint, stops
    import os
    import time

    _df(spark, [(1, 10, "click")]).coalesce(1).write.mode("append").parquet(src)
    now = time.time()
    for f in __import__("glob").glob(f"{src}/*.parquet"):
        os.utime(f, None)  # fresh mtime for the new file is enough here
    run_once()  # restart: must resume from state, process only batch 2

    rows = spark.read.parquet(f"{tmp_path}/out").collect()
    latest: dict[int, int] = {}
    for r in rows:
        latest[r["user_id"]] = max(latest.get(r["user_id"], 0), r["reached"])
    assert latest[1] == 2  # anchor from run 1 + click from run 2
    assert latest[2] == 1
    # run 2 re-emits only touched keys: user 2 appears exactly once
    assert sum(1 for r in rows if r["user_id"] == 2) == 1
    del now


def test_advance_transition_matches_analytics_fold():
    """The pure transition function is the batch fold's rule."""
    st = _advance([None, None, None], [(0, "view"), (1, "click")], STEPS, 10**9)
    assert st == [0, 1, None]
    # filled prefix never reopens
    st2 = _advance(st, [(-5, "purchase"), (2, "purchase")], STEPS, 10**9)
    assert st2 == [0, 1, 2]
    # irrelevant types are ignored even if passed in
    assert _advance([None] * 3, [(0, "error")], STEPS, 10**9) == [None] * 3


def test_stream_funnel_input_contracts(spark):
    df = _df(spark, [])
    with pytest.raises(ValueError, match="steps"):
        stream_funnel(df, ["view"], window_s=10)
    with pytest.raises(ValueError, match="window_s"):
        stream_funnel(df, STEPS, window_s=0)


# ---------------------------------------------------------------------------
# stream_funnel_watermarked (r11 verdict task #6): the watermark-buffered
# mode must close the arrival-order gap — out-of-order delivery within the
# delay matches the batch fold bit-for-bit.
# ---------------------------------------------------------------------------

from spectraplex_spark.streaming.funnel import stream_funnel_watermarked


def _drain_wm(spark, tmp, batches, window_s=1000, delay_s=3600):
    """The _drain harness for the watermarked mode: per-batch files with
    pinned strictly-increasing mtimes, one file per trigger; returns
    (latest-reached map, all snapshot rows)."""
    import glob as _glob
    import os as _os

    src = f"{tmp}/src"
    for i, rows in enumerate(batches):
        _df(spark, rows).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
        t = 1_700_000_000 + i * 60
        for f in _glob.glob(f"{src}/*.parquet"):
            if _os.path.getmtime(f) > t - 60:
                _os.utime(f, (t, t))
    stream = spark.readStream.schema(_df(spark, []).schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_funnel_watermarked(
            stream, STEPS, window_s=window_s, delay_s=delay_s
        )
        .writeStream.format("parquet")
        .option("path", f"{tmp}/out")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    rows = spark.read.parquet(f"{tmp}/out").collect()
    # the documented consumer pattern: reached is NOT monotone (a late
    # in-delay anchor can shrink the fold), so keep the snapshot with
    # max n_seen per user — that is the full-multiset fold.
    best: dict[int, tuple[int, int]] = {}
    for r in rows:
        if r["user_id"] not in best or r["n_seen"] > best[r["user_id"]][0]:
            best[r["user_id"]] = (r["n_seen"], r["reached"])
    return {u: v for u, (_, v) in best.items()}, rows


def test_watermarked_closes_the_arrival_order_gap(spark, tmp_path):
    """THE divergence case stream_funnel documents (click arrives before
    its anchor): the watermarked mode buffers both and folds them in
    time order — final reached equals the batch fold bit-for-bit,
    where the arrival-order mode loses the click forever."""
    b1 = [(1, 50, "click")]  # arrives first
    b2 = [(1, 10, "view")]   # the anchor, time-earlier, one batch later
    got, _ = _drain_wm(spark, str(tmp_path), [b1, b2])
    batch = {
        r["user_id"]: r["reached"]
        for r in funnel_steps(_df(spark, b1 + b2), STEPS, window_s=1000).collect()
    }
    assert got == batch == {1: 2}  # view@10 then click@50
    # contrast: the arrival-order mode is pinned at 1 for this delivery
    # (test_arrival_order_divergence_is_the_documented_one needs a THIRD
    # click to reach 2)


def test_watermarked_scrambled_multibatch_equals_batch_fold(spark, tmp_path):
    """Full journeys delivered scrambled across batches (every
    displacement within the delay): the final snapshot equals the
    batch fold over ALL events for EVERY user — bit-for-bit."""
    b1 = [(1, 20, "purchase"), (2, 30, "click"), (3, 2000, "click"),
          (4, 500, "purchase")]
    b2 = [(1, 10, "click"), (2, 0, "view"), (4, 400, "view")]
    b3 = [(1, 0, "view"), (3, 5, "view"), (4, 450, "click"),
          (5, 7, "view"), (5, 3, "click")]
    all_rows = b1 + b2 + b3
    got, _ = _drain_wm(spark, str(tmp_path), [b1, b2, b3])
    batch = {
        r["user_id"]: r["reached"]
        for r in funnel_steps(_df(spark, all_rows), STEPS, window_s=1000).collect()
    }
    assert got == batch
    assert got == {1: 3, 2: 2, 3: 1, 4: 3, 5: 1}


def test_watermarked_seals_behind_the_watermark(spark, tmp_path):
    """With a small delay, earlier events SEAL as the watermark passes:
    reached_sealed rises to the full fold and the buffer drains —
    the state-bound contract (buffer holds only one delay's worth)."""
    # user 1 journeys early; keeps appearing so sealing gets invoked
    b1 = [(1, 0, "view"), (1, 5, "click"), (1, 9, "purchase")]
    b2 = [(1, 100, "view")]   # advances wm to 95 -> seals all of b1
    b3 = [(1, 200, "view")]   # advances wm to 195 -> seals the 100 too
    _, rows = _drain_wm(spark, str(tmp_path), [b1, b2, b3], delay_s=5)
    by_batch = sorted(
        (r["reached"], r["reached_sealed"], r["pending"]) for r in rows
    )
    # The watermark lags one batch (wm after batch N gates batch N+1),
    # so sealing advances one batch behind and the newest events are
    # always pending: batch1 wm=0 seals nothing (pending all 3);
    # batch2 wm=9-5=4 seals view@0; batch3 wm=100-5=95 seals
    # click@5 + purchase@9 (prefix complete), views@100/200 pending.
    assert by_batch == [(3, 0, 3), (3, 1, 3), (3, 3, 2)]
    # provisional reached was already exact from the first snapshot,
    # sealed never retracts, and the buffer holds one delay's worth —
    # never the full history (3 -> 3 -> 2 while 6 events arrived).


def test_watermarked_drops_events_later_than_the_delay(spark, tmp_path):
    """An event older than the watermark is DROPPED before it can seal —
    the explicit trade replacing the silent arrival-order loss.  The
    anchor at t=10 arrives when wm is already ~995.

    DISCRIMINATING parameters (r14 review finding: with the old default
    window_s=1000 both the drop and no-drop paths yielded reached=2 and
    n_seen was unasserted, so the test was green while NoTimeout let
    the late view seal instantly): with window_s=60, a leaked view@10
    would re-anchor the fold and exclude click@1005 → reached 1; and
    n_seen must count 2, not 3."""
    b1 = [(1, 1000, "view")]
    b2 = [(1, 10, "view"), (1, 1005, "click")]  # t=10 is > delay late
    got, rows = _drain_wm(
        spark, str(tmp_path), [b1, b2], delay_s=5, window_s=60
    )
    # the t=10 view never perturbs state; anchor stays 1000, click lands
    assert got == {1: 2}
    assert max(r["n_seen"] for r in rows) == 2, "dropped event leaked into n_seen"


def test_watermarked_input_contracts(spark):
    df = _df(spark, [])
    with pytest.raises(ValueError, match="steps"):
        stream_funnel_watermarked(df, ["view"], window_s=10, delay_s=1)
    with pytest.raises(ValueError, match="window_s"):
        stream_funnel_watermarked(df, STEPS, window_s=0, delay_s=1)
    with pytest.raises(ValueError, match="delay_s"):
        stream_funnel_watermarked(df, STEPS, window_s=10, delay_s=-1)


def test_watermarked_reached_can_legally_shrink_and_n_seen_resolves(spark, tmp_path):
    """A late-but-in-delay step-1 event RE-ANCHORS the fold (the batch
    fold is greedy-earliest): provisional reached legally drops from 3
    to 1 when the earlier view arrives and pushes the rest outside the
    window.  n_seen is the monotone snapshot selector that keeps the
    final (= batch-fold) answer."""
    b1 = [(1, 100, "view"), (1, 105, "click"), (1, 108, "purchase")]
    b2 = [(1, 0, "view")]  # earlier anchor; window 10s excludes 105/108
    got, rows = _drain_wm(spark, str(tmp_path), [b1, b2], window_s=10)
    batch = {
        r["user_id"]: r["reached"]
        for r in funnel_steps(_df(spark, b1 + b2), STEPS, window_s=10).collect()
    }
    assert got == batch == {1: 1}
    snaps = sorted((r["n_seen"], r["reached"]) for r in rows)
    assert snaps == [(3, 3), (4, 1)]  # the shrink, pinned


def test_wm_step_composition_equals_batch_fold_hypothesis():
    """The sealing invariant, property-tested on the pure transition:
    for ANY event multiset, ANY batch split, and ANY valid watermark
    trajectory (nondecreasing, never past the min future event time —
    Spark's contract: rows behind the watermark are dropped before the
    operator, so a valid trajectory never strands an undelivered
    event), the final provisional fold equals the one-shot batch fold
    over all events."""
    from hypothesis import given, settings, strategies as st_

    from spectraplex_spark.streaming.funnel import _advance, _wm_step

    STEPS3 = ["view", "click", "purchase"]
    ev = st_.tuples(
        st_.integers(min_value=0, max_value=50),
        st_.sampled_from(STEPS3),
    )

    @settings(max_examples=300, deadline=None)
    @given(
        st_.lists(ev, min_size=0, max_size=24),
        st_.data(),
    )
    def check(events, data):
        k = len(STEPS3)
        w_us = data.draw(st_.sampled_from([5, 20, 10**9]))
        # random batch split (preserving arrival order = list order)
        n_batches = data.draw(st_.integers(min_value=1, max_value=4))
        cuts = sorted(
            data.draw(
                st_.lists(
                    st_.integers(min_value=0, max_value=len(events)),
                    min_size=n_batches - 1,
                    max_size=n_batches - 1,
                )
            )
        )
        batches, prev = [], 0
        for c in cuts + [len(events)]:
            batches.append(events[prev:c])
            prev = c
        st = [None] * k
        buf: list = []
        provisional = st
        wm = -1
        for i, b in enumerate(batches):
            # valid watermark: ≤ every event still to arrive, nondecreasing
            future = [t for bb in batches[i:] for t, _ in bb]
            hi = min(future) if future else 10**9
            wm = max(wm, data.draw(st_.integers(min_value=-1, max_value=hi)))
            st, buf, provisional = _wm_step(st, buf, b, wm, STEPS3, w_us)
        want = _advance([None] * k, events, STEPS3, w_us)
        assert provisional == want

    check()


def test_null_user_group_is_not_a_poison_pill(spark, tmp_path):
    """NULL user_id forms a legal state group (the batch fold keeps it);
    the Arrow key transfer delivers it as NaN, which the old
    `key[0] is None` check missed — int(NaN) crashed the query on
    every checkpoint retry (review finding r12, fixed with pd.isna)."""
    rows = [(None, 0, "view"), (None, 10, "click"), (1, 0, "view")]
    import datetime as dt

    df = spark.createDataFrame(
        [(i, u, T0 + dt.timedelta(seconds=s), t) for i, (u, s, t) in enumerate(rows)],
        SCHEMA,
    )
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_funnel(stream, STEPS, window_s=1000)
        .writeStream.format("parquet")
        .option("path", f"{tmp_path}/out")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r["user_id"]: r["reached"]
        for r in spark.read.parquet(f"{tmp_path}/out").collect()
    }
    assert got == {None: 2, 1: 1}


def test_funnel_string_user_keys_supported(spark, tmp_path):
    """The funnel key is caller-chosen: a string key must work (the old
    hardcoded `user_id long` + int(key[0]) killed the query on the
    first batch containing a non-numeric key — r14 review finding)."""
    rows = [
        ("u-1", 0, "view"), ("u-1", 5, "click"), ("u-1", 9, "purchase"),
        ("u-2", 0, "view"),
    ]
    df = spark.createDataFrame(
        [(u, T0 + dt.timedelta(seconds=s), t) for u, s, t in rows],
        "session_key string, ts timestamp_ntz, event_type string",
    )
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = stream_funnel(stream, STEPS, window_s=60, user_col="session_key")
    q = (
        out.writeStream.format("memory")
        .queryName("strkey_funnel")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r["user_id"]: r["reached"]
        for r in spark.sql("SELECT * FROM strkey_funnel").collect()
    }
    assert got == {"u-1": 3, "u-2": 1}
