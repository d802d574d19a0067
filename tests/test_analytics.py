"""Event-funnel + cohort-retention (operators/analytics.py): fold
semantics vs a pure-Python replica, windowFunnel edge cases, and the
retention matrix's invariants.  Cross-engine grading is in
test_oracle_parity.py (funnel_conversion_report /
cohort_retention_daily)."""

from __future__ import annotations

import datetime as dt

import pytest

from spectraplex_spark.operators.analytics import (
    RATIO_SCALE,
    cohort_retention,
    funnel_report,
    funnel_steps,
)

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, T0 + dt.timedelta(seconds=s), t) for i, (u, s, t) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp_ntz, event_type string",
    )


def _py_funnel(rows, steps, window_s):
    """Greedy-earliest windowed funnel per user (the fold's contract)."""
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, s, t in rows:
        by_user.setdefault(u, []).append((s * 1_000_000, t))
    out = {}
    for u, evs in by_user.items():
        state: list[int | None] = [None] * len(steps)
        for t_us, tp in sorted(evs):
            m = sum(x is not None for x in state)
            if m >= len(steps) or tp != steps[m]:
                continue
            if m == 0:
                state[0] = t_us
            elif t_us > state[m - 1] and t_us <= state[0] + window_s * 1_000_000:
                state[m] = t_us
        out[u] = sum(x is not None for x in state)
    return out


def test_funnel_matches_python_replica(spark):
    rows = [
        # u1 completes in order
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
        # u2: purchase BEFORE click -> stops at click
        (2, 0, "view"), (2, 5, "purchase"), (2, 10, "click"),
        # u3: click outside the window
        (3, 0, "view"), (3, 5000, "click"),
        # u4: never views; clicks/purchases don't count
        (4, 0, "click"), (4, 10, "purchase"),
        # u5: same-timestamp click as the anchoring view -> strict >
        (5, 0, "view"), (5, 0, "click"), (5, 10, "click"), (5, 20, "purchase"),
        # u6: second view would open a window but anchors are not retried
        (6, 0, "view"), (6, 2000, "view"), (6, 2500, "click"),
    ]
    steps = ["view", "click", "purchase"]
    W = 1000
    ref = _py_funnel(rows, steps, W)
    got = {
        r["user_id"]: r["reached"]
        for r in funnel_steps(_ev(spark, rows), steps, window_s=W).collect()
    }
    # u4 has no funnel-relevant first step but IS present (0 reached)
    assert got == ref
    assert got[1] == 3 and got[2] == 2 and got[3] == 1
    assert got[4] == 0 and got[5] == 3 and got[6] == 1

    rep = {
        r["step"]: (r["n_users"], r["pct_of_first_q"])
        for r in funnel_report(_ev(spark, rows), steps, window_s=W).collect()
    }
    n1 = sum(1 for v in ref.values() if v >= 1)
    for i in (1, 2, 3):
        ni = sum(1 for v in ref.values() if v >= i)
        assert rep[i] == (ni, ni * RATIO_SCALE // n1)


def test_funnel_fold_matches_replica_hypothesis(spark):
    """Property: on random small event streams (random users, offsets,
    types incl. non-funnel noise and duplicate timestamps), the Spark
    fold equals the pure-Python replica for every user."""
    from hypothesis import given, settings, strategies as st

    steps = ["view", "click", "purchase"]
    ev = st.tuples(
        st.integers(min_value=1, max_value=4),           # user
        st.integers(min_value=0, max_value=50),          # offset seconds
        st.sampled_from(steps + ["error"]),              # type (+ noise)
    )

    @settings(max_examples=12, deadline=None)  # each example runs Spark
    @given(st.lists(ev, min_size=1, max_size=14))
    def check(rows):
        ref = _py_funnel(rows, steps, 20)
        got = {
            r["user_id"]: r["reached"]
            for r in funnel_steps(_ev(spark, rows), steps, window_s=20).collect()
        }
        # the pre-filter drops noise-only users entirely; everyone with
        # at least one funnel-type event is present and matches
        assert set(got) == {u for u, _, t in rows if t in steps}
        assert all(got[u] == ref[u] for u in got)

    check()


def test_funnel_input_contracts(spark):
    df = _ev(spark, [(1, 0, "view")])
    with pytest.raises(ValueError, match="steps"):
        funnel_steps(df, ["view"], window_s=10)
    with pytest.raises(ValueError, match="window_s"):
        funnel_steps(df, ["view", "click"], window_s=0)


def test_funnel_report_zero_users(spark):
    """No user reaches step 1 -> k rows of zeros, ratio 0 (no div-0)."""
    df = _ev(spark, [(1, 0, "error")])
    rep = funnel_report(df, ["view", "click"], window_s=10).collect()
    assert [(r["step"], r["n_users"], r["pct_of_first_q"]) for r in rep] == [
        (1, 0, 0),
        (2, 0, 0),
    ]


def test_cohort_retention_matrix(spark):
    rows = [
        (1, 0, "view"),                 # u1 cohort day0, active day0
        (1, 86400 + 5, "click"),        # ... and day1
        (2, 0, "view"),                 # u2 cohort day0, active day0 only
        (3, 86400, "view"),             # u3 cohort day1, active day1 + day2
        (3, 2 * 86400, "purchase"),
    ]
    got = {
        (str(r["cohort_day"]), r["day_offset"]): (
            r["n_active"],
            r["cohort_size"],
            r["retention_q"],
        )
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 2, RATIO_SCALE)
    assert got[("2024-01-01", 1)] == (1, 2, RATIO_SCALE // 2)
    assert got[("2024-01-02", 0)] == (1, 1, RATIO_SCALE)
    assert got[("2024-01-02", 1)] == (1, 1, RATIO_SCALE)
    assert len(got) == 4
    # invariants: offset 0 is always full retention; offsets never negative
    assert all(off >= 0 for _, off in got)


def test_funnel_null_ts_never_counts(spark):
    """NULL-timestamp events can neither anchor nor advance a funnel
    (review finding r12: the oracle's u1 used to COUNT a user whose
    only views were NULL-timed while the fold left reached=0 — both
    sides now pin 'NULL ts never counts')."""
    import datetime as dt

    from spectraplex_spark.operators.analytics import funnel_steps

    T0 = dt.datetime(2024, 1, 1)
    rows = [
        # u1: ONLY a NULL-ts view -> reached 0 (grouped but unfilled)
        (1, None, "view"),
        # u2: NULL-ts view plus a real journey -> the real one anchors
        (2, None, "view"), (2, 10, "view"), (2, 20, "click"),
        # u3: real view, NULL-ts click -> click can't advance
        (3, 0, "view"), (3, None, "click"),
    ]
    df = spark.createDataFrame(
        [
            (i, u, None if s is None else T0 + dt.timedelta(seconds=s), t)
            for i, (u, s, t) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp_ntz, event_type string",
    )
    got = {
        r["user_id"]: r["reached"]
        for r in funnel_steps(df, ["view", "click", "purchase"], 1000).collect()
    }
    # u1 is dropped entirely (no non-NULL events) — matching the
    # oracle's ts IS NOT NULL; u2 anchors at t=10; u3 stays at 1
    assert got == {2: 2, 3: 1}


def test_cohort_null_ts_never_counts(spark):
    """NULL-ts events produce no matrix cells: no day_offset=NULL row
    for a user with a NULL-timed event, no cohort_day=NULL row for an
    all-NULL user — the same 'NULL ts never counts' contract the funnel
    got in r12; cohort_retention was missed (r14 review finding)."""
    rows = [
        (0, 1, T0, "view"),                            # u1 cohort day0
        (1, 1, None, "click"),   # NULL-timed event: no cell
        (2, 2, None, "view"),    # u2: all NULL -> absent entirely
        (3, 3, T0 + dt.timedelta(days=1), "view"),     # u3 cohort day1
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    got = cohort_retention(df).collect()
    assert all(r["cohort_day"] is not None for r in got)
    assert all(r["day_offset"] is not None for r in got)
    cells = {(str(r["cohort_day"]), r["day_offset"]) for r in got}
    assert cells == {("2024-01-01", 0), ("2024-01-02", 0)}
