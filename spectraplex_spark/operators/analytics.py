"""Event-funnel and cohort-retention analytics — the two classic
event-analytics reports (ClickHouse ``windowFunnel`` / every product-
analytics engine's retention matrix) over the ``events`` stream.

Funnel semantics (``funnel_steps``): per user, step i is reached at the
EARLIEST event of type ``steps[i]`` that is STRICTLY after step i−1's
time and within ``window_s`` of step 1's time (the windowFunnel
contract; greedy-earliest — the first occurrence of step 1 anchors the
window, later anchors are not retried, documented like ClickHouse's
default mode).  Implemented as ONE groupBy(user) shuffle:

  1. events are pre-filtered to the funnel's event types (the funnel
     never reads irrelevant rows — at 100 TB this is the predicate
     that makes per-user lists bounded);
  2. per user, ``sort_array(collect_list(struct(ts_us, type)))`` then a
     single HOF fold advances a k-slot state array (slot i = step i's
     timestamp in BIGINT micros; the state is always a filled PREFIX,
     so the next unmatched step is just the filled count) — zero
     Python, zero extra shuffles, all integer arithmetic;
  3. the per-user reach count aggregates into the per-step report with
     conversion ratios on the 10^-6 integer grid (exact BIGINT floor
     division on both engines).

Per-user collected lists hold only funnel-type events inside one
user's history — bounded by per-user activity, the same contract every
sessionization pass in this repo documents (streaming/sessions.py).

Cohort retention (``cohort_retention``): cohort = the user's first
activity day; the matrix counts distinct active users per (cohort_day,
day_offset) with the cohort's size and an integer-grid retention
ratio.  Two honest shuffles — the per-user first-day aggregate and the
(cohort, offset) distinct-count — both keyed and partial-aggregated;
the user→cohort join co-partitions on user_id with the first
aggregate's output (never broadcast: user cardinality scales with the
corpus).

Reference surface: the reference has per-wallet ledger reads only
(api/src/main.rs routes); funnel/cohort are the [EXT] §2.11 analytics
the events table exists to exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Conversion/retention ratio grid (10^-6): exact floor on both engines.
RATIO_SCALE = 10**6


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    window_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel state: (user, reached INT, step times array).

    ``reached`` = number of funnel steps completed in order (0..k);
    ``step_ts_us`` = the BIGINT-micros timestamp of each completed step
    (filled prefix, NULL after).  See module docstring for semantics.
    """
    if len(steps) < 2:
        raise ValueError(f"funnel_steps: need >= 2 steps, got {steps!r}")
    if window_s <= 0:
        raise ValueError(f"funnel_steps: window_s must be > 0, got {window_s}")
    k = len(steps)
    w_us = window_s * 1_000_000
    steps_lit = F.array(*[F.lit(s) for s in steps])
    evs = (
        # predicates BEFORE the shuffle; NULL-ts events can never fill a
        # slot (a NULL time neither anchors nor passes the strict-after
        # check), so dropping them here is result-identical, keeps them
        # out of the exchange, and pins the oracle's ts IS NOT NULL
        # contract for users whose ONLY step-1 events are NULL-timed
        # (review finding r12)
        df.filter(F.col(type_col).isin(steps) & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("user_id"),
            F.struct(
                # events.ts is TIMESTAMP_NTZ; under the repo's pinned UTC
                # session (session.py) the cast is the identity instant,
                # matching the oracle's epoch_us on the same wallclock
                F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
                F.col(type_col).alias("tp"),
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("e")).alias("evs"))
    )
    init = F.expr(f"array_repeat(CAST(NULL AS BIGINT), {k})")

    def fold(st, e):
        # the state is a filled prefix: next unmatched step index =
        # count of non-null slots (0-based).  All array reads go through
        # F.get (0-based, null-safe): element_at THROWS on out-of-range
        # under ANSI mode, and relying on `m < k` to short-circuit the
        # conjunction would break the moment the optimizer reorders the
        # predicates — a NULL from F.get just makes `ok` non-true.
        m = F.size(F.filter(st, lambda x: x.isNotNull()))
        ok = (
            (m < k)
            & (e["tp"] == F.get(steps_lit, m))
            & F.when(m == 0, F.lit(True)).otherwise(
                (e["t"] > F.get(st, m - 1))
                & (e["t"] <= F.get(st, 0) + F.lit(w_us))
            )
        )
        return F.when(
            ok,
            F.transform(
                st, lambda x, j: F.when(j == m, e["t"]).otherwise(x)
            ),
        ).otherwise(st)

    state = F.aggregate(F.col("evs"), init, fold)
    return evs.select(
        "user_id",
        state.alias("step_ts_us"),
    ).withColumn(
        "reached",
        F.size(F.filter(F.col("step_ts_us"), lambda x: x.isNotNull())).cast("int"),
    )


def funnel_report(
    df: DataFrame,
    steps: list[str],
    window_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The per-step funnel report: ``step`` (1-based), ``event_type``,
    ``n_users`` (users reaching the step), ``pct_of_first_q`` (ratio to
    step 1 on the 10^-6 grid; step 1 reports the grid constant).
    Bounded output (k rows)."""
    per_user = funnel_steps(df, steps, window_s, user_col, ts_col, type_col)
    spark = df.sparkSession
    steps_df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, event_type string"
    )
    # sequence(1, 0) DESCENDS in Spark ([1, 0]) — guard reached=0 users
    # out or they'd leak into step 1 (the documented sequence trap)
    reach_steps = F.when(
        F.col("reached") >= 1, F.sequence(F.lit(1), F.col("reached"))
    ).otherwise(F.expr("array()").cast("array<int>"))
    counts = (
        per_user.select(F.explode(reach_steps).alias("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    first = F.max(F.when(F.col("step") == 1, F.col("n_users")))
    return (
        steps_df.join(counts, "step", "left")
        .na.fill({"n_users": 0})
        # k-row frame: the global window is bounded by construction
        .withColumn("_n1", first.over(Window.partitionBy()))
        .select(
            "step",
            "event_type",
            F.col("n_users").cast("long").alias("n_users"),
            F.expr(
                f"CAST(CASE WHEN _n1 > 0 THEN (n_users * {RATIO_SCALE}) div _n1 "
                f"ELSE 0 END AS BIGINT)"
            ).alias("pct_of_first_q"),
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-granularity cohort retention matrix: ``cohort_day`` (the
    user's first activity day), ``day_offset`` (0..), ``n_active``
    (distinct cohort users active that day), ``cohort_size``,
    ``retention_q`` (n_active·10^6 div cohort_size — exact integer).

    Output is bounded by (#cohort days × #offsets), never by users.

    Cohort sizes come from the matrix itself: every user is active on
    their own first day, so ``cohort_size == n_active`` at offset 0 —
    deriving it there (a broadcast join of the bounded matrix) instead
    of re-aggregating the per-user frame saves a full second corpus
    scan (the plan-audit finding: an unshared ``firsts`` is otherwise
    recomputed per consumer, the Catalyst no-CSE rule)."""
    # NULL-ts events can anchor nothing and count toward no day: without
    # this prefilter a user's NULL-timed event groups as day_offset=NULL
    # (datediff(NULL,·) survives groupBy as a NULL grouping value) and
    # an all-NULL user emits a cohort_day=NULL row — bogus matrix cells
    # no ts-IS-NOT-NULL oracle reproduces.  The funnel sibling got this
    # exact prefilter in r12 (line ~78); cohort_retention was missed
    # (r14 review finding).
    df = df.filter(F.col(ts_col).isNotNull())
    firsts = (
        df.groupBy(F.col(user_col).alias("user_id"))
        .agg(F.min(F.to_date(F.col(ts_col))).alias("cohort_day"))
    )
    active = (
        df.select(F.col(user_col).alias("user_id"), F.to_date(F.col(ts_col)).alias("d"))
        .join(firsts, "user_id")  # co-partitioned on user_id, never broadcast
        .groupBy(
            "cohort_day",
            F.datediff(F.col("d"), F.col("cohort_day")).cast("int").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )
    # the matrix is bounded (days × offsets) — materialize it once so
    # the sizes branch and the join both read the blocks instead of
    # re-running the corpus pipeline (Catalyst does not CSE shared
    # subplans; the lineage_truncate discipline)
    from spectraplex_spark.operators.components import lineage_truncate

    active = lineage_truncate(active)
    sizes = active.filter(F.col("day_offset") == 0).select(
        "cohort_day", F.col("n_active").alias("cohort_size")
    )
    return (
        active.join(F.broadcast(sizes), "cohort_day")  # bounded: one row/day
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            F.expr(f"CAST((n_active * {RATIO_SCALE}) div cohort_size AS BIGINT)").alias(
                "retention_q"
            ),
        )
    )
