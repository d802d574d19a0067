"""The reference's own query surface, re-expressed over the driver tables.

The ``events`` table plays the bronze role (TESTDATA.md: "analog of the
bronze event feed"): ``user_id`` stands in for the tracked wallet,
``ts`` for the block time, ``value`` for the amount. Queries map 1:1 to
reference entry points (file:line cited per query). The U1 normalize
golden query runs the real pipeline on literal fixture rows and compares
against a VALUES oracle — the same vectors as the reference's unit test.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F, types as T

from spectraplex_spark.operators.normalize import normalize
from spectraplex_spark.plans.registry import query, table
from spectraplex_spark.schemas import BRONZE_SCHEMA

# THE catalog-wide grading decimal — one definition (relational.py),
# shared so a precision/scale tune can never drift the two catalog
# modules apart (r14 review finding: this was a copy-paste twin).
from spectraplex_spark.plans.relational import DEC, dec6  # noqa: E402


def _replay_scratch(tag: str, sf_dir: str) -> str:
    """Per-(entry, SF, process) scratch dir for the streaming replays,
    cleared at entry — the old mkdtemp() leaked a fresh events copy +
    checkpoint per RUN, accumulating unboundedly across grading rounds
    (r14 review finding; the ext.py _scratch_dir pattern adopted)."""
    import os
    import shutil
    import tempfile

    d = os.path.join(
        tempfile.gettempdir(),
        f"spectraplex_{tag}_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    return d


def _drain(q, timeout: int = 300) -> None:
    """availableNow drain with a LOUD timeout: awaitTermination returns
    False on timeout, and the old call sites ignored it — the partial
    sink was then read and graded while the query was still writing
    (r14 review finding)."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"streaming replay did not drain within {timeout}s — refusing "
            "to grade a partial sink"
        )


@query(
    "events_by_user",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events WHERE user_id = 7
    """,
    doc="S4 serving read (repo.rs:73-107): predicate + projection, "
    "`SELECT ... WHERE wallet_address = $1 ORDER BY timestamp`. The "
    "order-by is presentation-only (driver compare is order-insensitive); "
    "at scale the filter partition-prunes a user/date-partitioned layout.",
)
def events_by_user(spark, sf_dir):
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") == 7)
        .orderBy("ts", "event_id")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@query(
    "recent_events_topk",
    """
    SELECT event_id, ts, user_id, event_type FROM events
    ORDER BY ts DESC, event_id LIMIT 50
    """,
    doc="O3 top-K most recent (solana.rs:30 take(limit) on newest-first "
    "signatures; api/src/main.rs:75 limit 50) → TakeOrderedAndProject.",
)
def recent_events_topk(spark, sf_dir):
    return (
        table(spark, sf_dir, "events")
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(50)
        .select("event_id", "ts", "user_id", "event_type")
    )


@query(
    "user_activity_report",
    """
    SELECT user_id, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM events GROUP BY user_id, event_type
    """,
    doc="The per-wallet/per-asset report the reference schema anticipates "
    "('Index for tax calculations', init.sql:34-35): groupBy key sums — "
    "map-side partial agg then one shuffle on (user, type).",
)
def user_activity_report(spark, sf_dir):
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec6(F.col("value"))).cast("double").alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


@query(
    "running_balance_events",
    """
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6)))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_balance
    FROM events
    """,
    doc="Running balance per wallet (SURVEY §2.4/§2.5): window prefix sum, "
    "exact decimal, unique (ts, event_id) ordering.",
)
def running_balance_events(spark, sf_dir):
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        table(spark, sf_dir, "events")
        .withColumn("running_balance", F.sum(dec6(F.col("value"))).over(w).cast("double"))
        .select("user_id", "event_id", "running_balance")
    )


@query(
    "daily_rollup_events",
    """
    SELECT DATE_TRUNC('day', ts) AS day,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling-day rollup — the batch twin of the streaming windowed "
    "aggregation (SURVEY §2.9); same result as window(ts, '1 day').",
)
def daily_rollup_events(spark, sf_dir):
    return (
        table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec6(F.col("value"))).cast("double").alias("sum_value"),
        )
    )


@query(
    "dedup_union_events",
    """
    SELECT DISTINCT * FROM (
      SELECT * FROM events UNION ALL SELECT * FROM events
    ) t
    """,
    doc="The reference's ON CONFLICT DO NOTHING dedup-on-append (K1/K2, "
    "repo.rs:26,56) as union + distinct: re-ingesting the same batch "
    "yields no duplicates. (The file-sink variant with the anti-join "
    "protocol is exercised in tests/test_io.py.)",
)
def dedup_union_events(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.unionByName(ev).distinct()


# --------------------------------------------------------------------------
# U1 normalize golden parity (ignores sf_dir: literal fixture rows)
# --------------------------------------------------------------------------

_WALLET = "So1WalletAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
_OTHER = "OtherKeyBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB"
_MINT = "MintAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA1"


def _fixture_tx(pre, post, pre_tok, post_tok, meta=True):
    tx = {
        "slot": 1,
        "blockTime": 1672531200,
        "transaction": {
            "signatures": ["s"],
            "message": {
                "accountKeys": [
                    {"pubkey": _WALLET, "signer": True, "writable": True},
                    {"pubkey": _OTHER, "signer": False, "writable": True},
                ],
                "instructions": [],
                "recentBlockhash": "h",
            },
        },
        "meta": {
            "err": None,
            "fee": 5000,
            "preBalances": pre,
            "postBalances": post,
            "preTokenBalances": pre_tok,
            "postTokenBalances": post_tok,
            "logMessages": [],
            "rewards": [],
        }
        if meta
        else None,
    }
    return json.dumps(tx)


def _tok(ui, raw, idx=1, owner=_WALLET):
    return {
        "accountIndex": idx,
        "mint": _MINT,
        "owner": owner,
        "uiTokenAmount": {"uiAmount": ui, "decimals": 6, "amount": raw},
    }


_FIXTURE_BRONZE = [
    # G1: native SOL transfer → exactly -0.5 SOL
    ("b1", "u1", _WALLET, 1672531200, "sig1", "solana",
     _fixture_tx([10_000_000_000, 0], [9_500_000_000, 500_000_000], [], []), None),
    # G2: SPL delta 7.5 - 5.0 = 2.5
    ("b2", "u1", _WALLET, 1672531201, "sig2", "solana",
     _fixture_tx([1, 1], [1, 1], [_tok(5.0, "5000000")], [_tok(7.5, "7500000")]), None),
    # G3: new token account → 3.0
    ("b3", "u1", _WALLET, 1672531202, "sig3", "solana",
     _fixture_tx([1, 1], [1, 1], [], [_tok(3.0, "3000000")]), None),
    # G4: dust (5e-7 SOL) → no entry
    ("b4", "u1", _WALLET, 1672531203, "sig4", "solana",
     _fixture_tx([10_000_000_000, 0], [10_000_000_500, 0], [], []), None),
    # G5: missing meta → no entry
    ("b5", "u1", _WALLET, 1672531204, "sig5", "solana",
     _fixture_tx([], [], [], [], meta=False), None),
    # G6: wrong owner → no entry
    ("b6", "u1", _WALLET, 1672531205, "sig6", "solana",
     _fixture_tx([1, 1], [1, 1], [], [_tok(9.0, "9000000", owner=_OTHER)]), None),
    # non-solana chain → skipped entirely
    ("b7", "u1", _WALLET, 1672531206, "sig7", "ethereum",
     _fixture_tx([10_000_000_000, 0], [0, 0], [], []), None),
]


@query(
    "solana_normalize_golden",
    """
    SELECT * FROM (VALUES
      ('b1', 'SOL', CAST(-0.5 AS DOUBLE), 'transfer'),
      ('b2', 'MintAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA1',
       CAST(2.5 AS DOUBLE), 'transfer'),
      ('b3', 'MintAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA1',
       CAST(3.0 AS DOUBLE), 'transfer')
    ) AS t(transaction_id, asset_symbol, amount, entry_type)
    """,
    doc="U1 end-to-end parity: the full normalize pipeline on the golden "
    "vectors (FIXTURES.md G1-G6 + chain dispatch) against the expected "
    "silver rows — the reference's own unit-test assertion "
    "(solana_parser_test.rs:51-58) as a VALUES oracle.",
)
def solana_normalize_golden(spark, sf_dir):
    bronze = spark.createDataFrame(_FIXTURE_BRONZE, BRONZE_SCHEMA)
    silver = normalize(bronze, audit_ts=F.lit(None).cast("timestamp"))
    # The silver amount stays DECIMAL(38,18) (exact chain math); only the
    # graded projection is double (driver canonicalizes via float64).
    return silver.select(
        "transaction_id",
        "asset_symbol",
        F.col("amount").cast("double").alias("amount"),
        "entry_type",
    )


@query(
    "solana_normalize_udtf_golden",
    """
    SELECT * FROM (VALUES
      ('b1', 'SOL', CAST(-0.5 AS DOUBLE)),
      ('b2', 'MintAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA1',
       CAST(2.5 AS DOUBLE)),
      ('b3', 'MintAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA1',
       CAST(3.0 AS DOUBLE))
    ) AS t(transaction_id, asset_symbol, amount)
    """,
    doc="U1's Spark 4 Python UDTF twin (the reference's row->N-rows "
    "table-function shape taken literally) on the same golden vectors — "
    "an independent dict-walking implementation hash-matched against "
    "the same VALUES oracle as the expression pipeline. API-surface "
    "demo; the expression form stays the hot path.",
)
def solana_normalize_udtf_golden(spark, sf_dir):
    from spectraplex_spark.operators.normalize_udtf import normalize_entries_udtf

    bronze = spark.createDataFrame(_FIXTURE_BRONZE, BRONZE_SCHEMA)
    return normalize_entries_udtf(bronze).select(
        "transaction_id",
        "asset_symbol",
        F.col("amount").cast("double").alias("amount"),
    )


@query(
    "streaming_window_rollup",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    HAVING CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY
             <= (SELECT max(ts) FROM events)
    """,
    doc="S2 streaming semantics END-TO-END inside the correctness gate: "
    "replays the events table through a real file-source stream "
    "(availableNow micro-batches) into a watermarked tumbling-day "
    "aggregate, collecting the append-mode output. The oracle is the "
    "batch equivalent restricted to watermark-closed windows (append "
    "mode emits a window only once its end <= the final watermark, i.e. "
    "the max event time with a 0s delay — the last open day never "
    "emits). Exact decimal sums make stream/batch parity bit-for-bit.",
)
def streaming_window_rollup(spark, sf_dir):
    import tempfile

    from spectraplex_spark.streaming.pipeline import windowed_event_counts

    events = table(spark, sf_dir, "events")
    d = _replay_scratch("stream", sf_dir)
    events.repartition(4).write.parquet(f"{d}/src")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{d}/src")
    )
    out = windowed_event_counts(stream, "1 day", "0 seconds")
    q = (
        out.drop("window_end")
        .writeStream.format("parquet")
        .option("path", f"{d}/out")
        .option("checkpointLocation", f"{d}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    out_df = spark.read.parquet(f"{d}/out")
    # The streamed state keeps exact decimal sums; grade the double image.
    return out_df.withColumn("sum_value", F.col("sum_value").cast("double"))


@query(
    "stream_interval_join_replay",
    """
    SELECT l.event_id AS click_id, r.event_id AS error_id,
           l.user_id AS user_id,
           CAST(date_diff('second', l.ts, r.ts) AS BIGINT) AS lag_s
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'click' AND r.event_type = 'error'
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 4 HOUR
    """,
    doc="S2/§2.9 stream-STREAM inner join, replayed end-to-end: the "
    "click feed and the error feed run as two real file-source "
    "streams through Spark's symmetric-hash stream-stream join with "
    "an event-time interval bound (error within 4h after the click, "
    "same user) — the correlation the reference's tx/account-update "
    "gRPC families would need (solana_grpc.rs:19-23 stubs both). Both "
    "sides are watermarked; the bound plus the right watermark is "
    "what lets Spark EVICT join state — the property that keeps a "
    "forever-running join bounded (state ~ rate x horizon, never "
    "stream length). Replay is one availableNow batch so the match "
    "set is exactly the batch join (multi-batch watermark progression "
    "and eviction-loss behavior are pytest-covered with ordered "
    "arrival). All-integer output grades exactly.",
)
def stream_interval_join_replay(spark, sf_dir):
    import tempfile

    from spectraplex_spark.streaming.joins import stream_interval_join

    events = table(spark, sf_dir, "events")
    d = _replay_scratch("ssj", sf_dir)
    events.coalesce(1).write.parquet(f"{d}/src")
    src = lambda: spark.readStream.schema(events.schema).parquet(f"{d}/src")  # noqa: E731
    clicks = src().filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    errors = src().filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    joined = stream_interval_join(
        clicks, errors, on="user_id", upper="4 hours", right_watermark="5 hours"
    )
    out = joined.select(
        "click_id",
        "error_id",
        "user_id",
        (F.unix_timestamp("ts_right") - F.unix_timestamp("ts")).cast("long").alias("lag_s"),
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{d}/out")
        .option("checkpointLocation", f"{d}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.read.parquet(f"{d}/out")


@query(
    "stream_dedup_replay",
    """
    SELECT event_id, user_id, event_type,
           CAST(value AS DOUBLE) AS value
    FROM events
    """,
    doc="K1/§2.9 exactly-once landing on an at-least-once transport: "
    "the events feed is replayed DUPLICATED (every row delivered "
    "twice, the retry/redelivery mode) through "
    "dropDuplicatesWithinWatermark on the event id — state holds only "
    "a watermark-deep key set (bounded by rate x horizon; plain "
    "dropDuplicates on a stream grows forever), which is the "
    "streaming twin of the batch idempotent_append anti-join. The "
    "deduped stream must equal the original table exactly — the same "
    "guarantee the bronze sink's replay test pins batch-side.",
)
def stream_dedup_replay(spark, sf_dir):
    import tempfile

    from spectraplex_spark.streaming.joins import stream_dedup_within_watermark

    events = table(spark, sf_dir, "events")
    d = _replay_scratch("sdd", sf_dir)
    # deliver every row twice (two identical files, one batch)
    events.coalesce(1).write.parquet(f"{d}/src")
    events.coalesce(1).write.mode("append").parquet(f"{d}/src")
    stream = spark.readStream.schema(events.schema).parquet(f"{d}/src")
    deduped = stream_dedup_within_watermark(stream, ["event_id"], watermark="1 hour")
    out = deduped.select("event_id", "user_id", "event_type", F.col("value").cast("double"))
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{d}/out")
        .option("checkpointLocation", f"{d}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.read.parquet(f"{d}/out")


@query(
    "asof_price_enrichment",
    """
    WITH prices AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS pday,
             SUM(CAST(value AS DECIMAL(38,6))) AS price
      FROM events GROUP BY 1, 2
    )
    SELECT e.event_id, e.event_type,
           CAST(p.price AS DOUBLE) AS asof_price, p.pday AS asof_pday
    FROM events e
    ASOF LEFT JOIN prices p
      ON e.event_type = p.event_type AND e.ts >= p.pday
    """,
    doc="As-of join (the operator Spark lacks natively): enrich each "
    "event with the latest prior daily price per type — the fiat_value "
    "enrichment the reference declares but never populates "
    "(models.rs:43). Implementation is union + carry-forward window "
    "(ONE shuffle on the key, no range-join explosion); oracle is "
    "DuckDB's native ASOF JOIN.",
)
def asof_price_enrichment(spark, sf_dir):
    from spectraplex_spark.operators.temporal import asof_join

    events = table(spark, sf_dir, "events")
    prices = events.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("pday")
    ).agg(F.sum(dec6(F.col("value"))).alias("price"))
    out = asof_join(
        events.select("event_id", "event_type", "ts"),
        prices,
        key="event_type",
        left_ts="ts",
        right_ts="pday",
        value_cols=["price", "pday"],
    )
    return out.select(
        "event_id",
        "event_type",
        F.col("asof_price").cast("double").alias("asof_price"),
        "asof_pday",
    )


@query(
    "range_join_close_pairs",
    """
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           a.ts AS ts_a, b.ts AS ts_b
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
    """,
    doc="Bounded range self-join: event pairs on the same user within "
    "1 hour. Implementation buckets time into epsilon cells and joins "
    "only adjacent cells (candidates bounded by local density, not n²); "
    "oracle is the plain inequality join.",
)
def range_join_close_pairs(spark, sf_dir):
    from spectraplex_spark.operators.temporal import close_pairs

    events = table(spark, sf_dir, "events")
    return close_pairs(events, key="user_id", ts="ts", id_col="event_id", epsilon_seconds=3600)


@query(
    "session_stats",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts)) > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY 1, 2
    """,
    doc="Sessionization (30-min gap): lag + cumulative gap-break count — "
    "one shuffle on the key. This batch form is the oracle for the "
    "stateful streaming twin (applyInPandasWithState).",
)
def session_stats(spark, sf_dir):
    from spectraplex_spark.operators.temporal import sessionize

    events = table(spark, sf_dir, "events")
    out = sessionize(events, key="user_id", ts="ts", gap_seconds=1800)
    return out.select(
        "user_id",
        F.col("session_id").cast("bigint").alias("session_id"),
        "session_start",
        "session_end",
        "n_events",
    )


_NT_WALLET = "W" * 44
# Closed-form replay of the synthetic-bronze normalize output: the
# generated tx bodies are analytic in the row index i, so every silver
# column — including the sha256 content id over the exact decimal
# string rendering — reconstructs in SQL. Row count ties to the events
# table (1_000_000×sf == count(events) at every shipped SF), keeping
# one static oracle string sf-faithful. SOL delta is exactly -1; the
# SPL delta is (i+2_500_000)/1e6 rendered at decimal(38,18) scale.
_NT_ORACLE = f"""
    WITH i AS (SELECT unnest(range(0,
        (SELECT GREATEST(1000, count(*)) FROM events))) AS i),
    e AS (
      SELECT i, 'SOL' AS asset_symbol,
             '-1.000000000000000000' AS amt_str, '-1' AS ord_str
      FROM i
      UNION ALL
      SELECT i, 'MintT',
             CAST((i + 2500000) // 1000000 AS VARCHAR) || '.' ||
               lpad(CAST((i + 2500000) % 1000000 AS VARCHAR), 6, '0') ||
               repeat('0', 12),
             '1'
      FROM i
    )
    SELECT sha256('sig' || i || '|' || '{_NT_WALLET}' || '|' ||
                  asset_symbol || '|' || amt_str || '|' || ord_str) AS id,
           'b' || i AS transaction_id,
           'u' AS user_id,
           '{_NT_WALLET}' AS wallet_address,
           asset_symbol,
           CAST(amt_str AS DOUBLE) AS amount,
           'transfer' AS entry_type,
           CAST(NULL AS DOUBLE) AS fiat_value,
           CAST(NULL AS TIMESTAMP) AS created_at
    FROM e
    """


@query(
    "normalize_throughput",
    _NT_ORACLE,
    bench=True,
    doc="U1 normalize throughput: generates sf-scaled synthetic bronze "
    "rows (solana-shaped raw_metadata built JVM-side via format_string — "
    "no Python row loop) and runs the full normalize pipeline. This is "
    "the head-to-head with the reference's core operation, which "
    "processes one row per Postgres INSERT round-trip "
    "(repo.rs:14-38): the DataFrame pipeline normalizes ~100k tx/s/node "
    "vs the reference's network-bound hundreds/s. ORACLE: the synthetic "
    "bronze is analytic in the row index, so the FULL silver output — "
    "sha256 content ids over exact decimal strings included — is "
    "replayed closed-form in SQL (no rows-only compromise).",
)
def normalize_throughput(spark, sf_dir):
    # Row count tied to the SAME source of truth as the oracle's
    # GREATEST(1000, count(*)) FROM events — a bounded count action,
    # not float-parsing the directory basename (r14 review finding:
    # '/data/smoke' crashed before the query ran, and rounding of
    # 1_000_000·sf could disagree with the actual events count by one
    # row at unshipped SFs → a hash-parity failure).
    n = max(1000, table(spark, sf_dir, "events").count())
    wallet = _NT_WALLET  # the oracle string interpolates THIS constant
    other = "O" * 44
    raw = F.format_string(
        '{"slot": %d, "blockTime": 1672531200, '
        '"transaction": {"signatures": ["s%d"], "message": {"accountKeys": '
        '[{"pubkey": "' + wallet + '", "signer": true, "writable": true}, '
        '{"pubkey": "' + other + '", "signer": false, "writable": true}], '
        '"instructions": [], "recentBlockhash": "h"}}, '
        '"meta": {"err": null, "fee": 5000, '
        '"preBalances": [%d, 0], "postBalances": [%d, 1000000], '
        '"preTokenBalances": [], "postTokenBalances": '
        '[{"accountIndex": 1, "mint": "MintT", "owner": "' + wallet + '", '
        '"uiTokenAmount": {"uiAmount": 2.5, "decimals": 6, "amount": "%d"}}], '
        '"logMessages": [], "rewards": []}}',
        F.col("id"),
        F.col("id"),
        F.col("id") + 10_000_000_000,
        F.col("id") + 9_000_000_000,
        F.col("id") + 2_500_000,
    )
    bronze = (
        spark.range(n)
        .select(
            F.concat(F.lit("b"), F.col("id")).alias("id"),
            F.lit("u").alias("user_id"),
            F.lit(wallet).alias("wallet_address"),
            (F.lit(1672531200) + F.col("id")).alias("timestamp"),
            F.concat(F.lit("sig"), F.col("id")).alias("tx_hash"),
            F.lit("solana").alias("chain"),
            raw.alias("raw_metadata"),
            F.lit(None).cast("timestamp").alias("created_at"),
        )
    )
    for f in BRONZE_SCHEMA.fields:
        bronze = bronze.withColumn(f.name, F.col(f.name).cast(f.dataType))
    silver = normalize(bronze, audit_ts=F.lit(None).cast("timestamp"))
    # grading projection only (catalog convention: decimal outputs go to
    # the driver as DOUBLE — the pandas canonicalizer reads DuckDB
    # decimals as float64); the id hash is computed over the EXACT
    # decimal(38,18) strings upstream, so precision is certified there
    return silver.withColumn("amount", F.col("amount").cast("double")).withColumn(
        "fiat_value", F.col("fiat_value").cast("double")
    )


@query(
    "session_window_builtin",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts)) > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    doc="Spark's native session_window (gap-based session aggregation — "
    "the 'hypertable'-style time grouping) cross-checked against the "
    "window-based sessionization: session_window.end = last event + gap "
    "by definition, which the oracle reproduces.",
)
def session_window_builtin(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "sliding_window_rollup",
    """
    SELECT time_bucket(INTERVAL 12 HOUR, ts) - offs.o AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events
    CROSS JOIN (SELECT UNNEST([INTERVAL 0 HOUR, INTERVAL 12 HOUR]) AS o) offs
    WHERE ts >= time_bucket(INTERVAL 12 HOUR, ts) - offs.o
      AND ts <  time_bucket(INTERVAL 12 HOUR, ts) - offs.o + INTERVAL 24 HOUR
    GROUP BY 1
    """,
    doc="Sliding (hopping) window rollup: 24h windows every 12h — each "
    "event lands in 2 windows (Spark Expand node, one aggregate). The "
    "oracle replicates the epoch-aligned window grid with time_bucket + "
    "offset unnest.",
)
def sliding_window_rollup(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "24 hours", "12 hours"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec6(F.col("value"))).cast("double").alias("sum_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n", "sum_value")
    )


@query(
    "backfill_wallet_migration",
    """
    SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o.o_custkey AS BIGINT) AS o_custkey,
           o.o_orderstatus,
           CAST(c.c_nationkey AS BIGINT) AS backfilled_nationkey
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="The reference's add-column + UPDATE..FROM backfill migration "
    "(migrations/20251219010000_add_wallet_to_ledger.sql:2-12) as an "
    "engine op: orders plays ledger_entries, customer plays "
    "transactions, c_nationkey plays the backfilled wallet_address. "
    "LEFT-join enrich (UPDATE..FROM leaves unmatched rows NULL) with "
    "the SET NOT NULL validation riding the same join; the dimension "
    "side is broadcast, so the backfill costs zero shuffle on the fact "
    "table.",
)
def backfill_wallet_migration(spark, sf_dir):
    from spectraplex_spark.operators.migrate import add_column_with_backfill

    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "o_orderstatus",
    )
    customer = table(spark, sf_dir, "customer")
    out = add_column_with_backfill(
        orders,
        customer,
        on="o_custkey",
        column="c_nationkey",
        source_key="c_custkey",
        broadcast_source=True,
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("c_nationkey").cast("long").alias("backfilled_nationkey"),
    )


def _outer_join_replay(spark, sf_dir, how):
    """Shared sentinel-replay scaffolding for the outer stream-stream
    interval join entries: time-ordered real batches (mtime-pinned
    files, maxFilesPerTrigger=1), then two sentinel batches 12h/13h
    past the stream's end on BOTH sides — sentinel 1 advances the
    global watermark beyond every real row's close point (left rows
    close at ts+4h, right rows at ts), sentinel 2 is the flush trigger
    that emits the closed unmatched set. Sentinels carry negative user
    ids and are filtered at read-back."""
    import os
    import tempfile
    import time as _time

    from spectraplex_spark.streaming.joins import stream_interval_join

    events = table(spark, sf_dir, "events")
    d = _replay_scratch("slj", sf_dir)
    src_dir = f"{d}/src"
    bounds = events.selectExpr("min(ts) AS lo", "max(ts) AS hi").head()
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo) / 3
    base = _time.time() - 1000

    def _pin(mtime):
        # FileStreamSource orders by modification time: pin each batch's
        # files so arrival order == event-time order
        for f in os.listdir(src_dir):
            if f.endswith(".parquet"):
                full = os.path.join(src_dir, f)
                if os.path.getmtime(full) > mtime:
                    os.utime(full, (mtime, mtime))

    cuts = [lo + span, lo + 2 * span]
    parts = [
        events.filter(F.col("ts") <= F.lit(cuts[0])),
        events.filter((F.col("ts") > F.lit(cuts[0])) & (F.col("ts") <= F.lit(cuts[1]))),
        events.filter(F.col("ts") > F.lit(cuts[1])),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("append").parquet(src_dir)
        _pin(base + 10 * i)
    one = events.limit(1)
    for j, hrs in enumerate((12, 13)):
        s = one.withColumn("ts", F.lit(hi) + F.expr(f"INTERVAL {hrs} HOURS"))
        pair = s.withColumn("user_id", F.lit(-1).cast("long")).withColumn(
            "event_type", F.lit("click")
        ).unionByName(
            s.withColumn("user_id", F.lit(-2).cast("long")).withColumn(
                "event_type", F.lit("error")
            )
        )
        pair.coalesce(1).write.mode("append").parquet(src_dir)
        _pin(base + 40 + 10 * j)

    schema = events.schema
    src = lambda: spark.readStream.schema(schema).option(  # noqa: E731
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    clicks = src().filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    errors = src().filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    joined = stream_interval_join(
        clicks,
        errors,
        on="user_id",
        upper="4 hours",
        right_watermark="5 hours",
        how=how,
    )
    # Do NOT filter sentinels here: a deterministic predicate on the
    # joined stream pushes below the watermark assignment into the
    # SCAN, so the sentinel rows would be pruned before ever advancing
    # the watermark (observed: wm frozen, zero unmatched emissions for
    # the stream tail). No sentinel can reach the sink anyway — the
    # click sentinel is the stream's newest row so its own close point
    # is never passed, and right-side rows don't emit in left-outer —
    # but the read-back filter below stays as a defensive invariant.
    out = joined.select(
        "click_id",
        "error_id",
        "user_id",
        (F.unix_timestamp("ts_right") - F.unix_timestamp("ts")).cast("long").alias("lag_s"),
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{d}/out")
        .option("checkpointLocation", f"{d}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    # Sentinel guard only: NULL-keyed rows are LEGAL output (a NULL join
    # key never matches, so the batch oracle emits them NULL-padded) —
    # `user_id >= 0` would silently drop them along with the sentinels
    # because NULL >= 0 is NULL (review finding r12; fixtures carry no
    # NULL users, so this is a contract pin, not a result change).
    return spark.read.parquet(f"{d}/out").filter(
        F.col("user_id").isNull() | ~F.col("user_id").isin(-1, -2)
    )


@query(
    "stream_left_join_replay",
    """
    SELECT l.event_id AS click_id, r.event_id AS error_id,
           l.user_id AS user_id,
           CAST(date_diff('second', l.ts, r.ts) AS BIGINT) AS lag_s
    FROM events l LEFT JOIN events r
      ON l.user_id = r.user_id
     AND r.event_type = 'error'
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 4 HOUR
    WHERE l.event_type = 'click'
    """,
    doc="S2/§2.9 stream-stream LEFT OUTER interval join — the "
    "late-accounting mode (clicks that never drew an error within the "
    "4h horizon emit NULL-padded): Spark's symmetric hash join emits "
    "an unmatched left row only after the GLOBAL watermark (min of "
    "both inputs) passes left_ts + upper, and only in a trigger AFTER "
    "that advance — the _outer_join_replay sentinel machinery. The "
    "oracle is the plain batch LEFT JOIN — agreement certifies that "
    "every real unmatched row closed and emitted exactly once, and no "
    "sentinel leaked. All-integer/null output grades exactly.",
)
def stream_left_join_replay(spark, sf_dir):
    return _outer_join_replay(spark, sf_dir, "left_outer")


@query(
    "stream_full_join_replay",
    """
    SELECT l.event_id AS click_id, r.event_id AS error_id,
           COALESCE(l.user_id, r.user_id) AS user_id,
           CAST(date_diff('second', l.ts, r.ts) AS BIGINT) AS lag_s
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    FULL JOIN (SELECT * FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 4 HOUR
    """,
    doc="S2/§2.9 stream-stream FULL OUTER interval join — both "
    "late-accounting directions at once (clicks that never drew an "
    "error AND errors no click explains, each NULL-padded): completes "
    "the four stream-stream modes Spark's symmetric hash join "
    "supports. Left rows close at ts+4h, right rows at ts; the "
    "_outer_join_replay sentinels advance the global watermark past "
    "both close-point families, and the flush trigger emits the "
    "closed unmatched set from BOTH state stores. The join key of an "
    "unmatched right row arrives on the right side only, so the "
    "operator coalesces the two key columns — the oracle's "
    "COALESCE(l.user_id, r.user_id) certifies that, and the batch "
    "FULL JOIN certifies exactly-once emission of every unmatched row "
    "on either side. All-integer/null output grades exactly.",
)
def stream_full_join_replay(spark, sf_dir):
    return _outer_join_replay(spark, sf_dir, "full_outer")


@query(
    "stream_right_join_replay",
    """
    SELECT l.event_id AS click_id, r.event_id AS error_id,
           COALESCE(l.user_id, r.user_id) AS user_id,
           CAST(date_diff('second', l.ts, r.ts) AS BIGINT) AS lag_s
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    RIGHT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 4 HOUR
    """,
    doc="S2/§2.9 stream-stream RIGHT OUTER interval join — the mirror "
    "late-accounting direction (errors no click explains, NULL-padded; "
    "matched clicks emit normally, unmatched clicks drop): with this "
    "entry all four Spark stream-stream modes are driver-graded. "
    "Right rows close at their own ts (lower bound 0), so the "
    "_outer_join_replay sentinels flush them; the coalesced key "
    "contract is certified by the oracle's COALESCE.",
)
def stream_right_join_replay(spark, sf_dir):
    return _outer_join_replay(spark, sf_dir, "right_outer")
