"""[EXT] LLM-data-pipeline query catalog entries (SURVEY §2.11): dedup,
text analysis, similarity search, multimodal — over the driver's
``documents``/``embeddings`` tables.

SQL-expressible ops carry full DuckDB oracles (note DuckDB's
regexp_replace needs the 'g' flag; Spark replaces globally by default).
Genuinely non-SQL ops (minhash/simhash/LSH — xxhash64 has no DuckDB
twin) are registered without an oracle → driver records rows-only.
"""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from spectraplex_spark.operators import dedup as D
from spectraplex_spark.operators import multimodal as M
from spectraplex_spark.operators import pq as PQ
from spectraplex_spark.operators import simsearch as S
from spectraplex_spark.operators import textops as X
from spectraplex_spark.plans.registry import query, table

# DuckDB twin of textops.normalized().  NOTE the explicit character
# class: RE2's \s is [ \t\n\f\r] (NO vertical tab) while Java/Spark's
# default \s is [ \t\n\x0b\f\r] — spelling the Java class out keeps the
# twins identical on \x0b-bearing text (review finding, r12).
_NORM_SQL = "trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))"
# DuckDB twin of textops.tokens() → list of non-empty whitespace tokens
_TOKENS_SQL = f"list_filter(string_split({_NORM_SQL}, ' '), t -> t <> '')"


@query(
    "dedup_exact_docs",
    f"""
    SELECT md5({_NORM_SQL}) AS fp,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS representative
    FROM documents
    GROUP BY 1
    """,
    bench=True,
    doc="E1 exact dedup: group on the 16-byte normalized-text fingerprint "
    "(only the hash shuffles, never the text), min-id representative.",
)
def dedup_exact_docs(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy(X.fingerprint(F.col("text")).alias("fp"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("representative"),
        )
    )


@query(
    "doc_fingerprints",
    f"SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents",
    doc="E4 document fingerprinting (md5 of canonical text form).",
)
def doc_fingerprints(spark, sf_dir):
    return table(spark, sf_dir, "documents").select(
        "doc_id", X.fingerprint(F.col("text")).alias("fp")
    )


@query(
    "text_token_stats",
    f"""
    SELECT doc_id,
           CAST(len({_TOKENS_SQL}) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{X.BPE_RE}')) AS INTEGER) AS n_bpe_tokens,
           CAST(LENGTH(text) AS INTEGER) AS n_chars
    FROM documents
    """,
    doc="E4 token counting: whitespace tokens + BPE-ish regex tokens "
    "(letter runs / digits / punctuation) — expression-only, no UDF.",
)
def text_token_stats(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.token_count(F.col("text")).cast("int").alias("n_tokens"),
        X.bpe_token_count(F.col("text")).cast("int").alias("n_bpe_tokens"),
        F.length("text").cast("int").alias("n_chars"),
    )


def _stop_count_sql(lang: str) -> str:
    stops = ", ".join(f"'{s}'" for s in X.STOPWORDS[lang])
    return f"len(list_filter({_TOKENS_SQL}, t -> list_contains([{stops}], t)))"


@query(
    "lang_quality_report",
    f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len({_TOKENS_SQL})) AS BIGINT) AS sum_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]'))) AS BIGINT) AS sum_punct,
           CAST(SUM(CASE WHEN (
                  (CASE WHEN len({_TOKENS_SQL}) BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END)
                + (CASE WHEN len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) < 0.3 * LENGTH(text) THEN 0.25 ELSE 0.0 END)
                + (CASE WHEN {_stop_count_sql('en')} > 0 THEN 0.25 ELSE 0.0 END)
               ) >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok
    FROM documents GROUP BY lang
    """,
    doc="E4 quality scoring report per language: token/punctuation "
    "volumes and the count of docs passing the heuristic quality bar "
    "(integer outputs → engine-exact).",
)
def lang_quality_report(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(X.token_count(t)).cast("bigint").alias("sum_tokens"),
        F.sum(F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0)))
        .cast("bigint")
        .alias("sum_punct"),
        F.sum(F.when(X.quality_score(t) >= 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_quality_ok"),
    )


def _lang_id_oracle() -> str:
    cnt = {lang: _stop_count_sql(lang) for lang in X.STOPWORDS}
    m = f"GREATEST({cnt['en']}, {cnt['es']}, {cnt['fr']}, {cnt['de']})"
    return f"""
    SELECT lang_detected, COUNT(*) AS n FROM (
      SELECT CASE
        WHEN {m} = 0 THEN 'und'
        WHEN {cnt['en']} = {m} THEN 'en'
        WHEN {cnt['es']} = {m} THEN 'es'
        WHEN {cnt['fr']} = {m} THEN 'fr'
        ELSE 'de' END AS lang_detected
      FROM documents) t
    GROUP BY lang_detected
    """


@query(
    "lang_id_distribution",
    _lang_id_oracle(),
    doc="E4 language-ID heuristic (stopword argmax, ties by declaration "
    "order, no hits → 'und') — distribution over the corpus.",
)
def lang_id_distribution(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(X.detect_language(F.col("text")).alias("lang_detected"))
        .groupBy("lang_detected")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_pii_redaction",
    r"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
             '\+?[0-9][0-9()\-\s]{7,}[0-9]', '<PHONE>', 'g')) AS redacted_md5,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text,
             '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS INT) AS n_ips,
           CAST(len(regexp_extract_all(text,
             '\+?[0-9][0-9()\-\s]{7,}[0-9]')) AS INT) AS n_phones
    FROM documents
    """,
    doc="E4 PII scrub: email/IPv4/phone regexp_replace (shared Java/RE2 "
    "regex subset — no lookarounds) + audit match counts; the oracle "
    "hash-verifies the md5 of the fully redacted text. Narrow map "
    "stage, zero shuffle; the production NER scrubber slots in as a "
    "pandas_udf with this signature.",
)
def text_pii_redaction(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    n_emails, n_ips, n_phones = X.pii_counts(t)
    return docs.select(
        "doc_id",
        F.md5(X.redact_pii(t)).alias("redacted_md5"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )


@query(
    "text_markup_strip",
    r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(
             regexp_replace(text, '<[^>]+>', ' ', 'g')), '\s+', ' ', 'g'))
           ) AS stripped_md5
    FROM documents
    """,
    doc="E4 boilerplate first pass: drop HTML/XML-ish tags, re-normalize "
    "whitespace; oracle hash-verifies the md5 of the stripped text.",
)
def text_markup_strip(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.md5(X.strip_markup(F.col("text"))).alias("stripped_md5")
    )


@query(
    "text_sentence_split",
    r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(list_transform(
               string_split_regex(text, '[.!?]+\s+'), x -> trim(x)),
               x -> x <> '') AS parts
      FROM documents
    )
    SELECT doc_id,
           CAST(generate_subscripts(parts, 1) AS INT) AS sent_idx,
           unnest(parts) AS sentence
    FROM s
    """,
    doc="E4 sentence fan-out (posexplode on terminator-run splits — the "
    "regex subset both engines share, so the oracle reproduces the "
    "identical split): one row per sentence with 1-based index. The "
    "expression-only text twin of the frame-sampling fan-out.",
)
def text_sentence_split(spark, sf_dir):
    return X.split_sentences(table(spark, sf_dir, "documents"))


@query(
    "snapshot_table_diff",
    """
    WITH before AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'OLD-PRIORITY'
                  ELSE o_orderpriority END AS o_orderpriority,
             o_orderstatus
      FROM orders WHERE o_orderkey % 13 != 0
    ), after AS (
      SELECT o_orderkey, o_orderpriority, o_orderstatus
      FROM orders WHERE o_orderkey % 11 != 0
    )
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN b.o_orderkey IS NULL THEN 'added'
                WHEN a.o_orderkey IS NULL THEN 'removed'
                WHEN a.o_orderpriority <> b.o_orderpriority
                  OR a.o_orderstatus <> b.o_orderstatus THEN 'changed'
                ELSE 'unchanged' END AS diff_status
    FROM after a FULL OUTER JOIN before b ON a.o_orderkey = b.o_orderkey
    WHERE CASE WHEN b.o_orderkey IS NULL THEN 'added'
               WHEN a.o_orderkey IS NULL THEN 'removed'
               WHEN a.o_orderpriority <> b.o_orderpriority
                 OR a.o_orderstatus <> b.o_orderstatus THEN 'changed'
               ELSE 'unchanged' END != 'unchanged'
    """,
    doc="Snapshot reconciliation (the idempotent-sink audit): key-wise "
    "full-outer diff classifying rows added / removed / changed between "
    "two deterministically derived orders snapshots — one md5 payload "
    "hash per side instead of N column compares on the shuffle.",
)
def snapshot_table_diff(spark, sf_dir):
    from spectraplex_spark.operators.reconcile import table_diff

    orders = table(spark, sf_dir, "orders")
    before = orders.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, "OLD-PRIORITY")
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
        "o_orderstatus",
    )
    after = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    return table_diff(before, after, ["o_orderkey"])


@query(
    "scd2_user_event_history",
    """
    SELECT user_id, event_type, ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="SCD type-2 dimension versioning from a change log: one window "
    "pass (lead over (key, ts)) turns events into [valid_from, "
    "valid_to) validity intervals with an is_current flag — one "
    "shuffle on the key, no self-join, the CDC-backfill shape. "
    "event_id tiebreaks the window order for determinism.",
)
def scd2_user_event_history(spark, sf_dir):
    from spectraplex_spark.operators.temporal import scd2_intervals

    events = table(spark, sf_dir, "events")
    return scd2_intervals(
        events, key="user_id", ts="ts", attr_cols=["event_type"], tiebreak="event_id"
    )


@query(
    "stratified_embedding_sample",
    """
    SELECT vec_id, label
    FROM embeddings
    WHERE CASE
      WHEN label = 0 THEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 4) < 'c000'
      WHEN label = 1 THEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 4) < '8000'
      WHEN label = 2 THEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 4) < '4000'
      ELSE substr(md5(CAST(vec_id AS VARCHAR)), 1, 4) < '1000'
    END
    """,
    doc="Stratified consistent-hash sampling (training-mix class "
    "rebalancing): per-label keep fractions 75/50/25% (6.25% "
    "elsewhere) via md5-prefix thresholds quantized to 1/65536 — "
    "deterministic, corpus-size independent, nested across fractions; "
    "expression-only filter that pushes into the scan.",
)
def stratified_embedding_sample(spark, sf_dir):
    from spectraplex_spark.operators.packing import stratified_sample

    em = table(spark, sf_dir, "embeddings")
    return stratified_sample(
        em, "label", {0: 0.75, 1: 0.5, 2: 0.25}, default_fraction=0.0625, id_col="vec_id"
    ).select("vec_id", "label")


@query(
    "incremental_rollup_merge",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mean_value
    FROM events GROUP BY 1, 2
    """,
    doc="Materialized-view maintenance: events split at a cutoff into "
    "two batches, each aggregated alone into mergeable state (count + "
    "exact decimal sum), key-wise merged, then finalized — the oracle "
    "is the FULL recompute, so the hash gate proves "
    "merge(increments) == recompute bit-for-bit (decimal state is "
    "order-independent; double state would drift).",
)
def incremental_rollup_merge(spark, sf_dir):
    from spectraplex_spark.operators.incremental import (
        daily_rollup_state,
        finalize_rollup,
        merge_rollup_states,
    )

    events = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    old = daily_rollup_state(events.filter(F.col("ts") < cutoff))
    new = daily_rollup_state(events.filter(F.col("ts") >= cutoff))
    return finalize_rollup(merge_rollup_states(old, new))


# \r?\n split — the lines() CRLF twin (review r12)
_LINES_SQL = (
    "list_filter(list_transform(regexp_split_to_array(text, '\\r?\\n'), "
    "x -> trim(x)), x -> x <> '')"
)


@query(
    "text_repetition_stats",
    f"""
    SELECT doc_id,
           CASE WHEN len({_LINES_SQL}) > 0
                THEN 1.0 - CAST(len(list_distinct({_LINES_SQL})) AS DOUBLE)
                           / len({_LINES_SQL})
                ELSE 0.0 END AS dup_line_ratio,
           CASE WHEN len({_TOKENS_SQL}) > 0
                THEN CAST(len(list_distinct({_TOKENS_SQL})) AS DOUBLE)
                     / len({_TOKENS_SQL})
                ELSE 0.0 END AS unique_word_ratio,
           CASE WHEN len({_TOKENS_SQL}) > 0
                THEN CAST(list_sum(list_transform({_TOKENS_SQL}, t -> length(t))) AS DOUBLE)
                     / len({_TOKENS_SQL})
                ELSE 0.0 END AS mean_token_len
    FROM documents
    """,
    doc="E4 repetition/degeneracy gates: duplicate-line ratio "
    "(boilerplate signal), unique-word ratio (keyword stuffing), mean "
    "token length (char soup) — all HOF expressions, no explode, zero "
    "shuffle; ratios built with identical cast/divide structure in "
    "both engines for bit equality.",
)
def text_repetition_stats(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        X.dup_line_ratio(t).alias("dup_line_ratio"),
        X.unique_word_ratio(t).alias("unique_word_ratio"),
        X.mean_token_length(t).alias("mean_token_len"),
    )


@query(
    "frequent_users_exact",
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM events GROUP BY user_id
    HAVING COUNT(*) >= (SELECT (COUNT(*) + 199) // 200 FROM events)
    """,
    doc="Sketch-class heavy hitters with an EXACT answer: per-partition "
    "Misra-Gries candidate generation (bounded memory, no per-item "
    "shuffle state) + broadcast exact recount of the candidate set — "
    "the MG superset guarantee means the output is exactly the items "
    "in >= 1-in-200 rows. Integer-arithmetic threshold so the oracle "
    "computes the identical cutoff.",
)
def frequent_users_exact(spark, sf_dir):
    from spectraplex_spark.operators.sketches import frequent_items

    return frequent_items(table(spark, sf_dir, "events"), "user_id", one_in=200)


@query(
    "sketch_event_profile",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           1 AS hll_ok, 1 AS p50_ok, 1 AS p95_ok
    FROM events GROUP BY event_type
    """,
    doc="Per-event-type mergeable-sketch summary, graded via its error "
    "CONTRACT: the HLL++ distinct estimate (2% rsd) must land within "
    "3*rsd of the exact count, and each KLL percentile (accuracy 10k → "
    "rank error ≤ n/10k, well under 1 rank at gate scale) must sit at "
    "cumulative rank 0.5/0.95 ± 0.05. The Spark side computes sketch "
    "AND exact twins and emits the within-bounds flags as 0/1 ints; "
    "the oracle asserts the exact values and all-1 flags — so the "
    "driver hash-verifies that the sketches honor their bounds, the "
    "strongest claim an approximate operator can make deterministically. "
    "Raw sketch numerics stay pytest-bounded; production profiling uses "
    "approx_event_profile alone (one partial-agg shuffle, no exact "
    "twin).",
)
def sketch_event_profile(spark, sf_dir):
    from spectraplex_spark.operators.sketches import approx_event_profile

    ev = table(spark, sf_dir, "events")
    # one evaluation of the sketch aggregate (5 rows), shared by the
    # rank-check join AND the output join — without the checkpoint the
    # HLL/KLL groupBy would run twice and percentile_approx's partial-
    # merge order could even disagree between the two copies
    prof = approx_event_profile(ev).localCheckpoint(
        eager=False
    )  # event_type, approx_distinct, p50, p95
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    ranks = (
        ev.select("event_type", "value")
        .join(prof.select("event_type", "p50", "p95"), "event_type")
        .groupBy("event_type")
        .agg(
            (F.sum(F.when(F.col("value") <= F.col("p50"), 1).otherwise(0)) / F.count(F.lit(1))).alias("r50"),
            (F.sum(F.when(F.col("value") <= F.col("p95"), 1).otherwise(0)) / F.count(F.lit(1))).alias("r95"),
        )
    )
    return (
        prof.join(exact, "event_type")
        .join(ranks, "event_type")
        .select(
            "event_type",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                <= F.lit(0.06) * F.col("exact_distinct")
            ).cast("int").alias("hll_ok"),
            ((F.col("r50") >= 0.45) & (F.col("r50") <= 0.55)).cast("int").alias("p50_ok"),
            ((F.col("r95") >= 0.93) & (F.col("r95") <= 0.97)).cast("int").alias("p95_ok"),
        )
    )


@query(
    "corpus_split_assignment",
    f"""
    WITH s AS (
      SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '0ccc' THEN 'test'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1998' THEN 'val'
                  ELSE 'train' END AS split,
             CAST(len({_TOKENS_SQL}) AS INTEGER) AS n_tokens
      FROM documents
    )
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM s GROUP BY split
    """,
    doc="E4 deterministic train/val/test split (~90/5/5) by md5(id) "
    "prefix — consistent hashing, so corpus growth never moves an "
    "existing document across splits; per-split doc and token totals.",
)
def corpus_split_assignment(spark, sf_dir):
    from spectraplex_spark.operators.packing import assign_split
    from spectraplex_spark.operators.textops import token_count

    docs = assign_split(table(spark, sf_dir, "documents"))
    return docs.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("int")).cast("long").alias("sum_tokens"),
    )


@query(
    "corpus_pack_assignment",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len({_TOKENS_SQL}) AS INTEGER) AS n_tokens,
             CAST(doc_id % 8 AS INTEGER) AS shard
      FROM documents
    )
    SELECT doc_id, n_tokens, shard,
           CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS tokens_before,
           -- BIGINT integer division: the int32 form wrapped at ~1.1e12
           -- tokens/shard (inside the 100 TB envelope; review finding r12)
           CAST((CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) // 512) AS BIGINT) AS pack_id
    FROM toks
    WINDOW w AS (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="E4 sequence packing: shard-local prefix-sum assignment of "
    "documents to 512-token packs (the scalable approximation of the "
    "sequential greedy packer — one window per shard, shuffle only on "
    "the shard key; a pack can overrun by at most one document). "
    "Every per-document assignment is oracle-verified.",
)
def corpus_pack_assignment(spark, sf_dir):
    from spectraplex_spark.operators.packing import pack_documents

    return pack_documents(table(spark, sf_dir, "documents"), budget=512, n_shards=8)


@query(
    "multimodal_binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha
    FROM documents
    """,
    doc="E3 multimodal metadata derivation: utf-8 payload byte length + "
    "content sha256 — metadata-only query never touching payload "
    "internals (expression-only).",
)
def multimodal_binary_meta(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    mm = M.attach_binary_payload(docs)
    return mm.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("payload_sha"),
    )


@query(
    "multimodal_resize",
    """
    SELECT doc_id, 64 AS width, 64 AS height,
           CAST(12288 AS BIGINT) AS n_bytes,
           sha256(substr(repeat(sha256(text), 192), 1, 12288)) AS payload_sha
    FROM documents
    """,
    doc="E3 resize plumbing: mapInPandas payload rewrite to 64x64x3 with "
    "updated meta struct. The documented fake (digest-repeat payload) is "
    "SQL-expressible, so the driver hash-verifies the OUTPUT CONTENT of "
    "an Arrow-batched Python stage — including the resized payload's "
    "sha256 — not just its shape.",
)
def multimodal_resize(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    resized = M.resize_media(M.attach_binary_payload(docs), width=64, height=64)
    return resized.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("payload_sha"),
    )


@query(
    "multimodal_frame_sample",
    """
    WITH base AS (
      SELECT doc_id, sha256(text) AS payload_sha,
             least(greatest(octet_length(encode(text)) // 256, 1), 8) AS n_frames
      FROM documents
    ), frames AS (
      SELECT doc_id, payload_sha, unnest(range(n_frames)) AS g FROM base
    )
    SELECT doc_id, CAST(g AS INT) AS frame_idx, CAST(g * 40 AS BIGINT) AS ts_ms,
           sha256(payload_sha || ':' || CAST(g AS VARCHAR)) AS frame_sha
    FROM frames
    """,
    doc="E3 frame-sample plumbing: mapInPandas FAN-OUT (one row per "
    "sampled frame, count driven by payload size standing in for "
    "duration, capped at 8). Per-frame content hashes are "
    "SQL-expressible, so the row-multiplying Arrow stage is driver "
    "hash-verified frame by frame.",
)
def multimodal_frame_sample(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return M.sample_frames(M.attach_binary_payload(docs))


@query(
    "simsearch_cosine_topk",
    """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                  (SELECT qv FROM q)) AS cosine
    FROM embeddings WHERE vec_id != 0
    ORDER BY cosine DESC, vec_id LIMIT 20
    """,
    bench=True,
    doc="E2 brute-force cosine top-20 vs the vec_id=0 embedding: "
    "expression-only dot product (zip_with fold), TakeOrderedAndProject "
    "top-k — zero shuffle. Oracle computes in DOUBLE[] (bit-exact match "
    "verified: both engines fold float->double sequentially).",
)
def simsearch_cosine_topk(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    qvec = em.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return S.cosine_topk(em.filter(F.col("vec_id") != 0), [float(x) for x in qvec], k=20)


def _ann_lsh_oracle_sql(dim: int = 64, n_bits: int = 8, seed: int = 42) -> str:
    """Generate the DuckDB twin of ann_topk_lsh: the SAME seeded
    hyperplanes the Spark operator derives (random_planes is a pure
    function of (dim, n_bits, seed)) embedded as double literals, the
    8-bit sign signature rebuilt in SQL, and the query's bucket selected
    by signature equality — fully data-driven, no precomputed bucket id.
    Sign-flip safety: min |dot| across vectors × planes is ~9e-5 at
    sf0.01 (~2e-4 at sf0.1), nine orders of magnitude above cross-engine
    accumulation noise, so both engines agree on every signature bit.
    ``repr(float)`` literals round-trip to the identical double."""
    from spectraplex_spark.operators.simsearch import random_planes

    planes = random_planes(dim, n_bits, seed)
    bits = "\n        + ".join(
        f"(CASE WHEN list_dot_product(e, [{', '.join(repr(float(x)) for x in plane)}]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    )
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sig AS (
      SELECT vec_id, e,
        {bits} AS s
      FROM v
    ),
    q AS (SELECT e AS qe, s AS qs FROM sig WHERE vec_id = 0)
    SELECT vec_id,
           list_cosine_similarity(e, (SELECT qe FROM q)) AS cosine
    FROM sig
    WHERE vec_id != 0 AND s = (SELECT qs FROM q)
    ORDER BY cosine DESC, vec_id LIMIT 10
    """


@query(
    "simsearch_ann_lsh",
    _ann_lsh_oracle_sql(),
    doc="E2 ANN variant: 8-bit random-hyperplane LSH bucket filter before "
    "scoring (recall/fan-in tradeoff; bucket predicate partition-prunes "
    "when the signature is materialized). ORACLE: the seeded hyperplanes "
    "are embedded as SQL literals and the signature/bucket selection is "
    "recomputed in DuckDB, so the driver hash-verifies the whole "
    "bucket-then-score pipeline, not just its shape.",
)
def simsearch_ann_lsh(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    qvec = em.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return S.ann_topk_lsh(em.filter(F.col("vec_id") != 0), [float(x) for x in qvec], k=10)


@query(
    "simsearch_ivf_topk",
    """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                  (SELECT qv FROM q)) AS cosine
    FROM embeddings WHERE vec_id != 0
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    doc="E2 IVF ANN: spherical-kmeans centroids (sample fit, seeded/"
    "deterministic), Arrow-vectorized cluster assignment, exact cosine "
    "over the probed inverted lists. Graded at n_probe = n_centroids "
    "(full probe), where IVF degenerates to exact search — so the "
    "driver hash-verifies the whole fit/assign/probe/score pipeline "
    "against brute-force SQL top-k. The approximate operating point "
    "(n_probe 8/16: half the corpus scanned) is pytest-asserted for "
    "recall against this same exact baseline.",
)
def simsearch_ivf_topk(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    qvec = em.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return S.ivf_topk(
        em.filter(F.col("vec_id") != 0),
        [float(x) for x in qvec],
        k=10,
        n_centroids=16,
        n_probe=16,
    )


_NGRAM_TOKENS = "list_filter(string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' '), t -> t <> '')"


@query(
    "minhash_neardup_pairs",
    f"""
    WITH t AS (SELECT doc_id, {_NGRAM_TOKENS} AS toks FROM documents),
    s AS (SELECT doc_id,
           list_distinct(CASE WHEN len(toks) >= 3
             THEN list_transform(range(1, len(toks) - 1),
                                 i -> array_to_string(toks[i:i+2], ' '))
             ELSE [array_to_string(toks, ' ')] END) AS sh
          FROM t),
    sz AS (SELECT doc_id, len(sh) AS n FROM s),
    inv AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b,
           CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.id_a
    JOIN sz sb ON sb.doc_id = i.id_b
    WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.8
    """,
    bench=True,
    doc="E1 MinHash+LSH near-dup pairs over the ORGANIC corpus (32 "
    "hashes, 8 bands, 3-shingles, Jaccard ≥ 0.8): banding self-join "
    "emits only candidates — no all-pairs compare at any scale. ORACLE "
    "(new round 5): exact Jaccard via an inverted shingle index "
    "(unnest → equi-join → group-count = |A∩B|; c/(nA+nB−c) ≥ 0.8) — "
    "the organic corpus DOES hold true near-dups (25 pairs at sf0.01, "
    "256 at sf0.1, all Jaccard ≥ 0.9), and LSH output was verified "
    "bit-identical to brute force at BOTH SFs before attaching this "
    "twin. Caveats documented: banding miss-probability at the "
    "observed Jaccard floor (0.9) is ≤ 2e-4 per pair — zero misses on "
    "this corpus, deterministic under fixed seeds; the hashed-shingle "
    "verify equals string Jaccard absent 31-bit collisions (none "
    "here). A testdata regeneration planting near-threshold pairs "
    "could reopen the gap; the planted variant stays the "
    "recall-guaranteed certification.",
)
def minhash_neardup_pairs(spark, sf_dir):
    # spread=True: the shingle+signature pass is THE heavy narrow stage
    # (32 affine hashes over the shingle array per row) — the bounded
    # round-robin spread parallelizes it; a production multi-split
    # layout makes the spread a no-op (registry._spread_unsplittable_scan).
    return D.minhash_neardup_pairs(table(spark, sf_dir, "documents", spread=True))


@query(
    "simhash_dup_groups",
    None,
    doc="E1 SimHash 64-bit signature buckets with >1 member (exact-"
    "signature screen; one aggregate expression per doc, one group-by "
    "shuffle on the 8-byte signature). Rows-only BY NECESSITY: xxhash64 "
    "has no DuckDB twin, and a shingle-set-equality stand-in oracle is "
    "unsound — at sf0.1 the corpus has 6 organic signature collisions "
    "between near-identical docs with different shingle sets (near-dups "
    "colliding at distance 0 is simhash WORKING, not a bug), so only "
    "the signature itself defines the grouping. Exactness vs brute-"
    "force Hamming is pytest-asserted instead. Runs over an exact-twin "
    "planted view (doc_id+300000 copies of every 20th doc): the organic "
    "corpus has zero same-signature pairs, so the unplanted query "
    "returned 0 rows — a vacuous check; identical text guarantees "
    "identical signatures, making the recorded row count non-trivial.",
)
def simhash_dup_groups(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    _assert_planted_headroom(docs, "doc_id", 300000, "simhash_dup_groups")
    twins = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text"
    )
    return D.simhash_dup_groups(docs.unionByName(twins))


@query(
    "simhash_neighbor_pairs",
    None,
    doc="E1 SimHash near-miss pairs (Hamming ≤ 3) via 4×16-bit block "
    "buckets — pigeonhole guarantees recall 1.0 for distance ≤ 3 with "
    "only a (block, 2-byte key) equi-join; verified by bit_count(xor). "
    "No oracle: xxhash64-based signatures have no DuckDB twin; exactness "
    "vs the brute-force Hamming cross-join is pytest-asserted. Runs over "
    "the same exact-twin planted view as simhash_dup_groups (Hamming 0 "
    "pairs guaranteed), so the recorded row count is non-trivial.",
)
def simhash_neighbor_pairs(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    _assert_planted_headroom(docs, "doc_id", 300000, "simhash_neighbor_pairs")
    twins = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text"
    )
    return D.simhash_neighbor_pairs(docs.unionByName(twins))


# --------------------------------------------------------------------------
# Planted near-duplicate views. The synthetic corpus has NO true near-
# dups (max organic pairwise cosine ~0.51, so a production 0.8 threshold
# would grade empty output — a vacuous pass). Fix: a deterministic
# derived view that appends exact-twin vectors (vec_id + 100000) for
# every 50th embedding, embedded identically in the Spark builder and
# the DuckDB oracle (the same trick as the Q2/Q11/Q20/Q21 partsupp
# view). Twin pairs have cosine 1.0, so production thresholds grade
# non-trivially, and — key for the LSH variants — identical vectors
# land in the same bucket of EVERY hash table, making recall on the
# planted pairs mathematically 1.0 rather than probabilistic.
# Graded cosine is rounded to 6dp on both sides: the two engines'
# fold orders agree bit-for-bit on organic values but differ in the
# last ulp on identical-vector pairs (1.0000000000000002 vs 1.0).
# --------------------------------------------------------------------------
def _assert_planted_headroom(df, id_col: str, offset: int, view: str) -> None:
    """Loud guard on every planted-view builder: twin ids live at
    organic_id + offset, so if a larger scale factor's organic ids ever
    reach the offset, twins would collide with organic rows and the
    planted-pair restriction (id_b == id_a + offset) would silently
    match organic pairs — corrupting the oracle comparison on BOTH
    sides (Spark and DuckDB read the same parquet, so one check covers
    both). One column-pruned max() job per catalog call, only on
    planted views (never in the bench set)."""
    top = df.agg(F.max(id_col).alias("m")).head()["m"]
    if top is not None and top >= offset:
        raise AssertionError(
            f"planted view {view!r}: organic max({id_col})={top} >= twin offset "
            f"{offset}; twins would collide with organic ids at this scale "
            "factor. Raise the offset (and its hardcoded twin in the oracle "
            "SQL) before grading."
        )


_PLANTED_EMB_SQL = """
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, embedding
      FROM embeddings WHERE vec_id % 50 = 0
"""


def _planted_embeddings(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    _assert_planted_headroom(em, "vec_id", 100000, "planted_embeddings")
    twins = em.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return em.unionByName(twins)


@query(
    "embedding_neardup_bucketed",
    f"""
    WITH pl AS ({_PLANTED_EMB_SQL}),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM pl)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.e, b.e), 6) AS cosine
    FROM v a, v b
    WHERE b.vec_id = a.vec_id + 100000
      AND list_cosine_similarity(a.e, b.e) >= 0.8
    """,
    doc="E1 embedding-cosine near-dup pairs at the PRODUCTION threshold "
    "(0.8), LSH-bucketed (the 100 TB path): 8 tables × 8-bit hyperplane "
    "signatures, candidates from bucket equi-joins only, exact-cosine "
    "verification (precision 1.0 — always a subset of the cross-join "
    "baseline). Graded over the planted-twin view restricted to the "
    "planted pairs, where identical-vector recall is exactly 1.0 by "
    "construction — so the LSH pipeline is driver hash-verified end to "
    "end; probabilistic recall on non-identical near-dups stays "
    "pytest-asserted (≥0.9 on clustered fixtures vs cosine_pairs).",
)
def embedding_neardup_bucketed(spark, sf_dir):
    from spectraplex_spark.operators.simsearch import cosine_pairs_bucketed

    pairs = cosine_pairs_bucketed(
        _planted_embeddings(spark, sf_dir), threshold=0.8, n_bits=8, n_tables=8
    )
    return pairs.filter(F.col("id_b") == F.col("id_a") + 100000).withColumn(
        "cosine", F.round("cosine", 6)
    )


@query(
    "embedding_neardup_multiprobe",
    f"""
    WITH pl AS ({_PLANTED_EMB_SQL}),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM pl)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.e, b.e), 6) AS cosine
    FROM v a, v b
    WHERE b.vec_id = a.vec_id + 100000
      AND list_cosine_similarity(a.e, b.e) >= 0.8
    """,
    doc="E1 embedding near-dup pairs, multi-probe LSH at the production "
    "threshold (0.8): 4 tables x 8-bit signatures with 1-bit-flip "
    "neighbor probing — candidates when signatures differ by <=1 bit in "
    "any table, matching 12 exact-only tables' recall at a third of the "
    "index rows (pytest-asserted vs the 12-table variant and brute "
    "force). Graded on the planted-twin pairs (recall 1.0 by identical-"
    "signature construction); same exact-cosine verify; precision 1.0.",
)
def embedding_neardup_multiprobe(spark, sf_dir):
    from spectraplex_spark.operators.simsearch import cosine_pairs_bucketed

    pairs = cosine_pairs_bucketed(
        _planted_embeddings(spark, sf_dir), threshold=0.8, n_tables=4, multi_probe=True
    )
    return pairs.filter(F.col("id_b") == F.col("id_a") + 100000).withColumn(
        "cosine", F.round("cosine", 6)
    )


@query(
    "embedding_neardup_pairs",
    f"""
    WITH pl AS ({_PLANTED_EMB_SQL}),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM pl)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.e, b.e), 6) AS cosine
    FROM v a, v b
    WHERE a.vec_id < b.vec_id
      AND list_cosine_similarity(a.e, b.e) >= 0.8
    """,
    doc="E1 embedding-cosine near-dup at the PRODUCTION threshold (0.8): "
    "exact all-pairs baseline over the planted-twin view (the LSH-"
    "bucketed variant is the 100 TB path — same scoring, bucket "
    "equi-join instead of cross join). Unrestricted output: every pair "
    "≥ 0.8 anywhere in the view must match the oracle's brute force.",
)
def embedding_neardup_pairs(spark, sf_dir):
    from spectraplex_spark.operators.simsearch import cosine_pairs

    return cosine_pairs(_planted_embeddings(spark, sf_dir), threshold=0.8).withColumn(
        "cosine", F.round("cosine", 6)
    )


@query(
    "ngram_jaccard_sample",
    f"""
    WITH t AS (
      SELECT doc_id, {_NGRAM_TOKENS} AS toks FROM documents WHERE doc_id < 500
    ), s AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks) - 1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM s a, s b
    WHERE a.doc_id < b.doc_id
      AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.3
    """,
    doc="E1 n-gram (3-shingle) Jaccard similarity, exact all-pairs over a "
    "bounded id range (the O(n²) baseline the LSH banding approximates; "
    "bounded by design — the full corpus goes through minhash_neardup_"
    "pairs instead). The 500-id bound covers the sf0.01 corpus exactly "
    "(25 pairs ≥ 0.3) while keeping the quadratic block constant-size "
    "at every scale factor.",
)
def ngram_jaccard_sample(spark, sf_dir):
    from spectraplex_spark.operators.dedup import ngram_jaccard_pairs

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.3)
    return pairs.withColumn("jaccard", F.col("jaccard").cast("double"))


_PLANT_SUFFIX = " zq planted near duplicate zq"
_PLANTED_DOCS_SQL = f"""
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text || '{_PLANT_SUFFIX}' AS text
      FROM documents WHERE doc_id % 10 = 0 AND n_chars >= 300
"""


def _planted_documents(spark, sf_dir):
    """Deterministic near-dup planting for the document corpus (twin of
    the embedding planting above): every 10th sufficiently-long document
    gets a suffix-perturbed copy at doc_id + 100000. The suffix changes
    ~5 of ~50+ shingles, so twin-pair Jaccard lands around 0.85-0.95 —
    inside the production near-dup band, comfortably off the 0.8
    threshold boundary, and (being a ratio of integers) bit-identical
    between Spark and DuckDB."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text")
    _assert_planted_headroom(base, "doc_id", 100000, "planted_documents")
    twins = docs.filter((F.col("doc_id") % 10 == 0) & (F.col("n_chars") >= 300)).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_PLANT_SUFFIX)).alias("text"),
    )
    return base.unionByName(twins)


@query(
    "minhash_neardup_planted",
    f"""
    WITH pl AS ({_PLANTED_DOCS_SQL}),
    t AS (
      SELECT doc_id, {_NGRAM_TOKENS} AS toks FROM pl
    ), s AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks) - 1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM s a, s b
    WHERE b.doc_id = a.doc_id + 100000
      AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
    """,
    doc="E1 MinHash+LSH near-dup at the production threshold (0.8) with "
    "a driver-gradable oracle: the planted-twin corpus guarantees true "
    "near-dup pairs (Jaccard ~0.9), banding runs on the hashed-shingle "
    "fast path (32 hashes, 16 bands of 2 — miss probability ~1e-14 per "
    "planted pair), and candidate verification joins back STRING "
    "shingle sets (verify_on_text), whose integer-ratio Jaccard is "
    "bit-identical to the oracle's SQL. Graded on the planted pairs; "
    "the organic-corpus variant (minhash_neardup_pairs) keeps the "
    "hashed verify and the bench slot.",
)
def minhash_neardup_planted(spark, sf_dir):
    pairs = D.minhash_neardup_pairs(
        _planted_documents(spark, sf_dir),
        num_hashes=32,
        bands=16,
        jaccard_threshold=0.8,
        verify_on_text=True,
    )
    return pairs.filter(F.col("id_b") == F.col("id_a") + 100000).withColumn(
        "jaccard", F.col("jaccard").cast("double")
    )


_PLANTED_SHINGLES_CTE = f"""
    t AS (
      SELECT doc_id, {_NGRAM_TOKENS} AS toks FROM pl
    ), s AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks) - 1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM s a, s b
      WHERE a.doc_id < b.doc_id
        AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
    )"""


@query(
    "incremental_neardup_planted",
    f"""
    WITH pl0 AS ({_PLANTED_DOCS_SQL}),
    pl AS (SELECT * FROM pl0 WHERE doc_id % 100000 < 500),
    {_PLANTED_SHINGLES_CTE},
    b1 AS (SELECT doc_id FROM pl WHERE doc_id < 100000),
    surv1 AS (
      SELECT doc_id FROM b1 WHERE NOT EXISTS (
        SELECT 1 FROM pairs WHERE pairs.id_b = b1.doc_id AND pairs.id_a < 100000)
    ),
    b2 AS (SELECT doc_id FROM pl WHERE doc_id >= 100000),
    surv2 AS (
      SELECT doc_id FROM b2
      WHERE NOT EXISTS (
          SELECT 1 FROM pairs JOIN surv1 ON pairs.id_a = surv1.doc_id
          WHERE pairs.id_b = b2.doc_id)
        AND NOT EXISTS (
          SELECT 1 FROM pairs WHERE pairs.id_b = b2.doc_id AND pairs.id_a >= 100000)
    )
    SELECT doc_id FROM surv1 UNION ALL SELECT doc_id FROM surv2
    """,
    doc="The INCREMENTAL near-dup gate (streaming/neardup.py) driver-"
    "graded end to end: the planted corpus arrives as two batches "
    "(originals, then their suffix twins), each flowing through the "
    "banding pass, index equi-join, exact-Jaccard verify, in-batch "
    "self-dedup, and idempotent index append. Twins must be rejected "
    "as near-dups of the ACCEPTED corpus; originals survive unless an "
    "organic smaller-id near-dup exists. The oracle replays the same "
    "greedy two-batch semantics over brute-force SQL Jaccard "
    "(verify_on_text → integer-ratio values, engine-exact). Index "
    "state lives in a per-call temp dir — the parquet-backed state "
    "store is itself under test.",
)
def incremental_neardup_planted(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from spectraplex_spark.streaming.neardup import neardup_filter_batch

    # bounded id range (same rule as ngram_jaccard_sample): covers the
    # sf0.01 corpus exactly while keeping the oracle's quadratic
    # brute-force block constant-size at every scale factor
    pl = _planted_documents(spark, sf_dir).filter(F.col("doc_id") % 100000 < 500)
    # fixed per-(sf, process) scratch dir, wiped at entry: repeated
    # builder calls stay idempotent and /tmp holds at most one index
    # per live process instead of one per invocation
    index_dir = os.path.join(
        tempfile.gettempdir(),
        f"neardup_gate_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(index_dir, ignore_errors=True)
    kw = dict(num_hashes=32, bands=16, jaccard_threshold=0.8, verify_on_text=True)
    surv1 = neardup_filter_batch(
        pl.filter(F.col("doc_id") < 100000), index_dir, **kw
    )
    surv2 = neardup_filter_batch(
        pl.filter(F.col("doc_id") >= 100000), index_dir, **kw
    )
    return surv1.select("doc_id").unionByName(surv2.select("doc_id"))


@query(
    "incremental_neardup_embedding_planted",
    f"""
    WITH pl0 AS ({_PLANTED_EMB_SQL}),
    pl AS (SELECT * FROM pl0 WHERE vec_id % 100000 < 500),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM pl),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a, v b
      WHERE a.vec_id < b.vec_id
        AND list_cosine_similarity(a.e, b.e) >= 0.8
    ),
    b1 AS (SELECT vec_id FROM pl WHERE vec_id < 100000),
    surv1 AS (
      SELECT vec_id FROM b1 WHERE NOT EXISTS (
        SELECT 1 FROM pairs WHERE pairs.id_b = b1.vec_id AND pairs.id_a < 100000)
    ),
    b2 AS (SELECT vec_id FROM pl WHERE vec_id >= 100000),
    surv2 AS (
      SELECT vec_id FROM b2
      WHERE NOT EXISTS (
          SELECT 1 FROM pairs JOIN surv1 ON pairs.id_a = surv1.vec_id
          WHERE pairs.id_b = b2.vec_id)
        AND NOT EXISTS (
          SELECT 1 FROM pairs WHERE pairs.id_b = b2.vec_id AND pairs.id_a >= 100000)
    )
    SELECT vec_id FROM surv1 UNION ALL SELECT vec_id FROM surv2
    """,
    doc="The INCREMENTAL EMBEDDING near-dup gate (streaming/"
    "neardup_embedding.py) driver-graded end to end — the vector twin "
    "of incremental_neardup_planted: planted exact-twin vectors arrive "
    "as two batches (organics, then their vec_id+100000 copies), each "
    "flowing through the multi-table hyperplane signature pass, index "
    "equi-join, exact-cosine verify at the production 0.8 threshold, "
    "in-batch self-dedup, and idempotent index append. Twin recall is "
    "mathematically 1.0 (identical vectors share every table's "
    "signature), so the oracle's brute-force greedy replay is exact, "
    "not probabilistic. Index state lives in a per-call temp dir — the "
    "parquet signature/vector store is itself under test.",
)
def incremental_neardup_embedding_planted(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from spectraplex_spark.streaming.neardup_embedding import (
        embedding_neardup_filter_batch,
    )

    # bounded id range (same rule as incremental_neardup_planted): the
    # oracle's quadratic brute-force block stays constant-size at any SF
    pl = _planted_embeddings(spark, sf_dir).filter(F.col("vec_id") % 100000 < 500)
    index_dir = os.path.join(
        tempfile.gettempdir(),
        f"neardup_emb_gate_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(index_dir, ignore_errors=True)
    kw = dict(threshold=0.8, n_bits=8, n_tables=8, seed=42)
    surv1 = embedding_neardup_filter_batch(
        pl.filter(F.col("vec_id") < 100000), index_dir, **kw
    )
    surv2 = embedding_neardup_filter_batch(
        pl.filter(F.col("vec_id") >= 100000), index_dir, **kw
    )
    return surv1.select("vec_id").unionByName(surv2.select("vec_id"))


def _corpus_prep_pipeline_oracle() -> str:
    """Full-corpus replay of the ENTIRE prepare_corpus composition —
    no planted view, no id bound: language gate → quality gate → exact
    dedup → 3-shingle Jaccard ≥ 0.8 pairs via an INVERTED SHINGLE INDEX
    (unnest → equi-join → group-count = |A∩B|, the trick that makes the
    exact pair mine feasible in SQL at any shipped SF) → transitive
    closure (recursive CTE) → min-id survivor set. Attaching this twin
    required verifying the LSH stage exactly reproduces brute force on
    the organic corpus: pair sets AND Jaccard values are bit-identical
    at sf0.01 (25 pairs) and sf0.1 (256 pairs) — banding miss
    probability ≤ 2e-4/pair at the observed Jaccard floor of 0.9,
    deterministic under fixed seeds. End-to-end survivor sets were
    compared equal at both SFs before this oracle shipped."""
    cnt = {lang: _stop_count_sql(lang) for lang in X.STOPWORDS}
    m = f"GREATEST({cnt['en']}, {cnt['es']}, {cnt['fr']}, {cnt['de']})"
    quality = f"""(
        (CASE WHEN len({_TOKENS_SQL}) BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END)
      + (CASE WHEN len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) < 0.3 * LENGTH(text) THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN {cnt['en']} > 0 THEN 0.25 ELSE 0.0 END)
    ) >= 0.5"""
    return f"""
    WITH RECURSIVE lq AS (
      SELECT doc_id, text, lang, n_chars FROM documents
      WHERE {m} > 0 AND {cnt['en']} = {m} AND {quality}
    ),
    pl AS (
      SELECT doc_id, text, lang, n_chars FROM lq
      WHERE doc_id IN (SELECT MIN(doc_id) FROM lq GROUP BY md5({_NORM_SQL}))
    ),
    t AS (SELECT doc_id, {_NGRAM_TOKENS} AS toks FROM pl),
    s AS (SELECT doc_id,
           list_distinct(CASE WHEN len(toks) >= 3
             THEN list_transform(range(1, len(toks) - 1),
                                 i -> array_to_string(toks[i:i+2], ' '))
             ELSE [array_to_string(toks, ' ')] END) AS sh FROM t),
    sz AS (SELECT doc_id, len(sh) AS n FROM s),
    inv AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT i.id_a, i.id_b FROM inter i
      JOIN sz sa ON sa.doc_id = i.id_a JOIN sz sb ON sb.doc_id = i.id_b
      WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.8
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u
    ),
    comp AS (SELECT u AS node, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u)
    SELECT doc_id, lang, n_chars FROM pl
    WHERE doc_id NOT IN (SELECT node FROM comp WHERE component <> node)
    """


@query(
    "corpus_prep_pipeline",
    _corpus_prep_pipeline_oracle(),
    bench=True,
    doc="The full training-data prep composition over the ORGANIC "
    "corpus: language gate → quality gate → exact dedup → transitive "
    "near-dup removal (MinHash/LSH pairs + connected components) → "
    "cleaned corpus. ORACLE (new round 5): the whole composition "
    "replays in one SQL statement — the LSH pair mine is replaced by "
    "an exact inverted-index Jaccard (verified bit-identical to the "
    "engine's banding output at both shipped SFs), the components loop "
    "by a recursive-CTE transitive closure. The flagship pipeline now "
    "carries the driver's hard hash signal on its production input, "
    "not just the bounded planted view (corpus_prep_planted).",
)
def corpus_prep_pipeline(spark, sf_dir):
    from spectraplex_spark.operators.corpus import prepare_corpus

    # spread=True: the gate+enrichment scan (tokenize, fingerprint,
    # shingle hashes — all heavy per-row text work) roots here; bounded
    # spread per registry._spread_unsplittable_scan (r15 A/B).
    docs = table(spark, sf_dir, "documents", spread=True)
    clean, _ = prepare_corpus(docs, keep_langs=("en",), collect_stats=False)
    return clean.select("doc_id", "lang", "n_chars")


def _corpus_prep_planted_oracle() -> str:
    """DuckDB replay of the ENTIRE prepare_corpus composition over the
    bounded planted view: language gate (stopword-argmax == 'en') →
    quality gate (score >= 0.5) → exact dedup (min id per md5 of the
    normalized text) → brute-force 3-shingle Jaccard >= 0.8 pairs →
    transitive closure via recursive CTE → min-id survivor set. Each
    stage's SQL is the already-certified twin of its constituent query
    (lang_id_report, lang_quality_report, dedup_exact_docs,
    ngram_jaccard_sample / incremental_neardup_planted)."""
    cnt = {lang: _stop_count_sql(lang) for lang in X.STOPWORDS}
    m = f"GREATEST({cnt['en']}, {cnt['es']}, {cnt['fr']}, {cnt['de']})"
    quality = f"""(
        (CASE WHEN len({_TOKENS_SQL}) BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END)
      + (CASE WHEN len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) < 0.3 * LENGTH(text) THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN {cnt['en']} > 0 THEN 0.25 ELSE 0.0 END)
    ) >= 0.5"""
    return f"""
    WITH RECURSIVE plb0 AS ({_PLANTED_DOCS_SQL}),
    plb AS (SELECT doc_id, text FROM plb0 WHERE doc_id % 100000 < 500),
    lq AS (
      SELECT doc_id, text FROM plb
      WHERE {m} > 0 AND {cnt['en']} = {m} AND {quality}
    ),
    pl AS (
      SELECT doc_id, text FROM lq
      WHERE doc_id IN (SELECT MIN(doc_id) FROM lq GROUP BY md5({_NORM_SQL}))
    ),
    {_PLANTED_SHINGLES_CTE},
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u
    ),
    comp AS (SELECT u AS node, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u)
    SELECT doc_id FROM pl
    WHERE doc_id NOT IN (SELECT node FROM comp WHERE component <> node)
    """


@query(
    "corpus_prep_planted",
    _corpus_prep_planted_oracle(),
    doc="The FLAGSHIP composition (prepare_corpus: language gate → "
    "quality gate → exact dedup → LSH near-dup pairs → connected "
    "components → min-id survivor set) driver-graded END TO END over "
    "the bounded planted-twin view — the same planted-replay trick "
    "that oracle-graded the incremental gate. verify_on_text gives "
    "integer-ratio candidate Jaccard (engine-exact); the oracle "
    "replays every stage in pure SQL, with transitive closure as a "
    "recursive CTE standing in for the distributed label-propagation "
    "components. The organic-corpus variant keeps the bench slot; "
    "this entry gives the composition the driver's hard hash signal.",
)
def corpus_prep_planted(spark, sf_dir):
    from spectraplex_spark.operators.corpus import prepare_corpus

    # bounded id range (same rule as the other planted queries): covers
    # the sf0.01 corpus exactly while keeping the oracle's quadratic
    # brute-force block and recursive closure constant-size at any SF
    pl = _planted_documents(spark, sf_dir).filter(F.col("doc_id") % 100000 < 500)
    clean, _ = prepare_corpus(
        pl,
        keep_langs=("en",),
        min_quality=0.5,
        jaccard_threshold=0.8,
        collect_stats=False,
        verify_on_text=True,
    )
    return clean.select("doc_id")


# --------------------------------------------------------------------------
# I/O protocol certification queries. The sources/sinks (S3/K3 JSONL,
# K1/K2 idempotent parquet, S6 jdbc: dispatch) were pytest-only: no
# catalog query exercised them, so the driver never hash-certified the
# interchange protocols themselves. Each query below drives a full
# write → read-back round trip through the PUBLIC helper (never a
# shortcut re-read of the source) and returns a deterministic
# projection whose DuckDB twin reads the original parquet — so any
# loss, duplication, or type drift in the round trip breaks the hash.
# Scratch lives in per-(sf, pid) temp dirs: repeated calls in one
# process stay idempotent, and nothing lands inside the repo.
# --------------------------------------------------------------------------


def _scratch_dir(sf_dir: str, tag: str) -> str:
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"{tag}_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )


@query(
    "jsonl_roundtrip_events",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(38, 6))) AS DOUBLE) AS total_value,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY event_type
    """,
    doc="S3/K3 JSONL interchange certified end to end: the events table "
    "is written through the JSONL sink (write_jsonl) and read back "
    "through the schema'd JSONL source (spark.read.schema(...).json — "
    "never inferred), then aggregated per event type. The oracle "
    "aggregates the ORIGINAL parquet, so the hash matches only if the "
    "round trip preserved every row, timestamp (microsecond ISO "
    "rendering), and double (shortest-round-trip rendering) exactly. "
    "Decimal-cast sums keep the aggregation order-independent.",
)
def jsonl_roundtrip_events(spark, sf_dir):
    import shutil

    from spectraplex_spark.sources.io import JSON_TS_NTZ_FORMAT, write_jsonl

    ev = table(spark, sf_dir, "events")
    path = _scratch_dir(sf_dir, "jsonl_rt")
    shutil.rmtree(path, ignore_errors=True)
    write_jsonl(ev, path)
    back = (
        spark.read.schema(ev.schema)
        .option("timestampNTZFormat", JSON_TS_NTZ_FORMAT)
        .json(path)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast(T.DecimalType(38, 6))).cast("double").alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "csv_roundtrip_events",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(38, 6))) AS DOUBLE) AS total_value,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY event_type
    """,
    doc="S3/K3 CSV interchange certified end to end, the JSONL round "
    "trip's tabular twin: events written through the CSV sink (header, "
    "microsecond timestamp format, full quoting) and read back through "
    "the schema'd CSV source (declared schema — inference double-scans "
    "and guesses, the 100 TB anti-pattern), then aggregated per event "
    "type against the ORIGINAL parquet's oracle. Hash-matches only if "
    "every row, microsecond timestamp, and shortest-round-trip double "
    "survived the text format exactly.",
)
def csv_roundtrip_events(spark, sf_dir):
    import shutil

    from spectraplex_spark.sources.io import read_csv, write_csv

    ev = table(spark, sf_dir, "events")
    path = _scratch_dir(sf_dir, "csv_rt")
    shutil.rmtree(path, ignore_errors=True)
    write_csv(ev, path)
    back = read_csv(spark, path, ev.schema)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast(T.DecimalType(38, 6))).cast("double").alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "idempotent_sink_replay",
    """
    SELECT COUNT(*) AS n_rows,
           0 AS replay_appended,
           CAST(SUM(CAST(value AS DECIMAL(38, 6))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT event_id) AS n_ids
    FROM events
    """,
    doc="K1/K2 idempotent-append protocol certified end to end: the "
    "events table lands in a partitioned parquet target via "
    "idempotent_append, then the SAME batch replays — the anti-join "
    "must admit zero rows (replay_appended, hash-pinned to the "
    "oracle's literal 0), and the target must hold exactly one copy "
    "of every row (count + decimal-exact value sum vs the original "
    "parquet). This is the ON CONFLICT DO NOTHING re-expression "
    "(reference repo.rs:13-71) under the driver's hard signal.",
)
def idempotent_sink_replay(spark, sf_dir):
    import shutil

    from spectraplex_spark.sources.io import idempotent_append

    ev = table(spark, sf_dir, "events").withColumnRenamed("event_id", "id")
    path = _scratch_dir(sf_dir, "idem_sink")
    shutil.rmtree(path, ignore_errors=True)
    idempotent_append(ev, path, id_col="id", partition_by=("event_type",))
    n_replay = idempotent_append(ev, path, id_col="id", partition_by=("event_type",))
    target = spark.read.parquet(path)
    return target.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(int(n_replay)).alias("replay_appended"),
        F.sum(F.col("value").cast(T.DecimalType(38, 6))).cast("double").alias("total_value"),
        F.countDistinct("id").alias("n_ids"),
    )


@query(
    "jdbc_roundtrip_nation",
    """
    SELECT CAST(n_nationkey AS INT) AS n_nationkey,
           CAST(n_regionkey AS INT) AS n_regionkey,
           n_name
    FROM nation
    """,
    doc="S6 source dispatch + JDBC sink/source certified end to end "
    "over a REAL database (embedded Derby — the JDBC engine Spark "
    "ships): the nation table is published via write_jdbc and read "
    "back through open_source's jdbc: branch (the reference's db: URI "
    "dispatch, cli/src/main.rs:118-124); the oracle reads the original "
    "parquet. Hash-matches only if the dispatch, the JDBC write, and "
    "the typed read-back all preserve the rows. Derby note: n_name "
    "travels as VARCHAR explicitly — the dialect default CLOB is not "
    "comparable on the JDBC side.",
)
def jdbc_roundtrip_nation(spark, sf_dir):
    from spectraplex_spark.sources.io import open_source, write_jdbc

    nat = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
        "n_name",
    )
    db = _scratch_dir(sf_dir, "jdbc_rt")
    url = f"jdbc:derby:{db}/db;create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    write_jdbc(
        nat,
        url,
        "nation_rt",
        mode="overwrite",
        driver=drv,
        createTableColumnTypes="n_nationkey INT, n_regionkey INT, n_name VARCHAR(64)",
    )
    back = open_source(spark, url, "nation_rt", driver=drv)
    return back.select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
        "n_name",
    )


_FIXTURE_WALLET = "FixtureWallet1111111111111111111111111111111"
_GOLDEN_LEDGER_ORACLE = f"""
    SELECT 'sig' || lpad(CAST(i AS VARCHAR), 4, '0') AS tx_hash,
           CAST(1700000000 + i AS BIGINT) AS ts,
           '{_FIXTURE_WALLET}' AS wallet_address,
           'SOL' AS asset_symbol,
           CAST(-0.5 AS DOUBLE) AS amount
    FROM (SELECT unnest(range(0, 7)) AS i)
    """


@query(
    "rpc_ingest_golden",
    _GOLDEN_LEDGER_ORACLE,
    doc="S1 certified end to end under the driver's hash: a canned "
    "localhost Solana JSON-RPC node (spectraplex_spark/testing/"
    "rpc_fixture.py — golden-shaped −0.5 SOL transfers, the reference "
    "parser's own vector) is served on an ephemeral port; the "
    "connector's fetch loop (getSignaturesForAddress + per-signature "
    "getTransaction, rate/retry policy included) pulls the wallet "
    "history, conform_to_bronze lands it, normalize produces the "
    "ledger. The oracle is the closed-form golden ledger — 7 "
    "transactions × exactly −0.5 SOL. The fetch is eager (bounded, "
    "driver-side — the API's inline-ingest path), so the fixture node "
    "is shut down before the DataFrame is consumed.",
)
def rpc_ingest_golden(spark, sf_dir):
    from spectraplex_spark.operators.normalize import normalize
    from spectraplex_spark.sources.connector import ingest_history
    from spectraplex_spark.testing.rpc_fixture import WALLET, serve_node

    with serve_node(7) as node:
        bronze = ingest_history(spark, node.url, WALLET, limit=50)
    silver = normalize(bronze, audit_ts=F.lit(None).cast("timestamp"))
    return (
        silver.join(
            bronze.select(F.col("id").alias("transaction_id"), "tx_hash", "timestamp"),
            "transaction_id",
        )
        .select(
            "tx_hash",
            F.col("timestamp").alias("ts"),
            "wallet_address",
            "asset_symbol",
            F.col("amount").cast("double").alias("amount"),
        )
    )


@query(
    "rpc_ingest_datasource",
    _GOLDEN_LEDGER_ORACLE,
    doc="S1 through PySpark 4's Python Data Source API — the SECOND "
    "ingest surface, graded against the same golden ledger as "
    "rpc_ingest_golden: spark.read.format('solana_rpc') plans one "
    "InputPartition per wallet, so each wallet's fetch loop "
    "(signatures + per-signature getTransaction, rate/retry policy "
    "included) runs as an EXECUTOR task with its own rate-limited "
    "client — the driver never fetches or collects; aggregate node "
    "pressure is the task count x per-task rps, throttled by the "
    "scheduler. The lazy scan is materialized inside the fixture "
    "node's lifetime (scratch parquet), then conform_to_bronze + "
    "normalize produce the ledger: 7 transactions x exactly -0.5 SOL.",
)
def rpc_ingest_datasource(spark, sf_dir):
    import shutil

    from spectraplex_spark.operators.normalize import normalize
    from spectraplex_spark.sources.datasource import SolanaRpcDataSource
    from spectraplex_spark.sources.ingest import conform_to_bronze
    from spectraplex_spark.testing.rpc_fixture import WALLET, serve_node

    spark.dataSource.register(SolanaRpcDataSource)
    scratch = _scratch_dir(sf_dir, "rpc_ds")
    shutil.rmtree(scratch, ignore_errors=True)
    with serve_node(7) as node:
        raw = (
            spark.read.format("solana_rpc")
            .option("url", node.url)
            .option("wallets", WALLET)
            .option("limit", 50)
            .load()
        )
        # the scan is lazy — land it while the node is alive
        raw.write.parquet(f"{scratch}/raw")
    bronze = conform_to_bronze(spark.read.parquet(f"{scratch}/raw"))
    silver = normalize(bronze, audit_ts=F.lit(None).cast("timestamp"))
    return (
        silver.join(
            bronze.select(F.col("id").alias("transaction_id"), "tx_hash", "timestamp"),
            "transaction_id",
        )
        .select(
            "tx_hash",
            F.col("timestamp").alias("ts"),
            "wallet_address",
            "asset_symbol",
            F.col("amount").cast("double").alias("amount"),
        )
    )


@query(
    "grpc_replay_ingest_golden",
    """
    SELECT 'BUguQsv2ZuHus54HAFzjdJHzZBkygAjKhEeYwSG19tUfUyvvz3worsdQCdAXDNjakJHioSiyxhFiDJrm8XpSXRA'
             AS tx_hash,
           CAST(1672531200 + i AS BIGINT) AS ts,
           '4uQeVj5tqViQh7yWWGStvkEG1Zmhx6uasJtWCJziofM' AS wallet_address,
           'SOL' AS asset_symbol,
           CAST(-0.5 AS DOUBLE) AS amount
    FROM (SELECT unnest(range(0, 7)) AS i)
    """,
    doc="S2 certified end to end under the driver's hash — the THIRD "
    "ingest surface: a gRPC-relay frame log (7 golden Yellowstone "
    "transaction frames, hand-encoded against the public protobuf "
    "field numbers by testing/wire_fixture.py — an encoder independent "
    "of the decoder) streams through the registered Python Data Source "
    "streaming reader (spark.readStream.format('grpc_replay'), real "
    "offset management, checkpoint-resume pytest-certified in "
    "test_replay_source.py), decodes via the wire decoder into bronze, "
    "and normalizes to the ledger: 7 transactions x exactly -0.5 SOL "
    "with per-frame block times. The oracle is the closed-form golden "
    "ledger with the b58 constants the wire bytes imply.",
)
def grpc_replay_ingest_golden(spark, sf_dir):
    import shutil

    from spectraplex_spark.operators.normalize import normalize
    from spectraplex_spark.streaming.replay_source import GrpcReplayDataSource
    from spectraplex_spark.streaming.yellowstone import decode_yellowstone
    from spectraplex_spark.testing.wire_fixture import write_wire_log

    spark.dataSource.register(GrpcReplayDataSource)
    scratch = _scratch_dir(sf_dir, "grpc_replay")
    shutil.rmtree(scratch, ignore_errors=True)
    import os

    os.makedirs(scratch, exist_ok=True)
    log = f"{scratch}/wire.jsonl"
    write_wire_log(log, n=7)
    q = (
        spark.readStream.format("grpc_replay")
        .option("path", log)
        .load()
        .writeStream.format("parquet")
        .option("path", f"{scratch}/frames")
        .option("checkpointLocation", f"{scratch}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    bronze = decode_yellowstone(spark.read.parquet(f"{scratch}/frames"), value_col="frame")
    silver = normalize(bronze, audit_ts=F.lit(None).cast("timestamp"))
    return (
        silver.join(
            bronze.select(F.col("id").alias("transaction_id"), "tx_hash", "timestamp"),
            "transaction_id",
        )
        .select(
            "tx_hash",
            F.col("timestamp").alias("ts"),
            "wallet_address",
            "asset_symbol",
            F.col("amount").cast("double").alias("amount"),
        )
    )


@query(
    "http_serving_roundtrip",
    f"""
    SELECT wallet_address, asset_symbol, amount FROM (
        SELECT '{_FIXTURE_WALLET}' AS wallet_address,
               'SOL' AS asset_symbol,
               CAST(-0.5 AS DOUBLE) AS amount
        FROM (SELECT unnest(range(0, 7)) AS i)
    )
    """,
    doc="K4 certified end to end under the driver's hash — the ENTIRE "
    "reference API flow, route for route (api/src/main.rs:30-50), over "
    "real HTTP: POST /v1/ingest pulls the fixture node's history "
    "through the RPC connector into idempotent bronze, POST "
    "/v1/normalize lands silver, GET /v1/ledger/<wallet> serves the "
    "ledger as JSON. Ingest and normalize are POSTed TWICE — the "
    "replayed calls must be no-ops (deterministic ids + anti-join, the "
    "engine's ON CONFLICT), so 14 fetched transactions hash to exactly "
    "7 ledger rows. Both servers run on ephemeral localhost ports "
    "inside the builder; the response is materialized before teardown.",
)
def http_serving_roundtrip(spark, sf_dir):
    import json as _json
    import shutil
    import threading
    import urllib.request

    from spectraplex_spark.serving_http import AppState, make_server
    from spectraplex_spark.testing.rpc_fixture import WALLET, serve_node

    scratch = _scratch_dir(sf_dir, "http_edge")
    shutil.rmtree(scratch, ignore_errors=True)
    state = AppState(spark, f"{scratch}/bronze", f"{scratch}/silver")
    server = make_server(state)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    def post(path: str, payload: dict) -> None:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200, resp.status

    try:
        with serve_node(7) as node:
            ingest = {"chain": "solana", "wallet": WALLET, "rpc_url": node.url}
            post("/v1/ingest", ingest)
            post("/v1/ingest", ingest)  # replay: anti-join lands 0 rows
        post("/v1/normalize", {"wallet": WALLET})
        post("/v1/normalize", {"wallet": WALLET})  # replay: idempotent silver
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/ledger/{WALLET}", timeout=60
        ) as resp:
            rows = _json.loads(resp.read().decode())
    finally:
        server.shutdown()
        server.server_close()

    out = spark.createDataFrame(
        [
            (r["wallet_address"], r["asset_symbol"], float(r["amount"]))
            for r in rows
        ],
        "wallet_address string, asset_symbol string, amount double",
    )
    return out


@query(
    "account_state_latest",
    """
    WITH upd AS (
      SELECT 'acct' || CAST(user_id AS VARCHAR) AS pubkey,
             event_id AS slot,
             event_id AS write_version,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS lamports
      FROM events
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY pubkey ORDER BY slot DESC, write_version DESC
      ) AS rn FROM upd
    )
    SELECT pubkey, slot, write_version, lamports
    FROM ranked WHERE rn = 1
    """,
    doc="The Geyser-consumer 'current account state' view "
    "(streaming/accounts.py latest_account_state): one row per pubkey, "
    "the update with the greatest (slot, write_version). Implemented "
    "as max_by over a struct ordering key — partial-aggregatable, so "
    "at 100 TB the shuffle carries one candidate per (pubkey, "
    "partition) instead of the update history (a window/row_number "
    "form shuffles everything). Driven here by a deterministic "
    "update stream derived from the events table; the oracle replays "
    "the pick with a SQL window. The wire half (SubscribeUpdateAccount "
    "decode) is round-trip-certified in test_yellowstone.py; the "
    "streaming landing (idempotent pubkey:write_version identity) in "
    "test_accounts.py.",
)
def account_state_latest(spark, sf_dir):
    from spectraplex_spark.streaming.accounts import latest_account_state

    upd = table(spark, sf_dir, "events").select(
        F.concat(F.lit("acct"), F.col("user_id").cast("string")).alias("pubkey"),
        F.col("event_id").alias("slot"),
        F.col("event_id").alias("write_version"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("lamports"),
    )
    return latest_account_state(upd)


@query(
    "block_continuity_report",
    """
    WITH blocks AS (
      SELECT event_id * 2 AS slot,
             'h' || CAST(event_id * 2 AS VARCHAR) AS blockhash,
             CASE WHEN event_id % 97 = 0 AND event_id > 0
                  THEN event_id * 2 - 4 ELSE event_id * 2 - 2 END AS parent_slot,
             'h' || CAST(CASE WHEN event_id % 89 = 0 AND event_id > 0
                  THEN -1 ELSE event_id * 2 - 2 END AS VARCHAR) AS parent_blockhash
      FROM events WHERE event_id < 2000
    ),
    cont AS (
      SELECT slot, blockhash, parent_slot, parent_blockhash,
             LAG(slot) OVER (ORDER BY slot) AS prev_slot,
             LAG(blockhash) OVER (ORDER BY slot) AS prev_hash
      FROM blocks
    )
    SELECT slot, blockhash, parent_slot, parent_blockhash, prev_slot,
           parent_slot <> prev_slot AS has_gap,
           parent_blockhash <> prev_hash AS hash_mismatch
    FROM cont WHERE prev_slot IS NOT NULL
    """,
    doc="Block-metadata continuity verification (streaming/blocks.py "
    "slot_continuity) — the canonical consumer of the third Yellowstone "
    "event family: per block, does parent_slot point at the previous "
    "seen block (gap / missed-frame detection) and does "
    "parent_blockhash match its blockhash (fork/reorg signal even on "
    "contiguous slots)? Driven by a deterministic block chain derived "
    "from the events table with planted gaps (every 97th block skips a "
    "slot) and hash breaks (every 89th block lies about its parent "
    "hash); the oracle replays the lag-window verdicts. Bounded to "
    "2000 blocks so the single-partition window is constant-size at "
    "any SF (block metadata is ~1 row/400ms of chain time — tiny by "
    "construction; partition by chain for multi-chain).",
)
def block_continuity_report(spark, sf_dir):
    from spectraplex_spark.streaming.blocks import slot_continuity

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    blocks = ev.select(
        (F.col("event_id") * 2).alias("slot"),
        F.concat(F.lit("h"), (F.col("event_id") * 2).cast("string")).alias("blockhash"),
        F.when(
            (F.col("event_id") % 97 == 0) & (F.col("event_id") > 0),
            F.col("event_id") * 2 - 4,
        )
        .otherwise(F.col("event_id") * 2 - 2)
        .alias("parent_slot"),
        F.concat(
            F.lit("h"),
            F.when(
                (F.col("event_id") % 89 == 0) & (F.col("event_id") > 0), F.lit(-1)
            )
            .otherwise(F.col("event_id") * 2 - 2)
            .cast("string"),
        ).alias("parent_blockhash"),
    )
    # graded projection: the first block's verdicts are null by
    # definition (no predecessor), and null booleans canonicalize
    # differently across engines (None vs NaN) — grade the verdicted rows
    return slot_continuity(blocks).filter(F.col("prev_slot").isNotNull())


# --- product quantization (compressed-domain ANN) ------------------------

# Graded PQ configuration: seeded data-independent codebooks (a pure
# function of (dim, m, k, seed, scale) — same determinism contract as
# random_planes), so the oracle can re-derive the identical centroids as
# SQL literals. dim=64, m=4 subspaces, k=8 centroids: minimum argmin
# margin 1.4e-4 at sf0.01 / 9.8e-5 at sf0.1 — nine orders above
# cross-engine float noise, so both engines agree on every code.
_PQ_M, _PQ_K, _PQ_DIM, _PQ_SEED, _PQ_SCALE = 4, 8, 64, 7, 0.25
_ADC_SCALE_SQL = "CAST(1073741824 AS DOUBLE)"  # pq.ADC_LUT_SCALE = 2^30


def _pq_graded_codebooks():
    return PQ.pq_codebooks(_PQ_DIM, _PQ_M, _PQ_K, seed=_PQ_SEED, scale=_PQ_SCALE)


def _pq_oracle_sql(rerank: bool = False, k: int = 10, shortlist: int = 40) -> str:
    """DuckDB twin of pq_topk / pq_topk_rerank: the SAME seeded
    codebooks embedded as literals, code assignment re-derived via
    per-subspace distance-list argmin (list_position of list_min —
    first-occurrence, matching numpy argmin), and the ADC lookup table
    rebuilt with explicitly-CAST double products in an unrolled
    left-associated chain. Bare float literals parse as DECIMAL in
    DuckDB (a last-ulp divergence from the repr round-trip); every
    literal on a bit-graded path is wrapped in CAST(... AS DOUBLE)."""
    cb = _pq_graded_codebooks()
    m, k_cent, dsub = cb.shape

    def dlit(x: float) -> str:
        return f"CAST({float(x)!r} AS DOUBLE)"

    dist_cols, code_cols, lut_cols = [], [], []
    for j in range(m):
        dists = ", ".join(
            "list_sum(list_transform(range(1, %d), i -> (e[%d + i] - (%s)[i]) ** 2))"
            % (
                dsub + 1,
                j * dsub,
                "CAST([" + ", ".join(repr(float(x)) for x in cb[j][c]) + "] AS DOUBLE[])",
            )
            for c in range(k_cent)
        )
        dist_cols.append(f"[{dists}] AS d{j}")
        code_cols.append(f"list_position(d{j}, list_min(d{j})) - 1 AS c{j}")
        # lut[j][c] = <q_subj, cb[j][c]> as an unrolled left-assoc fold,
        # then snapped to the 2^-30 fixed-point grid (see pq.ADC_LUT_SCALE:
        # DuckDB contracts a*b+c into FMA, so the raw double chain drifts
        # 1 ulp from Python's — the integer grid absorbs it; floor(x*S+0.5)
        # sidesteps Python-vs-SQL round-half tie semantics)
        entries = []
        for c in range(k_cent):
            terms = [f"(e[{j * dsub + i + 1}] * {dlit(cb[j][c][i])})" for i in range(dsub)]
            expr = terms[0]
            for t in terms[1:]:
                expr = f"({expr} + {t})"
            entries.append(
                f"CAST(floor(({expr}) * {_ADC_SCALE_SQL} + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            )
        lut_cols.append("[" + ", ".join(entries) + f"] AS lut{j}")

    score = f"q.lut0[c.c0 + 1]"
    for j in range(1, m):
        score = f"({score} + q.lut{j}[c.c{j} + 1])"
    score = f"(CAST({score} AS DOUBLE) / {_ADC_SCALE_SQL})"
    codestr = " || '-' || ".join(f"CAST(c{j} AS VARCHAR)" for j in range(m))
    base = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    d AS (SELECT vec_id, e, {', '.join(dist_cols)} FROM v WHERE vec_id != 0),
    c AS (SELECT vec_id, e, {', '.join(code_cols)} FROM d),
    q AS (SELECT e AS qe, {', '.join(lut_cols)} FROM v WHERE vec_id = 0)
    """
    if not rerank:
        return base + f"""
    SELECT c.vec_id, {codestr} AS pq_code, {score} AS adc_score
    FROM c, q
    ORDER BY adc_score DESC, vec_id LIMIT {k}
    """
    return base + f"""
    , short AS (
      SELECT c.vec_id, c.e, {score} AS adc_score
      FROM c, q
      ORDER BY adc_score DESC, vec_id LIMIT {shortlist}
    )
    SELECT vec_id, list_cosine_similarity(e, (SELECT qe FROM q)) AS cosine
    FROM short
    ORDER BY cosine DESC, vec_id LIMIT {k}
    """


@query(
    "simsearch_pq_topk",
    _pq_oracle_sql(rerank=False),
    doc="E2 product quantization, ADC top-10: per-subspace code "
    "assignment (Arrow-vectorized encode — the ingest-time pass), then "
    "a pure-expression asymmetric-distance score (literal lookup "
    "tables, m element_ats + m-1 adds per row, zero shuffle, "
    "TakeOrderedAndProject). At 100 TB the codes are materialized at "
    "ingest and the query scan reads m BYTES per row instead of 4*dim "
    "(64x for dim=768/m=48) — column pruning keeps the embedding "
    "column untouched. ORACLE: the seeded codebooks re-derived as "
    "CAST-double SQL literals; codes via distance-list argmin "
    "(margin-protected), LUT + score via unrolled left-assoc chains — "
    "the driver hash-verifies codes AND scores bit-for-bit.",
)
def simsearch_pq_topk(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return PQ.pq_topk(
        em.filter(F.col("vec_id") != 0), qvec, _pq_graded_codebooks(), k=10
    )


@query(
    "simsearch_pq_rerank",
    _pq_oracle_sql(rerank=True),
    doc="E2 PQ + exact rerank — the production ANN recipe: ADC "
    "shortlist of 40 candidates from the compressed scan, then exact "
    "cosine on the shortlist ONLY (full-precision vectors fetched for "
    "40 rows via broadcast semi-join, never a corpus-wide vector "
    "read). ORACLE: replays shortlist selection from the literal "
    "codebooks, then list_cosine_similarity rerank (fold parity with "
    "the expression dot product is established by "
    "simsearch_cosine_topk).",
)
def simsearch_pq_rerank(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return PQ.pq_topk_rerank(
        em.filter(F.col("vec_id") != 0), qvec, _pq_graded_codebooks(), k=10, oversample=4
    )


# --- benchmark decontamination (cross-corpus n-gram collision) -----------


@query(
    "decontam_ngram_overlap",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
    ng AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 8
            THEN list_transform(range(1, len(toks) - 6),
                                i -> array_to_string(toks[i:i+7], ' '))
            ELSE [array_to_string(toks, ' ')] END) AS ngrams FROM toks),
    sz AS (SELECT doc_id, len(ngrams) AS n_ngrams FROM ng WHERE doc_id % 7 != 0),
    tr AS (SELECT doc_id, unnest(ngrams) AS ngram FROM ng WHERE doc_id % 7 != 0),
    ev AS (SELECT doc_id AS eval_doc_id, unnest(ngrams) AS ngram
           FROM ng WHERE doc_id % 7 = 0),
    hits AS (SELECT tr.doc_id,
                    COUNT(DISTINCT tr.ngram) AS hits,
                    COUNT(DISTINCT ev.eval_doc_id) AS n_eval_docs
             FROM tr JOIN ev ON tr.ngram = ev.ngram GROUP BY 1)
    SELECT h.doc_id, h.hits, h.n_eval_docs, s.n_ngrams,
           h.hits / s.n_ngrams AS contamination_share
    FROM hits h JOIN sz s ON s.doc_id = h.doc_id
    """,
    doc="E1 benchmark decontamination (GPT-3-style verbatim 8-token-"
    "gram overlap): the benchmark stand-in is every 7th document; a "
    "training doc is contaminated if any of its 8-grams appears in a "
    "benchmark doc. Scale shape: the (tiny) benchmark n-gram set is "
    "BROADCAST, so the 100 TB training side never shuffles for the "
    "probe — the only shuffle is the groupBy of the rare colliding "
    "rows, and per-doc totals re-attach by broadcasting the hit "
    "report, not the corpus. Graded on n-gram STRINGS for the SQL "
    "twin; production uses hashed=True (xxhash64 shingle stream, no "
    "string materialization — same verdicts absent 31-bit collisions, "
    "pytest-asserted).",
)
def decontam_ngram_overlap(spark, sf_dir):
    from spectraplex_spark.operators.decontam import contamination_report

    docs = table(spark, sf_dir, "documents")
    return contamination_report(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0).select(
            F.col("doc_id").alias("eval_doc_id"), "text"
        ),
        n=8,
    )


_SQ_CODE_SQL = (
    "list_transform(e, x -> greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT), "
    "CAST(floor(x * CAST(127 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))))"
)


@query(
    "simsearch_sq_topk",
    f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    c AS (SELECT vec_id, {_SQ_CODE_SQL} AS codes FROM v WHERE vec_id != 0),
    q AS (SELECT {_SQ_CODE_SQL} AS qc FROM v WHERE vec_id = 0)
    SELECT c.vec_id,
           CAST(list_sum(c.codes) AS BIGINT) AS code_sum,
           CAST(list_sum(list_transform(range(1, len(c.codes) + 1),
                                        i -> c.codes[i] * q.qc[i])) AS DOUBLE)
             / CAST(16129 AS DOUBLE) AS sq_score
    FROM c, q
    ORDER BY sq_score DESC, vec_id LIMIT 10
    """,
    doc="E2 symmetric int8 scalar quantization top-10 — the 4x-"
    "compression/near-exact point of the quantization family (vs PQ's "
    "16-64x/shortlist point): codes from a narrow expression pass (NO "
    "UDF even at encode), score an EXACT integer dot product of "
    "quantized query x quantized corpus (no float accumulation, no FMA "
    "hazard — the only double op is one final division), zero shuffle, "
    "TakeOrderedAndProject. code_sum rides as an integer witness of "
    "the full code vector. At 100 TB the int8 column is materialized "
    "once and the scan reads dim bytes/row instead of 4*dim.",
)
def simsearch_sq_topk(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return PQ.sq_topk(em.filter(F.col("vec_id") != 0), qvec, k=10)


@query(
    "corpus_mixture_sample",
    f"""
    WITH tok AS (SELECT doc_id, lang,
                        CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens
                 FROM documents WHERE lang IN ('en', 'de', 'fr')),
    tot AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS tot FROM tok GROUP BY 1),
    thr AS (SELECT lang,
                   CAST((65536 * 1500 * (CASE lang WHEN 'en' THEN 7
                                                   WHEN 'de' THEN 2
                                                   ELSE 1 END))
                        // (10 * tot) AS BIGINT) AS t
            FROM tot)
    SELECT k.doc_id, k.lang, CAST(k.n_tokens AS INT) AS n_tokens
    FROM tok k JOIN thr USING (lang)
    WHERE t >= 65536
       OR substring(md5(CAST(k.doc_id AS VARCHAR)), 1, 4)
          < printf('%04x', CAST(least(t, 65535) AS BIGINT))
    """,
    doc="E4 domain-mixture curriculum sampling: weight the corpus "
    "en:de:fr = 7:2:1 against a 1500-token budget; each domain is "
    "consistently-hash-downsampled to its token share (md5 16-bit "
    "grid — deterministic, nested, rows never move when other domains "
    "change). The planning pass is ONE aggregation producing a "
    "#domains-sized driver dict; thresholds are pure INTEGER floor "
    "division, so Spark and the SQL twin derive bit-identical keep "
    "sets with no float-rate divergence anywhere. Scale: the sample "
    "itself is a narrow filter over the corpus — at 100 TB the only "
    "cost above a scan is the one token-count aggregation.",
)
def corpus_mixture_sample(spark, sf_dir):
    from spectraplex_spark.operators.packing import mixture_sample
    from spectraplex_spark.operators.textops import token_count

    docs = table(spark, sf_dir, "documents")
    return mixture_sample(
        docs, "lang", {"en": 7, "de": 2, "fr": 1}, token_budget=1500
    ).select(
        "doc_id", "lang", token_count(F.col("text")).cast("int").alias("n_tokens")
    )


@query(
    "compaction_roundtrip",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(38, 6))) AS DOUBLE) AS total_value,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY event_type
    """,
    doc="Small-file compaction certified content-preserving end to end: "
    "events is fragmented into 32 splits, compacted back through "
    "layout.compact_to (narrow coalesce rewrite — no shuffle), and the "
    "compacted dataset aggregated per event type against the ORIGINAL "
    "parquet's oracle — the hash matches only if compaction preserved "
    "every row and value exactly. File-count mechanics (before/after "
    "counts, rows_per_file sizing) are pytest-asserted in "
    "test_layout.py; this query grades the data-integrity half.",
)
def compaction_roundtrip(spark, sf_dir):
    import shutil

    from spectraplex_spark.sources.layout import compact_to

    ev = table(spark, sf_dir, "events")
    frag = _scratch_dir(sf_dir, "compact_frag")
    comp = _scratch_dir(sf_dir, "compact_out")
    shutil.rmtree(frag, ignore_errors=True)
    shutil.rmtree(comp, ignore_errors=True)
    ev.repartition(32).write.mode("overwrite").parquet(frag)
    compact_to(spark, frag, comp, rows_per_file=1_000_000)
    back = spark.read.parquet(comp)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast(T.DecimalType(38, 6))).cast("double").alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def _bq_oracle_sql(dim: int = 64, k: int = 10) -> str:
    """DuckDB twin of bq_topk: sign-bit packing, XOR, popcount — every
    op is exact integer arithmetic, so there is no cross-engine float
    hazard anywhere (the sign threshold e[i] >= 0.0 is a single float
    compare, identical in both engines)."""
    n_words = (dim + 31) // 32

    def word(src: str, w: int) -> str:
        n = min(32, dim - w * 32)
        return (
            f"list_sum(list_transform(range(1, {n + 1}), "
            f"i -> CASE WHEN {src}[{w * 32} + i] >= CAST(0 AS DOUBLE) "
            f"THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE CAST(0 AS BIGINT) END))"
        )

    ham = " + ".join(
        f"bit_count(xor(CAST(c.w{w} AS BIGINT), CAST(q.w{w} AS BIGINT)))"
        for w in range(n_words)
    )
    cw = ", ".join(f"{word('e', w)} AS w{w}" for w in range(n_words))
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    c AS (SELECT vec_id, {cw} FROM v WHERE vec_id != 0),
    q AS (SELECT {cw} FROM v WHERE vec_id = 0)
    SELECT c.vec_id, CAST({ham} AS BIGINT) AS hamming
    FROM c, q
    ORDER BY hamming ASC, vec_id ASC LIMIT {k}
    """


@query(
    "simsearch_bq_topk",
    _bq_oracle_sql(),
    doc="E2 binary (1-bit) quantization Hamming top-10 — the 32x end of "
    "the quantization family (PQ 16-64x shortlist / int8 4x near-exact "
    "/ binary 32x first-stage): sign bits packed 32-per-word by a pure "
    "expression, scored by XOR+popcount against the driver-packed "
    "query. EVERY op is exact integer arithmetic — no float "
    "accumulation exists to diverge, so the oracle replays packing and "
    "scoring bit-for-bit. Compose with sq/exact rerank for the "
    "standard two-stage recipe.",
)
def simsearch_bq_topk(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return PQ.bq_topk(em.filter(F.col("vec_id") != 0), qvec, k=10)


def _kmeans_ctes(
    src: str, k: int = 8, iters: int = 3, dim: int = 64, scale: int = 1024
) -> list[str]:
    """Unrolled-CTE replay of the integer Lloyd's trajectory over
    ``src`` (a vec_id/embedding relation): quantize, (assign, update) x
    iters, final assign into ``fin(vec_id, q, cid)`` — the same trick
    as the incremental near-dup gate's two-batch greedy replay, applied
    to an iterative algorithm. Ties break ORDER BY (dist, cid) =
    Spark's array_position-of-first-min; empty clusters COALESCE to the
    previous centroid, mirroring the operator."""
    quant = (
        f"list_transform(CAST(embedding AS DOUBLE[]), "
        f"x -> CAST(floor(x * CAST({scale} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))"
    )
    dist = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> (v.q[i] - c.q[i]) * (v.q[i] - c.q[i])))"
    )

    def assign(name: str, cent: str) -> str:
        return (
            f"{name} AS (SELECT vec_id, q, cid FROM ("
            f"SELECT v.vec_id, v.q, c.cid, row_number() OVER ("
            f"PARTITION BY v.vec_id ORDER BY {dist}, c.cid) AS rn "
            f"FROM qv v CROSS JOIN {cent} c) WHERE rn = 1)"
        )

    ctes = [
        f"qv AS (SELECT vec_id, {quant} AS q FROM ({src}))",
        f"c0 AS (SELECT rn - 1 AS cid, q FROM (SELECT q, row_number() OVER "
        f"(ORDER BY vec_id) AS rn FROM qv) WHERE rn <= {k})",
        f"pos AS (SELECT unnest(range(1, {dim + 1})) AS p)",
    ]
    for it in range(1, iters + 1):
        ctes.append(assign(f"a{it}", f"c{it - 1}"))
        ctes.append(
            f"u{it} AS (SELECT cid, p, CAST(floor(SUM(a.q[p]) * 1.0 / COUNT(*)) "
            f"AS BIGINT) AS cv FROM a{it} a CROSS JOIN pos GROUP BY cid, p)"
        )
        ctes.append(
            f"c{it} AS (SELECT prev.cid, COALESCE(n.q, prev.q) AS q "
            f"FROM c{it - 1} prev LEFT JOIN (SELECT cid, list(cv ORDER BY p) AS q "
            f"FROM u{it} GROUP BY cid) n USING (cid))"
        )
    ctes.append(assign("fin", f"c{iters}"))
    return ctes


def _kmeans_oracle_sql(k: int = 8, iters: int = 3, dim: int = 64, scale: int = 1024) -> str:
    """DuckDB twin of clustering.cluster_profile (see _kmeans_ctes)."""
    ctes = _kmeans_ctes("SELECT vec_id, embedding FROM embeddings", k, iters, dim, scale)
    ctes.append(
        f"l1 AS (SELECT cid, list_sum(list_transform(q, x -> abs(x))) "
        f"AS centroid_l1 FROM c{iters})"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT CAST(f.cid AS INT) AS cluster_id, COUNT(*) AS n_vecs,\n"
        "       CAST(SUM(f.vec_id) AS BIGINT) AS sum_vec_id,\n"
        "       CAST(l.centroid_l1 AS BIGINT) AS centroid_l1\n"
        "FROM fin f JOIN l1 l ON l.cid = f.cid\n"
        "GROUP BY f.cid, l.centroid_l1"
    )


@query(
    "embedding_kmeans_clusters",
    _kmeans_oracle_sql(),
    doc="E2/E4 distributed integer-exact Lloyd's k-means (k=8, 3 "
    "iterations) over the embedding corpus — the corpus-scale domain-"
    "discovery fit that SemDeDup-style semantic dedup and mixture "
    "balancing start from (the IVF fit answers the same question on a "
    "bounded sample; this assigns EVERY vector, distributed). "
    "Assignment is a zero-shuffle literal-centroid expression; the "
    "update is one explode+groupBy of (cid,pos,val) ints per "
    "iteration; centroids are a bounded kxdim driver collect. Every "
    "step is integer arithmetic (1/1024-grid quantize, exact squared-"
    "L2, ties to lowest cid, floor(sum/count) updates), so the oracle "
    "replays the whole trajectory as unrolled CTEs and the grade "
    "covers labels AND centroids bit-for-bit — a promise float k-means "
    "(MLlib) cannot make even against itself across partitionings.",
)
def embedding_kmeans_clusters(spark, sf_dir):
    from spectraplex_spark.operators.clustering import cluster_profile

    em = table(spark, sf_dir, "embeddings")
    return cluster_profile(em, k=8, iters=3)


# --- inverted-index retrieval (postings / conjunctive / phrase) ----------


@query(
    "index_conjunctive_topk",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
           WHERE term IN ('spark', 'window', 'join') GROUP BY 1, 2)
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tf_sum
    FROM tf GROUP BY doc_id
    HAVING COUNT(DISTINCT term) = 3
    ORDER BY tf_sum DESC, doc_id ASC LIMIT 10
    """,
    doc="E4 inverted-index conjunctive search: docs containing ALL of "
    "{spark, window, join}, top-10 by Σtf with ties to the lowest "
    "doc_id — ALL-integer ranking, so the grade is exact. The postings "
    "build is one explode + one groupBy of (term, doc_id, pos) "
    "triples; at 100 TB the index is materialized once partitioned by "
    "term-hash bucket and probes partition-prune to the query's "
    "buckets (plan-asserted in tests/test_retrieval.py), so a search "
    "never rescans the corpus. BM25 float ranking over the same index "
    "is pytest-verified against a Python reference (ln + float "
    "accumulation exclude it from bit grading, same argument as "
    "simhash).",
)
def index_conjunctive_topk(spark, sf_dir):
    from spectraplex_spark.operators.retrieval import conjunctive_topk

    docs = table(spark, sf_dir, "documents")
    return conjunctive_topk(docs, ["spark", "window", "join"], k=10)


@query(
    "index_phrase_search",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
    g AS (SELECT doc_id,
                 CASE WHEN len(toks) >= 2
                      THEN list_transform(range(1, len(toks)),
                                          i -> array_to_string(toks[i:i+1], ' '))
                      ELSE [] END AS grams
          FROM tok)
    SELECT doc_id,
           CAST(len(list_filter(grams, x -> x = 'fast table')) AS BIGINT)
             AS n_occurrences
    FROM g
    WHERE len(list_filter(grams, x -> x = 'fast table')) > 0
    """,
    doc="E4 exact phrase search ('fast table') from the inverted index: "
    "intersect each phrase term's position list shifted by its offset "
    "(pos_i - i) — a start position survives every intersection iff "
    "the terms sit consecutively. Integer array ops end to end; the "
    "per-term frames are query-sized after the term filter so the "
    "joins broadcast. The ORACLE recounts by 2-gram string equality — "
    "an INDEPENDENT formulation of the same quantity, so agreement "
    "certifies the position arithmetic, not a shared code path.",
)
def index_phrase_search(spark, sf_dir):
    from spectraplex_spark.operators.retrieval import phrase_match

    docs = table(spark, sf_dir, "documents")
    return phrase_match(docs, ["fast", "table"])


@query(
    "bm25_ranked_topk",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(len(toks)) AS BIGINT) AS s FROM tok),
    tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                        unnest(toks) AS term FROM tok)
           WHERE term IN ('spark', 'window', 'join') GROUP BY 1, 2, 3),
    dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    c AS (SELECT tf.doc_id,
                 (CAST(FLOOR(LN(1 + CAST(2 * (stats.n - dfs.df) + 1 AS DOUBLE)
                                   / CAST(2 * dfs.df + 1 AS DOUBLE)) * 65536)
                       AS BIGINT)
                  * (44 * stats.s * tf.tf))
                 // (20 * stats.s * tf.tf + 6 * stats.s + 18 * tf.dl * stats.n)
                   AS cq
          FROM tf JOIN dfs USING (term), stats)
    SELECT doc_id, CAST(SUM(cq) AS BIGINT) AS bm25_q
    FROM c GROUP BY doc_id
    ORDER BY bm25_q DESC, doc_id ASC LIMIT 10
    """,
    doc="E4 BM25 relevance ranking over the inverted index, made "
    "bit-gradable by the integer-grid trick (the sq_topk / "
    "quality_linear_score recipe): with k1=6/5, b=3/4 and avgdl=S/N "
    "as exact rationals, each posting's BM25 term multiplies out to "
    "idf·44·S·tf / (20·S·tf + 6·S + 18·dl·N) — exact BIGINT numerator "
    "and denominator — and idf is quantized to floor(ln(rational)·2^16) "
    "so the whole score is an exact integer sum. The only float op is "
    "one ln over an identical rational in both engines, with a "
    "driver-side guard asserting the value sits >1e-6 from its floor "
    "boundary (and the products fit 62 bits). dl is DENORMALIZED into "
    "the postings at build time (layout v2), so length normalization "
    "never joins a corpus-sized table — the r5 verdict's one flagged "
    "scale bug, fixed structurally. Scale shape: narrow pass over the "
    "probed postings, one groupBy, TakeOrderedAndProject.",
)
def bm25_ranked_topk(spark, sf_dir):
    from spectraplex_spark.operators.retrieval import bm25_topk_grid

    docs = table(spark, sf_dir, "documents")
    return bm25_topk_grid(docs, ["spark", "window", "join"], k=10)


def _semantic_dedup_oracle_sql(
    k: int = 8, iters: int = 3, dim: int = 64, scale: int = 1024,
    cos_num: int = 4, cos_den: int = 5,
) -> str:
    """DuckDB twin of clustering.semantic_dedup_pairs over the planted
    view: replay the Lloyd's trajectory (same CTE chain as the kmeans
    oracle), then within-cluster pairs under the exact integer cosine
    test den²·dot² >= num²·|a|²·|b|², restricted to the planted twins."""
    ctes = _kmeans_ctes(_PLANTED_EMB_SQL, k, iters, dim, scale)
    dot = f"list_sum(list_transform(range(1, {dim + 1}), i -> a.q[i] * b.q[i]))"
    sq = lambda s: (  # noqa: E731
        f"list_sum(list_transform({s}.q, x -> x * x))"
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, CAST(a.cid AS INT) AS cluster_id
    FROM fin a JOIN fin b
      ON b.vec_id = a.vec_id + 100000 AND b.cid = a.cid
    WHERE {sq('a')} > 0 AND {sq('b')} > 0
      AND {dot} >= 0
      AND CAST({cos_den * cos_den} AS BIGINT) * {dot} * {dot}
          >= CAST({cos_num * cos_num} AS BIGINT) * {sq('a')} * {sq('b')}
    """
    )


@query(
    "semantic_dedup_planted",
    _semantic_dedup_oracle_sql(),
    doc="E1 SemDeDup (Abbas et al. 2023): semantic near-dup pairs by "
    "clustering first (the integer-exact k-means above), then cosine "
    "comparison WITHIN clusters only — the recipe that turns O(n²) "
    "all-pairs into O(n²/k) and is how web-scale semantic dedup "
    "actually runs (production k ~ 10⁴-10⁵ keeps each cluster's "
    "quadratic local; the graded k=8 bit-verifies the composition). "
    "The cosine threshold (0.8 = 4/5) is decided in EXACT integer "
    "arithmetic on the quantized grid (den²·dot² >= num²·|a|²·|b|²), "
    "so clustering trajectory AND pair verdicts grade bit-for-bit. "
    "Graded on the planted exact-twin view restricted to planted "
    "pairs: identical vectors quantize and assign identically, so "
    "twin recall is exactly 1.0 by construction; cross-cluster misses "
    "are SemDeDup's documented approximation, bounded in pytest "
    "against brute-force cosine pairs.",
)
def semantic_dedup_planted(spark, sf_dir):
    from spectraplex_spark.operators.clustering import semantic_dedup_pairs

    pl = _planted_embeddings(spark, sf_dir)
    pairs = semantic_dedup_pairs(pl, k=8, iters=3)
    return pairs.filter(F.col("id_b") == F.col("id_a") + 100000)


@query(
    "knn_join_topk",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 3),
    c AS (SELECT vec_id AS corpus_id, e FROM v WHERE vec_id >= 3)
    SELECT query_id, corpus_id, ROUND(list_cosine_similarity(qe, e), 6) AS cosine
    FROM (SELECT q.query_id, c.corpus_id, q.qe, c.e,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY list_cosine_similarity(q.qe, c.e) DESC, c.corpus_id) AS rn
          FROM q CROSS JOIN c) WHERE rn <= 5
    """,
    doc="E2 batch k-NN join: top-5 cosine neighbors for EVERY query in "
    "a batch (here vec_id<3) — the eval-harness / retrieval-labeling "
    "op; cosine_topk is its one-query degenerate case. Two-stage "
    "top-k: each corpus partition reduces to k candidates per query "
    "BEFORE anything shuffles, so the exchange carries "
    "Q*k*partitions rows, never the corpus. Graded on the "
    "deterministic expression-fold scoring (SQL-twin fold parity "
    "established by simsearch_cosine_topk, 6dp grading per the "
    "planted-view precedent); the Arrow matmul stage-1 — the true "
    "100 TB path — is pytest-asserted equal to float64 round-off.",
)
def knn_join_topk(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    res = S.knn_join(
        em.filter(F.col("vec_id") >= 3),
        em.filter(F.col("vec_id") < 3),
        k=5,
    )
    return res.select(
        "query_id", "corpus_id", F.round("score", 6).alias("cosine")
    )


@query(
    "knn_join_topk_arrow",
    """
    WITH v AS (SELECT vec_id,
                      list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> CAST(FLOOR(x * 1024 + 0.5) AS BIGINT))
                        AS q FROM embeddings),
    n AS (SELECT vec_id, q,
                 CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS p
          FROM v),
    qq AS (SELECT vec_id AS query_id, q AS qa, p AS pa FROM n WHERE vec_id < 3),
    c AS (SELECT vec_id AS corpus_id, q AS qb, p AS pb FROM n WHERE vec_id >= 3),
    s AS (SELECT query_id, corpus_id,
                 CAST(list_sum(list_transform(range(1, 65),
                                              i -> qa[i] * qb[i])) AS BIGINT) AS d,
                 pa, pb
          FROM qq CROSS JOIN c),
    sc AS (SELECT query_id, corpus_id,
                  CASE WHEN pa = 0 OR pb = 0 THEN 0.0
                       ELSE CAST(d AS DOUBLE)
                            / (SQRT(CAST(pb AS DOUBLE)) * SQRT(CAST(pa AS DOUBLE)))
                  END AS score
           FROM s)
    SELECT query_id, corpus_id, score
    FROM (SELECT query_id, corpus_id, score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, corpus_id) AS rn
          FROM sc) WHERE rn <= 5
    """,
    doc="E2 batch k-NN join, GRADED ON THE ARROW SCALE PATH — the r5 "
    "verdict's 'grade the fast path' ask. Stage 1 is the mapInPandas "
    "numpy stage (one matmul per partition, exactly k rows per query "
    "cross the exchange), made bit-gradable by the sq_topk recipe "
    "applied inside the Arrow stage: components snap to the integer "
    "grid floor(x*1024+0.5) (single IEEE ops, identical in numpy / "
    "Spark / DuckDB), dots and squared norms are exact int64 matmul "
    "sums, and the final score pays only int->double converts, two "
    "sqrts and one divide — all correctly-rounded single scalar ops, "
    "so no float accumulation, no libm transcendental, no FMA shape "
    "anywhere. The graded path and the 100 TB path are now the same "
    "code (knn_join method='arrow', quantize=1024); the unquantized "
    "float matmul stays pytest-bounded.",
)
def knn_join_topk_arrow(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    return S.knn_join(
        em.filter(F.col("vec_id") >= 3),
        em.filter(F.col("vec_id") < 3),
        k=5,
        method="arrow",
        quantize=1024,
    )


def _quality_linear_oracle_sql() -> str:
    from spectraplex_spark.operators.textops import (
        QSCORE_BUCKETS,
        seeded_quality_weights,
    )

    wq = seeded_quality_weights()
    wlit = "[" + ", ".join(str(w) for w in wq) + "]"
    bucket = (  # hex-nibble fold — the hashed_bucket twin (review r12)
        "((ascii(substring(md5(t), 1, 1)) - CASE WHEN ascii(substring(md5(t), 1, 1)) >= 97 THEN 87 ELSE 48 END) * 16 + (ascii(substring(md5(t), 2, 1)) - CASE WHEN ascii(substring(md5(t), 2, 1)) >= 97 THEN 87 ELSE 48 END))"
        f" % {QSCORE_BUCKETS}"
    )
    return f"""
    WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
    w AS (SELECT CAST({wlit} AS BIGINT[]) AS wq),
    m AS (SELECT doc_id,
                 CAST(COALESCE(list_sum(list_transform(toks,
                        t -> wq[{bucket} + 1])), 0) AS BIGINT)
                   + CAST(250000 AS BIGINT) AS margin_q
          FROM tok, w)
    SELECT doc_id, margin_q,
           CAST(margin_q AS DOUBLE) / CAST(1000000 AS DOUBLE) AS margin,
           margin_q >= 0 AS keep
    FROM m
    """


@query(
    "quality_linear_score",
    _quality_linear_oracle_sql(),
    doc="E4 hashed bag-of-tokens linear quality classifier — the "
    "SERVING shape of a fastText-style quality filter (the CCNet / "
    "RefinedWeb gate that precedes dedup): feature-hash each token to "
    "one of 64 buckets (engine-portable md5+ascii fold — xxhash64 has "
    "no DuckDB twin), sum the buckets' weights, threshold the margin. "
    "Weights live on a 1e-6 INTEGER grid, so margins are pure BIGINT "
    "sums and the keep/drop verdict is an integer compare — ZERO "
    "float boundary risk, bit-identical in any engine (the displayed "
    "margin pays one final division, the sq_topk precedent). The "
    "graded weights are seeded stand-ins: the operator is the "
    "deliverable; production quantizes its trained weights to the "
    "same grid. One narrow expression pass, zero shuffle.",
)
def quality_linear_score(spark, sf_dir):
    from spectraplex_spark.operators.textops import quality_classifier_report

    return quality_classifier_report(table(spark, sf_dir, "documents"))


@query(
    "corpus_top_ngrams",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
    ng AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 3
            THEN list_transform(range(1, len(toks) - 1),
                                i -> array_to_string(toks[i:i+2], ' '))
            ELSE [array_to_string(toks, ' ')] END)) AS ngram FROM tok)
    SELECT ngram, COUNT(*) AS doc_freq
    FROM ng GROUP BY ngram
    ORDER BY doc_freq DESC, ngram ASC LIMIT 20
    """,
    doc="E4 corpus boilerplate profile: the 20 word-3-grams present in "
    "the most documents (distinct-per-doc, so a phrase repeated inside "
    "one doc counts once) — the diagnostic that finds boilerplate/"
    "template contamination before dedup thresholds are tuned. Rides "
    "the zip_with shingle pass (tokenize once per row, not once per "
    "n-gram); the only shuffle is the groupBy of (ngram, doc) rows. "
    "All-integer ranking with lexicographic tie-break, so the top-20 "
    "grades exactly.",
)
def corpus_top_ngrams(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(D.shingles(F.col("text"), 3)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("ngram"))
        .limit(20)
    )


# --- exact repeated-substring span removal (Lee et al. within-doc dedup) --

_SPAN_K = 6

_SPAN_CTES = f"""
    tok AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
    g AS (SELECT doc_id, i - 1 AS pos,
                 array_to_string(toks[i:i+{_SPAN_K - 1}], ' ') AS gram
          FROM tok, UNNEST(range(1, greatest(len(toks) - {_SPAN_K} + 2, 1))) AS r(i)),
    rep AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    hits AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM rep)),
    pe AS (SELECT doc_id, pos,
             MAX(pos + {_SPAN_K}) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
           FROM hits),
    isl AS (SELECT doc_id, pos,
              SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)
                AS island
            FROM pe),
    spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_SPAN_K} AS e
              FROM isl GROUP BY doc_id, island)"""


@query(
    "repeated_spans_report",
    f"""
    WITH {_SPAN_CTES}
    SELECT doc_id, CAST(s AS BIGINT) AS span_start, CAST(e AS BIGINT) AS span_end
    FROM spans ORDER BY doc_id, span_start
    """,
    doc="E1 exact repeated-substring spans (Lee et al. 2022 within-doc "
    "dedup): maximal token spans whose every 6-gram occurs >= 2 times "
    "anywhere in the corpus — the boilerplate/template mode that "
    "whole-document dedup misses. One positional-shingle pass "
    "(zip_with — tokenize once per doc), one global gram groupBy, one "
    "semi-join back, one per-doc gaps-and-islands window; no corpus "
    "broadcast, no self-join. All-integer offsets, end-exclusive, "
    "maximally merged (no overlapping/touching spans) — grades "
    "exactly. hashed=True runs the same plan on polynomial token-hash "
    "longs with no gram string materialized (the 100 TB path, "
    "pytest-asserted equal).",
)
def repeated_spans_report(spark, sf_dir):
    from spectraplex_spark.operators.spans import repeated_spans

    return repeated_spans(table(spark, sf_dir, "documents"), k=_SPAN_K)


@query(
    "span_dedup_clean",
    f"""
    WITH {_SPAN_CTES},
    sp AS (SELECT doc_id, list({{'s': s, 'e': e}}) AS sps FROM spans GROUP BY doc_id),
    c AS (SELECT tok.doc_id, toks,
            CASE WHEN sp.sps IS NULL THEN toks
                 ELSE list_filter(toks, (x, i) ->
                        len(list_filter(sp.sps, v -> i - 1 >= v.s AND i - 1 < v.e)) = 0)
            END AS kept
          FROM tok LEFT JOIN sp ON tok.doc_id = sp.doc_id)
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
           COALESCE(array_to_string(kept, ' '), '') AS clean_text
    FROM c WHERE len(toks) - len(kept) > 0
    ORDER BY doc_id
    """,
    doc="E1 repeated-span REMOVAL: each affected doc's normalized text "
    "rebuilt from the tokens not covered by any repeated span (token-"
    "granularity strip — the op Lee et al. showed beats whole-doc "
    "dedup for LM quality). The span set is collected per doc as a "
    "bounded struct array (#spans <= n_tokens/k) and tokens filter "
    "through an index lambda — expression-only, zero extra shuffle "
    "beyond the span mining. Output strings grade exactly because "
    "reconstruction is from the canonical token array on both "
    "engines.",
)
def span_dedup_clean(spark, sf_dir):
    from spectraplex_spark.operators.spans import remove_repeated_spans

    return remove_repeated_spans(table(spark, sf_dir, "documents"), k=_SPAN_K).filter(
        F.col("n_removed") > 0
    )


_SRC_SHINGLES_SQL = (
    "list_distinct(CASE WHEN len(toks) >= 3 "
    "THEN list_transform(range(1, len(toks) - 1), "
    "i -> array_to_string(toks[i:i+2], ' ')) "
    "ELSE [array_to_string(toks, ' ')] END)"
)


@query(
    "source_overlap_matrix",
    f"""
    WITH tok AS (SELECT source, {_TOKENS_SQL} AS toks FROM documents),
    sg AS (SELECT DISTINCT source AS src, unnest({_SRC_SHINGLES_SQL}) AS g FROM tok),
    totals AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS total FROM sg GROUP BY src),
    pairs AS (SELECT a.src AS source_a, b.src AS source_b,
                     CAST(COUNT(*) AS BIGINT) AS shared_ngrams
              FROM sg a JOIN sg b ON a.g = b.g AND a.src < b.src
              GROUP BY a.src, b.src)
    SELECT source_a, source_b, shared_ngrams,
           ta.total AS ngrams_a, tb.total AS ngrams_b,
           CAST(shared_ngrams AS DOUBLE) / CAST(LEAST(ta.total, tb.total) AS DOUBLE)
             AS containment
    FROM pairs
    JOIN totals ta ON ta.src = source_a
    JOIN totals tb ON tb.src = source_b
    """,
    doc="E4 cross-source duplication matrix: distinct shared 3-grams "
    "and containment (shared / min vocab) for every source pair — the "
    "diagnostic a curation run reads before tuning dedup thresholds "
    "('which feeds mirror which'). Per-doc distinct shingles ride the "
    "zip_with pass; one (source, gram) dropDuplicates shuffle, one "
    "gram-keyed self-join whose fan-out is bounded by the SOURCE "
    "count (never corpus-scale), tiny totals broadcast back. "
    "All-integer counts; containment pays one exact int/int division "
    "(deterministic double, the sq_topk precedent).",
)
def source_overlap_matrix(spark, sf_dir):
    from spectraplex_spark.operators.textops import source_overlap_matrix as som

    return som(table(spark, sf_dir, "documents"), n=3)


@query(
    "udaf_value_stats",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(median(value), 6) AS median_value,
           ROUND(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 6)
             AS iqr_value
    FROM events GROUP BY event_type
    """,
    doc="§2.10 UDAF surface: per-event-type EXACT median, IQR and size "
    "via GROUPED_AGG pandas UDFs (Arrow Series in, scalar out; the "
    "count is a pandas UDAF too — Spark rejects mixing GROUPED_AGG "
    "with builtin aggregates in one agg(), INVALID_PANDAS_UDF_"
    "PLACEMENT, and that contract is part of the surface). Grades "
    "against DuckDB's exact "
    "median/quantile_cont at 6dp (the knn_join rounding precedent — "
    "linear interpolation's op order may differ by 1 ulp across "
    "engines). The module docstring states the scale trade honestly: "
    "GROUPED_AGG has no partial aggregation (full group columns "
    "shuffle to one task) — right for many-medium-groups, wrong for "
    "corpus-scale groups, where the builtin percentile/sketch "
    "aggregates apply.",
)
def udaf_value_stats(spark, sf_dir):
    from spectraplex_spark.functions.udaf import robust_value_stats

    r = robust_value_stats(table(spark, sf_dir, "events"))
    return r.select(
        "event_type",
        "n",
        F.round("median_value", 6).alias("median_value"),
        F.round("iqr_value", 6).alias("iqr_value"),
    )


@query(
    "udaf_value_stats_scalable",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(median(value), 6) AS median_value,
           ROUND(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 6)
             AS iqr_value
    FROM events GROUP BY event_type
    """,
    doc="The SCALE twin of udaf_value_stats — same exact median/IQR/"
    "size against the same DuckDB oracle, but built from partial-"
    "aggregatable pieces only (the r6 verdict's 'make the graded UDAF "
    "the scale UDAF' ask): per-group counts map-side combine, a "
    "row_number rank window sorts each group in the spillable "
    "ExternalSorter, the ≤6 quantile-index rows per group survive "
    "into a conditional-min HashAggregate (partial_min visible in the "
    "plan — pytest-pinned), and the interpolation fraction is exact "
    "((n-1)·p with p ∈ {¼,½,¾} is integer div/mod; frac ∈ {0,.25,.5,"
    ".75} are exact binary doubles). No GROUPED_AGG pandas UDF, so no "
    "group's full column ever sits in one task's memory — a skewed "
    "group at 100 TB costs a spillable sort, not an OOM. Graded at "
    "6dp (the udaf_value_stats precedent: linear interpolation's op "
    "order may differ by 1 ulp across engines).",
)
def udaf_value_stats_scalable(spark, sf_dir):
    from spectraplex_spark.functions.udaf import robust_value_stats_scalable

    r = robust_value_stats_scalable(table(spark, sf_dir, "events"))
    return r.select(
        "event_type",
        "n",
        F.round("median_value", 6).alias("median_value"),
        F.round("iqr_value", 6).alias("iqr_value"),
    )


@query(
    "doc_chunks_report",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
    SELECT doc_id,
           CAST(r.i // 48 AS BIGINT) AS chunk_id,
           CAST(r.i AS BIGINT) AS chunk_start,
           CAST(len(toks[r.i+1:r.i+64]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(toks[r.i+1:r.i+64], ' ') AS chunk_text
    FROM tok, UNNEST(range(0, len(toks), 48)) AS r(i)
    WHERE len(toks) > 0
    """,
    doc="E4/packing-prep document chunking: overlapping 64-token "
    "windows sliding by 48 (16-token overlap keeps boundary context "
    "in both neighbors — the HF return_overflowing_tokens recipe), "
    "the last prep step before tokenized training batches. "
    "Expression-only, zero-shuffle narrow map (sequence of starts + "
    "transform/slice + one posexplode); the packer owns the "
    "batch-shaping shuffle downstream. Final short chunks and the "
    "one-chunk short-doc case grade exactly; chunk text rebuilds from "
    "the canonical token array so chunk-then-tokenize == "
    "tokenize-then-chunk.",
)
def doc_chunks_report(spark, sf_dir):
    from spectraplex_spark.operators.chunking import chunk_documents

    return chunk_documents(table(spark, sf_dir, "documents"), max_tokens=64, stride=48)


@query(
    "source_quota_sample",
    """
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents) WHERE rk <= 5
    """,
    doc="E4 mixture balancing, quota step: cap every source at 5 docs "
    "via a DETERMINISTIC pseudo-random draw — rank within source by "
    "md5 of the doc id (engine-portable hash, the quality-classifier "
    "precedent) so reruns, engines and incremental rebuilds pick the "
    "same survivors. One window shuffle on the source key; for "
    "pathologically hot sources the two-phase form (md5-threshold "
    "filter before the shuffle) is documented in the operator.",
)
def source_quota_sample(spark, sf_dir):
    from spectraplex_spark.operators.textops import cap_per_source

    return cap_per_source(table(spark, sf_dir, "documents"), 5).select("source", "doc_id")


@query(
    "incremental_spans_planted",
    f"""
    WITH {_SPAN_CTES}
    SELECT doc_id, CAST(s AS BIGINT) AS span_start, CAST(e AS BIGINT) AS span_end
    FROM spans WHERE doc_id % 2 = 1
    ORDER BY doc_id, span_start
    """,
    doc="E1/§2.9 the span family's INCREMENTAL gate, two-batch SQL "
    "replay (the incremental_neardup_planted recipe): even-id docs "
    "ingest as batch 1, odd-id docs as batch 2 through "
    "streaming/spans_incremental.py — positional grams land in a "
    "gram-hash-bucket-partitioned parquet index (replay-idempotent, "
    "_config-pinned params), and each batch's spans are detected "
    "against the FULL ingested history with a partition-pruned probe. "
    "The oracle computes whole-corpus repeated spans restricted to "
    "batch-2 docs — exactly the gate's history-at-batch-2 answer, so "
    "agreement certifies that incremental == batch. Per-batch cost is "
    "one narrow gram pass + one pruned probe (measured-flat, the "
    "neardup gate's property).",
)
def incremental_spans_planted(spark, sf_dir):
    import shutil

    from spectraplex_spark.streaming.spans_incremental import spans_filter_batch

    docs = table(spark, sf_dir, "documents")
    index_dir = _scratch_dir(sf_dir, "span_gate")
    shutil.rmtree(index_dir, ignore_errors=True)
    spans_filter_batch(docs.filter(F.col("doc_id") % 2 == 0), index_dir, k=_SPAN_K)
    return spans_filter_batch(docs.filter(F.col("doc_id") % 2 == 1), index_dir, k=_SPAN_K)


@query(
    "fuzzy_decontam_planted",
    f"""
    WITH t AS (SELECT doc_id, {_NGRAM_TOKENS} AS toks FROM documents),
    s AS (SELECT doc_id,
           list_distinct(CASE WHEN len(toks) >= 3
             THEN list_transform(range(1, len(toks) - 1),
                                 i -> array_to_string(toks[i:i+2], ' '))
             ELSE [array_to_string(toks, ' ')] END) AS sh
          FROM t),
    sz AS (SELECT doc_id, len(sh) AS n FROM s),
    inv AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
    pinv AS (SELECT doc_id AS probe_id, shingle FROM inv WHERE doc_id % 97 = 0),
    inter AS (
      SELECT a.doc_id, p.probe_id, COUNT(*) AS c
      FROM inv a JOIN pinv p ON a.shingle = p.shingle
      GROUP BY 1, 2
    )
    SELECT i.doc_id, i.probe_id,
           CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.doc_id
    JOIN sz sb ON sb.doc_id = i.probe_id
    WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.8
    """,
    doc="E1 FUZZY decontamination (cross-corpus MinHash near-dup join): "
    "corpus docs that near-duplicate any doc of a benchmark probe set "
    "— the leakage exact-n-gram decontamination misses (paraphrased "
    "eval answers, reformatted exemplars). The probe side is eval-"
    "sized, so its band table BROADCASTS and the 100 TB corpus is "
    "banded in a narrow map pass — no corpus shuffle, no self-join, "
    "no star cap (candidates bounded by probe bucket membership). "
    "Planted probe = every 97th doc lifted verbatim (guaranteed "
    "jaccard-1.0 hits, recall 1.0 through banding); the oracle is the "
    "exact-Jaccard inverted-shingle join restricted to the probe — "
    "same caveat ledger as minhash_neardup_pairs (organic pairs at "
    "the observed >=0.9 floor survive banding deterministically, "
    "verified at both SFs).",
)
def fuzzy_decontam_planted(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    return D.cross_corpus_neardup(docs, probe, verify_on_text=True)


@query(
    "zorder_curve_events",
    """
    WITH t AS (SELECT event_id,
                      user_id % 256 AS zx,
                      CAST(FLOOR(value * 100) AS BIGINT) % 256 AS zy
               FROM events)
    SELECT event_id, CAST(zx AS BIGINT) AS zx, CAST(zy AS BIGINT) AS zy,
           CAST((((zx >> 0) & 1) << 0) + (((zx >> 1) & 1) << 2) + (((zx >> 2) & 1) << 4) + (((zx >> 3) & 1) << 6) + (((zx >> 4) & 1) << 8) + (((zx >> 5) & 1) << 10) + (((zx >> 6) & 1) << 12) + (((zx >> 7) & 1) << 14)
              + (((zy >> 0) & 1) << 1) + (((zy >> 1) & 1) << 3) + (((zy >> 2) & 1) << 5) + (((zy >> 3) & 1) << 7) + (((zy >> 4) & 1) << 9) + (((zy >> 5) & 1) << 11) + (((zy >> 6) & 1) << 13) + (((zy >> 7) & 1) << 15) AS BIGINT) AS zval
    FROM t
    """,
    doc="Layout: the Morton (Z-order) curve value behind "
    "layout.write_zordered, graded bit-for-bit — interleave the low 8 "
    "bits of two bucket ids with pure shift/mask expressions (whole-"
    "stage codegen, zero shuffle). Sorting by this value clusters rows "
    "close in BOTH dimensions into the same parquet row groups, so "
    "min/max stats prune two-predicate scans where a single-column "
    "sort prunes one — the Delta/Iceberg OPTIMIZE ZORDER trick as "
    "plain Spark; the pruning effect itself is measured in "
    "tests/test_layout.py::test_zorder_layout_prunes_two_column_boxes. "
    "Bucketing here is integer-exact (pmod / floor of a single "
    "product) so the curve grades in any engine.",
)
def zorder_curve_events(spark, sf_dir):
    from spectraplex_spark.sources.layout import zorder_value

    ev = table(spark, sf_dir, "events")
    zx = F.pmod(F.col("user_id"), F.lit(256)).cast("long")
    zy = F.pmod(F.floor(F.col("value") * 100).cast("long"), F.lit(256))
    return ev.select(
        "event_id",
        zx.alias("zx"),
        zy.alias("zy"),
        zorder_value(F.col("zx"), F.col("zy"), 8).alias("zval"),
    ).select("event_id", "zx", "zy", "zval")


@query(
    "feature_stats_report",
    """
    WITH c AS (SELECT i - 1 AS dim, e[i] AS x
               FROM (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
                    UNNEST(range(1, 65)) AS r(i)),
    a AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(x AS DECIMAL(38,12))) AS sx,
                 SUM(CAST(x * x AS DECIMAL(38,12))) AS sx2
          FROM c GROUP BY dim)
    SELECT CAST(dim AS BIGINT) AS dim, n,
           ROUND(CAST(sx AS DOUBLE) / n, 9) AS mean,
           ROUND(SQRT(CAST(sx2 AS DOUBLE) / n
                 - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)), 9) AS std
    FROM a
    """,
    doc="E2 feature standardization FIT: per-dimension corpus mean/std "
    "— the (x-mean)/std preprocessing every embedding pipeline runs "
    "before quantization/clustering. Moments are EXACT: per-component "
    "sums through DECIMAL(38,12) (float32 components convert to "
    "double exactly; x*x squares a 24-bit mantissa into 48 bits — "
    "exact in double; the decimal cast rounds deterministically), so "
    "accumulation is shuffle-order-independent and engine-identical; "
    "the final mean/std pay single IEEE ops, graded at 9dp (the mul-"
    "sub variance shape is the one FMA-contractible step — the knn "
    "rounding precedent). One posexplode + one groupBy(dim): after "
    "partial aggregation the shuffle carries dim rows per partition, "
    "never the corpus. The APPLY half (standardize_vectors: bounded "
    "dim-row collect, literal arrays, one zip_with, zero shuffle) is "
    "pytest-verified.",
)
def feature_stats_report(spark, sf_dir):
    from spectraplex_spark.operators.simsearch import fit_feature_stats

    s = fit_feature_stats(table(spark, sf_dir, "embeddings"))
    return s.select(
        "dim", "n", F.round("mean", 9).alias("mean"), F.round("std", 9).alias("std")
    )


@query(
    "stateful_balance_replay",
    """
    SELECT user_id,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS balance_cents,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
    doc="§2.9/§2.10 arbitrary stateful streaming, replayed end to end: "
    "the per-wallet running ledger balance (the reference's report "
    "aggregate) kept as per-user stream state via "
    "applyInPandasWithState — each micro-batch updates "
    "(balance_cents, n_events) state and emits the post-batch "
    "snapshot. Balances accumulate as INTEGER CENTS (floor(v*100+0.5), "
    "single IEEE ops both engines) so state merges are exact integer "
    "adds — no float drift across batches — and the snapshot grades "
    "bit-for-bit against the batch SQL twin. State is one (bigint, "
    "bigint) pair per user — size tracks distinct users, never event "
    "history. The transformWithStateInPandas twin (typed ValueState, "
    "the modern Spark 4 API) is implemented with identical semantics "
    "and gated on the protobuf runtime this container lacks "
    "(loud-probe discipline, pytest-pinned).",
)
def stateful_balance_replay(spark, sf_dir):
    import tempfile

    from spectraplex_spark.streaming.stateful import stream_running_balance

    events = table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="spectraplex_bal_")
    events.coalesce(1).write.parquet(f"{d}/src")
    stream = spark.readStream.schema(events.schema).parquet(f"{d}/src")
    q = (
        stream_running_balance(stream)
        .writeStream.format("parquet")
        .option("path", f"{d}/out")
        .option("checkpointLocation", f"{d}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    snaps = spark.read.parquet(f"{d}/out")
    # one snapshot per TOUCHED user PER BATCH: reduce to the latest
    # (n_events is strictly monotone per user), so the grade holds for
    # ANY micro-batch layout — the old bare read-back graded only
    # because coalesce(1) happens to drain in one batch (review
    # finding r12; identity reduction on the single-batch fixture)
    return snaps.groupBy("user_id").agg(
        F.max_by("balance_cents", "n_events").cast("long").alias("balance_cents"),
        F.max("n_events").cast("long").alias("n_events"),
    )


@query(
    "merge_upsert_roundtrip",
    """
    WITH up AS (SELECT event_id, user_id, event_type, value + 1000 AS value
                FROM events WHERE event_id % 37 = 0),
    del_keys AS (SELECT event_id FROM events
                 WHERE event_id % 53 = 0 AND event_id % 37 <> 0),
    ins AS (SELECT CAST(-i AS BIGINT) AS event_id, CAST(0 AS BIGINT) AS user_id,
                   'merged' AS event_type, CAST(i AS DOUBLE) AS value
            FROM (SELECT unnest(range(1, 6)) AS i)),
    merged AS (
      SELECT event_id, user_id, event_type, value FROM events
      WHERE event_id % 37 <> 0
        AND event_id NOT IN (SELECT event_id FROM del_keys)
      UNION ALL SELECT * FROM up
      UNION ALL SELECT * FROM ins)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM merged GROUP BY event_type
    """,
    doc="K1/K2 completion — MERGE INTO (upsert + delete) over plain "
    "parquet, the CDC write path the reference's insert-only ON "
    "CONFLICT lacks: corrections (value+1000 for every 37th event), "
    "GDPR-style deletes (every 53rd), and inserts into a brand-new "
    "partition, applied in ONE merge call. PARTITION-SCOPED "
    "copy-on-write: only partitions containing updated keys are "
    "rewritten (a merge touching 1 of 10k daily partitions costs "
    "1/10k of the table — Delta/Iceberg file-pruning at partition "
    "granularity; untouched-partition mtimes pinned in "
    "tests/test_merge.py), staged-then-swapped because Spark cannot "
    "overwrite what it reads. Graded by reading the merged table back "
    "and aggregating in exact integer cents against the SQL "
    "reconstruction of the same merge.",
)
def merge_upsert_roundtrip(spark, sf_dir):
    import shutil

    from spectraplex_spark.sources.merge import merge_upsert

    events = table(spark, sf_dir, "events")
    path = _scratch_dir(sf_dir, "merge_rt")
    shutil.rmtree(path, ignore_errors=True)
    events.write.partitionBy("event_type").parquet(path)
    import datetime as _dt

    up = (
        events.filter(F.col("event_id") % 37 == 0)
        .withColumn("value", F.col("value") + 1000)
        .withColumn("_op", F.lit("upsert"))
    )
    dels = events.filter(
        (F.col("event_id") % 53 == 0) & (F.col("event_id") % 37 != 0)
    ).withColumn("_op", F.lit("delete"))
    ins = spark.createDataFrame(
        [
            (-i, _dt.datetime(2024, 1, 1), 0, "merged", float(i), "{}", "upsert")
            for i in range(1, 6)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string, _op string",
    )
    updates = up.unionByName(dels).unionByName(ins)
    merge_upsert(spark, path, updates, "event_id", partition_col="event_type")
    back = spark.read.parquet(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).cast("long").alias("total_cents"),
    )


def _lang_confusion_oracle() -> str:
    from spectraplex_spark.plans.ext import _stop_count_sql  # self-import safe

    cnt = {lang: _stop_count_sql(lang) for lang in X.STOPWORDS}
    m = f"GREATEST({cnt['en']}, {cnt['es']}, {cnt['fr']}, {cnt['de']})"
    return f"""
    SELECT lang_labeled, lang_detected, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT lang AS lang_labeled, CASE
        WHEN {m} = 0 THEN 'und'
        WHEN {cnt['en']} = {m} THEN 'en'
        WHEN {cnt['es']} = {m} THEN 'es'
        WHEN {cnt['fr']} = {m} THEN 'fr'
        ELSE 'de' END AS lang_detected
      FROM documents) t
    GROUP BY lang_labeled, lang_detected
    """


@query(
    "lang_confusion_matrix",
    _lang_confusion_oracle(),
    doc="E4 language-ID QUALITY diagnostic: the labeled-vs-detected "
    "confusion matrix — the table a curation run reads before trusting "
    "the lang gate's thresholds (which labeled languages the stopword "
    "heuristic mistakes for which). Same deterministic argmax as "
    "lang_id_distribution, one groupBy on (label, prediction); at "
    "100 TB this is a partial-aggregated shuffle of #langs² rows.",
)
def lang_confusion_matrix(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("lang_labeled"),
            X.detect_language(F.col("text")).alias("lang_detected"),
        )
        .groupBy("lang_labeled", "lang_detected")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@query(
    "corpus_vocab_report",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
    u AS (SELECT doc_id, unnest(toks) AS token FROM tok)
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS total_count,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM u GROUP BY token
    HAVING COUNT(*) >= 10
    ORDER BY total_count DESC, token ASC
    """,
    doc="E4 corpus vocabulary (tokenizer-training prep): every token "
    "with total frequency >= 10, with its document frequency — the "
    "min-count-truncated vocab a word-level tokenizer or subword "
    "trainer seeds from. One explode + one groupBy; the shuffle "
    "carries (token, doc) rows with map-side partial aggregation. "
    "All-integer with lexicographic tie-break — grades exactly.",
)
def corpus_vocab_report(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    from spectraplex_spark.operators.textops import tokens as _tokens

    u = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    return (
        u.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_count"),
            F.count_distinct("doc_id").cast("long").alias("doc_freq"),
        )
        .filter(F.col("total_count") >= 10)
        .orderBy(F.desc("total_count"), F.asc("token"))
    )


@query(
    "embedding_covariance_report",
    """
    WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    p AS (SELECT ii.i AS i, jj.j AS j, e[ii.i + 1] AS xi, e[jj.j + 1] AS xj
          FROM v, UNNEST(range(0, 64)) AS ii(i), UNNEST(range(0, 64)) AS jj(j)
          WHERE jj.j >= ii.i),
    a AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(xi AS DECIMAL(38,12))) AS si,
                 SUM(CAST(xj AS DECIMAL(38,12))) AS sj,
                 SUM(CAST(xi * xj AS DECIMAL(38,12))) AS sij
          FROM p GROUP BY i, j)
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, n,
           ROUND(CAST(sij AS DOUBLE) / n
                 - (CAST(si AS DOUBLE) / n) * (CAST(sj AS DOUBLE) / n), 9) AS cov
    FROM a
    """,
    doc="E2 PCA fit input: the EXACT distributed covariance matrix of "
    "the embedding components (upper triangle, 2080 cells at dim=64). "
    "Component products of float32-origin doubles are exact in "
    "float64 (24-bit mantissas), cross-moment sums ride "
    "DECIMAL(38,12) — shuffle-order-independent, engine-identical; "
    "the final E[xy]-E[x]E[y] pays single IEEE ops, graded at 9dp "
    "(the feature_stats precedent). The shuffle carries dim(dim+1)/2 "
    "partial-aggregated cells per partition, never the corpus — at "
    "100 TB the cheapest second-moment statistic there is. The "
    "driver-side eigendecomposition + literal-matrix projection "
    "(pca_fit / pca_project, zero shuffle) are pytest-bounded: the "
    "graded artifact is the covariance they consume.",
)
def embedding_covariance_report(spark, sf_dir):
    from spectraplex_spark.operators.projections import covariance_matrix

    c = covariance_matrix(table(spark, sf_dir, "embeddings"), dim=64)
    return c.select("i", "j", "n", F.round("cov", 9).alias("cov"))


def _jl_oracle_sql(k: int = 16, dim: int = 64, quantize: int = 1024, seed: int = 42) -> str:
    from spectraplex_spark.operators.projections import jl_signs

    signs = jl_signs(dim, k, seed)
    rows = ", ".join(
        "[" + ", ".join(str(int(s)) for s in row) + "]" for row in signs
    )
    return f"""
    WITH v AS (SELECT vec_id,
                      list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> CAST(FLOOR(x * {quantize} + 0.5) AS BIGINT))
                        AS q FROM embeddings),
    s AS (SELECT CAST([{rows}] AS BIGINT[][]) AS m),
    pr AS (SELECT vec_id,
                  list_transform(range(1, {k + 1}),
                    r -> list_sum(list_transform(range(1, {dim + 1}),
                                                 i -> q[i] * m[r][i]))) AS p
           FROM v, s)
    SELECT vec_id,
           array_to_string(p, ',') AS proj_csv,
           CAST(list_sum(p) AS BIGINT) AS proj_sum
    FROM pr
    """


@query(
    "embedding_jl_projection",
    _jl_oracle_sql(),
    doc="E2 Johnson-Lindenstrauss random projection (Achlioptas ±1 "
    "form), 64→16 dims, EXACT: components snap to the 1024 integer "
    "grid (single IEEE ops — deterministic everywhere), then every "
    "output coordinate is an exact signed BIGINT sum under the SEEDED "
    "sign matrix (embedded in the oracle as SQL literals — the "
    "ann_lsh precedent). The full projected vector grades as a CSV "
    "string plus an integer checksum. Zero shuffle, expression-only, "
    "no UDF — the oblivious reducer that precedes LSH/quantization "
    "when the raw dimension is too wide; distance preservation within "
    "the standard JL bound is pytest-asserted.",
)
def embedding_jl_projection(spark, sf_dir):
    from spectraplex_spark.operators.projections import jl_project_quantized

    p = jl_project_quantized(table(spark, sf_dir, "embeddings"), k=16)
    return p.select(
        "vec_id",
        F.concat_ws(",", F.transform("projected", lambda x: x.cast("string"))).alias(
            "proj_csv"
        ),
        F.aggregate(
            "projected", F.lit(0).cast("long"), lambda a, b: a + b
        ).alias("proj_sum"),
    )


@query(
    "bigram_surprise_report",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
    g AS (SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS gram
          FROM tok, UNNEST(range(1, greatest(len(toks), 1))) AS r(i)
          WHERE len(toks) >= 2),
    c AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) < 2),
    -- every doc gets a row: < 2-token docs report n_bigrams = 0 (the
    -- explode_outer twin, review r12) — a quality gate joining this
    -- report needs a verdict for exactly the degenerate docs
    pd AS (SELECT t.doc_id, CAST(COALESCE(COUNT(g.gram), 0) AS BIGINT) AS n_bigrams
           FROM tok t LEFT JOIN g ON g.doc_id = t.doc_id GROUP BY t.doc_id),
    rd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_rare
           FROM g WHERE gram IN (SELECT gram FROM c) GROUP BY doc_id)
    SELECT pd.doc_id, pd.n_bigrams,
           COALESCE(rd.n_rare, 0) AS n_rare,
           CASE WHEN pd.n_bigrams > 0
                THEN CAST(COALESCE(rd.n_rare, 0) AS DOUBLE)
                     / CAST(pd.n_bigrams AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS rare_rate
    FROM pd LEFT JOIN rd ON pd.doc_id = rd.doc_id
    """,
    doc="E4 statistical fluency proxy — the integer-exact cousin of an "
    "n-gram LM perplexity filter (the CCNet/KenLM gate): per doc, the "
    "share of its word-bigram occurrences whose corpus count is "
    "below 2 (gibberish/OCR noise/entropy spam is full of bigrams the "
    "rest of the corpus never produces). All-integer counts, one "
    "exact int/int division; scale shape = the span miner's (one "
    "positional-shingle pass, one global bigram groupBy, one "
    "semi-join back). A real LM swaps in behind the same output shape "
    "as a pandas_udf; this proxy's verdicts grade bit-for-bit.",
)
def bigram_surprise_report(spark, sf_dir):
    from spectraplex_spark.operators.textops import bigram_surprise_report as bsr

    return bsr(table(spark, sf_dir, "documents"))


@query(
    "media_phash_planted",
    f"""
    WITH pv AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 101 = 0
    ),
    f AS (SELECT doc_id, md5({_NORM_SQL}) AS fp FROM pv)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
    FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
    """,
    doc="E1×E3 perceptual-hash media dedup (pHash: byte-raster decode → "
    "integer-quantized 2D DCT → 8×8 low-frequency sign code → Hamming "
    "pair join), graded on the planted view (every 101st doc's payload "
    "duplicated under a shifted id): identical payloads MUST collide "
    "at Hamming 0 and the pair set must equal the exact-payload-dup "
    "pairs the oracle derives independently from content hashes — "
    "certifying decode→code determinism end to end (verified "
    "pre-registration: zero organic 64-bit collisions at either SF). "
    "The DCT basis is quantized to the 2^15 integer grid so every "
    "coefficient, the median pick, and the sign code are exact "
    "integers — bit-reproducible on any executor. NEAR-similarity "
    "quality (perturbed rasters → small Hamming; the simhash-style "
    "blocked candidate join for hamming<=k) is pytest-verified; real "
    "codec decode swaps into _decode_gray with nothing else changing.",
)
def media_phash_planted(spark, sf_dir):
    from spectraplex_spark.operators.media_dedup import phash_dup_pairs
    from spectraplex_spark.operators.multimodal import attach_binary_payload

    docs = table(spark, sf_dir, "documents")
    planted = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 101 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return phash_dup_pairs(attach_binary_payload(planted))


@query(
    "simhash_planted_twins",
    """
    SELECT doc_id AS id_a, doc_id + 1000000 AS id_b, CAST(0 AS BIGINT) AS hamming
    FROM documents WHERE doc_id % 101 = 0
    """,
    doc="E1 SimHash, hash-graded at last via the planted-twin recipe "
    "(media_phash_planted precedent): every 101st doc is duplicated "
    "under a shifted id, signatures are computed over the planted "
    "view, and the exact-signature pair join is FILTERED to the "
    "planted clone relation (id_b = id_a + 1e6) — certifying the "
    "determinism chain text → tokens → weighted bit votes → 64-bit "
    "signature → pair join under the driver's hash. The filter is "
    "what makes this oracle sound: the organic corpus holds true "
    "near-identical signature collisions (6 at sf0.1) that no SQL "
    "stand-in can reproduce (xxhash64 has no DuckDB twin) — the "
    "UNRESTRICTED group/pair queries stay rows-only with that proof, "
    "and this entry adds the bit-level certification they could not "
    "carry.",
)
def simhash_planted_twins(spark, sf_dir):
    from spectraplex_spark.operators.dedup import simhash64

    docs = table(spark, sf_dir, "documents")
    planted = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 101 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    sigs = planted.select("doc_id", simhash64(F.col("text")).alias("_s"))
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("_s"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("_s"))
    return (
        a.join(b, "_s")
        .filter(F.col("id_b") == F.col("id_a") + 1000000)
        .select("id_a", "id_b", F.lit(0).cast("long").alias("hamming"))
    )


@query(
    "simhash_dup_groups_planted",
    """
    SELECT doc_id AS representative, CAST(2 AS BIGINT) AS n_docs
    FROM documents WHERE doc_id % 101 = 0
    """,
    doc="E1 SimHash GROUPING, hash-graded via the planted discipline — "
    "the r6 verdict's stretch ask that retires the catalog's last "
    "rows-only family. simhash_dup_groups runs over a RESTRICTED "
    "planted view (every 101st doc plus its exact twin at +1e6): "
    "identical text guarantees identical signatures, so each group is "
    "exactly {doc, twin} and the oracle reconstructs (representative "
    "= min id = doc_id, n_docs = 2) without ever computing a "
    "signature. The signature column itself is dropped (xxhash64 has "
    "no DuckDB twin — that's WHY the unrestricted query is rows-only). "
    "Soundness guard: an organic signature collision WITHIN the 1/101 "
    "subset would merge groups and invalidate the reconstruction, so "
    "the builder asserts every group has exactly 2 members and fails "
    "LOUDLY otherwise (verified clean at both SFs; the unrestricted "
    "corpus's 6 organic collisions live outside this subset). The "
    "unrestricted simhash_dup_groups stays in the catalog as the "
    "documented rows-only operator.",
)
def simhash_dup_groups_planted(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    sub = docs.filter(F.col("doc_id") % 101 == 0)
    twins = sub.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    groups = D.simhash_dup_groups(sub.unionByName(twins))
    odd = groups.filter(F.col("n_docs") != 2).count()
    if odd:  # loud, not a silent hash mismatch: the oracle's
        # reconstruction is only sound when every group is {doc, twin}
        raise AssertionError(
            f"simhash_dup_groups_planted: {odd} group(s) with n_docs != 2 — "
            "organic signature collision inside the 1/101 subset; planted "
            "reconstruction unsound for this corpus"
        )
    return groups.select(
        F.col("representative").cast("long").alias("representative"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


@query(
    "simhash_neighbor_pairs_planted",
    """
    SELECT doc_id AS id_a, doc_id + 1000000 AS id_b, CAST(0 AS BIGINT) AS hamming
    FROM documents WHERE doc_id % 101 = 0
    """,
    doc="E1 SimHash NEAR-MISS JOIN, hash-graded via the planted "
    "discipline: the full 4×16-bit-block candidate join "
    "(simhash_neighbor_pairs — posexplode into block buckets, "
    "equi-join on (block, 2-byte key), bit_count(xor) verify, "
    "dedup) runs over the corpus plus exact twins of every 101st "
    "doc, and the output is filtered to the planted clone relation. "
    "Pigeonhole recall is 1.0 for Hamming ≤ 3, and identical text "
    "gives Hamming exactly 0, so the planted filter certifies the "
    "ENTIRE blocked-join machinery bit-for-bit (the "
    "simhash_planted_twins entry certifies only the exact-signature "
    "equi-join; this one grades the scale path the unrestricted "
    "rows-only query actually uses).",
)
def simhash_neighbor_pairs_planted(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.unionByName(
        docs.filter(F.col("doc_id") % 101 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    pairs = D.simhash_neighbor_pairs(planted)
    return pairs.filter(F.col("id_b") == F.col("id_a") + 1000000).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


@query(
    "webdataset_roundtrip",
    """
    WITH r AS (SELECT doc_id, text,
                      CAST((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 100 AS INT)
                        AS shard
               FROM documents)
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(MIN(doc_id) AS BIGINT) AS min_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_id,
           md5(string_agg(md5(text), '' ORDER BY doc_id)) AS content_md5
    FROM r GROUP BY shard
    """,
    doc="K3 completion — the TRAINING-LOADER export: documents written "
    "as WebDataset-style tar shards (stdlib tarfile, one groupBy "
    "routes each shard to one task, entries key-sorted with zeroed "
    "mtimes so shard BYTES are deterministic — re-exports are "
    "byte-identical, pytest-pinned), then read back DISTRIBUTED "
    "(binaryFile source + Arrow untar pass — no driver-side file "
    "handling either direction). Graded per shard: count, id range, "
    "and an order-chained md5 content digest must match the oracle's "
    "independent reconstruction of the shard assignment — the hash "
    "matches only if every sample landed in the right shard with "
    "byte-exact text.",
)
def webdataset_roundtrip(spark, sf_dir):
    import shutil

    from spectraplex_spark.sources.webdataset import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    docs = table(spark, sf_dir, "documents")
    out = _scratch_dir(sf_dir, "wds_rt")
    shutil.rmtree(out, ignore_errors=True)
    write_webdataset_shards(docs, out, samples_per_shard=100)
    back = read_webdataset_shards(spark, out)
    chained = F.md5(
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("doc_id"), F.md5("text").alias("_h")))
                ),
                lambda s: s["_h"],
            ),
        )
    )
    return back.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id"),
        chained.alias("content_md5"),
    )


@query(
    "data_quality_report",
    """
    WITH base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
    checks AS (
      SELECT 'not_null(event_id)' AS rule, 'not_null' AS kind,
             CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v
      FROM events
      UNION ALL
      SELECT 'unique(event_id)', 'unique',
             CAST(COUNT(event_id) - COUNT(DISTINCT event_id) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'not_null(ts)', 'not_null',
             CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'in_set(event_type)', 'in_set',
             CAST(SUM(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
               ('click','view','purchase','signup','error') THEN 1 ELSE 0 END) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'in_range(value)', 'in_range',
             CAST(SUM(CASE WHEN value IS NOT NULL AND (value < 0 OR value > 1000000)
               THEN 1 ELSE 0 END) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'value_has_cents_precision', 'satisfies',
             CAST(SUM(CASE WHEN NOT (FLOOR(value * 100 + 0.5) >= 0) THEN 1 ELSE 0 END)
               AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'references(user_id)', 'references',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT user_id FROM events WHERE user_id IS NOT NULL
                EXCEPT ALL
                SELECT user_id FROM events WHERE user_id IN
                  (SELECT c_custkey FROM customer)) t)
    )
    SELECT rule, kind, base.n AS n_rows, v AS n_violations, v = 0 AS passed
    FROM checks, base
    """,
    doc="The reference's DDL integrity net re-expressed for the lake "
    "(Postgres enforces PRIMARY KEY/NOT NULL/enum domains/REFERENCES "
    "— init.sql:7-31, add_wallet:12; parquet enforces nothing): "
    "declarative expectations evaluated in ONE aggregation pass "
    "(every non-referential rule folds into a single partial-"
    "aggregated scan regardless of rule count) plus one column-pruned "
    "anti-join per foreign key. Exact BIGINT violation counts — the "
    "report (counts AND pass/fail verdicts) grades bit-for-bit; "
    "violation-counting correctness on dirty data is pytest-pinned "
    "with planted nulls/dups/orphans in tests/test_expectations.py.",
)
def data_quality_report(spark, sf_dir):
    from spectraplex_spark.operators import expectations as E

    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer")
    rules = [
        E.not_null("event_id"),
        E.unique("event_id"),
        E.not_null("ts"),
        E.in_set("event_type", ["click", "view", "purchase", "signup", "error"]),
        E.in_range("value", 0, 1_000_000),
        E.satisfies(
            "value_has_cents_precision",
            F.floor(F.col("value") * 100 + 0.5) >= 0,
        ),
        E.references("user_id", cust, "c_custkey"),
    ]
    return E.check_expectations(ev, rules)


@query(
    "epoch_append_roundtrip",
    """
    SELECT (SELECT COUNT(*) FROM events WHERE event_id % 3 = 0)
               AS committed_before_adopt,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT event_id) AS n_ids,
           CAST(SUM(CAST(value AS DECIMAL(38, 6))) AS DOUBLE) AS total_value
    FROM events
    """,
    doc="K1/K2 append sinks under the epoch-commit protocol "
    "(sources/commit.py) certified end to end: batch 1 (event_id % 3 "
    "== 0) lands and commits epoch 0; batch 2 (the rest) lands with "
    "its epoch commit suppressed — the simulated crash between "
    "Spark's job commit and the epoch marker. The committed view must "
    "show EXACTLY batch 1 (committed_before_adopt, hash-pinned to the "
    "oracle's subquery count — a torn batch is invisible, never a "
    "partial read), a replay of the torn batch must stay a no-op "
    "(raw-directory anti-join), and adopt_uncommitted must roll the "
    "orphaned files forward so the final committed view holds every "
    "event exactly once (count + distinct ids + decimal-exact value "
    "sum vs the source parquet). This closes the advice-ledger gap "
    "that bronze/silver appends sat outside the manifest protocol — "
    "the reference's Postgres INSERT atomicity (repo.rs:13-71), "
    "re-expressed for parquet batches.",
)
def epoch_append_roundtrip(spark, sf_dir):
    import shutil

    from spectraplex_spark.sources.commit import (
        adopt_uncommitted,
        read_committed_epochs,
        validate_epochs,
    )
    from spectraplex_spark.sources.io import idempotent_append

    ev = table(spark, sf_dir, "events").withColumnRenamed("event_id", "id")
    path = _scratch_dir(sf_dir, "epoch_sink")
    shutil.rmtree(path, ignore_errors=True)
    idempotent_append(
        ev.filter(F.col("id") % 3 == 0), path, id_col="id", partition_by=("event_type",)
    )
    idempotent_append(
        ev, path, id_col="id", partition_by=("event_type",), commit_epochs=False
    )
    n_before = read_committed_epochs(spark, path).count()
    n_replay = idempotent_append(ev, path, id_col="id", partition_by=("event_type",))
    if n_replay:  # torn batch must NOT be re-admitted by a replay
        raise AssertionError(f"replay duplicated a torn batch: {n_replay} rows")
    adopt_uncommitted(path)
    if validate_epochs(path)["uncommitted"]:
        raise AssertionError("adopt_uncommitted left orphaned files")
    committed = read_committed_epochs(spark, path)
    return committed.agg(
        F.lit(int(n_before)).alias("committed_before_adopt"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("id").alias("n_ids"),
        F.sum(F.col("value").cast(T.DecimalType(38, 6))).cast("double").alias("total_value"),
    )


@query(
    "encoding_quality_report",
    """
    WITH dirty AS (
      SELECT source,
             text || CASE
               WHEN doc_id % 7 = 0 THEN ' ' || chr(65533) || chr(65533) || 'x' || chr(1)
               WHEN doc_id % 11 = 0 THEN chr(65533)
               WHEN doc_id % 13 = 0 THEN chr(2) || chr(127)
               ELSE ''
             END AS t
      FROM documents
    )
    SELECT source,
           COUNT(*) AS docs,
           CAST(SUM(LENGTH(t) - LENGTH(REPLACE(t, chr(65533), ''))) AS BIGINT)
               AS replacement_chars,
           CAST(SUM(LENGTH(t) - LENGTH(regexp_replace(t, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'))) AS BIGINT)
               AS control_chars,
           CAST(SUM(CASE WHEN LENGTH(t) > LENGTH(REPLACE(t, chr(65533), '')) THEN 1 ELSE 0 END) AS BIGINT)
               AS mojibake_docs,
           CAST(SUM(CASE WHEN LENGTH(t) > LENGTH(regexp_replace(t, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')) THEN 1 ELSE 0 END) AS BIGINT)
               AS control_docs,
           CAST(SUM(CASE WHEN LENGTH(t) = LENGTH(REPLACE(t, chr(65533), ''))
                     AND LENGTH(t) = LENGTH(regexp_replace(t, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'))
                    THEN 1 ELSE 0 END) AS BIGINT) AS clean_docs
    FROM dirty
    GROUP BY source
    ORDER BY source
    """,
    doc="E4 encoding/garbage gate — the CCNet/ftfy-style stage a "
    "tokenizer-training pipeline runs before anything else: U+FFFD "
    "replacement characters (a destroyed decode) and raw C0/DEL "
    "control bytes (binary decoded as text) are counted per source "
    "with exact integers, so the report bit-grades. The corpus is "
    "clean ASCII, so both engines plant the SAME deterministic "
    "mojibake (doc_id mod 7/11/13 suffixes built from chr() on both "
    "sides) and the detector must find exactly it — the planted-view "
    "discipline. Length-difference counting keeps the pass in JVM "
    "expressions: one narrow scan, one |sources|-row shuffle.",
)
def encoding_quality_report(spark, sf_dir):
    from spectraplex_spark.operators.textops import encoding_report

    docs = table(spark, sf_dir, "documents")
    suffix = (
        F.when(F.col("doc_id") % 7 == 0, F.lit(" ��x\x01"))
        .when(F.col("doc_id") % 11 == 0, F.lit("�"))
        .when(F.col("doc_id") % 13 == 0, F.lit("\x02\x7f"))
        .otherwise(F.lit(""))
    )
    dirty = docs.select("source", F.concat(F.col("text"), suffix).alias("text"))
    return encoding_report(dirty).orderBy("source")


# --- Gopher/MassiveText repetition signals (r7) ---------------------------

def _duck_grams(n: int) -> str:
    """DuckDB twin of repetition.ngram_strings over a ``toks`` column."""
    return (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(range(1, len(toks)-{n}+2), "
        f"i -> array_to_string(list_slice(toks, i, i+{n}-1), ' ')) "
        f"ELSE [] END"
    )


def _duck_top(n: int) -> str:
    """CTE body: per-doc most-frequent n-gram (cnt DESC, gram ASC — the
    twin of the strict-> scan over the sorted array)."""
    return (
        f"SELECT doc_id, cnt, CAST(length(gram) AS BIGINT) AS glen, "
        f"ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn "
        f"FROM (SELECT doc_id, gram, COUNT(*) AS cnt FROM "
        f"(SELECT doc_id, unnest({_duck_grams(n)}) AS gram FROM base) GROUP BY 1, 2)"
    )


def _duck_dup(n: int) -> str:
    """CTE body: per-doc characters covered by duplicated n-grams."""
    return (
        f"SELECT doc_id, CAST(SUM(CASE WHEN cnt > 1 THEN cnt * length(gram) "
        f"ELSE 0 END) AS BIGINT) AS dchars "
        f"FROM (SELECT doc_id, gram, COUNT(*) AS cnt FROM "
        f"(SELECT doc_id, unnest({_duck_grams(n)}) AS gram FROM base) GROUP BY 1, 2) "
        f"GROUP BY doc_id"
    )


_REP_BASE_SQL = (
    f"SELECT doc_id, source, CAST(length({_NORM_SQL}) AS BIGINT) AS total, "
    f"{_TOKENS_SQL} AS toks FROM documents"
)


@query(
    "gopher_repetition_report",
    f"""
    WITH base AS ({_REP_BASE_SQL}),
    top2 AS ({_duck_top(2)}),
    top3 AS ({_duck_top(3)}),
    dup5 AS ({_duck_dup(5)}),
    dup6 AS ({_duck_dup(6)})
    SELECT b.doc_id,
           COALESCE(CASE WHEN b.total > 0 AND t2.cnt > 0
                    THEN CAST(t2.cnt * t2.glen AS DOUBLE) / CAST(b.total AS DOUBLE)
                    END, CAST(0 AS DOUBLE)) AS top2_gram_frac,
           COALESCE(CASE WHEN b.total > 0 AND t3.cnt > 0
                    THEN CAST(t3.cnt * t3.glen AS DOUBLE) / CAST(b.total AS DOUBLE)
                    END, CAST(0 AS DOUBLE)) AS top3_gram_frac,
           COALESCE(CASE WHEN b.total > 0
                    THEN CAST(d5.dchars AS DOUBLE) / CAST(b.total AS DOUBLE)
                    END, CAST(0 AS DOUBLE)) AS dup5_gram_frac,
           COALESCE(CASE WHEN b.total > 0
                    THEN CAST(d6.dchars AS DOUBLE) / CAST(b.total AS DOUBLE)
                    END, CAST(0 AS DOUBLE)) AS dup6_gram_frac
    FROM base b
    LEFT JOIN top2 t2 ON t2.doc_id = b.doc_id AND t2.rn = 1
    LEFT JOIN top3 t3 ON t3.doc_id = b.doc_id AND t3.rn = 1
    LEFT JOIN dup5 d5 ON d5.doc_id = b.doc_id
    LEFT JOIN dup6 d6 ON d6.doc_id = b.doc_id
    ORDER BY b.doc_id
    """,
    doc="E4 Gopher/MassiveText repetition signals (Rae et al. 2021 A1): "
    "per-doc char fraction of the most frequent 2-/3-gram and of "
    "duplicated 5-/6-grams. Spark side is one zero-shuffle HOF "
    "projection (sorted-array run-length scans, no explode); grams are "
    "space-joined, ties resolve lexicographically-smallest, numerators "
    "and denominators are exact BIGINTs and the single int/int → IEEE "
    "double division bit-agrees across engines (no ROUND needed). The "
    "non-overlap-adjusted variant (can exceed 1.0 on looping text) is "
    "deliberate and documented in operators/repetition.py.",
)
def gopher_repetition_report(spark, sf_dir):
    from spectraplex_spark.operators.repetition import repetition_report

    # The operator is a narrow per-row map with heavy per-row n-gram
    # work: spread=True gives it bounded scan parallelism adaptively
    # (registry._spread_unsplittable_scan), with no hard-coded
    # repartition (r14: a literal 32 defeated the driver's lower-core
    # scaling sweeps; r15: table-level spread unwound to opt-in).
    docs = table(spark, sf_dir, "documents", spread=True)
    return (
        repetition_report(docs, top_ns=(2, 3), dup_ns=(5, 6))
        .select(
            "doc_id",
            "top2_gram_frac",
            "top3_gram_frac",
            "dup5_gram_frac",
            "dup6_gram_frac",
        )
        .orderBy("doc_id")
    )


@query(
    "gopher_repetition_gate",
    f"""
    WITH base AS ({_REP_BASE_SQL}),
    top2 AS ({_duck_top(2)}),
    dup5 AS ({_duck_dup(5)}),
    j AS (
      SELECT b.source, b.total,
             COALESCE(t2.cnt * t2.glen, 0) AS top2_chars,
             COALESCE(d5.dchars, 0) AS dup5_chars
      FROM base b
      LEFT JOIN top2 t2 ON t2.doc_id = b.doc_id AND t2.rn = 1
      LEFT JOIN dup5 d5 ON d5.doc_id = b.doc_id
    )
    SELECT source,
           COUNT(*) AS docs,
           CAST(SUM(CASE WHEN total > 0 AND top2_chars * 100 < total * 20
                          AND dup5_chars * 100 < total * 30
                    THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs
    FROM j
    GROUP BY source
    ORDER BY source
    """,
    doc="E4 Gopher repetition GATE: per-source survivor counts under "
    "top2<0.20 and dup5<0.30, evaluated as exact BIGINT cross-products "
    "(chars*den < total*num) so threshold-boundary docs cannot flip "
    "between engines — the quality-classifier integer-grid discipline.",
)
def gopher_repetition_gate(spark, sf_dir):
    from spectraplex_spark.operators.repetition import repetition_gate

    docs = table(spark, sf_dir, "documents", spread=True)  # see report
    gated = repetition_gate(docs)
    return (
        gated.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col("repetition_pass").cast("long")).alias("kept_docs"),
        )
        .orderBy("source")
    )


# --- URL canonicalization + per-domain policy (r7) -------------------------

# Both engines synthesize the SAME URL variants from documents (the
# planted-view discipline: the corpus has no URL column, so the
# canonicalizer must collapse exactly the planted variant classes).
# doc_id%5 picks the variant, doc_id%25 the page:
#   0: https://www.<src>.example.com/docs/<p>          (www + plain)
#   1: HTTPS://<src>.EXAMPLE.COM:443/docs/<p>/         (case+port+slash)
#   2: https://<src>.example.com/%64ocs/<p>?utm_source=feed&ref=x
#      (percent-encoded unreserved 'd' — must decode to /docs/)
#   3: https://www.<src>.example.com/docs/<p>?b=2&a=1
#   4: https://<src>.example.com/docs/<p>?a=1&utm_campaign=z&b=2
# 0/1/2 collapse to one canonical; 3/4 to that canonical + '?a=1&b=2'.
_URL_VARIANT_SQL = """
    CASE doc_id % 5
      WHEN 0 THEN 'https://www.' || source || '.example.com/docs/' || (doc_id % 25)
      WHEN 1 THEN 'HTTPS://' || source || '.EXAMPLE.COM:443/docs/' || (doc_id % 25) || '/'
      WHEN 2 THEN 'https://' || source || '.example.com/%64ocs/' || (doc_id % 25) || '?utm_source=feed&ref=x'
      WHEN 3 THEN 'https://www.' || source || '.example.com/docs/' || (doc_id % 25) || '?b=2&a=1'
      ELSE 'https://' || source || '.example.com/docs/' || (doc_id % 25) || '?a=1&utm_campaign=z&b=2'
    END
"""

# DuckDB twin of urlops.canonicalize_url, step for step, as a CTE chain
# over (doc_id, u). TRACKING_PARAMS mirrored from operators/urlops.py.
# DuckDB twin of urlops.percent_decode_unreserved over a `pieces`
# column (string_split on '%'): piece 1 verbatim, every later piece
# was preceded by one '%' — two leading hex digits whose value is
# RFC 3986 unreserved decode, everything else keeps its '%'.
_DUCK_HEXVAL = (
    "((strpos('0123456789abcdef', lower(substr(p, 1, 1))) - 1) * 16"
    " + (strpos('0123456789abcdef', lower(substr(p, 2, 1))) - 1))"
)
_DUCK_DECODE = f"""pieces[1] || COALESCE(array_to_string(list_transform(pieces[2:], p -> CASE
               WHEN regexp_matches(p, '^[0-9A-Fa-f]{{2}}')
                    AND ({_DUCK_HEXVAL} BETWEEN 48 AND 57
                         OR {_DUCK_HEXVAL} BETWEEN 65 AND 90
                         OR {_DUCK_HEXVAL} BETWEEN 97 AND 122
                         OR {_DUCK_HEXVAL} IN (45, 46, 95, 126))
               THEN chr(CAST({_DUCK_HEXVAL} AS INTEGER)) || substr(p, 3)
               -- kept (reserved) escapes canonicalize hex to UPPER case
               -- (RFC 3986 6.2.2.1; review finding r13)
               WHEN regexp_matches(p, '^[0-9A-Fa-f]{{2}}')
               THEN '%' || upper(substr(p, 1, 2)) || substr(p, 3)
               ELSE '%' || p END), ''), '')"""

_DUCK_CANON_CTES = f"""
    s1 AS (SELECT doc_id,
             lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             regexp_replace(regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '#.*$', '') AS raw_rest
           FROM u0),
    s1d AS (SELECT doc_id, scheme, {_DUCK_DECODE} AS rest
            FROM (SELECT doc_id, scheme, string_split(raw_rest, '%') AS pieces FROM s1)),
    s2 AS (SELECT doc_id, scheme,
             regexp_replace(rest, '\\?.*$', '') AS hostpath,
             CASE WHEN contains(rest, '?')
                  THEN regexp_replace(rest, '^[^?]*\\?', '') ELSE '' END AS query
           FROM s1d),
    s3 AS (SELECT doc_id, scheme,
             CASE WHEN scheme = 'http' THEN regexp_replace(h, ':80$', '')
                  WHEN scheme = 'https' THEN regexp_replace(h, ':443$', '')
                  ELSE h END AS host,
             -- strip ALL trailing slashes then restore the bare root
             -- (idempotent canon; review finding r13)
             CASE WHEN regexp_replace(p, '/+$', '') = '' THEN '/'
                  ELSE regexp_replace(p, '/+$', '') END AS path,
             query
           FROM (SELECT doc_id, scheme,
                        -- userinfo stripped before the case fold
                        -- (review finding r13)
                        regexp_replace(lower(regexp_replace(regexp_extract(hostpath, '^([^/]*)', 1), '^.*@', '')), '^www\\.', '') AS h,
                        regexp_replace(hostpath, '^[^/]*', '') AS p,
                        query
                 FROM s2)),
    s4 AS (SELECT doc_id,
             CASE WHEN scheme <> '' THEN
               scheme || '://' || host || path ||
               CASE WHEN q <> '' THEN '?' || q ELSE '' END
             END AS canonical_url
           FROM (SELECT doc_id, scheme, host, path,
                        array_to_string(list_sort(list_filter(string_split(query, '&'),
                          p -> p <> '' AND NOT (
                            starts_with(split_part(p, '=', 1), 'utm_')
                            OR split_part(p, '=', 1) IN ('fbclid','gclid','mc_cid','mc_eid','ref')))), '&') AS q
                 FROM s3))
"""


def _planted_urls(docs):
    """Spark twin of _URL_VARIANT_SQL."""
    page = (F.col("doc_id") % 25).cast("string")
    base = F.concat(F.col("source"), F.lit(".example.com/docs/"), page)
    ubase = F.concat(F.col("source"), F.lit(".EXAMPLE.COM:443/docs/"), page)
    url = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("https://www."), base))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("HTTPS://"), ubase, F.lit("/")))
        .when(
            F.col("doc_id") % 5 == 2,
            F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/%64ocs/"),
                page,
                F.lit("?utm_source=feed&ref=x"),
            ),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(F.lit("https://www."), base, F.lit("?b=2&a=1")),
        )
        .otherwise(
            F.concat(F.lit("https://"), base, F.lit("?a=1&utm_campaign=z&b=2"))
        )
    )
    return docs.select("doc_id", url.alias("url"))


@query(
    "url_canonical_dedup",
    f"""
    WITH u0 AS (SELECT doc_id, {_URL_VARIANT_SQL} AS u FROM documents),
    {_DUCK_CANON_CTES}
    SELECT canonical_url,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS representative
    FROM s4
    GROUP BY canonical_url
    ORDER BY canonical_url
    """,
    doc="E4 canonical-URL dedup (the RefinedWeb/C4 web-curation stage): "
    "host case, www., default ports, fragments, tracking params "
    "(utm_*/fbclid/gclid/ref/...) and query-param ORDER are all "
    "normalized by pure string/array expressions (zero shuffle until "
    "the canonical-string groupBy — only the canonical URL shuffles, "
    "the dedup_exact_docs discipline). Both engines synthesize the "
    "same 5 planted variant classes and the canonicalizer must "
    "collapse exactly classes {{0,1,2}} and {{3,4}}; every "
    "canonicalization step has a step-for-step DuckDB twin.",
)
def url_canonical_dedup(spark, sf_dir):
    from spectraplex_spark.operators.urlops import canonical_url_dedup

    docs = table(spark, sf_dir, "documents")
    return canonical_url_dedup(_planted_urls(docs)).orderBy("canonical_url")


@query(
    "domain_cap_sample",
    f"""
    WITH u0 AS (SELECT doc_id,
                  'https://' || CASE doc_id % 3 WHEN 0 THEN 'a.' WHEN 1 THEN 'b.' ELSE '' END
                  || source
                  || CASE WHEN doc_id % 7 = 3 THEN 'site.co.uk/p/' ELSE 'site.com/p/' END
                  || (doc_id % 50) AS u
                FROM documents),
    {_DUCK_CANON_CTES}
    , h AS (SELECT doc_id,
              regexp_replace(regexp_extract(canonical_url, '^[a-z][a-z0-9+.-]*://([^/?]*)', 1), ':[0-9]+$', '') AS host
            FROM s4),
    d AS (SELECT doc_id,
            CASE WHEN ends_with(host, '.co.uk')
                 THEN regexp_extract(host, '([^.]+\\.co\\.uk)$', 1)
                 ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END AS domain
          FROM h),
    r AS (SELECT domain, doc_id,
            ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS rk
          FROM d)
    SELECT domain, doc_id FROM r WHERE rk <= 5
    ORDER BY domain, doc_id
    """,
    doc="E4 per-domain quota (stops one site dominating the training "
    "mix): registered-domain extraction (PSL-subset aware — hosts on a "
    "known two-label public suffix like .co.uk keep THREE labels; the "
    "full public-suffix list swaps in as a broadcast table for "
    "production), port-stripped, + a cap-5 deterministic window keyed "
    "by domain — one window shuffle, the cap_per_source shape. Planted "
    "classes: subdomain variants (a./b./bare) must collapse to one "
    "registered domain, and every-7th doc lives under .co.uk where "
    "last-two-labels would wrongly merge ALL sources into 'co.uk'. The "
    "oracle mirrors the PSL decision for the one planted suffix.",
)
def domain_cap_sample(spark, sf_dir):
    from spectraplex_spark.operators.urlops import cap_per_domain

    docs = table(spark, sf_dir, "documents")
    sub = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("a."))
        .when(F.col("doc_id") % 3 == 1, F.lit("b."))
        .otherwise(F.lit(""))
    )
    site = F.when(F.col("doc_id") % 7 == 3, F.lit("site.co.uk/p/")).otherwise(
        F.lit("site.com/p/")
    )
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            sub,
            F.col("source"),
            site,
            (F.col("doc_id") % 50).cast("string"),
        ).alias("url"),
    )
    return (
        cap_per_domain(urls, cap=5)
        .select("domain", "doc_id")
        .orderBy("domain", "doc_id")
    )


@query(
    "domain_cap_scalable",
    f"""
    WITH u0 AS (SELECT doc_id,
                  CASE WHEN doc_id % 97 = 5 THEN 'schemeless.example/p'
                       ELSE 'https://'
                            || CASE doc_id % 3 WHEN 0 THEN 'a.' WHEN 1 THEN 'b.' ELSE '' END
                            || CASE WHEN doc_id % 2 = 0 THEN 'megacrawl' ELSE source END
                            || 'site.com/p/' || doc_id END AS u
                FROM documents),
    {_DUCK_CANON_CTES}
    , h AS (SELECT doc_id,
              regexp_replace(regexp_extract(canonical_url, '^[a-z][a-z0-9+.-]*://([^/?]*)', 1), ':[0-9]+$', '') AS host
            FROM s4),
    d AS (SELECT doc_id,
            CASE WHEN host IS NULL THEN NULL
                 ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END AS domain
          FROM h),
    r AS (SELECT domain, doc_id,
            ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS rk
          FROM d WHERE domain IS NOT NULL)
    SELECT domain, doc_id FROM r WHERE rk <= 5
    UNION ALL
    SELECT domain, doc_id FROM d WHERE domain IS NULL
    ORDER BY domain NULLS FIRST, doc_id
    """,
    doc="E4 the domain cap's SCALE twin, graded on a PLANTED hot domain "
    "(half the corpus collapses onto megacrawlsite.com — the one-site-"
    "dominates-the-crawl skew that stalls a global domain window on "
    "one task): cap_per_domain_scalable prefilters hot domains by a "
    "per-domain APPROXIMATE-PERCENTILE threshold on the order column "
    "(power-of-two fraction grid; the ranking key here is the raw id, "
    "so the source quota's md5-prefix trick doesn't apply), proves "
    ">= min(cap, count) survivors per hot domain with a bounded "
    "verify, and falls back provably on a shortfall — so survivors "
    "are IDENTICAL to the one-window form, which IS the oracle. "
    "Scheme-less rows (every 97th doc) grade the NULL-domain "
    "passthrough contract; cold srcN-site domains grade the untouched "
    "path. Driver-side state is bounded by the hot-domain count.",
)
def domain_cap_scalable(spark, sf_dir):
    from spectraplex_spark.operators.urlops import cap_per_domain_scalable

    docs = table(spark, sf_dir, "documents")
    sub = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("a."))
        .when(F.col("doc_id") % 3 == 1, F.lit("b."))
        .otherwise(F.lit(""))
    )
    site = F.concat(
        F.lit("https://"),
        sub,
        F.when(F.col("doc_id") % 2 == 0, F.lit("megacrawl")).otherwise(
            F.col("source")
        ),
        F.lit("site.com/p/"),
        F.col("doc_id").cast("string"),
    )
    url = F.when(F.col("doc_id") % 97 == 5, F.lit("schemeless.example/p")).otherwise(
        site
    )
    # the table-level layout-guarded spread already parallelizes the
    # single-split local parquet (registry._spread_unsplittable_scan)
    urls = docs.select("doc_id", url.alias("url"))
    return (
        cap_per_domain_scalable(urls, cap=5, hot_factor=4)
        .select("domain", "doc_id")
        .orderBy(F.asc_nulls_first("domain"), "doc_id")
    )


@query(
    "orc_roundtrip_events",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(38, 6))) AS DOUBLE) AS total_value,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY event_type
    """,
    doc="S3/K3 ORC interchange certified end to end — the binary/columnar "
    "third leg of the interchange matrix (JSONL text, CSV tabular text, "
    "ORC Hive-ecosystem columnar): events written through the ORC sink "
    "and read back through the schema-pinned ORC source, then aggregated "
    "per event type against the ORIGINAL parquet's oracle. Timestamps "
    "and doubles are binary-preserved by the format, so a hash mismatch "
    "here would indicate a reader/writer defect, not a format limit.",
)
def orc_roundtrip_events(spark, sf_dir):
    import shutil

    from spectraplex_spark.sources.io import read_orc, write_orc

    ev = table(spark, sf_dir, "events")
    path = _scratch_dir(sf_dir, "orc_rt")
    shutil.rmtree(path, ignore_errors=True)
    write_orc(ev, path)
    back = read_orc(spark, path, ev.schema)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast(T.DecimalType(38, 6))).cast("double").alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "conservation_audit_report",
    """
    SELECT 'tx-' || event_id AS id,
           'sig' || event_id AS tx_hash,
           CASE WHEN event_id % 41 = 0 THEN NULL
                ELSE CAST(-5000 + CASE WHEN event_id % 37 = 0 THEN 1 ELSE 0 END AS BIGINT)
           END AS delta_sum,
           CASE WHEN event_id % 41 = 0 THEN NULL ELSE CAST(5000 AS BIGINT) END AS fee,
           (event_id % 41 <> 0 AND event_id % 37 <> 0) AS balanced
    FROM events
    WHERE event_id % 43 <> 0
    ORDER BY id
    """,
    doc="K-family hardening: the tx-level lamport-conservation audit "
    "(sum(post)-sum(pre) must equal -fee) a financial pipeline runs "
    "before trusting silver. Both engines derive the same bronze corpus "
    "from events (x = event_id-based lamport moves; every 37th tx "
    "planted 1 lamport out of balance, every 41st meta-less, every "
    "43rd non-solana) — but the Spark side goes through the REAL path: "
    "JSON built with to_json, parsed back with from_json against "
    "SOLANA_TX_SCHEMA, zip_with delta fold in exact BIGINT lamports — "
    "while the oracle is the closed form. The audit must flag exactly "
    "the planted violations: meta-less rows report null sums and "
    "balanced=false (un-auditable is not balanced), non-solana rows "
    "are dispatched away.",
)
def conservation_audit_report(spark, sf_dir):
    from spectraplex_spark.operators.audit import conservation_report

    eid = F.col("event_id")
    x = (eid % 1000000 + 1).cast("long")
    fee = F.lit(5000).cast("long")
    pre0 = (F.lit(10_000_000_000) + eid % 7).cast("long")
    pre1 = (F.lit(500) + eid % 11).cast("long")
    corrupt = F.when(eid % 37 == 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
    meta_json = F.to_json(
        F.struct(
            F.struct(
                fee.alias("fee"),
                F.array(pre0, pre1).alias("preBalances"),
                F.array(pre0 - x - fee, pre1 + x + corrupt).alias("postBalances"),
            ).alias("meta")
        )
    )
    bronze = table(spark, sf_dir, "events").select(
        F.concat(F.lit("tx-"), eid.cast("string")).alias("id"),
        F.concat(F.lit("sig"), eid.cast("string")).alias("tx_hash"),
        F.when(eid % 43 == 0, F.lit("ethereum")).otherwise(F.lit("solana")).alias("chain"),
        F.when(eid % 41 == 0, F.lit("{}")).otherwise(meta_json).alias("raw_metadata"),
    )
    return conservation_report(bronze).orderBy("id")


@query(
    "bpe_merge_pairs",
    f"""
    WITH tok AS (SELECT {_TOKENS_SQL} AS toks FROM documents),
    vocab AS (SELECT token AS w, CAST(COUNT(*) AS BIGINT) AS freq
              FROM (SELECT unnest(toks) AS token FROM tok) GROUP BY token),
    pairs AS (SELECT unnest(CASE WHEN length(w) >= 2
                            THEN list_transform(range(1, length(w)), i -> substr(w, i, 2))
                            ELSE [] END) AS pair,
                     freq
              FROM vocab)
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_freq
    FROM pairs
    GROUP BY pair
    ORDER BY pair_freq DESC, pair ASC
    LIMIT 30
    """,
    doc="E4 tokenizer training, first BPE merge iteration (Sennrich et "
    "al. 2016): top-30 adjacent character-pair frequencies weighted by "
    "word frequency. The corpus collapses to a word-frequency table "
    "first, so pair extraction runs over the DISTINCT VOCAB — the "
    "second shuffle is vocab-sized regardless of corpus size (the "
    "100 TB property; later iterations rescan only the vocab with "
    "updated segmentation). All-integer counts, lexicographic "
    "tie-break, TakeOrderedAndProject top-k.",
)
def bpe_merge_pairs(spark, sf_dir):
    from spectraplex_spark.operators.textops import bpe_merge_candidates

    docs = table(spark, sf_dir, "documents")
    return bpe_merge_candidates(docs, k=30)


def _bpe_train_oracle_sql(n_merges: int = 10, min_freq: int = 2) -> str:
    """DuckDB twin of bpe.bpe_train, fully UNROLLED: one (pair-count →
    one-row argmax → conditional re-segmentation) CTE triple per merge
    iteration. The greedy left-to-right non-overlapping merge is a
    list_reduce whose accumulator is the segmented word joined by ' '
    (tokens never contain spaces); the carry is the accumulator's last
    token, and a just-merged token can never re-match ``a`` in the same
    pass (merged = a||b, b non-empty) — exactly merge_pair's struct-
    carry semantics. Early stop: a sub-threshold best pair makes the
    re-segmentation a no-op, so the vocab — and therefore every later
    best — is a fixed point; filtering the unioned winners on
    pf >= min_freq reproduces the loop break."""
    ctes = [
        "v0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,"
        " string_split(w, '') AS symbols"
        f" FROM (SELECT unnest({_TOKENS_SQL}) AS w FROM documents) GROUP BY w)"
    ]
    for i in range(n_merges):
        ctes.append(
            f"p{i} AS (SELECT a, b, SUM(freq) AS pf FROM ("
            f"SELECT freq, unnest(symbols[1:len(symbols)-1]) AS a,"
            f" unnest(symbols[2:len(symbols)]) AS b"
            f" FROM v{i} WHERE len(symbols) >= 2) GROUP BY a, b)"
        )
        ctes.append(
            f"best{i} AS (SELECT a AS ba, b AS bb, pf FROM p{i}"
            f" ORDER BY pf DESC, a ASC, b ASC LIMIT 1)"
        )
        ctes.append(
            f"v{i + 1} AS (SELECT w, freq,"
            f" CASE WHEN pf >= {min_freq} THEN"
            f" string_split(list_reduce(symbols, (acc, s) ->"
            f" CASE WHEN (acc = ba OR ends_with(acc, ' ' || ba)) AND s = bb"
            f" THEN acc || s ELSE acc || ' ' || s END), ' ')"
            f" ELSE symbols END AS symbols"
            f" FROM v{i} CROSS JOIN best{i})"
        )
    union = " UNION ALL ".join(
        f"SELECT {i + 1} AS step, ba AS a, bb AS b, pf FROM best{i}"
        for i in range(n_merges)
    )
    return (
        "WITH " + ",\n    ".join(ctes) + f""",
    m AS ({union})
    SELECT CAST(step AS INT) AS step, a, b, CAST(pf AS BIGINT) AS pair_freq
    FROM m WHERE pf >= {min_freq} ORDER BY step
    """
    )


def _bpe_vocab_ctes(n_merges: int = 10, min_freq: int = 2) -> str:
    """The CTE chain of _bpe_train_oracle_sql up to the FINAL segmented
    vocab v{n_merges} (shared by the encode twin)."""
    full = _bpe_train_oracle_sql(n_merges, min_freq)
    return full[: full.index(",\n    m AS (")]


@query(
    "bpe_trained_merges",
    # Round 8 retired this entry's rows-only status: the "iterative
    # argmax feeds the next plan" objection dissolves once each
    # iteration is UNROLLED into CTEs — best_i is a one-row CTE and the
    # re-segmentation is a list_reduce string-accumulator fold whose
    # carry is the accumulator's last space-separated token (merged
    # tokens can never re-match `a` in the same pass because merged =
    # a||b with b non-empty — the same invariant bpe.merge_pair's
    # struct carry enforces). Early stop (min_freq) maps to a
    # cumulative window filter over the unioned per-iteration winners.
    # tests/test_bpe.py additionally pins the full run against an
    # independent pure-Python reference.
    _bpe_train_oracle_sql(n_merges=10, min_freq=2),
    doc="E4 iterative BPE training (Sennrich et al. 2016): 10 merge "
    "iterations over the documents corpus. One corpus scan builds the "
    "word-frequency table; each iteration is one VOCAB-sized pair-count "
    "shuffle + a one-row argmax collect + a zero-shuffle HOF "
    "re-segmentation fold, with per-iteration persist/unpersist so "
    "lineage stays flat (the iterative-algorithm discipline). "
    "Deterministic: exact integer counts, lexicographic tie-break. "
    "Hash-graded since r8 via a fully UNROLLED DuckDB twin (10 chained "
    "best/re-segment CTE pairs — see _bpe_train_oracle_sql), retiring "
    "the catalog's last designed-rows-only entry.",
)
def bpe_trained_merges(spark, sf_dir):
    from spectraplex_spark.operators.bpe import bpe_train

    docs = table(spark, sf_dir, "documents")
    merges, vocab = bpe_train(docs, n_merges=10, min_freq=2)
    vocab.unpersist()
    rows = [(i + 1, a, b, pf) for i, (a, b, pf) in enumerate(merges)]
    return spark.createDataFrame(rows, "step int, a string, b string, pair_freq long")


# --- round-8 additions: DSIR resampling, estimator error, entropy --------

# hex-nibble fold — the hashed_bucket twin (review r12)
_DSIR_BUCKET_SQL = "((ascii(substring(md5(t), 1, 1)) - CASE WHEN ascii(substring(md5(t), 1, 1)) >= 97 THEN 87 ELSE 48 END) * 16 + (ascii(substring(md5(t), 2, 1)) - CASE WHEN ascii(substring(md5(t), 2, 1)) >= 97 THEN 87 ELSE 48 END)) % 64"


@query(
    "dsir_importance_sample",
    f"""
    WITH tok AS (SELECT doc_id, lang, {_TOKENS_SQL} AS toks FROM documents),
    tb AS (SELECT doc_id, lang,
             unnest(list_transform(toks, t -> {_DSIR_BUCKET_SQL})) AS bucket
           FROM tok),
    w AS (SELECT bucket,
            ((COUNT(*) FILTER (WHERE lang = 'en') + 1) * 1000000)
              // (COUNT(*) + 64) AS wq
          FROM tb GROUP BY bucket),
    s AS (SELECT tb.doc_id, any_value(tb.lang) AS lang,
            CAST(SUM(w.wq) AS BIGINT) AS score_q
          FROM tb JOIN w USING (bucket) GROUP BY tb.doc_id),
    r AS (SELECT lang, doc_id, score_q,
            ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY score_q DESC, doc_id) AS rk
          FROM s)
    SELECT lang, doc_id, score_q, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 10 ORDER BY lang, rk
    """,
    doc="E4 DSIR-style importance resampling (Xie et al. 2023): rank "
    "each stratum's documents by how much their hashed-token profile "
    "resembles a TARGET slice (here lang='en'), via per-bucket "
    "smoothed target/raw ratio weights on the 1e-6 integer grid — "
    "pure BIGINT scores, zero float boundary. Scale shape: one "
    "partial-aggregated bucket-stats pass (shuffle capped at "
    "n_buckets rows per task), a BOUNDED 64-row weights collect "
    "(centroid-collect contract) broadcast back as an array literal, "
    "then zero-shuffle in-row scoring + one per-stratum top-k window.",
)
def dsir_importance_sample_q(spark, sf_dir):
    from spectraplex_spark.operators.dsir import dsir_importance_sample

    docs = table(spark, sf_dir, "documents")
    return (
        dsir_importance_sample(docs, F.col("lang") == "en", k=10)
        .select("lang", "doc_id", "score_q", "rk")
        .orderBy("lang", "rk")
    )


def _minhash_error_oracle_sql(num_hashes: int = 16, sample_mod: int = 5) -> str:
    from spectraplex_spark.operators.dedup import _P, _POLY_C
    from spectraplex_spark.operators.estimators import EST_SCALE, perm_constants

    fold = "CAST(0 AS BIGINT)"
    for i in range(1, 13):
        fold = f"(({fold}) * 131 + ascii(substring(h, {i}, 1))) % {_P}"

    def sh(arr):  # shingle hashes (n=3) from a hashed-token list
        tri = (
            f"((({arr}[i] * {_POLY_C} + {arr}[i+1]) % {_P}) * {_POLY_C}"
            f" + {arr}[i+2]) % {_P}"
        )
        return (
            f"list_distinct(CASE WHEN len({arr}) >= 3 THEN "
            f"list_transform(range(1, len({arr}) - 1), i -> {tri}) "
            f"ELSE [list_reduce({arr}, (a, b) -> (a * {_POLY_C} + b) % {_P})] "
            f"END)"
        )

    def smin(arr, a, b):
        return f"list_min(list_transform({arr}, x -> (x * {a} + {b}) % {_P}))"

    matches = " + ".join(
        f"CASE WHEN {smin('A', a, b)} = {smin('B', a, b)} THEN 1 ELSE 0 END"
        for a, b in perm_constants(num_hashes)
    )
    per_match = EST_SCALE // num_hashes
    return f"""
    WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
                 WHERE doc_id % {sample_mod} = 0),
    hh AS (SELECT doc_id,
             list_transform(list_transform(toks, t -> md5(t)), h -> {fold}) AS th
           FROM tok WHERE len(toks) >= 1),
    mm AS (SELECT doc_id, th, 2 + (doc_id // {sample_mod}) % 5 AS k FROM hh),
    tt AS (SELECT doc_id, th,
             th[1:greatest(len(th) - (len(th) - len(th) % k) // k, 1)] AS tm
           FROM mm),
    ab AS (SELECT doc_id, {sh('th')} AS A, {sh('tm')} AS B FROM tt),
    ex AS (SELECT doc_id, len(A) AS n_a, len(B) AS n_b,
             len(list_intersect(A, B)) AS inter,
             ({matches}) AS matches
           FROM ab)
    SELECT doc_id,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(inter AS BIGINT) AS inter,
           CAST(inter * {EST_SCALE} // (n_a + n_b - inter) AS BIGINT) AS jacc_q,
           CAST(matches AS BIGINT) AS sig_matches,
           CAST(matches * {per_match} AS BIGINT) AS est_q,
           CAST(abs(matches * {per_match}
                    - inter * {EST_SCALE} // (n_a + n_b - inter)) AS BIGINT)
             AS err_q
    FROM ex ORDER BY doc_id
    """


@query(
    "minhash_estimate_error",
    _minhash_error_oracle_sql(),
    doc="E1 estimator-quality measurement: every near-dup threshold "
    "rides the MinHash estimate of shingle Jaccard, and this report "
    "GRADES that estimator — each sampled doc is paired with a "
    "deterministic suffix-truncated mutation of itself (true J sweeps "
    "~[0.4, 0.85]), then exact Jaccard, 16-perm signature agreement, "
    "and |error| are emitted on the 1e-6 integer grid (Broder 1997 "
    "bound sqrt(J(1-J)/m) made observable). Base hash is the "
    "engine-portable md5 poly-fold so the WHOLE estimator bit-grades "
    "cross-engine (production keeps xxhash64; estimator statistics "
    "don't depend on which well-mixing base hash sits under the "
    "permutation family). Zero shuffle: one narrow in-row pass.",
)
def minhash_estimate_error(spark, sf_dir):
    from spectraplex_spark.operators.estimators import minhash_error_report

    # single-split local parquet: the opt-in layout-guarded spread
    # parallelizes the compute-heavy narrow pass (a 100 TB input
    # brings its own splits and the guard skips the exchange)
    docs = table(spark, sf_dir, "documents", spread=True)
    return minhash_error_report(docs).orderBy("doc_id")


@query(
    "entropy_quality_report",
    f"""
    WITH c AS (SELECT doc_id, string_split({_NORM_SQL}, '') AS cs FROM documents
               WHERE length({_NORM_SQL}) > 0),
    m AS (SELECT doc_id, cs, list_sort(list_distinct(cs)) AS d FROM c),
    e AS (SELECT doc_id, len(cs) AS n, len(d) AS nd,
            list_reduce(list_transform(d, ch ->
              CAST(len(list_filter(cs, x -> x = ch)) AS DOUBLE)
              * ln(CAST(len(list_filter(cs, x -> x = ch)) AS DOUBLE))),
              (a, b) -> a + b) AS sclnc
          FROM m)
    SELECT doc_id, CAST(n AS BIGINT) AS n_chars, CAST(nd AS BIGINT) AS n_distinct,
           ROUND(ln(CAST(n AS DOUBLE)) - sclnc / CAST(n AS DOUBLE), 6) AS entropy
    FROM e ORDER BY doc_id
    """,
    doc="E4 Shannon character entropy per document — the "
    "compression-proxy quality signal (low entropy ⇔ repetitive/"
    "template/spam text; the Gopher rules' cheap cousin). Cross-engine "
    "determinism: the distinct-char array is SORTED before an explicit "
    "left-fold sum, so both engines add the identical term sequence "
    "and the only wiggle is libm ln's final ulp (6dp precedent). Zero "
    "shuffle — one narrow projection, O(distinct·len) in-row.",
)
def entropy_quality_report(spark, sf_dir):
    from spectraplex_spark.operators.textops import char_entropy_report

    docs = table(spark, sf_dir, "documents", spread=True)  # see above
    return char_entropy_report(docs).orderBy("doc_id")


@query(
    "bpe_encode_topk",
    _bpe_vocab_ctes(10, 2)
    + """
    SELECT symbol, CAST(SUM(freq) AS BIGINT) AS n_occurrences
    FROM (SELECT freq, unnest(symbols) AS symbol FROM v10)
    GROUP BY symbol ORDER BY n_occurrences DESC, symbol ASC LIMIT 20
    """,
    doc="E4 tokenizer APPLY: encode the corpus with the 10 trained BPE "
    "merges and report the top-20 emitted symbols. The graded path is "
    "the SCALE path — each distinct word is segmented ONCE at train "
    "time and broadcast-joined onto the exploded corpus tokens (the "
    "classic tokenizer word-cache: encode cost is vocab-sized, corpus "
    "cost is one narrow explode+join), not the per-document merge-"
    "replay fold (apply_bpe), which re-folds every token occurrence "
    "and is 10x slower at 10x rows. Certification chain: the oracle "
    "independently re-trains and expands its own v10 segmentation; "
    "tests/test_bpe.py pins apply_bpe's per-doc fold bit-equal to the "
    "vocab-join expansion, and the trainer itself equals a pure-Python "
    "reference — so apply-time == train-time segmentation is certified "
    "end to end.",
)
def bpe_encode_topk(spark, sf_dir):
    from spectraplex_spark.operators.bpe import bpe_train
    from spectraplex_spark.operators.textops import tokens

    docs = table(spark, sf_dir, "documents")
    merges, vocab = bpe_train(docs, n_merges=10, min_freq=2)
    # vocab stays persisted through the action (bench/_drop_cached and
    # session teardown reclaim it); unpersisting here would re-derive
    # the 10-iteration lineage at execution time
    enc = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .join(F.broadcast(vocab.select("w", "symbols")), "w")
        .select(F.explode("symbols").alias("symbol"))
    )
    return (
        enc.groupBy("symbol")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("symbol"))
        .limit(20)
    )


@query(
    "bpe_encode_pandas_topk",
    _bpe_vocab_ctes(10, 2)
    + """
    SELECT symbol, CAST(SUM(freq) AS BIGINT) AS n_occurrences
    FROM (SELECT freq, unnest(symbols) AS symbol FROM v10)
    GROUP BY symbol ORDER BY n_occurrences DESC, symbol ASC LIMIT 20
    """,
    doc="E4 tokenizer APPLY at REALISTIC merge counts: the same top-20 "
    "emitted-symbol report as bpe_encode_topk, but encoded through "
    "apply_bpe_pandas — the broadcast-trained-tokenizer Arrow path the "
    "r10 BASELINE.md probe certified for 1000+ merges, where apply_bpe's "
    "n_merges-deep expression tree makes Catalyst analysis the "
    "bottleneck (the r9 trainer probe's plan-growth class, on the "
    "encode side). Per-batch word->segmentation cache makes Python "
    "cost distinct-words-sized; zero shuffle before the count. "
    "tests/test_bpe.py pins the pandas segmentation bit-equal to the "
    "expression fold (incl. NULL text and unicode-whitespace "
    "tokenization); the oracle independently re-trains and expands its "
    "own segmentation, so the certification chain is end-to-end.",
)
def bpe_encode_pandas_topk(spark, sf_dir):
    from spectraplex_spark.operators.bpe import apply_bpe_pandas, bpe_train

    docs = table(spark, sf_dir, "documents")
    merges, vocab = bpe_train(docs, n_merges=10, min_freq=2)
    vocab.unpersist()
    return (
        apply_bpe_pandas(docs, merges)
        .select(F.explode("bpe_symbols").alias("symbol"))
        .groupBy("symbol")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("symbol"))
        .limit(20)
    )


@query(
    "source_quota_scalable",
    """
    WITH v AS (SELECT doc_id,
                 CASE WHEN doc_id % 2 = 0 THEN 'megacrawl' ELSE source END
                   AS source
               FROM documents)
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM v) WHERE rk <= 5
    ORDER BY source, doc_id
    """,
    doc="E4 the quota step's SCALE twin, graded on a PLANTED hot source "
    "(half the corpus relabeled 'megacrawl'): cap_per_source_scalable "
    "pre-filters hot sources by an md5-prefix threshold BEFORE the "
    "window shuffle — an order-prefix of the ranking key, so with >= n "
    "provable survivors the n winners are identical to the one-window "
    "form (the oracle IS the one-window form; agreement certifies the "
    "two-phase rewrite). Per-source counts and the survivor verify are "
    "bounded collects; the skewed window partition never forms. The "
    "udaf_value_stats_scalable discipline: the documented scale path "
    "is now the graded path.",
)
def source_quota_scalable(spark, sf_dir):
    from spectraplex_spark.operators.textops import cap_per_source_scalable

    docs = table(spark, sf_dir, "documents").withColumn(
        "source",
        F.when(F.col("doc_id") % 2 == 0, F.lit("megacrawl")).otherwise(
            F.col("source")
        ),
    )
    return (
        cap_per_source_scalable(docs, 5, hot_factor=4)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


@query(
    "salted_hot_key_sum",
    """
    WITH v AS (SELECT CASE WHEN user_id % 4 != 0 THEN -1 ELSE user_id END
                 AS user_key,
               CAST(value AS DECIMAL(38, 6)) AS v
               FROM events)
    SELECT user_key,
           CAST(SUM(v) AS DOUBLE) AS total_value,
           COUNT(*) AS n_events
    FROM v GROUP BY user_key ORDER BY user_key
    """,
    doc="§2.6 skew-salted aggregation, graded on a PLANTED hot key "
    "(three quarters of events collapse onto user_key=-1): "
    "salted_group_sum spreads each key across salt_n partial "
    "(key, salt) sums before the merge, so one dominant reducer key "
    "becomes salt_n parallel tasks — the aggregation-side skew tool "
    "the layout module pairs with AQE's join-side handling. DECIMAL "
    "partial sums are exact and order-independent, so the two-phase "
    "result bit-equals the oracle's one-phase GROUP BY regardless of "
    "how rows landed in salt buckets (the salt uses partition id + "
    "monotonic id — deterministic execution artifacts, but the DECIMAL "
    "grid means the grade never depends on them).",
)
def salted_hot_key_sum(spark, sf_dir):
    from spectraplex_spark.sources.layout import salted_group_sum

    ev = table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 4 != 0, F.lit(-1).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("user_key"),
        F.col("value").cast("decimal(38,6)").alias("_v"),
    )
    out = salted_group_sum(ev, ["user_key"], F.col("_v"), "total_dec", salt_n=16)
    n = (
        ev.groupBy("user_key")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        out.join(n, "user_key")
        .select(
            "user_key",
            F.col("total_dec").cast("double").alias("total_value"),
            "n_events",
        )
        .orderBy("user_key")
    )


def _ivf_recall_oracle_sql(
    q_count: int = 8, k: int = 10, n_centroids: int = 8, n_probe: int = 2,
    iters: int = 3, dim: int = 64, scale: int = 1024,
) -> str:
    """DuckDB twin of simsearch.ivf_recall_report: the integer Lloyd's
    replay (_kmeans_ctes) over the corpus slice, per-query probe
    selection by integer L2 (ties cid), both rankings by cosine over
    the quantized grid (exact BIGINT dot/norms; CAST/sqrt/divide are
    correctly-rounded single ops — the knn arrow precedent)."""
    ctes = _kmeans_ctes(
        f"SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {q_count}",
        n_centroids, iters, dim, scale,
    )
    quant = (
        f"list_transform(CAST(embedding AS DOUBLE[]), "
        f"x -> CAST(floor(x * CAST({scale} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))"
    )
    l2 = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> (q.qq[i] - c.q[i]) * (q.qq[i] - c.q[i])))"
    )
    dot = f"list_sum(list_transform(range(1, {dim + 1}), i -> v.q[i] * q.qq[i]))"
    ctes += [
        f"qv2 AS (SELECT vec_id AS query_id, {quant} AS qq "
        f"FROM embeddings WHERE vec_id < {q_count})",
        f"pc AS (SELECT query_id, cid FROM (SELECT q.query_id, c.cid, "
        f"row_number() OVER (PARTITION BY q.query_id ORDER BY {l2}, c.cid) AS pr "
        f"FROM qv2 q CROSS JOIN c{iters} c) WHERE pr <= {n_probe})",
        f"pairs AS (SELECT q.query_id, v.vec_id, v.cid AS vcid, "
        f"CAST({dot} AS DOUBLE) / "
        f"(sqrt(CAST(list_sum(list_transform(v.q, x -> x * x)) AS DOUBLE)) * "
        f"sqrt(CAST(list_sum(list_transform(q.qq, x -> x * x)) AS DOUBLE))) AS cos "
        f"FROM fin v CROSS JOIN qv2 q)",
        f"ex AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id, "
        f"row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS xr "
        f"FROM pairs) WHERE xr <= {k})",
        f"iv AS (SELECT query_id, vec_id FROM (SELECT p.query_id, p.vec_id, "
        f"row_number() OVER (PARTITION BY p.query_id ORDER BY p.cos DESC, p.vec_id) AS ir "
        f"FROM pairs p JOIN pc ON pc.query_id = p.query_id AND pc.cid = p.vcid) "
        f"WHERE ir <= {k})",
    ]
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT e.query_id,
           CAST(COUNT(i.vec_id) AS BIGINT) AS hits,
           CAST(COUNT(i.vec_id) * {1_000_000 // k} AS BIGINT) AS recall_q
    FROM ex e LEFT JOIN iv i
      ON i.query_id = e.query_id AND i.vec_id = e.vec_id
    GROUP BY e.query_id ORDER BY e.query_id
    """
    )


@query(
    "ivf_recall_report",
    _ivf_recall_oracle_sql(),
    doc="E2 ANN measurement harness (the minhash_estimate_error "
    "discipline applied to similarity search): recall@10 of a "
    "PARTIAL-probe IVF (2 of 8 cells) against exact search, one row "
    "per query, hits and recall on the integer grid. Built on the "
    "integer-exact k-means so the WHOLE report — centroid trajectory, "
    "probe selection, both rankings — replays bit-for-bit in SQL; "
    "cosine over the quantized grid pays only CAST/sqrt/divide "
    "(correctly-rounded single ops, the knn arrow precedent). This "
    "grades the approximation quality itself, not just the index "
    "mechanics: the sibling simsearch_ivf_topk is graded at full "
    "probe where IVF degenerates to exact.",
)
def ivf_recall_report(spark, sf_dir):
    from spectraplex_spark.operators.simsearch import ivf_recall_report as op

    return op(table(spark, sf_dir, "embeddings")).orderBy("query_id")


@query(
    "ivf_persisted_recall",
    _ivf_recall_oracle_sql(n_probe=4),
    doc="E2 the FIT-ONCE shape of the recall harness (the r8 verdict's "
    "named fix: ivf_recall_report refit k-means per call — 3 corpus "
    "scans for one report): the builder fits once, persists the model "
    "through clustering.write_kmeans_model (centroids/ subdirectory + "
    "_config sidecar pinning k/dim/scale — the write_ivf_index layout "
    "discipline), reads it back with read_kmeans_model, and the report "
    "runs from the PERSISTED centroids — two narrow passes (expression "
    "assignment + scoring), no refit. Probing 4 of 8 cells (the graded "
    "sibling probes 2) so this entry grades a distinct operating "
    "point. The oracle still replays fit+probe+rank from scratch in "
    "SQL — agreement certifies the persisted model IS the fit: "
    "write/read round-trips the integer grid bit-exactly and the "
    "recomputed assignment equals the fit-time one.",
)
def ivf_persisted_recall(spark, sf_dir):
    import tempfile

    from spectraplex_spark.operators.clustering import (
        kmeans_fit_predict,
        read_kmeans_model,
        write_kmeans_model,
    )
    from spectraplex_spark.operators.simsearch import ivf_recall_report as op

    em = table(spark, sf_dir, "embeddings")
    corpus = em.filter(F.col("vec_id") >= 8)
    d = tempfile.mkdtemp(prefix="spectraplex_kmm_")
    _, cents = kmeans_fit_predict(corpus, k=8, iters=3)
    write_kmeans_model(spark, d, cents, scale=1024, extra_config={"iters": 3})
    stored, cfg = read_kmeans_model(spark, d)
    # explicit raise, not assert: asserts vanish under python -O and this
    # k/scale round-trip IS the persisted-model certification (r9 ADVICE)
    if cfg.get("k") != "8" or cfg.get("scale") != "1024":
        raise ValueError(f"persisted k-means config round-trip mismatch: {cfg}")
    return op(em, n_probe=4, cents=stored).orderBy("query_id")


@query(
    "nfc_dedup_groups",
    """
    WITH v AS (SELECT doc_id,
                 text || CASE WHEN doc_id % 3 = 0
                              THEN ' x' || chr(65) || chr(778)
                              WHEN doc_id % 3 = 1
                              THEN ' x' || chr(197)
                              ELSE '' END AS t
               FROM documents)
    SELECT md5(lower(nfc_normalize(t))) AS fp,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS representative
    FROM v GROUP BY fp ORDER BY fp
    """,
    doc="E4/E1 Unicode-canonical dedup (the normalization step exact "
    "dedup silently needs on real crawls: precomposed vs combining-"
    "mark spellings — A+U+030A vs U+00C5 — and case variants are the "
    "same page): NFC via an Arrow pandas UDF (Spark has no builtin; "
    "the idna-codec precedent), lowercase, md5-group. Planted classes: "
    "every doc_id%3==0 doc carries the DECOMPOSED marker and %3==1 the "
    "PRECOMPOSED one — byte-different, NFC-equal — so same-text docs "
    "across those classes MUST collapse while %3==2 stays apart only "
    "if its base text differs. The oracle rides DuckDB's "
    "nfc_normalize; both engines implement the Unicode standard, "
    "pytest pins known vectors. Only (fp, id) shuffles.",
)
def nfc_dedup_groups(spark, sf_dir):
    from spectraplex_spark.operators.textops import nfc_key

    docs = table(spark, sf_dir, "documents")
    marker = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(" x" + chr(0x41) + chr(0x30A)))
        .when(F.col("doc_id") % 3 == 1, F.lit(" x" + chr(0xC5)))
        .otherwise(F.lit(""))
    )
    v = docs.select("doc_id", F.concat(F.col("text"), marker).alias("t"))
    return (
        v.select(F.md5(nfc_key(F.col("t")).cast("binary")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("representative"),
        )
        .orderBy("fp")
    )


def _web_curation_oracle_sql() -> str:
    """DuckDB replay of the ENTIRE web-curation composition — each stage
    is the already-certified twin of its constituent query
    (url_canonical_dedup, domain_cap_sample, encoding_quality_report,
    gopher_repetition_gate, quality_linear_score, nfc_dedup_groups),
    chained in the exact stage order the Spark builder applies."""
    from spectraplex_spark.operators.textops import (
        QSCORE_BUCKETS,
        seeded_quality_weights,
    )

    norm_t = _NORM_SQL.replace("lower(text)", "lower(t)")
    toks_t = f"list_filter(string_split({norm_t}, ' '), x -> x <> '')"
    ctrl = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
    wq = seeded_quality_weights()
    wlit = "[" + ", ".join(str(w) for w in wq) + "]"
    bucket = (  # hex-nibble fold — the hashed_bucket twin (review r12)
        "((ascii(substring(md5(tk), 1, 1)) - CASE WHEN ascii(substring(md5(tk), 1, 1)) >= 97 THEN 87 ELSE 48 END) * 16 + (ascii(substring(md5(tk), 2, 1)) - CASE WHEN ascii(substring(md5(tk), 2, 1)) >= 97 THEN 87 ELSE 48 END))"
        f" % {QSCORE_BUCKETS}"
    )
    return f"""
    WITH u0 AS (SELECT doc_id,
        'https://'
        || CASE doc_id % 3 WHEN 0 THEN 'a.' WHEN 1 THEN 'b.' ELSE '' END
        || source
        || CASE WHEN doc_id % 7 = 3 THEN 'site.co.uk' ELSE 'site.com' END
        || '/p/' || (doc_id % 50)
        || CASE doc_id % 5 WHEN 0 THEN '?utm_source=x&b=2&a=1'
                           WHEN 1 THEN '?b=2&a=1' ELSE '' END AS u
      FROM documents),
    {_DUCK_CANON_CTES},
    k1 AS (SELECT MIN(doc_id) AS doc_id FROM s4 GROUP BY canonical_url),
    hh AS (SELECT s4.doc_id,
             regexp_replace(regexp_extract(canonical_url,
               '^[a-z][a-z0-9+.-]*://([^/?]*)', 1), ':[0-9]+$', '') AS host
           FROM s4 JOIN k1 USING (doc_id)),
    dd AS (SELECT doc_id,
             CASE WHEN ends_with(host, '.co.uk')
                  THEN regexp_extract(host, '([^.]+\\.co\\.uk)$', 1)
                  ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END AS domain
           FROM hh),
    k2 AS (SELECT domain, doc_id FROM (
             SELECT domain, doc_id,
                    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS rk
             FROM dd) WHERE rk <= 5),
    tx AS (SELECT d.doc_id, k2.domain,
             d.text
             || CASE WHEN d.doc_id % 17 = 3 THEN chr(65533) ELSE '' END
             || CASE WHEN d.doc_id % 3 = 0 THEN ' x' || chr(65) || chr(778)
                     WHEN d.doc_id % 3 = 1 THEN ' x' || chr(197)
                     ELSE '' END AS t
           FROM documents d JOIN k2 ON k2.doc_id = d.doc_id),
    enc AS (SELECT doc_id, domain, t FROM tx
            WHERE LENGTH(t) = LENGTH(REPLACE(t, chr(65533), ''))
              AND LENGTH(t) = LENGTH(regexp_replace(t, '{ctrl}', '', 'g'))),
    base AS (SELECT doc_id, CAST(length({norm_t}) AS BIGINT) AS total,
                    {toks_t} AS toks FROM enc),
    top2 AS ({_duck_top(2)}),
    dup5 AS ({_duck_dup(5)}),
    rep AS (SELECT b.doc_id FROM base b
            LEFT JOIN top2 t2 ON t2.doc_id = b.doc_id AND t2.rn = 1
            LEFT JOIN dup5 d5 ON d5.doc_id = b.doc_id
            WHERE b.total > 0
              AND COALESCE(t2.cnt * t2.glen, 0) * 100 < b.total * 20
              AND COALESCE(d5.dchars, 0) * 100 < b.total * 30),
    qual AS (SELECT b.doc_id FROM base b JOIN rep USING (doc_id)
             CROSS JOIN (SELECT CAST({wlit} AS BIGINT[]) AS wq) w
             WHERE CAST(COALESCE(list_sum(list_transform(b.toks,
                     tk -> wq[{bucket} + 1])), 0) AS BIGINT)
                   + CAST(250000 AS BIGINT) >= 0),
    nfc AS (SELECT MIN(e.doc_id) AS doc_id
            FROM enc e JOIN qual USING (doc_id)
            GROUP BY md5(lower(nfc_normalize(e.t))))
    SELECT e.domain, e.doc_id
    FROM enc e JOIN nfc USING (doc_id)
    ORDER BY e.domain, e.doc_id
    """


@query(
    "web_curation_pipeline",
    _web_curation_oracle_sql(),
    doc="E4 FLAGSHIP COMPOSITION #2 — the WEB-curation path (the "
    "RefinedWeb/CCNet shape), complementing corpus_prep_pipeline's "
    "classic gate→dedup path with the r7/r8 web operators chained end "
    "to end over planted variants: (1) canonical-URL dedup (tracking "
    "params, host case, www., subdomain classes), (2) per-registered-"
    "domain cap 5 (PSL-aware), (3) encoding/garbage gate (planted "
    "U+FFFD docs drop), (4) Gopher repetition gate (integer cross-"
    "product thresholds), (5) hashed linear quality gate (BIGINT "
    "margins), (6) Unicode-NFC canonical dedup (planted decomposed/"
    "precomposed markers collapse). The oracle chains each stage's "
    "already-certified twin in the same order, so a hash match "
    "certifies the COMPOSITION — stage order, survivor propagation, "
    "and every per-stage rule — not just the parts. Scale shape: two "
    "key-hashed shuffles (canonical_url group, domain window) + one "
    "(fp,id) dedup shuffle; every gate is a narrow in-row pass.",
)
def web_curation_pipeline(spark, sf_dir):
    from pyspark.sql import Window

    from spectraplex_spark.operators.repetition import repetition_gate
    from spectraplex_spark.operators.textops import (
        control_char_count,
        linear_quality_margin_q,
        nfc_key,
        replacement_char_count,
        seeded_quality_weights,
    )
    from spectraplex_spark.operators.urlops import (
        canonicalize_url,
        registered_domain,
    )

    # spread=True: gates (repetition n-grams, URL canonicalization,
    # NFC keys) are heavy per-row text work rooted at this scan.
    docs = table(spark, sf_dir, "documents", spread=True)
    sub = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("a."))
        .when(F.col("doc_id") % 3 == 1, F.lit("b."))
        .otherwise(F.lit(""))
    )
    site = F.when(F.col("doc_id") % 7 == 3, F.lit("site.co.uk")).otherwise(
        F.lit("site.com")
    )
    qs = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("?utm_source=x&b=2&a=1"))
        .when(F.col("doc_id") % 5 == 1, F.lit("?b=2&a=1"))
        .otherwise(F.lit(""))
    )
    url = F.concat(
        F.lit("https://"), sub, F.col("source"), site,
        F.lit("/p/"), (F.col("doc_id") % 50).cast("string"), qs,
    )
    t = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 17 == 3, F.lit("�")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" x" + chr(0x41) + chr(0x30A)))
        .when(F.col("doc_id") % 3 == 1, F.lit(" x" + chr(0xC5)))
        .otherwise(F.lit("")),
    )
    base = docs.select("doc_id", url.alias("url"), t.alias("t"))

    # stage 1: canonical-URL dedup (min-id survivor per canonical form)
    c = base.withColumn("canonical_url", canonicalize_url(F.col("url")))
    w1 = Window.partitionBy("canonical_url")
    k1 = c.withColumn("_m", F.min("doc_id").over(w1)).filter(
        F.col("doc_id") == F.col("_m")
    ).drop("_m")
    # stage 2: per-registered-domain cap (deterministic by id)
    k1 = k1.withColumn("domain", registered_domain(F.col("url")))
    w2 = Window.partitionBy("domain").orderBy("doc_id")
    k2 = (
        k1.withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") <= 5)
        .drop("_rk")
    )
    # stage 3: encoding/garbage gate
    enc = k2.filter(
        (replacement_char_count(F.col("t")) == 0)
        & (control_char_count(F.col("t")) == 0)
    )
    # stage 4: Gopher repetition gate
    rep = repetition_gate(enc, text_col="t").filter(F.col("repetition_pass"))
    # stage 5: hashed linear quality gate (BIGINT margin)
    qual = rep.filter(
        linear_quality_margin_q(F.col("t"), seeded_quality_weights(), 250_000) >= 0
    )
    # stage 6: Unicode-NFC canonical dedup
    w3 = Window.partitionBy(F.md5(nfc_key(F.col("t")).cast("binary")))
    fin = qual.withColumn("_m", F.min("doc_id").over(w3)).filter(
        F.col("doc_id") == F.col("_m")
    )
    return fin.select("domain", "doc_id").orderBy("domain", "doc_id")


@query(
    "neardup_cluster_sizes",
    f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, {_NGRAM_TOKENS} AS toks FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks) - 1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t
    ), sz AS (SELECT doc_id, len(sh) AS n FROM s),
    inv AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    p AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN sz sa ON sa.doc_id = i.id_a
      JOIN sz sb ON sb.doc_id = i.id_b
      WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.8
    ),
    e AS (SELECT id_a AS a, id_b AS b FROM p
          UNION SELECT id_b, id_a FROM p),
    reach(n, m) AS (
      SELECT DISTINCT a, a FROM e
      UNION
      SELECT e.b, r.m FROM reach r JOIN e ON e.a = r.n
    ),
    comp AS (SELECT n, MIN(m) AS component FROM reach GROUP BY n),
    g AS (SELECT component, COUNT(*) AS csize FROM comp GROUP BY component),
    h AS (SELECT CAST(csize AS BIGINT) AS cluster_size,
                 CAST(COUNT(*) AS BIGINT) AS n_clusters
          FROM g GROUP BY csize)
    SELECT cluster_size, n_clusters FROM h
    UNION ALL
    SELECT CAST(1 AS BIGINT),
           CAST((SELECT COUNT(*) FROM documents)
                - COALESCE((SELECT SUM(csize) FROM g), 0) AS BIGINT)
    ORDER BY cluster_size
    """,
    doc="E1 duplicate-family size distribution — the curation "
    "observable behind dedup budgeting ('how big are my dup "
    "families'): organic MinHash/LSH pairs at the production 0.8 "
    "threshold feed connected components (iterative min-label + "
    "pointer jumping), and the histogram counts clusters per size, "
    "with implicit singletons as the size-1 row. The oracle recomputes "
    "pairs via the certified inverted-shingle exact-Jaccard twin, "
    "closes them with a recursive CTE (the corpus_prep_planted "
    "precedent), and histograms identically — so the grade certifies "
    "pair mining, transitive closure, AND the accounting in one hash.",
)
def neardup_cluster_sizes(spark, sf_dir):
    from spectraplex_spark.operators.components import neardup_groups

    docs = table(spark, sf_dir, "documents")
    pairs = D.minhash_neardup_pairs(docs)
    groups = neardup_groups(pairs)
    clus = groups.groupBy(F.col("n_docs").cast("long").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )
    total = docs.count()
    in_clusters = groups.agg(F.sum("n_docs")).head()[0] or 0
    singles = spark.createDataFrame(
        [(1, int(total - in_clusters))], "cluster_size long, n_clusters long"
    )
    return clus.unionByName(singles).orderBy("cluster_size")


@query(
    "mixture_share_report",
    f"""
    WITH s AS (SELECT source,
                 COUNT(*) AS docs,
                 CAST(SUM(len({_TOKENS_SQL})) AS BIGINT) AS toks
               FROM documents GROUP BY source),
    t AS (SELECT SUM(docs) AS td, SUM(toks) AS tt FROM s)
    SELECT source,
           CAST(docs AS BIGINT) AS docs,
           toks,
           CAST(docs * 1000000 // t.td AS BIGINT) AS doc_share_q,
           CAST(toks * 1000000 // t.tt AS BIGINT) AS token_share_q
    FROM s CROSS JOIN t
    ORDER BY source
    """,
    doc="E4 mixture-health report — the observable the quota/mixture "
    "samplers steer: per-source document and TOKEN shares on the 1e-6 "
    "integer grid (token share is what the training mix actually "
    "consumes; a source can be 5% of docs and 40% of tokens). One "
    "partial-aggregated scan, |sources| rows, pure BIGINT floor "
    "division — bit-grades with zero float anywhere.",
)
def mixture_share_report(spark, sf_dir):
    from pyspark.sql import Window

    from spectraplex_spark.operators.textops import token_count

    docs = table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum(token_count(F.col("text"))).cast("long").alias("toks"),
    )
    w = Window.partitionBy()  # |sources| rows — a bounded frame, not a corpus window
    return s.select(
        "source",
        "docs",
        "toks",
        F.expr("docs * 1000000").cast("long").alias("_dq"),
        F.expr("toks * 1000000").cast("long").alias("_tq"),
        F.sum("docs").over(w).alias("_td"),
        F.sum("toks").over(w).alias("_tt"),
    ).select(
        "source",
        "docs",
        "toks",
        F.expr("_dq div _td").cast("long").alias("doc_share_q"),
        F.expr("_tq div _tt").cast("long").alias("token_share_q"),
    ).orderBy("source")


@query(
    "group_split_report",
    """
    WITH v AS (SELECT doc_id,
                 CASE WHEN doc_id % 97 = 5 THEN NULL ELSE source END AS source
               FROM documents),
    s AS (SELECT CASE WHEN substr(md5(COALESCE(source, CAST(doc_id AS VARCHAR))), 1, 4) < '0ccc' THEN 'test'
                      WHEN substr(md5(COALESCE(source, CAST(doc_id AS VARCHAR))), 1, 4) < '1998' THEN 'val'
                      ELSE 'train' END AS split,
                 source
          FROM v)
    SELECT split,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM s GROUP BY split ORDER BY split
    """,
    doc="E4 LEAKAGE-SAFE dataset split (GroupShuffleSplit semantics): "
    "the consistent hash keys on the GROUP (here: source), so every "
    "document of a group lands in ONE split — doc-keyed splits let "
    "near-duplicate pages of one site straddle train/test and score "
    "the model on memorized boilerplate. Planted NULL sources (every "
    "97th doc) grade the documented fallback: a NULL group has no "
    "identity to key on, so those docs fall back to the doc-keyed "
    "hash. The oracle replays the md5 grid; agreement certifies both "
    "the group keying and the fallback exactly.",
)
def group_split_report(spark, sf_dir):
    from spectraplex_spark.operators.packing import assign_split_grouped

    docs = table(spark, sf_dir, "documents").withColumn(
        "source",
        F.when(F.col("doc_id") % 97 == 5, F.lit(None).cast("string")).otherwise(
            F.col("source")
        ),
    )
    out = assign_split_grouped(docs, "source")
    return (
        out.groupBy("split")
        .agg(
            F.count_distinct(F.col("source")).cast("long").alias("n_sources"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .orderBy("split")
    )


@query(
    "temperature_mixture_shares",
    f"""
    WITH v AS (SELECT CASE WHEN doc_id % 2 = 0 THEN 'head' ELSE source END AS domain,
                      len({_TOKENS_SQL}) AS ntok
               FROM documents),
    s AS (SELECT domain, COUNT(*) AS n_docs,
                 CAST(SUM(ntok) AS BIGINT) AS n_tokens
          FROM v GROUP BY domain),
    w0 AS (SELECT domain, n_docs, n_tokens,
                  CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS wt0
           FROM s),
    w1 AS (SELECT *, CASE WHEN wt0 * wt0 > n_docs THEN wt0 - 1 ELSE wt0 END AS wt1
           FROM w0),
    w AS (SELECT domain, n_docs, n_tokens,
                 CASE WHEN (wt1 + 1) * (wt1 + 1) <= n_docs THEN wt1 + 1 ELSE wt1 END AS wt
          FROM w1),
    t AS (SELECT SUM(n_docs) AS nd, SUM(wt) AS sw FROM w)
    SELECT domain,
           CAST(n_docs AS BIGINT) AS n_docs,
           n_tokens,
           CAST(n_docs * 1000000 // t.nd AS BIGINT) AS raw_share_q,
           CAST(wt * 1000000 // t.sw AS BIGINT) AS temp_share_q
    FROM w CROSS JOIN t ORDER BY domain
    """,
    doc="E4 temperature-scaled mixture planning (the mT5/XLM-R "
    "upsampling rule: sample domain i with probability proportional to "
    "n_i^(1/T) so tail domains aren't drowned by the head), computed "
    "BIT-EXACTLY at T=2 via a TRUE integer sqrt — a float "
    "floor(sqrt(double)) seed corrected by one BIGINT adjust in each "
    "direction, replayed identically in the oracle, exact for counts "
    "< 2^62 where a float POW (or a raw double sqrt near 2^52) would "
    "not grade. A planted head domain (half the "
    "corpus) makes the effect observable: its temp share drops well "
    "below its raw share while every tail domain's rises. raw vs "
    "temperature columns side by side on the 1e-6 grid; one "
    "partial-aggregated scan, |domains| rows.",
)
def temperature_mixture_shares(spark, sf_dir):
    from spectraplex_spark.operators.packing import temperature_shares

    docs = table(spark, sf_dir, "documents").withColumn(
        "dom",
        F.when(F.col("doc_id") % 2 == 0, F.lit("head")).otherwise(F.col("source")),
    )
    return temperature_shares(docs, "dom").orderBy("domain")


_REPEAT_PARTS_SQL = "CASE source WHEN 'src0' THEN 8 ELSE 1 END"


@query(
    "mixture_repeat_plan_report",
    f"""
    WITH d AS (SELECT source, CAST(len({_TOKENS_SQL}) AS BIGINT) AS ntok
               FROM documents WHERE source IN ('src0', 'src1', 'src2')),
    t AS (SELECT source, SUM(ntok) AS tk FROM d GROUP BY source),
    b AS (SELECT 4 * tk AS budget FROM t WHERE source = 'src1'),
    p AS (SELECT source, tk,
            CAST(b.budget * ({_REPEAT_PARTS_SQL}) // 10 AS BIGINT) AS tgt
          FROM t CROSS JOIN b)
    SELECT source AS domain,
           CAST(tk AS BIGINT) AS corpus_tokens,
           tgt AS target_tokens,
           CAST(tgt // tk AS BIGINT) AS full_repeats,
           CAST((65536 * (tgt % tk)) // tk AS BIGINT) AS tail_threshold
    FROM p ORDER BY domain
    """,
    doc="E4 repeat-upweighting plan — the half mixture_thresholds "
    "explicitly leaves out (tail domains in an LLM mix are repeated "
    "for multiple epochs): per domain, full integer repeats plus a "
    "16-bit consistent-hash tail threshold for the fractional epoch, "
    "all BIGINT floor division. The budget is DATA-DERIVED (4x src1's "
    "tokens) so at every SF the planted 8/1/1 weighting grades both "
    "regimes: src0 lands full_repeats >= 1 (upsample), src1/src2 land "
    "full_repeats = 0 with a fractional tail (downsample) — up- and "
    "downsampling as one rule.",
)
def mixture_repeat_plan_report(spark, sf_dir):
    from spectraplex_spark.operators.packing import mixture_repeat_plan
    from spectraplex_spark.operators.textops import token_count

    docs = table(spark, sf_dir, "documents")
    t1 = docs.filter(F.col("source") == "src1").agg(
        F.sum(token_count(F.col("text")).cast("long"))
    ).collect()[0][0]
    plan = mixture_repeat_plan(
        docs, "source", {"src0": 8, "src1": 1, "src2": 1}, token_budget=4 * int(t1)
    )
    rows = [
        (d, t, tgt, reps, thr) for d, (t, tgt, reps, thr) in sorted(plan.items())
    ]
    return spark.createDataFrame(
        rows,
        "domain string, corpus_tokens long, target_tokens long, "
        "full_repeats long, tail_threshold long",
    ).orderBy("domain")


@query(
    "mixture_upsample_counts",
    f"""
    WITH dd AS (SELECT doc_id, source,
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h4,
                  CAST(len({_TOKENS_SQL}) AS BIGINT) AS ntok
                FROM documents WHERE source IN ('src0', 'src1', 'src2')),
    t AS (SELECT source, SUM(ntok) AS tk FROM dd GROUP BY source),
    b AS (SELECT 4 * tk AS budget FROM t WHERE source = 'src1'),
    q AS (SELECT source, tk,
            CAST(b.budget * ({_REPEAT_PARTS_SQL}) // 10 AS BIGINT) AS tgt
          FROM t CROSS JOIN b),
    r AS (SELECT source, CAST(tgt // tk AS BIGINT) AS reps,
            CAST((65536 * (tgt % tk)) // tk AS BIGINT) AS thr
          FROM q),
    c AS (SELECT dd.doc_id, dd.source,
            r.reps + CASE WHEN r.thr > 0
                           AND dd.h4 < printf('%04x', least(r.thr, 65535))
                     THEN 1 ELSE 0 END AS copies
          FROM dd JOIN r USING (source))
    SELECT source AS domain,
           CAST(SUM(copies) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN copies > 0 THEN 1 END) AS BIGINT) AS n_docs
    FROM c GROUP BY source ORDER BY domain
    """,
    doc="E4 the materialized repeat-upsample, count-graded: every kept "
    "doc explodes into full_repeats (+1 under the hash tail) copies "
    "tagged repeat_idx; per-domain exploded row and surviving doc "
    "counts must equal the oracle's pure-arithmetic replay of the "
    "plan. Same data-derived budget as mixture_repeat_plan_report, so "
    "src0's multiple epochs and src1/src2's fractional downsample are "
    "both exercised through the actual explode path.",
)
def mixture_upsample_counts(spark, sf_dir):
    from spectraplex_spark.operators.packing import mixture_upsample
    from spectraplex_spark.operators.textops import token_count

    docs = table(spark, sf_dir, "documents")
    t1 = docs.filter(F.col("source") == "src1").agg(
        F.sum(token_count(F.col("text")).cast("long"))
    ).collect()[0][0]
    up = mixture_upsample(
        docs, "source", {"src0": 8, "src1": 1, "src2": 1}, token_budget=4 * int(t1)
    )
    return (
        up.groupBy(F.col("source").alias("domain"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct(F.col("doc_id")).cast("long").alias("n_docs"),
        )
        .orderBy("domain")
    )


@query(
    "sliced_examples_report",
    f"""
    WITH d AS (SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
                 {_TOKENS_SQL} AS toks
               FROM documents),
    o AS (SELECT doc_id, shard, toks,
            COALESCE(SUM(len(toks)) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
          FROM d),
    t AS (SELECT shard,
            strt + UNNEST(range(len(toks))) AS gpos,
            UNNEST(toks) AS tok
          FROM o),
    e AS (SELECT shard, CAST(gpos // 64 AS BIGINT) AS example_idx,
                 gpos % 64 AS slot, tok FROM t),
    g AS (SELECT shard, example_idx, COUNT(*) AS n,
                 md5(string_agg(tok, ' ' ORDER BY slot)) AS example_md5
          FROM e GROUP BY shard, example_idx)
    SELECT shard, example_idx, example_md5
    FROM g WHERE n = 64 ORDER BY shard, example_idx
    """,
    doc="E4 boundary-crossing example slicing — the OTHER standard "
    "pre-training layout (pack_documents keeps docs whole; GPT-style "
    "pipelines concatenate the shard's token stream and cut EXACT "
    "seq_len windows, examples crossing doc boundaries): shard-local "
    "prefix sums give every token a global position, example k = "
    "positions [64k, 64k+64), trailing partials dropped. The md5 of "
    "each example's space-joined tokens bit-grades CONTENT and ORDER "
    "of every slice, not just counts — the oracle replays the slicing "
    "with zipped UNNEST + ordered string_agg. Cost shape: one "
    "doc-level window (shard-keyed (id, n) shuffle) + the one honest "
    "token-level exchange keyed (shard, example) that boundary-"
    "crossing examples require by definition.",
)
def sliced_examples_report(spark, sf_dir):
    from spectraplex_spark.operators.packing import slice_token_examples

    docs = table(spark, sf_dir, "documents")
    ex = slice_token_examples(docs, seq_len=64, n_shards=8)
    return ex.select(
        "shard",
        "example_idx",
        F.md5(F.concat_ws(" ", F.col("tokens"))).alias("example_md5"),
    ).orderBy("shard", "example_idx")


@query(
    "epoch_change_feed_roundtrip",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38, 6))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_id % 4 IN (2, 3)
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="K1 the append-epoch protocol driven end to end through the "
    "driver gate (the merge_upsert_roundtrip discipline for the epoch "
    "side): four idempotent_append batches land as four epochs, the "
    "oldest two are SQUASHED into one base manifest (snapshot "
    "retention — metadata bounded, data untouched), and the CHANGE "
    "FEED (from_epoch=1] is read back and aggregated. The oracle is "
    "the equivalent slice of the source table — agreement certifies "
    "epoch-delta isolation (batches 0-1 invisible to the feed), "
    "squash correctness (the boundary manifest still serves "
    "post-boundary deltas), and the manifest file-list read path, all "
    "with exact DECIMAL sums.",
)
def epoch_change_feed_roundtrip(spark, sf_dir):
    import tempfile

    from spectraplex_spark.sources.commit import read_epoch_changes, squash_epochs
    from spectraplex_spark.sources.io import idempotent_append

    events = table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="spectraplex_ecf_")
    path = f"{d}/t"
    for k in range(4):
        idempotent_append(
            events.filter(F.col("event_id") % 4 == k), path, id_col="event_id"
        )
    squash_epochs(path, keep_last=2)
    feed = read_epoch_changes(spark, path, from_epoch=1)
    return (
        feed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )


def _pagerank_oracle_sql(iters: int = 3, damping_pct: int = 85, scale: int = 10**12) -> str:
    """DuckDB twin of graph.pagerank_integer, iterations UNROLLED (the
    bpe_trained_merges discipline): per round one contribution join +
    groupBy, all BIGINT floor division, so the trajectory replays
    bit-for-bit."""
    base = (((100 - damping_pct) * scale) // 100)
    ctes = [
        "e0 AS (SELECT DISTINCT doc_id % 97 AS u, (doc_id * 7 + 3) % 97 AS v FROM documents)",
        "deg AS (SELECT u, COUNT(*) AS outd FROM e0 GROUP BY u)",
        "nodes AS (SELECT DISTINCT x AS node FROM (SELECT u AS x FROM e0 UNION SELECT v FROM e0))",
        "c AS (SELECT COUNT(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({scale} // c.n AS BIGINT) AS r FROM nodes CROSS JOIN c)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"s{i} AS (SELECT e0.v AS node, "
            f"SUM((({damping_pct} * r{i - 1}.r) // 100) // deg.outd) AS s "
            f"FROM e0 JOIN r{i - 1} ON r{i - 1}.node = e0.u "
            f"JOIN deg ON deg.u = e0.u GROUP BY e0.v)"
        )
        ctes.append(
            f"r{i} AS (SELECT nodes.node, "
            f"CAST(({base} // c.n) + COALESCE(s{i}.s, 0) AS BIGINT) AS r "
            f"FROM nodes CROSS JOIN c LEFT JOIN s{i} ON s{i}.node = nodes.node)"
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, r AS rank_q FROM r{iters} ORDER BY node"
    )


@query(
    "pagerank_ranks",
    _pagerank_oracle_sql(),
    doc="E4/§2.11 link-graph centrality prior (CommonCrawl-style host "
    "ranking decides which sites a curated corpus keeps) as the "
    "fourth iterative-algorithm class (after k-means, label "
    "propagation, BPE): integer-exact PageRank — per round every node "
    "redistributes a damped share along its out-edges, contributions "
    "and the teleport base all BIGINT floor division on the 1e-12 "
    "grid, dangling mass dropped (a documented ranking-prior "
    "simplification). Edges planted deterministically from doc ids "
    "(u = id%97 -> v = (7id+3)%97, a dense functional graph). The "
    "oracle unrolls all 3 rounds as chained CTEs, so the whole "
    "trajectory — not just the final ordering — bit-grades.",
)
def pagerank_ranks(spark, sf_dir):
    from spectraplex_spark.operators.graph import pagerank_integer

    docs = table(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 97).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 97).alias("dst"),
    )
    # conserve_dangling pinned False: this entry grades the ORIGINAL
    # leaky-trajectory oracle (the function default flipped to the
    # conserving mode in r12; pagerank_conserving_ranks grades that).
    return pagerank_integer(edges, iters=3, conserve_dangling=False).orderBy("node")


def _perceptron_oracle_sql(epochs: int = 3) -> str:
    """DuckDB twin of linear.perceptron_trajectory, epochs UNROLLED (the
    bpe/pagerank trajectory discipline): per epoch one CROSS JOIN of the
    one-row weight CTE onto the feature CTE, a misclassified-sum update,
    and the next one-row weight CTE — all BIGINT, so every weight in the
    trajectory bit-grades."""
    the = "len(list_filter(" + _TOKENS_SQL + ", t -> t = 'the'))"
    ctes = [
        f"""f AS (SELECT CAST(1 AS BIGINT) AS x0,
               CAST(len({_TOKENS_SQL}) AS BIGINT) AS x1,
               n_chars AS x2,
               CAST({the} AS BIGINT) AS x3,
               CASE WHEN CAST(len({_TOKENS_SQL}) AS BIGINT) * 4
                         + CAST({the} AS BIGINT) * 10 > n_chars
                    THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y
        FROM documents)""",
        "w0 AS (SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1, "
        "CAST(0 AS BIGINT) AS b2, CAST(0 AS BIGINT) AS b3)",
    ]
    for e in range(1, epochs + 1):
        m = f"y * (b0*x0 + b1*x1 + b2*x2 + b3*x3)"
        ctes.append(
            f"u{e} AS (SELECT "
            + ", ".join(
                # DuckDB SUM(BIGINT) widens to HUGEINT (pandas float64);
                # pin every sum and running weight back to BIGINT
                f"CAST(COALESCE(SUM(CASE WHEN {m} <= 0 THEN y*x{j} END), 0) AS BIGINT) AS d{j}"
                for j in range(4)
            )
            + f", COUNT(CASE WHEN {m} <= 0 THEN 1 END) AS nm"
            f" FROM f CROSS JOIN w{e - 1})"
        )
        ctes.append(
            f"w{e} AS (SELECT "
            + ", ".join(f"CAST(b{j} + d{j} AS BIGINT) AS b{j}" for j in range(4))
            + f" FROM w{e - 1} CROSS JOIN u{e})"
        )
    selects = [
        f"SELECT {e} AS epoch, CAST(u{e}.nm AS BIGINT) AS n_mis, "
        f"b0 AS w_bias, b1 AS w_ntok, b2 AS w_nchars, b3 AS w_the "
        f"FROM w{e} CROSS JOIN u{e}"
        for e in range(1, epochs + 1)
    ]
    return (
        "WITH " + ",\n    ".join(ctes) + "\n    "
        + "\n    UNION ALL ".join(selects)
        + "\n    ORDER BY epoch"
    )


@query(
    "perceptron_quality_trajectory",
    _perceptron_oracle_sql(3),
    doc="E4 distributed integer-exact linear-classifier TRAINING (the "
    "fifth iterative-algorithm class after k-means, label propagation, "
    "BPE, PageRank): a 3-epoch batch perceptron learning a planted "
    "linear quality rule (y = sign(4*n_tokens + 10*n_'the' - n_chars)) "
    "over integer text features (bias, token count, n_chars, 'the' "
    "count). The BATCH update (w += sum of y*x over misclassified rows) "
    "is commutative, so the trajectory is partition-order-independent "
    "and bit-grades; per epoch: one partial-aggregated scan of the "
    "checkpointed feature frame with the weights inlined as literals "
    "(flat lineage), one k+1-scalar collect (the bounded-collect "
    "contract). The oracle unrolls all 3 epochs as chained one-row "
    "weight CTEs, so every weight in the trajectory — not just the "
    "final classifier — is certified.",
)
def perceptron_quality_trajectory(spark, sf_dir):
    from spectraplex_spark.operators.linear import perceptron_trajectory
    from spectraplex_spark.operators.textops import tokens

    docs = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tok = F.size(toks).cast("long")
    n_the = F.size(F.filter(toks, lambda t: t == F.lit("the"))).cast("long")
    feats = docs.select(
        F.lit(1).cast("long").alias("x0"),
        n_tok.alias("x1"),
        F.col("n_chars").alias("x2"),
        n_the.alias("x3"),
        F.when(n_tok * 4 + n_the * 10 > F.col("n_chars"), 1)
        .otherwise(-1)
        .cast("long")
        .alias("y"),
    )
    out = perceptron_trajectory(feats, ["x0", "x1", "x2", "x3"], "y", epochs=3)
    return out.select(
        "epoch",
        "n_mis",
        F.col("w0").alias("w_bias"),
        F.col("w1").alias("w_ntok"),
        F.col("w2").alias("w_nchars"),
        F.col("w3").alias("w_the"),
    ).orderBy("epoch")


@query(
    "epoch_tail_stream_roundtrip",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38, 6))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_id % 4 IN (2, 3)
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="K1/§2.9 the append-epoch protocol as a STREAMING SOURCE "
    "(streaming/epoch_tail.py — Delta's readStream-on-a-change-feed "
    "rebuilt on the engine's own commit protocol): four "
    "idempotent_append batches land as four epochs; a registered "
    "PySpark 4 streaming Data Source tails the table with EPOCH "
    "NUMBERS as the offsets (from_epoch=1, so epochs 0-1 are invisible "
    "— the change-feed contract), one InputPartition per committed "
    "data file read executor-side via pyarrow, drained availableNow "
    "into a parquet sink and aggregated with exact DECIMAL sums. The "
    "oracle is the equivalent slice of the source table; agreement "
    "certifies offset semantics, the manifest file-list expansion, and "
    "the executor-side read path. tests/test_epoch_tail.py additionally "
    "pins checkpoint resume (exactly-once across restarts), squash-"
    "boundary re-baseline failure, and max_epochs_per_batch "
    "backpressure.",
)
def epoch_tail_stream_roundtrip(spark, sf_dir):
    import tempfile

    from spectraplex_spark.sources.io import idempotent_append
    from spectraplex_spark.streaming.epoch_tail import EpochTailDataSource

    events = table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="spectraplex_etail_")
    path, sink, ckpt = f"{d}/t", f"{d}/sink", f"{d}/ckpt"
    for k in range(4):
        idempotent_append(
            events.filter(F.col("event_id") % 4 == k), path, id_col="event_id"
        )
    spark.dataSource.register(EpochTailDataSource)
    q = (
        spark.readStream.format("epoch_tail")
        .option("path", path)
        .option("from_epoch", 1)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.read.parquet(sink)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )


@query(
    "semantic_decontam_report",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    ev AS (SELECT list_transform(e, x -> x + 0.05) AS ee
           FROM v WHERE vec_id IN (9, 22, 35, 48, 61, 74, 87, 100)),
    qv AS (SELECT vec_id,
                  list_transform(e, x -> CAST(FLOOR(x * 1024 + 0.5) AS BIGINT)) AS qa
           FROM v),
    qe AS (SELECT list_transform(ee, x -> CAST(FLOOR(x * 1024 + 0.5) AS BIGINT)) AS qb
           FROM ev),
    cn AS (SELECT vec_id, qa,
                  CAST(list_sum(list_transform(qa, x -> x * x)) AS HUGEINT) AS na2
           FROM qv),
    en AS (SELECT qb,
                  CAST(list_sum(list_transform(qb, x -> x * x)) AS HUGEINT) AS ne2
           FROM qe),
    s AS (SELECT cn.vec_id,
                 CAST(list_sum(list_transform(range(1, 65),
                                              i -> qa[i] * qb[i])) AS HUGEINT) AS d,
                 na2, ne2
          FROM cn CROSS JOIN en)
    SELECT vec_id,
           CAST(COUNT(*) FILTER (d > 0 AND
                  d * d * CAST(1000000000000 AS HUGEINT)
                  >= CAST(810000000000 AS HUGEINT) * na2 * ne2) AS BIGINT) AS n_hits
    FROM s GROUP BY vec_id HAVING n_hits > 0
    ORDER BY vec_id
    """,
    doc="E1/E4 the EMBEDDING member of the decontamination family "
    "(verbatim n-gram collision catches copy-paste leakage; "
    "paraphrased leakage needs the semantic test): per corpus vector, "
    "how many of 8 planted benchmark embeddings (corpus rows "
    "9+13k shifted by +0.05 per component — SQL-replayable "
    "contamination) sit at cosine >= 0.9. Integer-exact without a "
    "float argmax: the test runs on SQUARES — dot > 0 AND dot^2*1e12 "
    ">= t_q^2*|a|^2*|e|^2 — in DECIMAL(38,0) (HUGEINT in the oracle), "
    "on the 1/1024 quantization grid; no sqrt, division, or float "
    "ordering anywhere. The benchmark side is one bounded collect "
    "riding into tasks as constant-folded literals; the corpus pass "
    "is a narrow zero-shuffle projection (the decontam asymmetry: "
    "the corpus never crosses the network).",
)
def semantic_decontam_report(spark, sf_dir):
    from spectraplex_spark.operators.decontam import semantic_contamination_report

    em = table(spark, sf_dir, "embeddings")
    seeds = [9 + 13 * k for k in range(8)]
    eval_df = em.filter(F.col("vec_id").isin(seeds)).select(
        F.transform(F.col("embedding"), lambda x: x.cast("double") + F.lit(0.05)).alias(
            "embedding"
        )
    )
    return semantic_contamination_report(
        em, eval_df, threshold_q=900_000
    ).orderBy("vec_id")


def _pagerank_conserving_oracle_sql(
    iters: int = 3, damping_pct: int = 85, scale: int = 10**12
) -> str:
    """DuckDB twin of graph.pagerank_integer(conserve_dangling=True),
    iterations UNROLLED: per round the contribution join + dst groupBy of
    the lossy variant PLUS the two conservation legs — a 1-row dangling-
    mass CTE shared uniformly, and a 1-row residual CTE returned
    largest-remainder style by node order (ROW_NUMBER, portable SQL) —
    so Σ rank == scale bit-replays after every round."""
    base = ((100 - damping_pct) * scale) // 100
    d = damping_pct
    ctes = [
        "e0 AS (SELECT DISTINCT doc_id % 89 AS u, (doc_id * 13 + 5) % 97 AS v FROM documents)",
        "deg AS (SELECT u, COUNT(*) AS outd FROM e0 GROUP BY u)",
        "nodes AS (SELECT DISTINCT x AS node FROM (SELECT u AS x FROM e0 UNION SELECT v FROM e0))",
        "c AS (SELECT COUNT(*) AS n FROM nodes)",
        "nr AS (SELECT node, ROW_NUMBER() OVER (ORDER BY node) AS rn FROM nodes)",
        f"r0 AS (SELECT nr.node, CAST({scale} // c.n"
        f" + CASE WHEN nr.rn <= {scale} % c.n THEN 1 ELSE 0 END AS BIGINT) AS r"
        " FROM nr CROSS JOIN c)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes.append(
            f"s{i} AS (SELECT e0.v AS node, "
            f"CAST(SUM((({d} * r{p}.r) // 100) // deg.outd) AS BIGINT) AS s "
            f"FROM e0 JOIN r{p} ON r{p}.node = e0.u "
            f"JOIN deg ON deg.u = e0.u GROUP BY e0.v)"
        )
        ctes.append(
            f"d{i} AS (SELECT CAST(COALESCE(SUM(r{p}.r), 0) AS BIGINT) AS dm "
            f"FROM r{p} WHERE r{p}.node NOT IN (SELECT u FROM deg))"
        )
        ctes.append(
            f"p{i} AS (SELECT nodes.node, "
            f"CAST(({base} // c.n) + COALESCE(s{i}.s, 0) "
            f"+ (({d} * d{i}.dm) // 100) // c.n AS BIGINT) AS p "
            f"FROM nodes CROSS JOIN c CROSS JOIN d{i} "
            f"LEFT JOIN s{i} ON s{i}.node = nodes.node)"
        )
        ctes.append(
            f"t{i} AS (SELECT CAST({scale} - SUM(p) AS BIGINT) AS res FROM p{i})"
        )
        ctes.append(
            f"r{i} AS (SELECT p{i}.node, "
            f"CAST(p + t{i}.res // c.n "
            f"+ CASE WHEN nr.rn <= t{i}.res % c.n THEN 1 ELSE 0 END AS BIGINT) AS r "
            f"FROM p{i} JOIN nr ON nr.node = p{i}.node CROSS JOIN t{i} CROSS JOIN c)"
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, r AS rank_q FROM r{iters} ORDER BY node"
    )


@query(
    "pagerank_conserving_ranks",
    _pagerank_conserving_oracle_sql(),
    doc="E4/§2.11 MASS-CONSERVING PageRank (r10 verdict task #4): the "
    "pagerank_ranks trajectory with all three mass leaks plugged — "
    "dangling-node mass redistributed uniformly (one extra 1-row "
    "aggregate per round), per-round floor losses returned largest-"
    "remainder style by node order, and the initial vector topped up — "
    "so Σ rank_q == 10^12 EXACTLY after every round: a true "
    "probability on the grid, not just a ranking prior. The planted "
    "graph (u = doc_id%89 → v = (13·doc_id+5)%97) deliberately has "
    "DANGLING nodes (residues 89..96 appear only as destinations), so "
    "the dangling leg carries real mass. The oracle unrolls all 3 "
    "rounds as chained CTEs — trajectory-certified like pagerank_ranks.",
)
def pagerank_conserving_ranks(spark, sf_dir):
    from spectraplex_spark.operators.graph import pagerank_integer

    docs = table(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 89).alias("src"),
        ((F.col("doc_id") * 13 + 5) % 97).alias("dst"),
    )
    return pagerank_integer(edges, iters=3).orderBy("node")  # the r12 default


def _ilog_ctes(tag: str, src_sql: str, frac_bits: int = 16) -> tuple[list[str], str]:
    """CTE chain computing unigram.ilog2q over (piece?, x BIGINT) rows:
    exponent from length(bin(x)), then ``frac_bits`` unrolled mantissa-
    squaring steps in Q30 — bit-identical to the Python integer
    implementation (the shift is CASE-guarded: DuckDB's << overflows
    loudly past 63 bits, so large x down-shifts instead — the same
    floor((x*2^30)/2^e) value). Returns (ctes, final_cte_name); final
    exposes ilog = e*2^frac_bits + f alongside the source columns."""
    ctes = [
        f"{tag}0 AS MATERIALIZED (SELECT *, CASE WHEN e <= 30 THEN x << (30 - e) "
        f"ELSE x >> (e - 30) END AS y, CAST(0 AS BIGINT) AS f FROM "
        f"(SELECT *, CAST(length(bin(x)) - 1 AS BIGINT) AS e FROM ({src_sql})))"
    ]
    for k in range(1, frac_bits + 1):
        ctes.append(
            f"{tag}{k} AS MATERIALIZED (SELECT * REPLACE ("
            f"CASE WHEN ((y*y) >> 30) >= (CAST(2 AS BIGINT) << 30) "
            f"THEN ((y*y) >> 30) >> 1 ELSE ((y*y) >> 30) END AS y, "
            f"(f*2) + CASE WHEN ((y*y) >> 30) >= (CAST(2 AS BIGINT) << 30) "
            f"THEN 1 ELSE 0 END AS f) FROM {tag}{k-1})"
        )
    fin = f"{tag}F"
    ctes.append(
        f"{fin} AS MATERIALIZED (SELECT *, (e * {1 << frac_bits}) + f AS ilog "
        f"FROM {tag}{frac_bits})"
    )
    return ctes, fin


def _unigram_em_ctes(
    iters: int, max_word_len: int, big: int
) -> tuple[list[str], list[str]]:
    """Shared generator for the unigram oracles: the word-freq base, the
    substring seed counts, and ``iters`` EM rounds (two integer-log2
    chains, hash-join cost lookup, position-unrolled Viterbi DP, the
    freq-weighted re-count). Returns (ctes, per-iteration trajectory
    SELECTs). Every chain step is AS MATERIALIZED — DuckDB inlines plain
    CTEs, giving k^depth expression growth otherwise."""
    W = max_word_len
    ctes = [
        "w AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM "
        f"(SELECT unnest({_TOKENS_SQL}) AS word FROM documents) "
        f"WHERE length(word) BETWEEN 1 AND {W} GROUP BY word)",
        "cnt0 AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM ("
        "SELECT substr(word, CAST(k AS INT), 1) AS piece, freq "
        "FROM w, unnest(generate_series(1, length(word))) AS t(k) "
        "UNION ALL "
        "SELECT substr(word, CAST(k AS INT), 2) AS piece, freq "
        "FROM w, unnest(generate_series(1, length(word) - 1)) AS t(k)"
        ") GROUP BY piece)",
    ]
    outs = []
    for i in range(1, iters + 1):
        p = i - 1
        a_ctes, a_fin = _ilog_ctes(
            f"a{i}_", f"SELECT piece, cnt AS x FROM cnt{p}"
        )
        t_ctes, t_fin = _ilog_ctes(
            f"t{i}_", f"SELECT CAST(SUM(cnt) AS BIGINT) AS x FROM cnt{p}"
        )
        ctes.extend(a_ctes)
        ctes.extend(t_ctes)
        ctes.append(
            f"sc{i} AS MATERIALIZED (SELECT a.piece, CAST(t.ilog - a.ilog AS BIGINT) AS cost_q "
            f"FROM {a_fin} a CROSS JOIN {t_fin} t)"
        )
        # Per-position cost lookup as HASH JOINS (a one-row MAP value is
        # O(vocab) per extraction in DuckDB — measured pathological), then
        # the Viterbi DP unrolled over positions 1..W with lateral aliases
        # against O(1) list indexing.
        ctes.append(
            f"pos{i} AS MATERIALIZED (SELECT q.word, q.k, "
            f"COALESCE(s1.cost_q, {big}) AS ck, "
            f"COALESCE(s2.cost_q, {big}) AS dk FROM "
            "(SELECT word, CAST(k AS INT) AS k, "
            "substr(word, CAST(k AS INT), 1) AS u1, "
            "CASE WHEN k >= 2 THEN substr(word, CAST(k AS INT) - 1, 2) END AS u2 "
            "FROM w, unnest(generate_series(1, length(word))) AS t(k)) q "
            f"LEFT JOIN sc{i} s1 ON s1.piece = q.u1 "
            f"LEFT JOIN sc{i} s2 ON s2.piece = q.u2)"
        )
        ctes.append(
            f"arr{i} AS MATERIALIZED (SELECT word, list(ck ORDER BY k) AS cs, "
            f"list(dk ORDER BY k) AS ds FROM pos{i} GROUP BY word)"
        )
        # Viterbi DP as CHAINED MATERIALIZED steps, one per position: each
        # step references the previous step's b/p columns twice, so the
        # same inlining blowup applies without the barrier.
        ctes.append(
            f"dp{i}_1 AS MATERIALIZED (SELECT word, cs, ds, "
            "length(word) AS L, CAST(0 AS BIGINT) AS b0, "
            "CAST([] AS VARCHAR[]) AS p0, cs[1] AS b1, "
            f"[substr(word, 1, 1)] AS p1 FROM arr{i})"
        )
        for k in range(2, W + 1):
            bi = f"b{k-2} + ds[{k}]"
            un = f"b{k-1} + cs[{k}]"
            ctes.append(
                f"dp{i}_{k} AS MATERIALIZED (SELECT *, "
                f"CASE WHEN L < {k} THEN CAST(0 AS BIGINT) "
                f"WHEN {bi} < {un} THEN {bi} ELSE {un} END AS b{k}, "
                f"CASE WHEN L < {k} THEN p0 "
                f"WHEN {bi} < {un} THEN list_append(p{k-2}, "
                f"substr(word, {k - 1}, 2)) ELSE list_append(p{k-1}, "
                f"substr(word, {k}, 1)) END AS p{k} FROM dp{i}_{k-1})"
            )
        case = (
            "CASE L "
            + " ".join(f"WHEN {k} THEN p{k}" for k in range(1, W + 1))
            + " END"
        )
        ctes.append(
            f"seg{i} AS MATERIALIZED (SELECT word, freq, {case} AS pieces "
            f"FROM dp{i}_{W} JOIN w USING (word))"
        )
        ctes.append(
            f"cnt{i} AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM "
            f"(SELECT unnest(pieces) AS piece, freq FROM seg{i}) GROUP BY piece)"
        )
        outs.append(
            f"SELECT CAST({i} AS INT) AS iter, c.piece, "
            f"CAST(COALESCE(s.cost_q, {big}) AS BIGINT) AS cost_q, "
            f"c.cnt AS n_uses FROM cnt{i} c LEFT JOIN sc{i} s USING (piece)"
        )
    return ctes, outs


def _unigram_oracle_sql(
    iters: int = 3, max_word_len: int = 12, big: int = 1 << 40
) -> str:
    """DuckDB twin of unigram.unigram_train, EM iterations UNROLLED (the
    bpe/pagerank/perceptron trajectory discipline) — every (iter, piece,
    cost_q, n_uses) row of the trajectory bit-grades."""
    ctes, outs = _unigram_em_ctes(iters, max_word_len, big)
    return (
        "WITH " + ",\n    ".join(ctes) + "\n    "
        + "\n    UNION ALL ".join(outs)
        + "\n    ORDER BY iter, piece"
    )


def _unigram_encode_oracle_sql(
    train_iters: int = 3, max_word_len: int = 12, big: int = 1 << 40
) -> str:
    """DuckDB twin of the unigram ENCODE entry: run train_iters EM
    rounds, derive the FINAL model's costs from the last counts (one
    more log chain + Viterbi round = the encode pass over the distinct-
    word frame), and report the top-20 emitted symbols freq-weighted —
    the bpe_encode_topk report shape for the unigram family."""
    ctes, _ = _unigram_em_ctes(train_iters + 1, max_word_len, big)
    last = train_iters + 1
    return (
        "WITH " + ",\n    ".join(ctes) + "\n    "
        + "SELECT symbol, CAST(SUM(freq) AS BIGINT) AS n_occurrences FROM "
        f"(SELECT unnest(pieces) AS symbol, freq FROM seg{last}) "
        + "GROUP BY symbol ORDER BY n_occurrences DESC, symbol ASC LIMIT 20"
    )


@query(
    "unigram_trained_vocab",
    _unigram_oracle_sql(),
    doc="E4 unigram-LM (SentencePiece-style) tokenizer TRAINING — the "
    "sixth iterative-algorithm class (after k-means, label propagation, "
    "BPE, PageRank, perceptron) and the tokenizer family's missing half "
    "(BPE train/encode are graded; unigram is what Llama-class models "
    "ship). Hard-EM over a char+bigram substring-seeded vocab: E-step "
    "Viterbi-segments every DISTINCT word (pieces len 1-2, bigram only "
    "when STRICTLY cheaper) under integer-grid costs; M-step recounts "
    "freq-weighted piece uses (one vocab-sized collect per iteration — "
    "the bounded-collect contract). Costs are ilog2q(total)-ilog2q(n) "
    "where ilog2q is a PURE-INTEGER fixed-point log2 (exponent from bit "
    "length + 16 mantissa-squaring fraction bits) — no float log "
    "anywhere, so the whole 3-iteration trajectory (iter, piece, "
    "cost_q, n_uses) bit-grades. The oracle unrolls the EM loop, the "
    "two log chains AND the per-position Viterbi DP as chained CTEs.",
)
def unigram_trained_vocab(spark, sf_dir):
    from spectraplex_spark.operators.unigram import unigram_train

    docs = table(spark, sf_dir, "documents")
    return unigram_train(docs, iters=3).orderBy("iter", "piece")


@query(
    "unigram_encode_topk",
    _unigram_encode_oracle_sql(),
    doc="E4 unigram tokenizer APPLY (the encode half of "
    "unigram_trained_vocab, completing the train+encode pair the BPE "
    "family already has): train 3 hard-EM rounds, derive the FINAL "
    "model's integer-grid costs from the last counts, Viterbi-encode "
    "the corpus (broadcast cost table, Arrow batches, per-batch word "
    "cache — the apply_bpe_pandas shape) and report the top-20 emitted "
    "symbols. The oracle replays training as one extra EM round's "
    "Viterbi over the freq-weighted distinct-word frame — equivalent "
    "to the per-document encode because segmentation is a pure "
    "function of the word (certified by the train entry's trajectory "
    "parity plus this report).",
)
def unigram_encode_topk(spark, sf_dir):
    from spectraplex_spark.operators.unigram import (
        piece_costs,
        unigram_encode,
        unigram_train,
    )

    docs = table(spark, sf_dir, "documents")
    traj = unigram_train(docs, iters=3)
    counts = {
        r["piece"]: r["n_uses"] for r in traj.filter(F.col("iter") == 3).collect()
    }
    return (
        unigram_encode(docs, piece_costs(counts), max_word_len=12)
        .select(F.explode("unigram_pieces").alias("symbol"))
        .groupBy("symbol")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("symbol"))
        .limit(20)
    )


# --- round-11 (continuation) additions: WordPiece — the tokenizer trio ----


def _wordpiece_train_ctes(n_merges: int, min_pf: int) -> list[str]:
    """Shared CTE chain for the WordPiece oracles: decorated v0, then one
    (candidate pair-counts → symbol-counts → one-row scored argmax →
    conditional re-segmentation) quadruple per merge iteration — the
    _bpe_train_oracle_sql unroll with three deltas: (1) v0 decorates
    every non-initial char with '##' (BERT continuation forms); (2) the
    argmax key is the integer-grid likelihood score floor(pf·10^12 /
    (cnt(a)·cnt(b))) in HUGEINT — bit-equal to the Spark side's
    DECIMAL-range `div`; (3) best{i} can be EMPTY (the candidate floor
    is applied before the argmax), so re-segmentation rides a LEFT JOIN
    ON TRUE and a NULL winner leaves the vocab unchanged — a fixed
    point, reproducing the trainer's early stop."""
    scale = 10**12
    ctes = [
        "v0 AS MATERIALIZED (SELECT w, freq, list_transform("
        "generate_series(1, len(cs)), i -> CASE WHEN i = 1 THEN cs[i] "
        "ELSE '##' || cs[i] END) AS symbols FROM ("
        "SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, string_split(w, '') AS cs"
        f" FROM (SELECT unnest({_TOKENS_SQL}) AS w FROM documents) GROUP BY w))"
    ]
    for i in range(n_merges):
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT a, b, SUM(freq) AS pf FROM ("
            f"SELECT freq, unnest(symbols[1:len(symbols)-1]) AS a,"
            f" unnest(symbols[2:len(symbols)]) AS b"
            f" FROM v{i} WHERE len(symbols) >= 2) GROUP BY a, b"
            f" HAVING SUM(freq) >= {min_pf})"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT s, SUM(freq) AS cnt FROM ("
            f"SELECT unnest(symbols) AS s, freq FROM v{i}) GROUP BY s)"
        )
        ctes.append(
            f"best{i} AS MATERIALIZED (SELECT a AS ba, b AS bb, pf,"
            f" CAST((CAST(pf AS HUGEINT) * {scale}) //"
            f" (CAST(ca.cnt AS HUGEINT) * CAST(cb.cnt AS HUGEINT)) AS BIGINT) AS sq,"
            f" CASE WHEN starts_with(b, '##') THEN b[3:] ELSE b END AS bs"
            f" FROM p{i} JOIN s{i} ca ON ca.s = p{i}.a"
            f" JOIN s{i} cb ON cb.s = p{i}.b"
            f" ORDER BY sq DESC, a ASC, b ASC LIMIT 1)"
        )
        ctes.append(
            f"v{i + 1} AS MATERIALIZED (SELECT w, freq,"
            f" CASE WHEN ba IS NULL THEN symbols ELSE"
            f" string_split(list_reduce(symbols, (acc, s) ->"
            f" CASE WHEN (acc = ba OR ends_with(acc, ' ' || ba)) AND s = bb"
            f" THEN acc || bs ELSE acc || ' ' || s END), ' ')"
            f" END AS symbols"
            f" FROM v{i} LEFT JOIN best{i} ON TRUE)"
        )
    return ctes


def _wordpiece_train_oracle_sql(n_merges: int = 8, min_pf: int = 2) -> str:
    """DuckDB twin of wordpiece.wordpiece_train: the full merge
    trajectory (step, a, b, pair_freq, score_q), iterations unrolled."""
    ctes = _wordpiece_train_ctes(n_merges, min_pf)
    union = " UNION ALL ".join(
        f"SELECT {i + 1} AS step, ba AS a, bb AS b, pf, sq FROM best{i}"
        for i in range(n_merges)
    )
    return (
        "WITH " + ",\n    ".join(ctes) + f""",
    m AS ({union})
    SELECT CAST(step AS INT) AS step, a, b, CAST(pf AS BIGINT) AS pair_freq,
           sq AS score_q
    FROM m ORDER BY step
    """
    )


def _wordpiece_encode_oracle_sql(
    n_merges: int = 8, min_pf: int = 2, max_word_len: int = 16
) -> str:
    """DuckDB twin of the WordPiece ENCODE entry: train n_merges rounds
    (shared CTE chain), export the vocab (decorated alphabet ∪ merge
    outputs), then GREEDY LONGEST-MATCH-FIRST segmentation of every
    DISTINCT word, unrolled over ``max_word_len`` cursor steps (each
    step consumes ≥1 char, so the unroll is exhaustive; longer words
    are [UNK] outright, the HF max_input_chars_per_word rule).  The
    longest match at a cursor is a pure list expression —
    list_max(list_filter(candidate lengths, vocab membership)) — no
    joins in the hot per-step CTEs beyond the one-row vocab-list/maxlen
    frames.  Equivalent to the per-document Spark encode because
    segmentation is a pure function of the word (the unigram_encode
    precedent); the report freq-weights the distinct-word pieces."""
    W = max_word_len
    ctes = _wordpiece_train_ctes(n_merges, min_pf)
    merged_union = " UNION ".join(
        f"SELECT ba || bs AS s FROM best{i}" for i in range(n_merges)
    )
    ctes.append(
        "vv AS MATERIALIZED (SELECT DISTINCT s FROM ("
        f"SELECT unnest(symbols) AS s FROM v0 UNION {merged_union}))"
    )
    ctes.append("vl AS MATERIALIZED (SELECT list(s ORDER BY s) AS vs FROM vv)")
    ctes.append(
        "mp AS MATERIALIZED (SELECT MAX(length("
        "CASE WHEN starts_with(s, '##') THEN s[3:] ELSE s END)) AS mx FROM vv)"
    )
    ctes.append(
        "g0 AS MATERIALIZED (SELECT w AS word, freq, length(w) AS L,"
        " CAST(1 AS BIGINT) AS pos, CAST('' AS VARCHAR) AS acc,"
        f" length(w) > {W} AS failed FROM v0)"
    )
    for k in range(1, W + 1):
        piece = (
            "CASE WHEN pos = 1 THEN substr(word, pos, bl)"
            " ELSE '##' || substr(word, pos, bl) END"
        )
        ctes.append(
            f"g{k} AS MATERIALIZED (SELECT word, freq, L,"
            " CASE WHEN failed OR pos > L OR bl IS NULL THEN pos"
            " ELSE pos + bl END AS pos,"
            " CASE WHEN failed OR pos > L OR bl IS NULL THEN acc"
            f" WHEN acc = '' THEN {piece}"
            f" ELSE acc || ' ' || {piece} END AS acc,"
            " failed OR (pos <= L AND bl IS NULL) AS failed"
            " FROM (SELECT g.*, list_max(list_filter("
            " generate_series(1, least(mp.mx, L - pos + 1)),"
            " q -> list_contains(vl.vs, CASE WHEN pos = 1"
            " THEN substr(word, pos, q)"
            " ELSE '##' || substr(word, pos, q) END))) AS bl"
            f" FROM g{k - 1} g, vl, mp))"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f""",
    enc AS (SELECT word, freq,
              CASE WHEN failed THEN ['[UNK]']
                   ELSE string_split(acc, ' ') END AS pieces
            FROM g{W})
    SELECT symbol, CAST(SUM(freq) AS BIGINT) AS n_occurrences
    FROM (SELECT unnest(pieces) AS symbol, freq FROM enc)
    GROUP BY symbol ORDER BY n_occurrences DESC, symbol ASC LIMIT 20
    """
    )


@query(
    "wordpiece_trained_merges",
    _wordpiece_train_oracle_sql(n_merges=8, min_pf=2),
    doc="E4 WordPiece tokenizer TRAINING (Schuster & Nakajima 2012 — the "
    "BERT-family tokenizer), completing the tokenizer trio beside BPE "
    "(bpe_trained_merges) and unigram-LM (unigram_trained_vocab): the "
    "BPE merge loop with the likelihood objective — merge the adjacent "
    "pair maximizing count(ab)/(count(a)·count(b)) over the CURRENT "
    "segmentation, computed as an exact integer floor on the 10^-12 "
    "grid (DECIMAL-range div on the Spark side, HUGEINT // in the "
    "oracle — no floats, bit-reproducible argmax). Initial segmentation "
    "decorates non-initial chars with '##' (BERT continuation forms); "
    "merges strip the marker off the right piece. One corpus scan "
    "builds the word table; per iteration: two vocab-sized shuffles "
    "(pair + symbol counts, symbol frame broadcast onto the pairs), a "
    "k=1 argmax collect, a zero-shuffle HOF re-segment fold over the "
    "touched slice, eager localCheckpoint (flat lineage). The candidate "
    "floor (pair_freq >= 2) applies BEFORE the argmax — the ratio score "
    "otherwise crowns one-off noise pairs. Oracle: 8 unrolled "
    "(pairs→symbols→scored argmax→re-segment) CTE quadruples; the whole "
    "(step, a, b, pair_freq, score_q) trajectory bit-grades.",
)
def wordpiece_trained_merges(spark, sf_dir):
    from spectraplex_spark.operators.wordpiece import wordpiece_train

    docs = table(spark, sf_dir, "documents")
    merges, vocab = wordpiece_train(docs, n_merges=8, min_pair_freq=2)
    vocab.unpersist()
    rows = [(i + 1, a, b, pf, sq) for i, (a, b, pf, sq) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "step int, a string, b string, pair_freq long, score_q long"
    )


@query(
    "wordpiece_encode_topk",
    _wordpiece_encode_oracle_sql(n_merges=8, min_pf=2, max_word_len=16),
    doc="E4 WordPiece tokenizer APPLY (the encode half of "
    "wordpiece_trained_merges — all three tokenizer families now carry "
    "a graded train+encode pair): train 8 merges, export the vocab "
    "(decorated alphabet ∪ merge outputs — what a released BERT vocab "
    "file holds), then GREEDY LONGEST-MATCH-FIRST segmentation per "
    "token with '##' continuation prefixes; any dead-end cursor or a "
    "token over 16 chars makes the whole token [UNK] (the HF "
    "WordpieceTokenizer semantics, max_input_chars_per_word). Spark "
    "side: broadcast-vocab Arrow mapInPandas with a per-batch word "
    "cache (the apply_bpe_pandas shape — zero shuffle); report = "
    "top-20 emitted symbols. Oracle: the train CTE chain + the greedy "
    "cursor loop unrolled over 16 steps, longest match as "
    "list_max(list_filter(...)) against the one-row vocab list — "
    "equivalent per distinct word because segmentation is a pure "
    "function of the word (the unigram_encode_topk precedent).",
)
def wordpiece_encode_topk(spark, sf_dir):
    from spectraplex_spark.operators.wordpiece import (
        build_wp_vocab,
        wordpiece_encode,
        wordpiece_train,
        wordpiece_vocab,
    )

    docs = table(spark, sf_dir, "documents")
    # one corpus scan: the decorated word table feeds BOTH training
    # (vocab_df — skips its internal rebuild) and the vocab export
    # (review finding: train(docs) + build_wp_vocab(docs) re-scanned)
    base = build_wp_vocab(docs).localCheckpoint(eager=True)
    merges, vocab = wordpiece_train(None, n_merges=8, min_pair_freq=2, vocab_df=base)
    vocab.unpersist()
    vset = wordpiece_vocab(base, merges)
    base.unpersist()
    return (
        wordpiece_encode(docs, vset, max_word_len=16)
        .select(F.explode("wordpiece_pieces").alias("symbol"))
        .groupBy("symbol")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("symbol"))
        .limit(20)
    )


def _shuffle_oracle_sql(n_shards: int, seed: int) -> str:
    """DuckDB twin of shuffling.shuffle_shards(_scalable): the affine
    permutation in plain BIGINT (products < 2^62), exact-balance shard
    cut and in-shard position via two window passes."""
    from spectraplex_spark.operators.shuffling import PERM_P, perm_params

    a, b = perm_params(seed)
    return f"""
    WITH p AS (SELECT doc_id,
                 CAST(({a} * doc_id + {b}) % {PERM_P} AS BIGINT) AS perm_q
               FROM documents),
    r AS (SELECT doc_id, perm_q,
            ROW_NUMBER() OVER (ORDER BY perm_q, doc_id) AS rn,
            COUNT(*) OVER () AS total
          FROM p),
    s AS (SELECT doc_id, perm_q,
            CAST(((rn - 1) * {n_shards}) // total AS BIGINT) AS shard_ranked,
            CAST(perm_q % {n_shards} AS BIGINT) AS shard_mod,
            rn
          FROM r)
    SELECT doc_id, perm_q, shard_ranked, shard_mod,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard_ranked ORDER BY rn) - 1
                AS BIGINT) AS shard_pos
    FROM s ORDER BY doc_id
    """


@query(
    "training_shuffle_shards",
    _shuffle_oracle_sql(n_shards=16, seed=7),
    doc="E4/§2.11 deterministic global shuffle + balanced shard "
    "assignment (operators/shuffling.py) — the last step of a "
    "pretraining-data pipeline: a SEEDED bijective affine permutation "
    "perm_q = (A·doc_id + B) mod (2^31−1) gives a total order that is "
    "a function of (id, seed) only — bit-identical across "
    "partitionings, file layouts and cluster sizes (rand(seed) is "
    "per-partition-seeded and is NOT). Ranked shards cut the global "
    "rank into 16 exactly-balanced slices; shard_mod = perm_q mod 16 "
    "is the zero-rank writer key; shard_pos is the resume offset. This "
    "entry grades the SCALABLE two-phase ranking (range exchange + "
    "stamped-pid checkpoint + bounded per-partition-count collect + "
    "broadcast offsets — no single-task global window); the simple "
    "window path is pytest-pinned bit-equal. All arithmetic < 2^62: "
    "ANSI-safe, BIGINT-exact on both engines.",
)
def training_shuffle_shards(spark, sf_dir):
    from spectraplex_spark.operators.shuffling import shuffle_shards_scalable

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return shuffle_shards_scalable(docs, n_shards=16, seed=7).orderBy("doc_id")


# --- round-11 (continuation): event-funnel + cohort-retention analytics ---

_FUNNEL_W_US = 7 * 86400 * 1_000_000  # 7-day window in BIGINT micros


@query(
    "funnel_conversion_report",
    f"""
    WITH u1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
                WHERE event_type = 'view'
                  -- NULL ts can never anchor a funnel window: the
                  -- Spark fold leaves the slot unfilled, so a user
                  -- whose ONLY views are NULL-timed must not count
                  -- at step 1 here either (review finding r12)
                  AND ts IS NOT NULL GROUP BY user_id),
    u2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
           FROM events e JOIN u1 USING (user_id)
           WHERE e.event_type = 'click' AND epoch_us(e.ts) > u1.t1
             AND epoch_us(e.ts) <= u1.t1 + {_FUNNEL_W_US}
           GROUP BY e.user_id),
    u3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
           FROM events e JOIN u2 USING (user_id) JOIN u1 USING (user_id)
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > u2.t2
             AND epoch_us(e.ts) <= u1.t1 + {_FUNNEL_W_US}
           GROUP BY e.user_id),
    c AS (SELECT 1 AS step, 'view' AS event_type, COUNT(*) AS n FROM u1
          UNION ALL SELECT 2, 'click', COUNT(*) FROM u2
          UNION ALL SELECT 3, 'purchase', COUNT(*) FROM u3),
    n1 AS (SELECT n AS first_n FROM c WHERE step = 1)
    SELECT CAST(step AS INT) AS step, event_type, CAST(n AS BIGINT) AS n_users,
           CAST(CASE WHEN first_n > 0 THEN (n * 1000000) // first_n
                     ELSE 0 END AS BIGINT) AS pct_of_first_q
    FROM c, n1 ORDER BY step
    """,
    doc="§2.11 event-funnel conversion (the ClickHouse windowFunnel "
    "contract): per user, step i is reached at the EARLIEST event of "
    "its type STRICTLY after step i-1 and within 7 days of step 1 "
    "(greedy-earliest anchoring, documented). ONE groupBy(user) "
    "shuffle: events pre-filtered to the funnel's types, per-user "
    "sorted struct list + a single HOF fold advancing a k-slot state "
    "array in BIGINT micros (the state is a filled prefix, so the "
    "next unmatched step is the filled count) — zero Python, zero "
    "extra shuffles, bounded k-row output with 10^-6-grid conversion "
    "ratios. Oracle: chained conditional-min CTEs (t1 -> t2 > t1 -> "
    "t3 > t2, all within t1 + W) — equivalent to the fold because "
    "events are scanned in time order (proof in operators/analytics"
    ".py). Spark is the UTC-pinned session (session.py), so "
    "unix_micros(cast) == epoch_us on the same wallclock.",
)
def funnel_conversion_report(spark, sf_dir):
    from spectraplex_spark.operators.analytics import funnel_report

    ev = table(spark, sf_dir, "events")
    return funnel_report(
        ev, ["view", "click", "purchase"], window_s=7 * 86400
    ).orderBy("step")


@query(
    "cohort_retention_daily",
    """
    WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
               FROM events GROUP BY user_id),
    s AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
          FROM f GROUP BY cohort_day),
    a AS (SELECT f.cohort_day,
            date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
            CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
          FROM events e JOIN f USING (user_id) GROUP BY 1, 2)
    SELECT a.cohort_day, CAST(day_offset AS INT) AS day_offset, n_active,
           cohort_size,
           CAST((n_active * 1000000) // cohort_size AS BIGINT) AS retention_q
    FROM a JOIN s USING (cohort_day) ORDER BY 1, 2
    """,
    doc="§2.11 cohort-retention matrix (the product-analytics "
    "retention report): cohort = each user's first activity day; the "
    "matrix counts distinct active users per (cohort_day, day_offset) "
    "with cohort size and a 10^-6-grid retention ratio (exact BIGINT "
    "floor on both engines). Two honest shuffles — per-user first-day "
    "aggregate and the (cohort, offset) distinct-count — with the "
    "user->cohort join co-partitioned on user_id (never broadcast: "
    "user cardinality scales with the corpus). Cohort sizes derive "
    "from the matrix's own offset-0 row (every user is active on their "
    "first day), materialized once via lineage_truncate — saving the "
    "second corpus scan an unshared per-user aggregate would recompute "
    "(plan-audited: 16 exchanges down to 4). Output bounded by "
    "days x offsets, never by users.",
)
def cohort_retention_daily(spark, sf_dir):
    from spectraplex_spark.operators.analytics import cohort_retention

    ev = table(spark, sf_dir, "events")
    return cohort_retention(ev).orderBy("cohort_day", "day_offset")



def _funnel_reach_counts(spark, latest):
    """Shared tail of the two streaming-funnel replay entries: fold the
    final per-user ``reached`` snapshots into per-step reach counts
    (step s counts users with reached >= s), zero-filled over the
    3-step frame so an empty drain still grades."""
    steps_df = spark.createDataFrame([(1,), (2,), (3,)], "step int")
    reach_steps = F.when(
        F.col("reached") >= 1, F.sequence(F.lit(1), F.col("reached"))
    ).otherwise(F.expr("array()").cast("array<int>"))
    counts = (
        latest.select(F.explode(reach_steps).alias("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    return (
        steps_df.join(counts, "step", "left")
        .na.fill({"n_users": 0})
        .select("step", F.col("n_users").cast("long").alias("n_users"))
        .orderBy("step")
    )


@query(
    "stream_funnel_replay",
    f"""
    WITH u1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
                WHERE event_type = 'view'
                  -- NULL ts can never anchor a funnel window: the
                  -- Spark fold leaves the slot unfilled, so a user
                  -- whose ONLY views are NULL-timed must not count
                  -- at step 1 here either (review finding r12)
                  AND ts IS NOT NULL GROUP BY user_id),
    u2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
           FROM events e JOIN u1 USING (user_id)
           WHERE e.event_type = 'click' AND epoch_us(e.ts) > u1.t1
             AND epoch_us(e.ts) <= u1.t1 + {_FUNNEL_W_US}
           GROUP BY e.user_id),
    u3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
           FROM events e JOIN u2 USING (user_id) JOIN u1 USING (user_id)
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > u2.t2
             AND epoch_us(e.ts) <= u1.t1 + {_FUNNEL_W_US}
           GROUP BY e.user_id)
    SELECT 1 AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM u1
    UNION ALL SELECT 2, COUNT(*) FROM u2
    UNION ALL SELECT 3, COUNT(*) FROM u3
    ORDER BY step
    """,
    doc="§2.9/§2.11 STREAMING event funnel, replayed end to end: the "
    "windowFunnel state machine (funnel_conversion_report's exact "
    "transition rule, integer micros) kept incrementally per user via "
    "applyInPandasWithState — state is k BIGINT step times (filled "
    "prefix) per user, never event history; each batch advances the "
    "prefix and emits the post-batch (user, reached) snapshot. The "
    "replay streams the events table through a file source "
    "(availableNow) and aggregates snapshots to per-step reach counts; "
    "for an in-order source this is BIT-IDENTICAL to the batch funnel "
    "(the oracle is the same chained conditional-min SQL), which is "
    "what this entry certifies — the arrival-order caveat for "
    "out-of-order streams is documented in streaming/funnel.py and "
    "pinned by pytest (slots fill once; late time-preceding events "
    "are ignored, the k-BIGINT-state trade).",
)
def stream_funnel_replay(spark, sf_dir):
    import tempfile

    from spectraplex_spark.streaming.funnel import stream_funnel

    events = table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="spectraplex_funnel_")
    events.coalesce(1).write.parquet(f"{d}/src")
    stream = spark.readStream.schema(events.schema).parquet(f"{d}/src")
    q = (
        stream_funnel(stream, ["view", "click", "purchase"], window_s=7 * 86400)
        .writeStream.format("parquet")
        .option("path", f"{d}/out")
        .option("checkpointLocation", f"{d}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):  # partial output must fail loudly
        q.stop()
        raise TimeoutError("stream_funnel_replay: drain exceeded 300s")
    snaps = spark.read.parquet(f"{d}/out")
    # one snapshot per TOUCHED user PER BATCH: keep the latest (max —
    # the prefix only advances) so a multi-batch drain can never
    # double-count a user (review finding; the single coalesced file
    # usually drains in one batch, but that is an execution detail,
    # not a contract)
    latest = snaps.groupBy("user_id").agg(F.max("reached").alias("reached"))
    return _funnel_reach_counts(spark, latest)


@query(
    "stream_funnel_watermarked_replay",
    f"""
    WITH u1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
                WHERE event_type = 'view'
                  -- NULL ts can never anchor a funnel window: the
                  -- Spark fold leaves the slot unfilled, so a user
                  -- whose ONLY views are NULL-timed must not count
                  -- at step 1 here either (review finding r12)
                  AND ts IS NOT NULL GROUP BY user_id),
    u2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
           FROM events e JOIN u1 USING (user_id)
           WHERE e.event_type = 'click' AND epoch_us(e.ts) > u1.t1
             AND epoch_us(e.ts) <= u1.t1 + {_FUNNEL_W_US}
           GROUP BY e.user_id),
    u3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
           FROM events e JOIN u2 USING (user_id) JOIN u1 USING (user_id)
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > u2.t2
             AND epoch_us(e.ts) <= u1.t1 + {_FUNNEL_W_US}
           GROUP BY e.user_id)
    SELECT 1 AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM u1
    UNION ALL SELECT 2, COUNT(*) FROM u2
    UNION ALL SELECT 3, COUNT(*) FROM u3
    ORDER BY step
    """,
    doc="§2.9/§2.11 the WATERMARK-BUFFERED streaming funnel (r11 "
    "verdict task #6) replayed OUT OF ORDER end to end: the source is "
    "hash-scrambled into 8 files (arrival order decorrelated from "
    "event time) and drained 2 files per trigger, so every micro-batch "
    "delivers time-interleaved events — the case where the "
    "arrival-order funnel (stream_funnel_replay) diverges from the "
    "batch fold. stream_funnel_watermarked buffers per-user events "
    "until the watermark passes, seals them through the exact batch "
    "_advance rule in time order, and folds the pending tail "
    "provisionally, so the final snapshot (max-n_seen per user — "
    "reached is legally non-monotone under late re-anchoring) equals "
    "the batch funnel BIT-FOR-BIT. The oracle is therefore the same "
    "chained conditional-min SQL as the batch funnel — agreement "
    "certifies the out-of-order claim, not just in-order replay. "
    "State bound: k BIGINTs + one watermark delay of events per user.",
)
def stream_funnel_watermarked_replay(spark, sf_dir):
    import tempfile

    from spectraplex_spark.streaming.funnel import stream_funnel_watermarked

    events = table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="spectraplex_wmfunnel_")
    # hash-scramble: 8 range partitions of xxhash64(event_id) — each
    # file spans the full time range, so arrival interleaves wildly
    (
        events.withColumn("_h", F.xxhash64("event_id"))
        .repartitionByRange(8, "_h")
        .drop("_h")
        .write.parquet(f"{d}/src")
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{d}/src")
    )
    q = (
        stream_funnel_watermarked(
            stream,
            ["view", "click", "purchase"],
            window_s=7 * 86400,
            delay_s=31 * 86400,  # covers the table's full span: drop nothing
        )
        .writeStream.format("parquet")
        .option("path", f"{d}/out")
        .option("checkpointLocation", f"{d}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):  # partial output must fail loudly
        q.stop()
        raise TimeoutError("stream_funnel_watermarked_replay: drain exceeded 300s")
    snaps = spark.read.parquet(f"{d}/out")
    # final snapshot per user = max n_seen (monotone); reached itself
    # may shrink under late re-anchoring, so max(reached) would be WRONG
    latest = snaps.groupBy("user_id").agg(
        F.max_by("reached", "n_seen").alias("reached")
    )
    return _funnel_reach_counts(spark, latest)


@query(
    "hybrid_rrf_fusion",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
    stats AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(len(toks)) AS BIGINT) AS s FROM tok),
    tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                        unnest(toks) AS term FROM tok)
           WHERE term IN ('spark', 'window', 'join') GROUP BY 1, 2, 3),
    dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    c AS (SELECT tf.doc_id,
                 (CAST(FLOOR(LN(1 + CAST(2 * (stats.n - dfs.df) + 1 AS DOUBLE)
                                   / CAST(2 * dfs.df + 1 AS DOUBLE)) * 65536)
                       AS BIGINT)
                  * (44 * stats.s * tf.tf))
                 // (20 * stats.s * tf.tf + 6 * stats.s + 18 * tf.dl * stats.n)
                   AS cq
          FROM tf JOIN dfs USING (term), stats),
    bm AS MATERIALIZED (
        SELECT doc_id, CAST(SUM(cq) AS BIGINT) AS bm25_q
        FROM c GROUP BY doc_id
        ORDER BY bm25_q DESC, doc_id ASC LIMIT 20),
    bmr AS (SELECT doc_id,
                   row_number() OVER (ORDER BY bm25_q DESC, doc_id ASC) AS r
            FROM bm),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cd AS (SELECT vec_id, {_SQ_CODE_SQL} AS codes FROM v WHERE vec_id != 0),
    qv AS (SELECT {_SQ_CODE_SQL} AS qc FROM v WHERE vec_id = 0),
    sq AS MATERIALIZED (
        SELECT cd.vec_id AS doc_id,
               CAST(list_sum(list_transform(range(1, len(cd.codes) + 1),
                                            i -> cd.codes[i] * qv.qc[i]))
                    AS BIGINT) AS dot
        FROM cd, qv
        ORDER BY dot DESC, doc_id ASC LIMIT 20),
    sqr AS (SELECT doc_id,
                   row_number() OVER (ORDER BY dot DESC, doc_id ASC) AS r
            FROM sq),
    u AS (SELECT doc_id, 1048576 // (60 + r) AS rrf FROM bmr
          UNION ALL
          SELECT doc_id, 1048576 // (60 + r) AS rrf FROM sqr)
    SELECT doc_id, CAST(SUM(rrf) AS BIGINT) AS rrf_q,
           CAST(COUNT(*) AS INT) AS n_lists
    FROM u GROUP BY doc_id
    ORDER BY rrf_q DESC, doc_id ASC LIMIT 10
    """,
    doc="E2/E4 hybrid retrieval fusion (r11 verdict task #9 — the RAG "
    "serving shape): reciprocal-rank fusion of the BM25 lexical "
    "shortlist (bm25_topk_grid, the graded integer-grid ranker) and "
    "the int8-SQ semantic shortlist (sq_topk; vec_id shares documents' "
    "id space in the driver tables), rrf_q = sum of "
    "floor(2^20 div (60 + rank)) — pure BIGINT rank arithmetic, so the "
    "fused score bit-grades with NO new float surface. n_lists rides "
    "as the legs-agreed witness. Scale shape: both legs keep their own "
    "distributed plans (postings probe / int8 scan) and hand fusion a "
    "k-row shortlist; the fusion itself is a union + groupBy over "
    "2k rows with single-partition rank windows bounded by the "
    "rankers' limit() (the serving-edge discipline). Oracle ranks the "
    "SQ leg by the raw integer dot — identical order to sq_score "
    "(positive constant divisor).",
)
def hybrid_rrf_fusion(spark, sf_dir):
    from spectraplex_spark.operators.fusion import rrf_fuse
    from spectraplex_spark.operators.retrieval import bm25_topk_grid

    docs = table(spark, sf_dir, "documents")
    em = table(spark, sf_dir, "embeddings")
    lex = bm25_topk_grid(docs, ["spark", "window", "join"], k=20)
    qvec = [
        float(x)
        for x in em.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    ]
    sem = PQ.sq_topk(em.filter(F.col("vec_id") != 0), qvec, k=20).select(
        F.col("vec_id").alias("doc_id"), "sq_score"
    )
    return rrf_fuse([(lex, "bm25_q"), (sem, "sq_score")], k=10)


# --------------------------------------------------------------------------
# Round-13 growth (r12 verdict task #8): the END-TO-END curation run —
# the integration-level evidence that the per-stage graded entries
# COMPOSE. Registers at the catalog tail (grades r14 per the standing
# late-registration precedent; declared in freshness.LATE_REGISTRATIONS).
# --------------------------------------------------------------------------


def _curation_run_oracle() -> str:
    """Single-statement DuckDB replay of the ENTIRE curation run:
    benchmark split → language gate → quality gate → exact dedup →
    exact-Jaccard near-dup pairs (inverted shingle index) → transitive
    closure → min-id survivors → 8-gram decontamination vs the
    benchmark → DSIR importance top-k per source → 512-token pack
    assignment → seeded shuffle shards.  Every stage's SQL is the
    already-certified twin of its constituent graded entry
    (corpus_prep_pipeline, decontam_ngram_overlap,
    dsir_importance_sample, corpus_pack_assignment,
    training_shuffle_shards) chained in order, so one hash certifies
    stage order and survivor propagation across the whole pipeline.
    Chained CTEs are MATERIALIZED (the r11 inlining-blowup gotcha)."""
    from spectraplex_spark.operators.shuffling import PERM_P, perm_params

    a, b = perm_params(7)
    cnt = {lang: _stop_count_sql(lang) for lang in X.STOPWORDS}
    m = f"GREATEST({cnt['en']}, {cnt['es']}, {cnt['fr']}, {cnt['de']})"
    quality = f"""(
        (CASE WHEN len({_TOKENS_SQL}) BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END)
      + (CASE WHEN len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) < 0.3 * LENGTH(text) THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN {cnt['en']} > 0 THEN 0.25 ELSE 0.0 END)
    ) >= 0.5"""
    gram8 = (
        "list_distinct(CASE WHEN len(toks) >= 8 "
        "THEN list_transform(range(1, len(toks) - 6), "
        "i -> array_to_string(toks[i:i+7], ' ')) "
        "ELSE [array_to_string(toks, ' ')] END)"
    )
    return f"""
    WITH RECURSIVE tr AS MATERIALIZED (
      SELECT doc_id, text, source FROM documents WHERE doc_id % 7 != 0
    ),
    lq AS MATERIALIZED (
      SELECT doc_id, text, source FROM tr
      WHERE {m} > 0 AND {cnt['en']} = {m} AND {quality}
    ),
    pl AS MATERIALIZED (
      SELECT doc_id, text, source FROM lq
      WHERE doc_id IN (SELECT MIN(doc_id) FROM lq GROUP BY md5({_NORM_SQL}))
    ),
    t AS (SELECT doc_id, {_NGRAM_TOKENS} AS toks FROM pl),
    s AS MATERIALIZED (SELECT doc_id,
           list_distinct(CASE WHEN len(toks) >= 3
             THEN list_transform(range(1, len(toks) - 1),
                                 i -> array_to_string(toks[i:i+2], ' '))
             ELSE [array_to_string(toks, ' ')] END) AS sh FROM t),
    sz AS (SELECT doc_id, len(sh) AS n FROM s),
    inv AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT i.id_a, i.id_b FROM inter i
      JOIN sz sa ON sa.doc_id = i.id_a JOIN sz sb ON sb.doc_id = i.id_b
      WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.8
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u
    ),
    comp AS (SELECT u AS node, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u),
    nd AS MATERIALIZED (
      SELECT doc_id, text, source FROM pl
      WHERE doc_id NOT IN (SELECT node FROM comp WHERE component <> node)
    ),
    ng8 AS MATERIALIZED (
      SELECT doc_id, {gram8} AS g8
      FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM nd)
    ),
    ngb AS MATERIALIZED (
      SELECT DISTINCT unnest(g8) AS gram
      FROM (SELECT {gram8} AS g8
            FROM (SELECT {_TOKENS_SQL} AS toks FROM documents
                  WHERE doc_id % 7 = 0))
    ),
    dirty AS (
      SELECT DISTINCT n.doc_id
      FROM (SELECT doc_id, unnest(g8) AS gram FROM ng8) n
      JOIN ngb USING (gram)
    ),
    dc AS MATERIALIZED (
      SELECT doc_id, text, source FROM nd
      WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
    ),
    tb AS MATERIALIZED (
      SELECT doc_id, source,
             unnest(list_transform(toks, t -> {_DSIR_BUCKET_SQL})) AS bucket
      FROM (SELECT doc_id, source, {_TOKENS_SQL} AS toks FROM dc)
    ),
    w AS MATERIALIZED (
      SELECT bucket,
             ((COUNT(*) FILTER (WHERE doc_id % 3 = 0) + 1) * 1000000)
               // (COUNT(*) + 64) AS wq
      FROM tb GROUP BY bucket
    ),
    sc AS (SELECT tb.doc_id, any_value(tb.source) AS source,
                  CAST(SUM(w.wq) AS BIGINT) AS score_q
           FROM tb JOIN w USING (bucket) GROUP BY tb.doc_id),
    rkd AS (SELECT source, doc_id, score_q,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY score_q DESC, doc_id) AS rk
            FROM sc),
    kept AS MATERIALIZED (
      SELECT r.source, r.doc_id, r.score_q, CAST(r.rk AS BIGINT) AS rk,
             CAST(len({_TOKENS_SQL}) AS INTEGER) AS n_tokens
      FROM rkd r JOIN dc USING (doc_id) WHERE r.rk <= 8
    ),
    pk AS (
      SELECT doc_id, n_tokens,
             CAST(doc_id % 4 AS INTEGER) AS pack_shard,
             CAST(SUM(n_tokens) OVER wp - n_tokens AS BIGINT) AS tokens_before,
             CAST((CAST(SUM(n_tokens) OVER wp - n_tokens AS BIGINT) // 512)
                  AS BIGINT) AS pack_id
      FROM kept
      WINDOW wp AS (PARTITION BY doc_id % 4 ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    pm AS (
      SELECT doc_id,
             CAST(({a} * doc_id + {b}) % {PERM_P} AS BIGINT) AS perm_q
      FROM kept
    ),
    rr AS (SELECT doc_id, perm_q,
             ROW_NUMBER() OVER (ORDER BY perm_q, doc_id) AS rn,
             COUNT(*) OVER () AS total
           FROM pm),
    sh8 AS (SELECT doc_id, perm_q,
              CAST(((rn - 1) * 8) // total AS BIGINT) AS shard_ranked,
              CAST(perm_q % 8 AS BIGINT) AS shard_mod,
              rn
            FROM rr),
    shf AS (SELECT doc_id, perm_q, shard_ranked, shard_mod,
              CAST(ROW_NUMBER() OVER (PARTITION BY shard_ranked ORDER BY rn) - 1
                   AS BIGINT) AS shard_pos
            FROM sh8)
    SELECT k.doc_id, k.source, k.score_q, k.rk,
           p.n_tokens, p.pack_shard, p.tokens_before, p.pack_id,
           f.perm_q, f.shard_ranked, f.shard_mod, f.shard_pos
    FROM kept k JOIN pk p USING (doc_id) JOIN shf f USING (doc_id)
    ORDER BY k.doc_id
    """


@query(
    "curation_run_e2e",
    _curation_run_oracle(),
    doc="THE end-to-end curation run (r12 verdict task #8) — every "
    "stage of a pretraining-data pipeline chained as ONE graded "
    "entry over the organic corpus: benchmark split (every 7th doc "
    "held out) → prepare_corpus (language gate → quality gate → exact "
    "dedup → MinHash/LSH near-dup pairs → connected components → "
    "min-id survivors) → verbatim 8-gram decontamination against the "
    "held-out benchmark (string-gram graded path; hashed=True is the "
    "100 TB path) → DSIR importance top-8 per source toward the "
    "doc_id%3 target slice → 512-token pack assignment (4 shards) → "
    "seeded shuffle into 8 training shards (scalable two-phase "
    "ranking). One hash certifies stage ORDER and survivor "
    "propagation across six operator families that were previously "
    "only graded stage-by-stage (the corpus_prep_pipeline precedent, "
    "extended to the r7-r12 operators). Scale shape: the pipeline "
    "inherits each stage's certified plan — gates are narrow in-row "
    "passes on one enrichment scan, dedup shuffles 16-byte keys, the "
    "benchmark side broadcasts, DSIR collects exactly 64 bucket "
    "weights, and pack/shuffle run over the k-per-stratum selection "
    "(bounded), with the shuffle's two-phase ranking the only "
    "data-sized exchange.",
)
def curation_run_e2e(spark, sf_dir):
    from spectraplex_spark.operators.components import lineage_truncate
    from spectraplex_spark.operators.corpus import prepare_corpus
    from spectraplex_spark.operators.decontam import decontaminate
    from spectraplex_spark.operators.dsir import dsir_importance_sample
    from spectraplex_spark.operators.packing import pack_documents
    from spectraplex_spark.operators.shuffling import shuffle_shards_scalable

    # spread=True: the prepare_corpus gates + decontam n-gram pass root
    # their heavy text work at this one scan.
    docs = table(spark, sf_dir, "documents", spread=True)
    bench = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "text"
    )
    train = docs.filter(F.col("doc_id") % 7 != 0)
    clean, _ = prepare_corpus(train, keep_langs=("en",), collect_stats=False)
    # string-gram decontam (hashed=False) is the graded path; production
    # passes hashed=True (xxhash64 stream — same verdicts absent 31-bit
    # collisions, pytest-asserted in test_decontam)
    # lineage_truncate: dc fans into FOUR consumers (the DSIR weights
    # collect, the scoring pass, and through kept into pack + shuffle) —
    # Catalyst does not CSE shared subplans, so without the barrier the
    # decontam anti-join + pair-mining stages re-execute per branch
    # (prepare_corpus's internal persist already shares the text scan;
    # review finding r13 — A/B measured ~19-21 s → ~12.7 s warm at
    # sf0.1, with the stage count roughly halved)
    dc = lineage_truncate(decontaminate(clean, bench, n=8, hashed=False))
    sel = dsir_importance_sample(
        dc, F.col("doc_id") % 3 == 0, k=8, stratum_col="source"
    )
    kept = lineage_truncate(
        dc.join(sel.select("doc_id", "score_q", "rk"), "doc_id")
    )
    packed = pack_documents(kept, budget=512, n_shards=4)
    shf = shuffle_shards_scalable(kept.select("doc_id"), n_shards=8, seed=7)
    return (
        sel.join(packed, "doc_id")
        .join(shf, "doc_id")
        .select(
            "doc_id",
            "source",
            "score_q",
            "rk",
            "n_tokens",
            F.col("shard").alias("pack_shard"),
            "tokens_before",
            "pack_id",
            "perm_q",
            "shard_ranked",
            "shard_mod",
            "shard_pos",
        )
        .orderBy("doc_id")
    )
