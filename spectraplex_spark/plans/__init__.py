"""The query catalog: every operator from SURVEY.md §2 as a named query
with (where SQL-expressible) a DuckDB oracle twin.

Registry contract (mirrors ``__spark_entry__``):
  - ``CATALOG[name].builder(spark, sf_dir) -> DataFrame``
  - ``CATALOG[name].oracle`` — ANSI SQL DuckDB runs on the same parquet
    (None → driver records a weaker rows-only check)

Determinism rules used throughout (so Spark and DuckDB agree bit-for-bit):
  - float aggregations go through per-row CAST(... AS DECIMAL(38,6))
    before SUM — decimal addition is exact and order-independent, so
    shuffle/partial-agg order can't change the result; the FINAL output
    column is then cast to DOUBLE on both sides (the grader's pandas
    canonicalizer reads DuckDB decimals as float64).
  - every window/top-k ORDER BY carries a unique tiebreaker.
  - date parts are cast to INT, integer sums to BIGINT, on both sides.
  - array/map outputs are stringified (sorted CSV) — raw array cells
    are unhashable to the pandas canonicalizer.
"""

from spectraplex_spark.plans.registry import CATALOG, Query, table

# Importing the modules populates CATALOG via the @query decorator.
from spectraplex_spark.plans import relational  # noqa: E402,F401
from spectraplex_spark.plans import reference_surface  # noqa: E402,F401
from spectraplex_spark.plans import ext  # noqa: E402,F401

# --------------------------------------------------------------------------
# Graded-window curation. The external correctness gate grades the FIRST
# 50 registered queries, so registration order is part of the contract.
#
# The composition rules (freshness bar, deferral justifications, late-
# registration precedent) are MACHINE-CHECKED by
# spectraplex_spark/testing/freshness.py + tests/test_freshness.py — the
# r9 verdict's task #2.  That module parses CORRECTNESS_r*.json, computes
# per-entry latest-green, and asserts this window's legality; the prose
# history blocks that used to live here (r8/r9 compositions) are in git
# history, and the list below now holds ONLY the live window (the r9
# ADVICE duplicate-name fragility is gone: _curate asserts uniqueness).
#
# Round-11 composition (the r10 verdict's pre-planned window, adopted):
#   55 mandatory candidates for 50 slots =
#   (a) ALL 4 never-driver-graded late-r10 registrations (each dual-SF
#       parity green locally since r10 and pytest-covered); three of them
#       are ALSO changed-code regrades this round (the r10 ADVICE fixes:
#       epoch_tail offset-regression + column-order, semantic decontam
#       overflow fail-closed, bpe pandas locale contract — recorded in
#       freshness.CHANGED_CODE_REGRADES);
#   (b) the 4 round-6-vintage r10 deferrals (csv_roundtrip_events,
#       setop_union/intersect_segments, window_topn_orders_per_customer)
#       — they cross the bar otherwise;
#   (c) 42 of the 47 round-7-vintage entries — exactly at the freshness
#       bar's hard edge.  The 5 DEFERRED (named, each with an in-window
#       in-family sibling plus pytest parity, listed in
#       freshness.DEFERRALS): knn_join_topk_arrow, multimodal_resize,
#       solana_normalize_udtf_golden, simhash_dup_groups_planted,
#       session_window_builtin.
# Changed-code entries NOT regraded this round, certified through the
# non-semantic precedent (nfc_dedup_groups r9, ivf_persisted_recall r10)
# plus pytest:
#   - rpc_ingest_golden / rpc_ingest_datasource: connector.py's transient
#     net widened to catch http.client exceptions + OSError (fault-
#     injection finding — a mid-stream disconnect previously CRASHED
#     instead of retrying). Error-path only: the happy path the hashes
#     certify is byte-identical, and tests/test_connector.py's new
#     timeout/disconnect/mixed-fault suite pins the retry semantics.
# New r11 queries register late-only (tail of the catalog; they grade
# r12 per the standing precedent) and are declared in
# freshness.LATE_REGISTRATIONS.
# --------------------------------------------------------------------------
_GRADED_PRIORITY = [
    # ---- round 11 window (exactly 50) ----
    # (a) never driver-graded (late r10; three also changed-code this round)
    "bpe_encode_pandas_topk",
    "epoch_tail_stream_roundtrip",
    "perceptron_quality_trajectory",
    "semantic_decontam_report",
    # (b) round-6 vintage (the named r10 deferrals — hard mandatory)
    "csv_roundtrip_events",
    "setop_intersect_segments",
    "setop_union_segments",
    "window_topn_orders_per_customer",
    # (c) round-7 vintage, 42 of 47 — freshness rotation
    "array_ops_embeddings",
    "asof_price_enrichment",
    "backfill_wallet_migration",
    "corpus_pack_assignment",
    "corpus_split_assignment",
    "dedup_union_events",
    "embedding_neardup_bucketed",
    "embedding_neardup_multiprobe",
    "encoding_quality_report",
    "epoch_append_roundtrip",
    "events_by_user",
    "incremental_neardup_planted",
    "incremental_rollup_merge",
    "knn_join_topk",
    "minhash_neardup_planted",
    "multimodal_frame_sample",
    "ngram_jaccard_sample",
    "q20_excess_stock_suppliers",
    "q21_suppliers_kept_waiting",
    "q4_order_priority_check",
    "range_join_close_pairs",
    "recent_events_topk",
    "running_balance_events",
    "scalar_string_advanced",
    "scalar_try_functions",
    "scd2_user_event_history",
    "session_stats",
    "setop_except_segments",
    "simhash_neighbor_pairs_planted",
    "simsearch_ann_lsh",
    "simsearch_ivf_topk",
    "sketch_event_profile",
    "sliding_window_rollup",
    "snapshot_table_diff",
    "solana_normalize_golden",
    "stratified_embedding_sample",
    "text_markup_strip",
    "text_pii_redaction",
    "text_repetition_stats",
    "text_sentence_split",
    "window_lag_order_gap",
    "window_rank_suite",
]


def _curate(order: list[str]) -> None:
    if len(order) != len(set(order)):  # r9 ADVICE #5: no silent dedup
        dupes = sorted({n for n in order if order.count(n) > 1})
        raise RuntimeError(f"graded-priority contains duplicates: {dupes}")
    missing = [n for n in order if n not in CATALOG]
    if missing:  # fail loudly: a typo here silently un-grades an operator
        raise RuntimeError(f"graded-priority names not in CATALOG: {missing}")
    tail = [n for n in CATALOG if n not in set(order)]
    reordered = {n: CATALOG[n] for n in [*order, *tail]}
    CATALOG.clear()
    CATALOG.update(reordered)


_curate(_GRADED_PRIORITY)

__all__ = ["CATALOG", "Query", "table"]
