"""Repeated-substring span removal (operators/spans.py): island
merging, within-doc repetition, short-doc edges, hashed-path parity.
Cross-engine grading is in test_oracle_parity.py
(repeated_spans_report / span_dedup_clean).
"""

from __future__ import annotations

from spectraplex_spark.operators.spans import (
    remove_repeated_spans,
    repeated_spans,
)

SCHEMA = "doc_id long, text string"


def _spans(spark, docs, k=3, **kw):
    df = spark.createDataFrame(docs, SCHEMA)
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(df, k=k, **kw).collect()
    )


def test_cross_doc_repeat_marks_both_docs(spark):
    docs = [
        (0, "alpha beta gamma delta unique0 tail0"),
        (1, "head1 alpha beta gamma delta unique1"),
        (2, "nothing shared here at all zero"),
    ]
    got = _spans(spark, docs, k=4)
    # "alpha beta gamma delta" (4 tokens) repeats across docs 0 and 1
    assert got == [(0, 0, 4), (1, 1, 5)]


def test_within_doc_repetition_counts(spark):
    # the 3-gram "a b c" occurs twice INSIDE one doc — still repeated
    docs = [(0, "a b c x y z a b c"), (1, "totally different words here")]
    got = _spans(spark, docs, k=3)
    assert got == [(0, 0, 3), (0, 6, 9)]


def test_overlapping_and_touching_spans_merge(spark):
    # two docs share a 5-token run; with k=3 the run's three 3-grams
    # produce overlapping intervals that must merge into ONE span
    docs = [
        (0, "p q r s t end0 filler0"),
        (1, "start1 p q r s t end1"),
    ]
    got = _spans(spark, docs, k=3)
    assert got == [(0, 0, 5), (1, 1, 6)]


def test_docs_shorter_than_k_emit_nothing(spark):
    docs = [(0, "one two"), (1, "one two")]
    assert _spans(spark, docs, k=3) == []
    # but at k=2 the full (identical) docs are spans
    assert _spans(spark, docs, k=2) == [(0, 0, 2), (1, 0, 2)]


def test_hashed_path_agrees_with_string_path(spark):
    docs = [
        (0, "alpha beta gamma delta unique0 tail0 alpha beta gamma delta"),
        (1, "head1 alpha beta gamma delta unique1"),
        (2, "nothing shared here at all zero"),
    ]
    assert _spans(spark, docs, k=4, hashed=True) == _spans(spark, docs, k=4)


def test_remove_rebuilds_uncovered_tokens(spark):
    docs = [
        (0, "keep0 alpha beta gamma delta keep1 keep2"),
        (1, "alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(docs, SCHEMA)
    rows = {r["doc_id"]: r for r in remove_repeated_spans(df, k=4).collect()}
    assert rows[0]["clean_text"] == "keep0 keep1 keep2"
    assert (rows[0]["n_tokens"], rows[0]["n_removed"]) == (7, 4)
    assert rows[1]["clean_text"] == ""  # fully covered doc
    assert (rows[1]["n_tokens"], rows[1]["n_removed"]) == (4, 4)


def test_remove_passes_clean_docs_through_normalized(spark):
    docs = [(0, "  Mixed   CASE text  "), (1, "other words entirely")]
    df = spark.createDataFrame(docs, SCHEMA)
    rows = {r["doc_id"]: r for r in remove_repeated_spans(df, k=3).collect()}
    assert rows[0]["n_removed"] == 0
    assert rows[0]["clean_text"] == "mixed case text"  # canonical form


def test_cross_corpus_neardup_finds_planted_and_near_variants(spark):
    from spectraplex_spark.operators.dedup import cross_corpus_neardup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [
            (0, base),                      # exact copy of probe 100
            (1, base + " tail"),            # near-dup (high jaccard)
            (2, "completely different words about other topics entirely now"),
        ],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame([(100, base)], "probe_id long, text string")
    got = {
        (r["doc_id"], r["probe_id"])
        for r in cross_corpus_neardup(corpus, probe, jaccard_threshold=0.7).collect()
    }
    assert got == {(0, 100), (1, 100)}
    # hashed and string verify agree
    got_s = {
        (r["doc_id"], r["probe_id"])
        for r in cross_corpus_neardup(
            corpus, probe, jaccard_threshold=0.7, verify_on_text=True
        ).collect()
    }
    assert got_s == got


def test_cross_corpus_neardup_broadcasts_probe_side(spark):
    """The probe (eval-set) side must broadcast — the corpus is never
    shuffled for the banding probe."""
    from spectraplex_spark.operators.dedup import cross_corpus_neardup

    corpus = spark.createDataFrame(
        [(i, f"text number {i} with filler words") for i in range(30)],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame([(0, "text number 0")], "probe_id long, text string")
    plan = (
        cross_corpus_neardup(corpus, probe)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # corpus side never shuffle-joins


def test_prepare_corpus_optional_span_strip(spark):
    """strip_spans_k prepends the boilerplate strip; defaults (None)
    leave the pipeline identical to the graded twin's behavior."""
    from spectraplex_spark.operators.corpus import prepare_corpus

    boiler = "shared license header repeated across docs verbatim"
    docs = spark.createDataFrame(
        [
            (0, f"{boiler} the quick brown fox jumps over the lazy dog again and again"),
            (1, f"{boiler} a completely different body of useful sentence content here"),
            (2, "no boilerplate in this one just plain useful english text content"),
        ],
        "doc_id long, text string",
    )
    base, base_stats = prepare_corpus(docs, min_quality=0.0)
    stripped, s_stats = prepare_corpus(docs, min_quality=0.0, strip_spans_k=4)
    assert base_stats.n_tokens_span_stripped == -1  # stage off by default
    assert s_stats.n_tokens_span_stripped > 0
    # the boilerplate tokens are gone from every surviving doc
    for r in stripped.collect():
        assert "license" not in r["text"]
    # stripping must not duplicate or drop docs by itself
    assert stripped.count() == base.count()


def test_bigram_surprise_flags_gibberish(spark):
    from spectraplex_spark.operators.textops import bigram_surprise_report

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "zxqj vwpk qmfl xxyz jjqw zzpp"),  # gibberish: all-unique bigrams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_surprise_report(docs).collect()}
    assert rows[2]["rare_rate"] == 1.0
    # the shared-prefix docs have mostly repeated bigrams
    assert rows[0]["rare_rate"] < 0.5 and rows[1]["rare_rate"] < 0.5
    assert rows[0]["n_bigrams"] == 8


def test_remove_spans_preserves_caller_id_column(spark):
    """remove_repeated_spans must hand back the caller's id column name
    (a custom id_col used to come back hardcoded as 'doc_id', breaking
    prepare_corpus(strip_spans_k=..., id_col=...))."""
    df = spark.createDataFrame(
        [(1, "a b c d e a b c d e"), (2, "x y z w q")], "my_id long, text string"
    )
    out = remove_repeated_spans(df, k=4, id_col="my_id")
    assert "my_id" in out.columns and "doc_id" not in out.columns
    assert {r["my_id"] for r in out.collect()} == {1, 2}


def test_prepare_corpus_custom_id_col_with_span_strip(spark):
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.corpus import prepare_corpus

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "id")
    )
    clean, stats = prepare_corpus(
        docs, min_quality=0.0, strip_spans_k=6, id_col="id"
    )
    assert clean.filter(F.col("id").isNotNull()).count() == stats.n_after_neardup
