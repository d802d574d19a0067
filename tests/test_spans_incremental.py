"""Incremental repeated-span gate (streaming/spans_incremental.py):
incremental == batch, replay idempotence, sidecar param pinning,
foreachBatch wrapper. Cross-engine grading is in test_oracle_parity.py
(incremental_spans_planted).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spectraplex_spark.operators.spans import repeated_spans
from spectraplex_spark.streaming.spans_incremental import (
    spans_filter_batch,
    stream_spans_report,
)

SCHEMA = "doc_id long, text string"

DOCS = [
    (0, "alpha beta gamma delta unique0 tail0"),
    (1, "head1 alpha beta gamma delta unique1"),
    (2, "nothing shared here at all zero"),
    (3, "second wave alpha beta gamma delta closing"),
    (4, "totally fresh words in wave two"),
]


def test_two_batch_equals_batch_for_new_docs(spark, tmp_path):
    """Gate output for batch-2 docs == whole-corpus spans restricted
    to batch-2 docs (history includes both batches)."""
    df = spark.createDataFrame(DOCS, SCHEMA)
    idx = str(tmp_path / "gate")
    b1 = df.filter(F.col("doc_id") < 3)
    b2 = df.filter(F.col("doc_id") >= 3)
    spans_filter_batch(b1, idx, k=4)
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in spans_filter_batch(b2, idx, k=4).collect()
    )
    want = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(df, k=4).collect()
        if r["doc_id"] >= 3
    )
    assert got == want and len(got) > 0


def test_replayed_batch_appends_nothing_and_reports_same(spark, tmp_path):
    df = spark.createDataFrame(DOCS, SCHEMA)
    idx = str(tmp_path / "gate")
    first = sorted(map(tuple, spans_filter_batch(df, idx, k=4).collect()))
    n_rows = spark.read.parquet(f"{idx}/grams").count()
    replay = sorted(map(tuple, spans_filter_batch(df, idx, k=4).collect()))
    assert replay == first  # same verdicts
    assert spark.read.parquet(f"{idx}/grams").count() == n_rows  # zero appended


def test_mismatched_params_fail_loudly(spark, tmp_path):
    df = spark.createDataFrame(DOCS, SCHEMA)
    idx = str(tmp_path / "gate")
    spans_filter_batch(df, idx, k=4)
    with pytest.raises(ValueError, match="k"):
        spans_filter_batch(df, idx, k=5)


def test_within_batch_second_occurrence_detected(spark, tmp_path):
    """A gram's first AND second occurrence arriving in the same batch
    still count — history includes the batch itself."""
    idx = str(tmp_path / "gate")
    batch = spark.createDataFrame(
        [(10, "x y z w pad10"), (11, "pre11 x y z w")], SCHEMA
    )
    got = sorted(map(tuple, spans_filter_batch(batch, idx, k=4).collect()))
    assert got == [(10, 0, 4), (11, 1, 5)]


def test_foreachbatch_wrapper_lands_idempotently(spark, tmp_path):
    df = spark.createDataFrame(DOCS, SCHEMA)
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = stream_spans_report(
        stream,
        report_path=str(tmp_path / "report"),
        index_dir=str(tmp_path / "gate"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=4,
    )
    q.awaitTermination(120)
    report = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in spark.read.parquet(str(tmp_path / "report")).select(
            "doc_id", "span_start", "span_end"
        ).collect()
    }
    want = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(df, k=4).collect()
    }
    assert report == want
