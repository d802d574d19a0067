"""Incremental near-dup gate: batch semantics, cross-batch memory,
replay idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from spectraplex_spark.streaming.neardup import (
    neardup_filter_batch,
    stream_neardup_filter,
)

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "astronomers catalog variable stars across the northern hemisphere "
    "every clear winter night recording magnitudes in weathered journals"
)
OTHER = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines that "
    "stream compressed batches through operators without materializing"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, _DOC_SCHEMA)


def test_in_batch_neardup_drops_larger_id(spark, tmp_path):
    out = neardup_filter_batch(
        _docs(spark, [(1, BASE), (2, BASE + " zq tail zq"), (3, OTHER)]),
        str(tmp_path / "idx"),
    )
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]


def test_cross_batch_memory_and_unique_pass(spark, tmp_path):
    idx = str(tmp_path / "idx")
    first = neardup_filter_batch(_docs(spark, [(1, BASE)]), idx)
    assert [r.doc_id for r in first.collect()] == [1]
    # second batch: 10 is a near-dup of ACCEPTED doc 1; 11 is unique
    second = neardup_filter_batch(
        _docs(spark, [(10, BASE + " zq tail zq"), (11, OTHER)]), idx
    )
    assert sorted(r.doc_id for r in second.collect()) == [11]


def test_replayed_batch_reemits_survivors_and_appends_nothing(spark, tmp_path):
    idx = str(tmp_path / "idx")
    batch = _docs(spark, [(1, BASE), (3, OTHER)])
    neardup_filter_batch(batch, idx)
    bands_before = spark.read.parquet(f"{idx}/bands").count()
    # replay the SAME batch (at-least-once redelivery): each doc meets
    # its OWN index entry, which must not count as a near-dup — the
    # survivors re-emit (so a failed downstream append can complete on
    # retry) and the idempotent index appends add zero rows
    again = neardup_filter_batch(batch, idx)
    assert sorted(r.doc_id for r in again.collect()) == [1, 3]
    assert spark.read.parquet(f"{idx}/bands").count() == bands_before


def test_streaming_two_microbatches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # two files → two micro-batches (maxFilesPerTrigger=1)
    _docs(spark, [(1, BASE), (2, BASE + " zq tail zq"), (3, OTHER)]).coalesce(
        1
    ).write.parquet(str(src / "b1"))
    _docs(spark, [(10, BASE + " zq other tail zq"), (11, "entirely new topic " * 12)]).coalesce(
        1
    ).write.parquet(str(src / "b2"))
    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = stream_neardup_filter(
        stream,
        str(tmp_path / "survivors"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination(180)
    survivors = {
        r.doc_id for r in spark.read.parquet(str(tmp_path / "survivors")).collect()
    }
    # 2 dups 1 in-batch; 10 dups accepted 1 cross-batch; 11 unique
    assert survivors == {1, 3, 11}


def test_index_config_mismatch_raises(spark, tmp_path):
    idx = str(tmp_path / "idx")
    neardup_filter_batch(_docs(spark, [(1, BASE)]), idx)
    with pytest.raises(ValueError, match="different .*parameters|parameters"):
        neardup_filter_batch(_docs(spark, [(2, OTHER)]), idx, bands=8)
    with pytest.raises(ValueError, match="verify_on_text"):
        neardup_filter_batch(_docs(spark, [(2, OTHER)]), idx, verify_on_text=True)
    # matching params still work after the rejected calls
    ok = neardup_filter_batch(_docs(spark, [(2, OTHER)]), idx)
    assert [r.doc_id for r in ok.collect()] == [2]
