"""Incremental embedding near-dup gate: exact-twin rejection,
cross-batch memory, replay re-emission, streaming end to end."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from spectraplex_spark.streaming.neardup_embedding import (
    embedding_neardup_filter_batch,
    stream_embedding_neardup_filter,
)

_VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

DIM = 16


def _vec(seed: int) -> list[float]:
    # deterministic, pairwise-far unit-ish vectors: one-hot + small tail
    v = [0.01 * ((seed * 7 + i) % 5) for i in range(DIM)]
    v[seed % DIM] = 1.0
    return [float(x) for x in v]


def _vecs(spark, rows):
    return spark.createDataFrame(rows, _VEC_SCHEMA)


def test_in_batch_exact_twin_drops_larger_id(spark, tmp_path):
    out = embedding_neardup_filter_batch(
        _vecs(spark, [(1, _vec(1)), (2, _vec(1)), (3, _vec(3))]),
        str(tmp_path / "idx"),
    )
    assert sorted(r.vec_id for r in out.collect()) == [1, 3]


def test_cross_batch_memory_and_replay(spark, tmp_path):
    idx = str(tmp_path / "idx")
    first = embedding_neardup_filter_batch(_vecs(spark, [(1, _vec(1))]), idx)
    assert [r.vec_id for r in first.collect()] == [1]
    # 10 = exact copy of accepted 1 → rejected; 11 far → accepted
    second = embedding_neardup_filter_batch(
        _vecs(spark, [(10, _vec(1)), (11, _vec(11))]), idx
    )
    assert sorted(r.vec_id for r in second.collect()) == [11]
    # replay of batch 2: survivor 11 re-emits (self-match excluded),
    # 10 still rejected, index appends add zero rows
    sigs_before = spark.read.parquet(f"{idx}/sigs").count()
    replay = embedding_neardup_filter_batch(
        _vecs(spark, [(10, _vec(1)), (11, _vec(11))]), idx
    )
    assert sorted(r.vec_id for r in replay.collect()) == [11]
    assert spark.read.parquet(f"{idx}/sigs").count() == sigs_before


def test_streaming_two_microbatches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _vecs(spark, [(1, _vec(1)), (2, _vec(1)), (3, _vec(3))]).coalesce(1).write.parquet(
        str(src / "b1")
    )
    _vecs(spark, [(10, _vec(3)), (11, _vec(11))]).coalesce(1).write.parquet(
        str(src / "b2")
    )
    stream = (
        spark.readStream.schema(_VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = stream_embedding_neardup_filter(
        stream,
        str(tmp_path / "survivors"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination(180)
    survivors = {
        r.vec_id for r in spark.read.parquet(str(tmp_path / "survivors")).collect()
    }
    assert survivors == {1, 3, 11}


def test_null_and_ragged_vectors_quarantined(spark, tmp_path):
    idx = str(tmp_path / "idx")
    # null embedding in the FIRST row (the old head() probe's failure
    # mode) plus a wrong-dimension vector: both quarantined, the valid
    # vector survives and is indexed
    out = embedding_neardup_filter_batch(
        _vecs(spark, [(1, None), (2, [1.0, 2.0]), (3, _vec(3))]), idx
    )
    assert sorted(r.vec_id for r in out.collect()) == [3]
    # the pinned dim comes from the valid row; a later exact copy of 3
    # is still rejected against the index
    nxt = embedding_neardup_filter_batch(_vecs(spark, [(10, _vec(3))]), idx)
    assert nxt.count() == 0


def test_all_null_batch_yields_empty(spark, tmp_path):
    out = embedding_neardup_filter_batch(
        _vecs(spark, [(1, None), (2, None)]), str(tmp_path / "idx")
    )
    assert out.count() == 0


def test_embedding_index_config_mismatch_raises(spark, tmp_path):
    idx = str(tmp_path / "idx")
    embedding_neardup_filter_batch(_vecs(spark, [(1, _vec(1))]), idx)
    with pytest.raises(ValueError, match="n_bits"):
        embedding_neardup_filter_batch(_vecs(spark, [(2, _vec(2))]), idx, n_bits=4)
    with pytest.raises(ValueError, match="dim"):
        embedding_neardup_filter_batch(
            _vecs(spark, [(2, [1.0] * 32)]), idx, dim=32
        )
