"""Document chunking (operators/chunking.py) + per-source quota
(textops.cap_per_source): window arithmetic edges, determinism.
Cross-engine grading is in test_oracle_parity.py (doc_chunks_report /
source_quota_sample).
"""

from __future__ import annotations

import pytest

from spectraplex_spark.operators.chunking import chunk_documents
from spectraplex_spark.operators.textops import cap_per_source

SCHEMA = "doc_id long, text string"


def _chunks(spark, docs, **kw):
    df = spark.createDataFrame(docs, SCHEMA)
    return sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, **kw).collect()
    )


def test_short_doc_yields_one_chunk(spark):
    got = _chunks(spark, [(0, "a b c")], max_tokens=8, stride=8)
    assert got == [(0, 0, 0, 3, "a b c")]


def test_disjoint_chunks_cover_exactly(spark):
    text = " ".join(f"t{i}" for i in range(10))
    got = _chunks(spark, [(0, text)], max_tokens=4, stride=4)
    assert [(c[2], c[4]) for c in got] == [
        (0, "t0 t1 t2 t3"),
        (4, "t4 t5 t6 t7"),
        (8, "t8 t9"),  # short tail chunk, never empty
    ]


def test_overlapping_stride_shares_boundary_tokens(spark):
    text = " ".join(f"t{i}" for i in range(8))
    got = _chunks(spark, [(0, text)], max_tokens=4, stride=2)
    # starts 0,2,4,6: every interior token appears in two chunks
    assert [c[2] for c in got] == [0, 2, 4, 6]
    assert got[0][4] == "t0 t1 t2 t3" and got[1][4] == "t2 t3 t4 t5"
    assert got[3][4] == "t6 t7"


def test_empty_doc_yields_no_chunks(spark):
    assert _chunks(spark, [(0, "   "), (1, "x")], max_tokens=4, stride=4) == [
        (1, 0, 0, 1, "x")
    ]


def test_bad_stride_raises(spark):
    df = spark.createDataFrame([(0, "a b")], SCHEMA)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, max_tokens=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, max_tokens=4, stride=0)


def test_cap_per_source_deterministic_and_capped(spark):
    rows = [(i, f"doc {i}") for i in range(40)]
    df = spark.createDataFrame(
        [(i, t, f"src{i % 4}") for i, t in rows], "doc_id long, text string, source string"
    )
    a = sorted((r["source"], r["doc_id"]) for r in cap_per_source(df, 3).collect())
    b = sorted((r["source"], r["doc_id"]) for r in cap_per_source(df, 3).collect())
    assert a == b  # deterministic draw
    per_src = {}
    for s, d in a:
        per_src.setdefault(s, []).append(d)
    assert all(len(v) == 3 for v in per_src.values())
    # under-quota sources keep everything
    small = df.filter("doc_id < 2")
    assert cap_per_source(small, 3).count() == 2


def test_feature_standardize_fit_apply(spark):
    """standardize_vectors: standardized corpus has ~0 mean and ~1 std
    per dim; zero-variance dims center but don't divide."""
    import numpy as np

    from spectraplex_spark.operators.simsearch import (
        fit_feature_stats,
        standardize_vectors,
    )

    rng = np.random.default_rng(7)
    data = rng.normal(loc=3.0, scale=2.0, size=(200, 4))
    data[:, 3] = 5.0  # constant dim
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    stats = fit_feature_stats(df)
    srows = {r["dim"]: r for r in stats.collect()}
    assert srows[3]["std"] == 0.0
    out = standardize_vectors(df, stats)
    mat = np.array([r["standardized"] for r in out.orderBy("vec_id").collect()])
    assert np.allclose(mat[:, :3].mean(axis=0), 0.0, atol=1e-9)
    assert np.allclose(mat[:, :3].std(axis=0), 1.0, atol=1e-6)
    assert np.allclose(mat[:, 3], 0.0)  # centered, not scaled



def test_pack_documents_scalable_bit_equal_and_partitioning_independent(spark):
    """The two-phase running sum must return byte-identical assignments
    to the single-window form, under any input partitioning and
    partition count — including shards spanning several range
    partitions (the case the offsets fold exists for)."""
    from spectraplex_spark.operators.packing import (
        pack_documents,
        pack_documents_scalable,
    )

    # NULL text planted mid-stream (r12 ADVICE): the window form's SUM
    # skips NULL n_tokens — the rows get NULL tokens_before/pack_id and
    # the running sum continues unaffected; the scalable twin must match
    # bit-for-bit instead of raising on the NaN.
    df = spark.createDataFrame(
        [(i, None if i % 97 == 3 else "tok " * (1 + i % 37)) for i in range(500)],
        "doc_id long, text string",
    )

    def rows(out):
        return sorted(tuple(r) for r in out.collect())

    want = rows(pack_documents(df, budget=64, n_shards=4))
    assert any(r[-1] is None for r in want)  # the NULL rows are present
    assert want == rows(pack_documents_scalable(df, budget=64, n_shards=4))
    assert want == rows(
        pack_documents_scalable(df.repartition(13), budget=64, n_shards=4,
                                num_partitions=11)
    )
    assert want == rows(
        pack_documents_scalable(df.coalesce(1), budget=64, n_shards=4,
                                num_partitions=2)
    )
    # an ENTIRE shard of NULL text (review finding r13): the per-group
    # SUM(n_tokens) is NULL for that slice — the offset fold must treat
    # it as 0 like the window form, not crash on int(None)
    df_null_shard = spark.createDataFrame(
        [(i, None if i % 4 == 2 else "tok " * (1 + i % 7)) for i in range(40)],
        "doc_id long, text string",
    )
    want2 = rows(pack_documents(df_null_shard, budget=64, n_shards=4))
    assert want2 == rows(
        pack_documents_scalable(df_null_shard, budget=64, n_shards=4)
    )


def test_pack_documents_chunk_composition_deterministic(spark):
    """The documented chunk-stream composition: duplicate doc_ids from
    chunk_documents must pack deterministically via the chunk_id
    tiebreaker (review finding r12: the untiebroken window made
    tokens_before partition-order-dependent)."""
    from spectraplex_spark.operators.chunking import chunk_documents
    from spectraplex_spark.operators.packing import pack_documents

    docs = spark.createDataFrame(
        [(i, "w " * (40 + i)) for i in range(12)], "doc_id long, text string"
    )
    chunks = chunk_documents(docs, max_tokens=16)

    def rows(df_):
        return sorted(
            (r["doc_id"], r["chunk_id"], r["tokens_before"], r["pack_id"])
            for r in df_.collect()
        )

    a = rows(pack_documents(chunks, budget=24, n_shards=3,
                            text_col="chunk_text", order_cols=("chunk_id",)))
    b = rows(pack_documents(chunks.repartition(7), budget=24, n_shards=3,
                            text_col="chunk_text", order_cols=("chunk_id",)))
    assert a == b
    # and pack_id is BIGINT integer math (no float floor, no int32 cast)
    assert all(isinstance(p, int) for *_, p in a)
