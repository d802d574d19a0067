"""Deterministic shuffle + shard assignment (operators/shuffling.py):
exact-vs-scalable bit-equality, partitioning independence, balance,
bijectivity, and the loud id-range contract.  Cross-engine grading is
in test_oracle_parity.py (training_shuffle_shards)."""

from __future__ import annotations

from collections import Counter

import pytest

from spectraplex_spark.operators.shuffling import (
    PERM_P,
    perm_params,
    shard_manifest,
    shuffle_shards,
    shuffle_shards_scalable,
)


def _rows(df):
    return [tuple(r) for r in df.orderBy("doc_id").collect()]


def test_scalable_bit_equal_and_partitioning_independent(spark):
    """The two-phase distributed ranking returns byte-identical rows to
    the single-window reference — and neither changes when the input
    arrives under a different partitioning (the rand(seed) failure
    mode this operator exists to rule out)."""
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = _rows(shuffle_shards(df, 7, seed=42))
    assert a == _rows(shuffle_shards_scalable(df, 7, seed=42))
    assert a == _rows(shuffle_shards_scalable(df.repartition(13), 7, seed=42))
    assert a == _rows(shuffle_shards_scalable(df.coalesce(1), 7, seed=42))
    assert a == _rows(shuffle_shards(df.repartition(3), 7, seed=42))


def test_permutation_is_bijective_and_seeded(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = shuffle_shards(df, 4, seed=1).select("doc_id", "perm_q").collect()
    assert len({r["perm_q"] for r in a}) == 1000  # collision-free
    b = shuffle_shards(df, 4, seed=2).select("doc_id", "perm_q").collect()
    assert {r["perm_q"] for r in a} != {r["perm_q"] for r in b}
    # the python-side params replay the column expression
    A, B = perm_params(1)
    got = {r["doc_id"]: r["perm_q"] for r in a}
    for i in (0, 1, 999):
        assert got[i] == (A * i + B) % PERM_P


def test_ranked_shards_exactly_balanced(spark):
    df = spark.range(0, 1003).withColumnRenamed("id", "doc_id")
    out = shuffle_shards(df, 8, seed=0).collect()
    sizes = Counter(r["shard_ranked"] for r in out)
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # shard_pos is a dense 0..size-1 enumeration per shard
    for s, n in sizes.items():
        pos = sorted(r["shard_pos"] for r in out if r["shard_ranked"] == s)
        assert pos == list(range(n))
    # shard_mod stays within range and is perm-derived
    assert all(0 <= r["shard_mod"] < 8 for r in out)
    assert all(r["shard_mod"] == r["perm_q"] % 8 for r in out)


def test_shard_manifest_bounded_and_consistent(spark):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    out = shuffle_shards(df, 5, seed=3)
    mani = {r["shard_ranked"]: r for r in shard_manifest(out).collect()}
    assert len(mani) == 5
    assert sum(r["n_docs"] for r in mani.values()) == 200
    # perm spans are disjoint and ordered by shard (rank cut along perm_q)
    spans = [
        (mani[s]["perm_lo"], mani[s]["perm_hi"]) for s in sorted(mani)
    ]
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def test_out_of_range_id_fails_loudly(spark):
    bad = spark.createDataFrame([(PERM_P + 5,)], "doc_id long")
    with pytest.raises(Exception, match="outside"):
        shuffle_shards(bad, 2).collect()
    null = spark.createDataFrame([(None,)], "doc_id long")
    with pytest.raises(Exception, match="outside"):
        shuffle_shards_scalable(null, 2).collect()
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_shards(bad, 0)


def test_degenerate_seed_regression(spark):
    """Review-caught: `mix % P | 1` could yield A = P ≡ 0 (mod P),
    collapsing the permutation to the constant B.  Seed 1749512918 hit
    it; perm_params must never return A ≡ 0 and the permutation stays
    bijective there."""
    for seed in (1749512918, 0, 1, PERM_P - 2, 2**31):
        a, b = perm_params(seed)
        assert 1 <= a <= PERM_P - 1, (seed, a)
        assert 0 <= b < PERM_P
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    out = shuffle_shards(df, 4, seed=1749512918).collect()
    assert len({r["perm_q"] for r in out}) == 300  # still a bijection
    assert len({r["shard_mod"] for r in out}) == 4


def test_hypothesis_bijective_over_random_seeds():
    """Property: for any seed, A is never ≡ 0 mod P, so the map
    id → (A·id + B) mod P is injective on [0, P)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=0, max_value=2**63 - 2))
    def check(seed):
        a, b = perm_params(seed)
        assert 1 <= a <= PERM_P - 1
        # injectivity witness on a few points
        pts = {(a * i + b) % PERM_P for i in (0, 1, 2, 12345, PERM_P - 1)}
        assert len(pts) == 5

    check()


def test_empty_input(spark):
    df = spark.range(0, 0).withColumnRenamed("id", "doc_id")
    assert shuffle_shards(df, 4).count() == 0
    assert shuffle_shards_scalable(df, 4).count() == 0


def test_integer_typed_ids_no_int32_wrap(spark):
    """r11 ADVICE (medium): with an IntegerType id column the old
    ``lit(a) * col`` multiplied int32×int32 and silently wrapped at 2^31
    under non-ANSI mode — a wrong but valid-looking perm_q.  perm_q must
    equal the exact Python affine map for int-typed ids across the full
    legal range, and agree bit-for-bit with the long-typed path."""
    ids = [0, 1, 12345, 2**30, PERM_P - 2]  # all fit in int32
    as_int = spark.createDataFrame([(i,) for i in ids], "doc_id int")
    as_long = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    A, B = perm_params(7)
    got_int = {
        r["doc_id"]: r["perm_q"]
        for r in shuffle_shards(as_int, 3, seed=7).select("doc_id", "perm_q").collect()
    }
    for i in ids:
        assert got_int[i] == (A * i + B) % PERM_P, i
    got_long = {
        r["doc_id"]: r["perm_q"]
        for r in shuffle_shards(as_long, 3, seed=7).select("doc_id", "perm_q").collect()
    }
    assert got_int == got_long
    # the scalable two-phase path holds the same contract on int ids
    got_scal = {
        r["doc_id"]: r["perm_q"]
        for r in shuffle_shards_scalable(as_int, 3, seed=7)
        .select("doc_id", "perm_q")
        .collect()
    }
    assert got_scal == got_int


def test_offset_lookup_fails_loudly_on_missing_pid(spark):
    """r11 ADVICE: a pid absent from the broadcast offset map must raise
    at execution, not silently resolve to offset 0 (duplicate global
    ranks).  Present pids resolve exactly."""
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.shuffling import _offset_lookup

    df = spark.createDataFrame([(0,), (1,)], "_pid int")
    ok = df.withColumn("off", _offset_lookup({0: 0, 1: 17})).collect()
    assert {r["_pid"]: r["off"] for r in ok} == {0: 0, 1: 17}
    drifted = spark.createDataFrame([(0,), (2,)], "_pid int")
    with pytest.raises(Exception, match="missing from the offset map"):
        drifted.withColumn("off", _offset_lookup({0: 0, 1: 17})).collect()


def test_finish_arithmetic_survives_int32_overflow(spark):
    """(_rn - 1) * n_shards must be BIGINT arithmetic: row_number() is
    IntegerType, and at total*n_shards > 2^31 the old int32 multiply
    crashed ANSI sessions / wrapped non-ANSI ones — diverging from the
    scalable twin whose rank is already long (r14 review finding).
    Drives _finish directly with a simulated 40M-row rank frame."""
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.shuffling import _finish

    total, n_shards = 40_000_000, 64  # (total-1)*64 = 2.56e9 > 2^31
    out = spark.createDataFrame(
        [(1, 7), (total, 9)], "_rn int, perm_q long"
    ).withColumn("_rn", F.col("_rn").cast("int"))
    rows = {r["perm_q"]: r for r in _finish(out, n_shards, total).collect()}
    first, last = rows[7], rows[9]
    assert first["shard_ranked"] == 0 and first["shard_pos"] == 0
    # last global rank lands in the last shard at its final position
    assert last["shard_ranked"] == n_shards - 1
    assert last["shard_pos"] >= 0
