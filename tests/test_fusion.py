"""Reciprocal-rank fusion (operators/fusion.py): pure-Python replica
equality, rank/tiebreak determinism, and the serving-edge contracts.
Cross-engine grading is in test_oracle_parity.py (hybrid_rrf_fusion)."""

from __future__ import annotations

import pytest

from spectraplex_spark.operators.fusion import RRF_K0, RRF_SCALE, rrf_fuse


def _py_rrf(lists, k0=RRF_K0, scale=RRF_SCALE, k=10):
    """lists: [[(id, score), ...], ...] — the exact integer formulation."""
    acc: dict[int, list[int]] = {}
    for lst in lists:
        ranked = sorted(lst, key=lambda p: (-p[1], p[0]))
        for r, (i, _) in enumerate(ranked, start=1):
            e = acc.setdefault(i, [0, 0])
            e[0] += scale // (k0 + r)
            e[1] += 1
    rows = sorted(
        ((i, q, n) for i, (q, n) in acc.items()), key=lambda t: (-t[1], t[0])
    )
    return rows[:k]


def _spark_rrf(spark, lists, **kw):
    dfs = [
        (spark.createDataFrame(lst, "doc_id long, score long"), "score")
        for lst in lists
    ]
    return [
        (r["doc_id"], r["rrf_q"], r["n_lists"])
        for r in rrf_fuse(dfs, **kw).collect()
    ]


def test_rrf_matches_python_replica(spark):
    lex = [(1, 900), (2, 800), (3, 700), (4, 600)]
    sem = [(3, 50), (5, 40), (1, 30), (6, 20)]
    assert _spark_rrf(spark, [lex, sem], k=10) == _py_rrf([lex, sem], k=10)
    # doc 3 and doc 1 appear in both legs and outrank single-leg docs
    top = _spark_rrf(spark, [lex, sem], k=2)
    assert {t[0] for t in top} == {1, 3}
    assert all(t[2] == 2 for t in top)


def test_rrf_equal_scores_break_by_id(spark):
    """Equal ranker scores rank by id ascending — the fused result is
    deterministic under ties on BOTH levels (per-list rank and fused
    rrf_q)."""
    a = [(10, 5), (11, 5), (12, 5)]
    b = [(12, 7), (11, 7), (10, 7)]
    got = _spark_rrf(spark, [a, b], k=3)
    assert got == _py_rrf([a, b], k=3)
    # both legs rank 10 < 11 < 12 by the id tiebreak → 10 wins overall
    assert [t[0] for t in got] == [10, 11, 12]


def test_rrf_three_lists_and_k_cut(spark):
    import random

    rng = random.Random(7)
    lists = [
        [(i, rng.randrange(1000)) for i in rng.sample(range(40), 15)]
        for _ in range(3)
    ]
    assert _spark_rrf(spark, lists, k=5) == _py_rrf(lists, k=5)


def test_rrf_hypothesis_grid_matches_float_ordering():
    """On the 2^20 grid, the integer formulation's ORDER agrees with the
    float sum 1/(k0+rank) whenever the float scores differ by more
    than one grid step — and the grid terms are distinct for every
    rank the serving edge can produce (k ≤ 960 at k0=60)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=960), min_size=2,
                    max_size=6, unique=True))
    def check(ranks):
        terms = [RRF_SCALE // (RRF_K0 + r) for r in ranks]
        assert len(set(terms)) == len(terms)  # distinct per rank
        fl = sorted(ranks, key=lambda r: -1.0 / (RRF_K0 + r))
        gr = sorted(ranks, key=lambda r: -(RRF_SCALE // (RRF_K0 + r)))
        assert fl == gr

    check()


def test_rrf_input_contracts(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, score long")
    with pytest.raises(ValueError, match="shortlists"):
        rrf_fuse([(df, "score")])
    with pytest.raises(ValueError, match="k0"):
        rrf_fuse([(df, "score"), (df, "score")], k0=0)
