"""Batch k-NN join (simsearch.knn_join): expression vs Arrow path
agreement, brute-force exactness, and boundary shapes. Cross-engine
grading of the expression path is in test_oracle_parity.py
(knn_join_topk).
"""

from __future__ import annotations

import math

import pytest

from spectraplex_spark.operators.simsearch import knn_join

VEC_SCHEMA = "vec_id long, embedding array<float>"


def _vecs(n, dim, phase=0.0):
    return [
        (
            i,
            [float(math.sin(phase + 0.37 * i + d) + 0.2 * math.cos(2 * i - d)) for d in range(dim)],
        )
        for i in range(n)
    ]


def _brute(corpus, queries, k):
    out = {}
    for qid, q in queries:
        qn = math.sqrt(sum(x * x for x in q))
        scored = []
        for cid, v in corpus:
            vn = math.sqrt(sum(x * x for x in v))
            dot = sum(a * b for a, b in zip(q, v))
            scored.append((cid, dot / (vn * qn)))
        scored.sort(key=lambda t: (-t[1], t[0]))
        out[qid] = [cid for cid, _ in scored[:k]]
    return out


def test_knn_join_matches_bruteforce(spark):
    corpus = _vecs(50, 8)
    queries = [(100 + i, v) for i, (_, v) in enumerate(_vecs(4, 8, phase=1.5))]
    cdf = spark.createDataFrame(corpus, VEC_SCHEMA)
    qdf = spark.createDataFrame(queries, VEC_SCHEMA)
    got = {}
    for r in knn_join(cdf, qdf, k=7).collect():
        got.setdefault(r["query_id"], []).append(r["corpus_id"])
    assert got == _brute(
        [(i, [float(x) for x in v]) for i, v in corpus],
        [(i, [float(x) for x in v]) for i, v in queries],
        7,
    )


def test_knn_join_arrow_agrees_with_expression(spark):
    corpus = _vecs(80, 16)
    queries = [(200 + i, v) for i, (_, v) in enumerate(_vecs(3, 16, phase=0.9))]
    cdf = spark.createDataFrame(corpus, VEC_SCHEMA).repartition(8)
    qdf = spark.createDataFrame(queries, VEC_SCHEMA)
    exp = {
        (r["query_id"], r["corpus_id"]): r["score"]
        for r in knn_join(cdf, qdf, k=9, method="expression").collect()
    }
    arr = {
        (r["query_id"], r["corpus_id"]): r["score"]
        for r in knn_join(cdf, qdf, k=9, method="arrow").collect()
    }
    assert set(exp) == set(arr)  # same neighbor sets
    for key in exp:  # scores equal to float64 round-off (matmul reassociates)
        assert abs(exp[key] - arr[key]) < 1e-12


def test_knn_join_k_exceeds_corpus(spark):
    cdf = spark.createDataFrame(_vecs(3, 4), VEC_SCHEMA)
    qdf = spark.createDataFrame([(9, [1.0, 0.0, 0.0, 0.0])], VEC_SCHEMA)
    rows = knn_join(cdf, qdf, k=10).collect()
    assert len(rows) == 3  # all of a too-small corpus, no padding


def test_knn_join_exact_duplicate_scores_tiebreak_to_lowest_id(spark):
    # two identical corpus vectors -> identical scores; lower id first
    v = [1.0, 2.0, 3.0, 4.0]
    cdf = spark.createDataFrame([(5, v), (2, v), (9, v)], VEC_SCHEMA)
    qdf = spark.createDataFrame([(0, v)], VEC_SCHEMA)
    rows = knn_join(cdf, qdf, k=2).collect()
    assert [r["corpus_id"] for r in rows] == [2, 5]


def test_knn_join_empty_queries_raises(spark):
    cdf = spark.createDataFrame(_vecs(3, 4), VEC_SCHEMA)
    qdf = spark.createDataFrame([], VEC_SCHEMA)
    with pytest.raises(ValueError, match="empty"):
        knn_join(cdf, qdf, k=2)


def test_knn_join_over_limit_query_batch_raises(spark):
    """The driver-side collect is bounded by CONTRACT: exceeding
    max_query_batch must raise before collecting, pointing at the
    near-dup family — never a silent driver OOM."""
    cdf = spark.createDataFrame(_vecs(3, 4), VEC_SCHEMA)
    qdf = spark.createDataFrame(_vecs(7, 4), VEC_SCHEMA)
    with pytest.raises(ValueError, match="near-dup"):
        knn_join(cdf, qdf, k=2, max_query_batch=6)
    # exactly at the limit is fine
    assert knn_join(cdf, qdf, k=1, max_query_batch=7).count() == 7


def test_knn_join_quantized_arrow_ranks_like_float(spark):
    """quantize=1024 snaps components to an integer grid before the
    matmul; at grid granularity the neighbor ordering should agree
    with the float path on well-separated vectors, and scores must be
    deterministic doubles (exact ints through sqrt/divide)."""
    corpus = _vecs(60, 16)
    queries = [(300 + i, v) for i, (_, v) in enumerate(_vecs(3, 16, phase=2.1))]
    cdf = spark.createDataFrame(corpus, VEC_SCHEMA).repartition(8)
    qdf = spark.createDataFrame(queries, VEC_SCHEMA)
    fl = {}
    for r in knn_join(cdf, qdf, k=5, method="arrow").collect():
        fl.setdefault(r["query_id"], []).append(r["corpus_id"])
    qz = {}
    for r in knn_join(cdf, qdf, k=5, method="arrow", quantize=1024).collect():
        qz.setdefault(r["query_id"], []).append(r["corpus_id"])
    assert set(fl) == set(qz)
    for qid in fl:  # same top-5 sets; order may differ only on grid ties
        assert set(fl[qid]) == set(qz[qid])
    # determinism: two runs produce bit-identical scores
    a = sorted(
        (r["query_id"], r["corpus_id"], r["score"])
        for r in knn_join(cdf, qdf, k=5, method="arrow", quantize=1024).collect()
    )
    b = sorted(
        (r["query_id"], r["corpus_id"], r["score"])
        for r in knn_join(cdf, qdf, k=5, method="arrow", quantize=1024).collect()
    )
    assert a == b


def test_knn_join_quantize_requires_arrow(spark):
    cdf = spark.createDataFrame(_vecs(3, 4), VEC_SCHEMA)
    qdf = spark.createDataFrame(_vecs(2, 4), VEC_SCHEMA)
    with pytest.raises(ValueError, match="arrow"):
        knn_join(cdf, qdf, k=2, method="expression", quantize=1024)


def test_no_aggregation_buffers_in_either_knn_plan(spark):
    """Neither kNN method may buffer a partition's scored rows in
    aggregation state: stage 1 is a streaming Arrow running-top-k
    (Q·k resident rows), stage 2 a row_number window (spillable sort).
    collect_list / ObjectHashAggregate in the plan would mean the
    unbounded-buffer shape came back."""
    cdf = spark.createDataFrame(_vecs(30, 8), VEC_SCHEMA)
    qdf = spark.createDataFrame(
        [(100 + i, v) for i, (_, v) in enumerate(_vecs(3, 8, phase=1.5))], VEC_SCHEMA
    )
    for method in ("expression", "arrow"):
        plan = knn_join(cdf, qdf, k=5, method=method)._jdf.queryExecution().executedPlan().toString()
        assert "collect_list" not in plan, method
        assert "ObjectHashAggregate" not in plan, method
        assert "Window" in plan, method
