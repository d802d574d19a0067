"""Gopher/MassiveText repetition signals (operators/repetition.py):
expression results vs an independent Python reference, edge cases, and
the zero-shuffle plan contract."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from spectraplex_spark.operators.repetition import (
    dup_ngram_char_frac,
    dup_ngram_chars,
    ngram_strings,
    repetition_gate,
    repetition_report,
    top_ngram_char_frac,
    top_ngram_stats,
)
from spectraplex_spark.operators.textops import tokens


def py_norm(t):
    return re.sub(r"\s+", " ", t.lower()).strip()


def py_toks(t):
    return [x for x in py_norm(t).split(" ") if x]


def py_grams(toks, n):
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def py_top(t, n):
    g = py_grams(py_toks(t), n)
    if not g:
        return (0, 0)
    c = Counter(g)
    m = max(c.values())
    gram = min(k for k, v in c.items() if v == m)
    return (m, len(gram))


def py_dup_chars(t, n):
    c = Counter(py_grams(py_toks(t), n))
    return sum(v * len(k) for k, v in c.items() if v > 1)


CASES = [
    "",
    "word",
    "a b a b a b",
    "x y z w v u t s",
    "p q r s t p q r s t p q r s t",
    "the THE   the\tthe",  # case + whitespace normalization
    "one two three one two three four one two",
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], ["doc_id", "text"]
    )


def test_ngram_strings_matches_reference(spark, frame):
    for n in (1, 2, 3, 5):
        rows = frame.select(
            "doc_id", ngram_strings(tokens(F.col("text")), n).alias("g")
        ).collect()
        for r in rows:
            assert r.g == py_grams(py_toks(CASES[r.doc_id]), n), (n, r.doc_id)


def test_top_and_dup_match_reference(spark, frame):
    rows = frame.select(
        "doc_id",
        top_ngram_stats(F.col("text"), 2).alias("t2"),
        dup_ngram_chars(F.col("text"), 5).alias("d5"),
        top_ngram_char_frac(F.col("text"), 3).alias("f3"),
        dup_ngram_char_frac(F.col("text"), 6).alias("f6"),
    ).collect()
    for r in rows:
        t = CASES[r.doc_id]
        cnt, glen = py_top(t, 2)
        assert (r.t2.cnt, r.t2.gram_chars) == (cnt, glen), r.doc_id
        assert r.d5 == py_dup_chars(t, 5), r.doc_id
        total = len(py_norm(t))
        c3, g3 = py_top(t, 3)
        exp3 = (c3 * g3) / total if total and c3 else 0.0
        assert r.f3 == exp3, r.doc_id  # exact: int/int IEEE division
        exp6 = py_dup_chars(t, 6) / total if total else 0.0
        assert r.f6 == exp6, r.doc_id


def test_tie_break_is_lexicographically_smallest(spark):
    # "b b" and "a a" both occur twice; the kept gram must be "a a".
    df = spark.createDataFrame([("b b x b b y a a z a a",)], ["text"])
    row = df.select(top_ngram_stats(F.col("text"), 2).alias("s")).first()
    assert row.s.cnt == 2
    assert row.s.gram_chars == 3  # "a a"


def test_gate_integer_threshold_boundary(spark):
    # total=15 chars, top2 covers exactly 3 chars -> 3*100 == 15*20:
    # strictly-less fails, so the doc is rejected AT the boundary
    # identically in both engines (no float compare anywhere).
    long_ok = " ".join(f"word{i:02d}" for i in range(20))  # 20 distinct words
    df = spark.createDataFrame(
        [(1, "x y z w v u t s"), (2, long_ok)], ["doc_id", "text"]
    )
    got = {r.doc_id: r.repetition_pass for r in repetition_gate(df).collect()}
    assert got[1] is False  # 1*len("t s")=3 chars of 15 == 20% exactly
    assert got[2] is True  # top 2-gram = 13 of 139 chars (~9%) < 20%


def test_empty_and_short_docs_are_zero(spark, frame):
    rows = repetition_report(frame).where(F.col("doc_id") < 2).collect()
    for r in rows:
        for c in r.asDict():
            if c.endswith("_gram_frac"):
                assert r[c] == 0.0, (r.doc_id, c)


def test_report_is_zero_shuffle(spark, frame):
    plan = repetition_report(frame)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
