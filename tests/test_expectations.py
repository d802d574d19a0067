"""Declarative expectations (operators/expectations.py): violation
counting on planted-dirty data, clean-data passes, unknown-rule guard.
Cross-engine grading is in test_oracle_parity.py (data_quality_report).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spectraplex_spark.operators import expectations as E

SCHEMA = "id long, v double, kind string, fk long"


def _report(spark, rows, rules):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in E.check_expectations(df, rules).collect()
    }


def test_planted_violations_are_counted_exactly(spark):
    parent = spark.createDataFrame([(1,), (2,)], "k long")
    rows = [
        (1, 1.0, "a", 1),
        (1, 2.0, "a", 2),      # dup id
        (None, 3.0, "b", 1),   # null id
        (4, -5.0, "zzz", 9),   # range + set + orphan fk
        (5, None, "a", None),  # null v tolerated (rules skip nulls), null fk tolerated
    ]
    got = _report(
        spark,
        rows,
        [
            E.not_null("id"),
            E.unique("id"),
            E.in_set("kind", ["a", "b"]),
            E.in_range("v", 0, 100),
            E.satisfies("v_under_1000", F.coalesce(F.col("v"), F.lit(0.0)) < 1000),
            E.references("fk", parent, "k"),
        ],
    )
    assert got["not_null(id)"] == (1, False)
    assert got["unique(id)"] == (1, False)       # one extra copy of id 1
    assert got["in_set(kind)"] == (1, False)     # 'zzz'
    assert got["in_range(v)"] == (1, False)      # -5.0
    assert got["v_under_1000"] == (0, True)
    assert got["references(fk)"] == (1, False)   # fk 9; null fk not a violation


def test_clean_data_all_pass_in_one_report(spark):
    rows = [(i, float(i), "a", 1) for i in range(10)]
    parent = spark.createDataFrame([(1,)], "k long")
    got = _report(
        spark,
        rows,
        [E.not_null("id"), E.unique("id"), E.in_range("v", 0, 100),
         E.references("fk", parent, "k")],
    )
    assert all(v == (0, True) for v in got.values()) and len(got) == 4


def test_unknown_rule_kind_raises(spark):
    df = spark.createDataFrame([(1, 1.0, "a", 1)], SCHEMA)
    with pytest.raises(ValueError, match="unknown rule kind"):
        E.check_expectations(df, [E.Rule(name="x", kind="bogus")])


def test_violating_rows_selects_and_annotates(spark):
    rows = [
        (1, 1.0, "a", 1),
        (None, -2.0, "zzz", 1),  # breaks three rules at once
        (3, 5.0, "b", 1),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = E.violating_rows(
        df,
        [E.not_null("id"), E.in_set("kind", ["a", "b"]), E.in_range("v", 0, 100)],
    ).collect()
    assert len(got) == 1
    assert got[0]["violated_rules"] == "not_null(id),in_set(kind),in_range(v)"
    with pytest.raises(ValueError, match="set-level"):
        E.violating_rows(df, [E.unique("id")])
