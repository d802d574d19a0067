"""Lamport-conservation audit (operators/audit.py)."""

import json

from pyspark.sql import functions as F

from spectraplex_spark.operators.audit import conservation_report, conservation_summary
from spectraplex_spark.schemas import BRONZE_SCHEMA


def _row(i, meta, chain="solana"):
    raw = json.dumps({"meta": meta}) if meta is not None else "{}"
    return (f"tx-{i}", "u", "w", 1672531200, f"sig{i}", chain, raw, None)


def _bronze(spark, rows):
    return spark.createDataFrame(rows, BRONZE_SCHEMA)


def test_conservation_verdicts(spark):
    rows = [
        # balanced: 100 moves A->B, fee 5000 leaves A
        _row(1, {"fee": 5000, "preBalances": [10_000, 0], "postBalances": [4_900, 100]}),
        # violated by exactly 1 lamport
        _row(2, {"fee": 5000, "preBalances": [10_000, 0], "postBalances": [4_900, 101]}),
        # meta-less: un-auditable -> null sums, balanced=false
        _row(3, None),
        # length mismatch pre/post: null-poisoned fold -> balanced=false
        _row(4, {"fee": 5000, "preBalances": [10_000, 0], "postBalances": [4_900]}),
        # non-solana: dispatched away entirely
        _row(5, {"fee": 0, "preBalances": [1], "postBalances": [1]}, chain="ethereum"),
    ]
    got = {r.id: r for r in conservation_report(_bronze(spark, rows)).collect()}
    assert set(got) == {"tx-1", "tx-2", "tx-3", "tx-4"}
    assert (got["tx-1"].delta_sum, got["tx-1"].fee, got["tx-1"].balanced) == (-5000, 5000, True)
    assert (got["tx-2"].delta_sum, got["tx-2"].balanced) == (-4999, False)
    assert (got["tx-3"].delta_sum, got["tx-3"].fee, got["tx-3"].balanced) == (None, None, False)
    assert (got["tx-4"].delta_sum, got["tx-4"].balanced) == (None, False)


def test_conservation_summary_exact_counts(spark):
    rows = [
        _row(1, {"fee": 10, "preBalances": [100], "postBalances": [90]}),
        _row(2, {"fee": 10, "preBalances": [100], "postBalances": [93]}),  # +3 off
        _row(3, None),
    ]
    s = conservation_summary(_bronze(spark, rows)).first()
    assert (s.n_txs, s.n_balanced, s.n_violations) == (3, 1, 2)
    assert s.total_abs_discrepancy == 3  # null discrepancy adds 0


def test_report_is_zero_shuffle(spark):
    rows = [_row(1, {"fee": 1, "preBalances": [2], "postBalances": [1]})]
    plan = (
        conservation_report(_bronze(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
