"""Cross-implementation check: the Spark 4 Python UDTF variant of U1
must produce exactly the entries of the expression pipeline — two
independent implementations (Python dict-walking vs Catalyst
expressions) agreeing on golden and edge fixtures, amounts compared as
exact decimals."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from spectraplex_spark.operators.normalize import normalize
from spectraplex_spark.operators.normalize_udtf import normalize_entries_udtf
from spectraplex_spark.schemas import BRONZE_SCHEMA
from tests.test_normalize_golden import (
    MINT_A,
    MINT_B,
    OTHER,
    WALLET,
    bronze_row,
    solana_tx,
    token_balance,
)


def _entries_expr(spark, rows):
    df = normalize(
        spark.createDataFrame(rows, BRONZE_SCHEMA),
        audit_ts=F.lit(None).cast("timestamp"),
    )
    return {
        (r.transaction_id, r.asset_symbol, r.amount)
        for r in df.select("transaction_id", "asset_symbol", "amount").collect()
    }


def _entries_udtf(spark, rows):
    df = normalize_entries_udtf(spark.createDataFrame(rows, BRONZE_SCHEMA))
    return {
        (r.transaction_id, r.asset_symbol, r.amount)
        for r in df.select("transaction_id", "asset_symbol", "amount").collect()
    }


def test_udtf_matches_expression_pipeline_on_fixture_suite(spark):
    null_pre = json.loads(
        solana_tx(
            pre_balances=[1, 1],
            post_balances=[1, 1],
            post_token=[token_balance(MINT_A, WALLET, 3.0)],
        )
    )
    null_pre["meta"]["preTokenBalances"] = None

    rows = [
        # golden G1: SOL -0.5
        bronze_row(
            solana_tx(pre_balances=[10_000_000_000, 0], post_balances=[9_500_000_000, 500_000_000]),
            tx_hash="g1",
        ),
        # SPL delta + new token account + combined fan-out
        bronze_row(
            solana_tx(
                pre_balances=[10_000_000_000, 0],
                post_balances=[8_000_000_000, 2_000_000_000],
                pre_token=[token_balance(MINT_A, WALLET, 5.0, account_index=1)],
                post_token=[
                    token_balance(MINT_A, WALLET, 7.5, account_index=1),
                    token_balance(MINT_B, WALLET, 4.25, account_index=2),
                ],
            ),
            tx_hash="g8",
        ),
        # dust-filtered SOL delta
        bronze_row(
            solana_tx(pre_balances=[10_000_000_000, 0], post_balances=[10_000_000_500, 0]),
            tx_hash="dust",
        ),
        # missing meta; wrong owner; null owner
        bronze_row(solana_tx(meta_present=False), tx_hash="nometa"),
        bronze_row(
            solana_tx(pre_balances=[1, 1], post_balances=[1, 1],
                      post_token=[token_balance(MINT_A, OTHER, 9.0)]),
            tx_hash="owner",
        ),
        bronze_row(
            solana_tx(pre_balances=[1, 1], post_balances=[1, 1],
                      post_token=[token_balance(MINT_A, None, 9.0)]),
            tx_hash="nullowner",
        ),
        # null preTokenBalances array suppresses SPL (both-arrays guard)
        bronze_row(json.dumps(null_pre), tx_hash="nullpre"),
        # corrupt JSON; non-solana chain
        bronze_row("{not json", tx_hash="bad"),
        bronze_row(
            solana_tx(pre_balances=[2_000_000_000, 0], post_balances=[1_000_000_000, 0]),
            tx_hash="eth", chain="ethereum",
        ),
        # wallet absent from accountKeys but SPL still emitted
        bronze_row(
            solana_tx(account_keys=[OTHER, "ThirdKey"],
                      pre_balances=[10_000_000_000, 0], post_balances=[9_000_000_000, 0],
                      post_token=[token_balance(MINT_A, WALLET, 2.0)]),
            tx_hash="nokey",
        ),
        # exact decimal from raw amount (0.3 - 0.1 must be exactly 0.2)
        bronze_row(
            solana_tx(pre_balances=[1, 1], post_balances=[1, 1],
                      pre_token=[token_balance(MINT_A, WALLET, 0.1, raw="100000", decimals=6)],
                      post_token=[token_balance(MINT_A, WALLET, 0.3, raw="300000", decimals=6)]),
            tx_hash="exact",
        ),
    ]
    expr = _entries_expr(spark, rows)
    udtf = _entries_udtf(spark, rows)
    assert expr == udtf
    # g1 SOL + g8's three entries + nokey SPL + exact-decimal SPL
    assert len(expr) == 6
