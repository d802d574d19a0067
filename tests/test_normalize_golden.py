"""Golden-vector tests for the U1 normalize pipeline (FIXTURES.md §3).

G1 is the reference's own unit test
(adapters/tests/solana_parser_test.rs:7-59) re-expressed against the
DataFrame pipeline: preBalances [10e9, 0] → postBalances [9.5e9, 0.5e9],
fee 5000, expecting exactly one SOL entry of exactly -0.5.
G2-G8 extend coverage per the parser's branch structure
(adapters/src/solana_parser.rs:7-93).
"""

from __future__ import annotations

import json
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from spectraplex_spark.operators.normalize import normalize, parse_failures
from spectraplex_spark.schemas import BRONZE_SCHEMA

WALLET = "So1WalletAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
OTHER = "OtherKeyBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB"
MINT_A = "MintAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA1"
MINT_B = "MintBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB2"


def solana_tx(
    pre_balances=None,
    post_balances=None,
    account_keys=None,
    pre_token=None,
    post_token=None,
    meta_present=True,
    fee=5000,
    block_time=1672531200,
):
    """Build a raw_metadata JSON shaped like the reference golden fixture
    (solana_parser_test.rs:11-37)."""
    keys = account_keys if account_keys is not None else [WALLET, OTHER]
    tx = {
        "slot": 123456,
        "blockTime": block_time,
        "transaction": {
            "signatures": ["sig1"],
            "message": {
                "accountKeys": [
                    {"pubkey": k, "signer": i == 0, "writable": True}
                    for i, k in enumerate(keys)
                ],
                "instructions": [],
                "recentBlockhash": "hash123",
            },
        },
    }
    if meta_present:
        tx["meta"] = {
            "err": None,
            "fee": fee,
            "preBalances": pre_balances if pre_balances is not None else [],
            "postBalances": post_balances if post_balances is not None else [],
            "preTokenBalances": pre_token if pre_token is not None else [],
            "postTokenBalances": post_token if post_token is not None else [],
            "logMessages": [],
            "rewards": [],
        }
    else:
        tx["meta"] = None
    return json.dumps(tx)


def token_balance(mint, owner, ui_amount, account_index=1, decimals=6, raw=None):
    if raw is None and ui_amount is not None:
        raw = str(int(round(ui_amount * 10**decimals)))
    return {
        "accountIndex": account_index,
        "mint": mint,
        "owner": owner,
        "uiTokenAmount": {"uiAmount": ui_amount, "decimals": decimals, "amount": raw},
    }


def bronze_row(raw_metadata, tx_hash="sig1", wallet=WALLET, chain="solana"):
    return (
        f"tx-{tx_hash}",
        "00000000-0000-0000-0000-000000000000",
        wallet,
        1672531200,
        tx_hash,
        chain,
        raw_metadata,
        None,
    )


def run(spark, rows):
    bronze = spark.createDataFrame(rows, BRONZE_SCHEMA)
    return normalize(bronze, audit_ts=F.lit("2026-01-01 00:00:00").cast("timestamp"))


def test_g1_native_sol_transfer(spark):
    """The reference's own golden test: exactly one entry, amount == -0.5."""
    raw = solana_tx(pre_balances=[10_000_000_000, 0], post_balances=[9_500_000_000, 500_000_000])
    out = run(spark, [bronze_row(raw)]).collect()
    assert len(out) == 1
    e = out[0]
    assert e.wallet_address == WALLET
    assert e.asset_symbol == "SOL"
    assert e.amount == Decimal("-0.5")  # exact decimal equality
    assert e.entry_type == "transfer"
    assert e.fiat_value is None
    assert e.transaction_id == "tx-sig1"


def test_g2_spl_token_delta(spark):
    raw = solana_tx(
        pre_balances=[1, 1],
        post_balances=[1, 1],
        pre_token=[token_balance(MINT_A, WALLET, 5.0)],
        post_token=[token_balance(MINT_A, WALLET, 7.5)],
    )
    out = run(spark, [bronze_row(raw)]).collect()
    assert len(out) == 1
    assert out[0].asset_symbol == MINT_A
    assert out[0].amount == Decimal("2.5")


def test_g3_new_token_account_missing_pre(spark):
    raw = solana_tx(
        pre_balances=[1, 1],
        post_balances=[1, 1],
        pre_token=[],
        post_token=[token_balance(MINT_A, WALLET, 3.0)],
    )
    out = run(spark, [bronze_row(raw)]).collect()
    assert len(out) == 1
    assert out[0].amount == Decimal("3")


def test_g3b_null_pre_token_array_emits_nothing(spark):
    """Reference nests two if-lets (solana_parser.rs:46-47): a NULL
    preTokenBalances array (vs empty []) suppresses ALL SPL entries even
    when postTokenBalances has owner-matching rows."""
    raw = json.loads(
        solana_tx(
            pre_balances=[1, 1],
            post_balances=[1, 1],
            post_token=[token_balance(MINT_A, WALLET, 3.0)],
        )
    )
    raw["meta"]["preTokenBalances"] = None
    assert run(spark, [bronze_row(json.dumps(raw))]).count() == 0


def test_g4_dust_filtered(spark):
    # SOL delta of 500 lamports = 5e-7 SOL < 1e-6 threshold
    raw = solana_tx(pre_balances=[10_000_000_000, 0], post_balances=[10_000_000_500, 0])
    assert run(spark, [bronze_row(raw)]).count() == 0


def test_g5_missing_meta(spark):
    raw = solana_tx(meta_present=False)
    assert run(spark, [bronze_row(raw)]).count() == 0


def test_g6_wrong_owner(spark):
    raw = solana_tx(
        pre_balances=[1, 1],
        post_balances=[1, 1],
        post_token=[token_balance(MINT_A, OTHER, 9.0)],
    )
    assert run(spark, [bronze_row(raw)]).count() == 0


def test_g6b_null_owner_is_not_a_match(spark):
    # 3-way Option match (solana_parser.rs:50-57): None owner never matches
    raw = solana_tx(
        pre_balances=[1, 1],
        post_balances=[1, 1],
        post_token=[token_balance(MINT_A, None, 9.0)],
    )
    assert run(spark, [bronze_row(raw)]).count() == 0


def test_g7_wallet_not_in_account_keys(spark):
    # SOL branch skipped (position lookup fails, parser.rs:26) but SPL
    # branch still evaluated
    raw = solana_tx(
        account_keys=[OTHER, "ThirdKeyCCC"],
        pre_balances=[10_000_000_000, 0],
        post_balances=[9_000_000_000, 0],
        post_token=[token_balance(MINT_A, WALLET, 2.0)],
    )
    out = run(spark, [bronze_row(raw)]).collect()
    assert len(out) == 1
    assert out[0].asset_symbol == MINT_A


def test_g8_combined_fanout(spark):
    """One tx → 3 entries (SOL + 2 SPL mints): the UDTF fan-out shape."""
    raw = solana_tx(
        pre_balances=[10_000_000_000, 0],
        post_balances=[8_000_000_000, 2_000_000_000],
        pre_token=[token_balance(MINT_A, WALLET, 5.0, account_index=1)],
        post_token=[
            token_balance(MINT_A, WALLET, 7.5, account_index=1),
            token_balance(MINT_B, WALLET, 4.25, account_index=2),
        ],
    )
    out = run(spark, [bronze_row(raw)]).collect()
    assert len(out) == 3
    by_asset = {r.asset_symbol: r.amount for r in out}
    assert by_asset["SOL"] == Decimal("-2")
    assert by_asset[MINT_A] == Decimal("2.5")
    assert by_asset[MINT_B] == Decimal("4.25")
    # distinct deterministic ids
    assert len({r.id for r in out}) == 3


def test_g9_two_accounts_same_mint_same_delta_keep_both(spark, tmp_path):
    """A wallet owning TWO token accounts of the same mint with identical
    deltas yields TWO ledger entries with distinct ids, and both survive
    the idempotent silver sink — the reference keeps one entry per
    post-token-balance (solana_parser.rs:47-87). Before the ordinal went
    into the id hash, the second entry was silently dropped."""
    from spectraplex_spark.sources.io import write_silver

    raw = solana_tx(
        pre_balances=[1, 1],
        post_balances=[1, 1],
        pre_token=[
            token_balance(MINT_A, WALLET, 1.0, account_index=1),
            token_balance(MINT_A, WALLET, 1.0, account_index=2),
        ],
        post_token=[
            token_balance(MINT_A, WALLET, 2.0, account_index=1),
            token_balance(MINT_A, WALLET, 2.0, account_index=2),
        ],
    )
    out = run(spark, [bronze_row(raw)]).collect()
    assert len(out) == 2
    assert all(r.asset_symbol == MINT_A and r.amount == Decimal("1") for r in out)
    assert len({r.id for r in out}) == 2
    silver_path = str(tmp_path / "silver")
    n = write_silver(run(spark, [bronze_row(raw)]), silver_path)
    assert n == 2
    assert spark.read.parquet(silver_path).count() == 2


def test_non_solana_chain_skipped(spark):
    raw = solana_tx(pre_balances=[10_000_000_000], post_balances=[9_000_000_000])
    rows = [bronze_row(raw, chain="ethereum"), bronze_row(raw, tx_hash="sig2")]
    out = run(spark, rows).collect()
    assert len(out) == 1 and out[0].tx_hash if hasattr(out[0], "tx_hash") else True
    assert out[0].transaction_id == "tx-sig2"


def test_corrupt_json_dropped_and_surfaced(spark):
    rows = [
        bronze_row("{not valid json", tx_hash="bad"),
        bronze_row(
            solana_tx(pre_balances=[2_000_000_000, 0], post_balances=[1_000_000_000, 0]),
            tx_hash="good",
        ),
    ]
    bronze = spark.createDataFrame(rows, BRONZE_SCHEMA)
    out = normalize(bronze, audit_ts=F.lit(None).cast("timestamp")).collect()
    assert len(out) == 1 and out[0].transaction_id == "tx-good"
    bad = parse_failures(bronze).collect()
    assert len(bad) == 1 and bad[0].tx_hash == "bad"


def test_determinism_and_idempotence(spark):
    """Same input → same ids (content-hash ids vs reference UUIDv4)."""
    raw = solana_tx(pre_balances=[10_000_000_000, 0], post_balances=[9_500_000_000, 0])
    a = run(spark, [bronze_row(raw)]).collect()
    b = run(spark, [bronze_row(raw)]).collect()
    assert [r.id for r in a] == [r.id for r in b]


def test_exact_decimal_from_raw_token_amount(spark):
    """Raw integer amount path beats f64: 0.1 + 0.2 style values exact."""
    raw = solana_tx(
        pre_balances=[1, 1],
        post_balances=[1, 1],
        pre_token=[token_balance(MINT_A, WALLET, 0.1, raw="100000", decimals=6)],
        post_token=[token_balance(MINT_A, WALLET, 0.3, raw="300000", decimals=6)],
    )
    out = run(spark, [bronze_row(raw)]).collect()
    assert out[0].amount == Decimal("0.2")


def test_multi_chain_dispatch_and_skip_surface(spark):
    from spectraplex_spark.operators.normalize import normalize_multi, unsupported_chains

    raw = solana_tx(pre_balances=[10_000_000_000, 0], post_balances=[9_000_000_000, 0])
    rows = [
        bronze_row(raw, tx_hash="s1"),
        bronze_row(raw, tx_hash="s2", chain="ethereum"),
        bronze_row(raw, tx_hash="s3", chain="hyperliquid"),
    ]
    from spectraplex_spark.schemas import BRONZE_SCHEMA
    bronze = spark.createDataFrame(rows, BRONZE_SCHEMA)
    out = normalize_multi(bronze, audit_ts=F.lit(None).cast("timestamp")).collect()
    assert len(out) == 1 and out[0].transaction_id == "tx-s1"
    skipped = {r.chain: r.n_skipped for r in unsupported_chains(bronze).collect()}
    assert skipped == {"ethereum": 1, "hyperliquid": 1}


def test_deterministic_id_null_part_poisons_not_collides(spark):
    """concat_ws SKIPS null parts, so ('solana', NULL, 'sig') used to
    hash identically to ('solana', 'sig', NULL) — and the idempotent
    anti-join would then DROP a genuinely distinct row (silent data
    loss). F.concat propagates NULL: any NULL part -> NULL id, visible
    and queryable, never a cross-row collision (r14 review finding).
    Non-NULL ids are byte-identical to the old formula (golden tests +
    the normalize_throughput closed-form oracle pin that)."""
    from pyspark.sql import functions as F

    from spectraplex_spark.functions.ids import deterministic_id

    df = spark.createDataFrame(
        [("solana", None, "sigX"), ("solana", "sigX", None), ("solana", "w", "s")],
        "chain string, wallet string, sig string",
    )
    ids = df.select(
        deterministic_id("chain", "wallet", "sig").alias("id")
    ).collect()
    assert ids[0]["id"] is None and ids[1]["id"] is None
    assert ids[2]["id"] is not None
    # and the non-null id matches the documented '|'-join formula
    import hashlib

    assert ids[2]["id"] == hashlib.sha256(b"solana|w|s").hexdigest()
