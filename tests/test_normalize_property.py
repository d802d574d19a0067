"""Property-based U1 testing: hypothesis-generated transactions vs an
independent Python model of the parser semantics
(reference adapters/src/solana_parser.rs:7-93, re-derived here from the
spec rather than shared with the pipeline code — disagreement means one
of them is wrong)."""

from __future__ import annotations

import json
from decimal import Context, Decimal

# quantizing to 18 fractional digits can exceed Python's default
# 28-digit context for large integer parts — widen it
_CTX = Context(prec=60)


def _q18(d: Decimal) -> Decimal:
    return d.quantize(Decimal("1e-18"), context=_CTX)

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spectraplex_spark.operators.normalize import normalize
from spectraplex_spark.schemas import BRONZE_SCHEMA

WALLET = "WalletUnderTest11111111111111111111111111111"
OTHER_KEYS = ["OtherA", "OtherB", "OtherC"]
MINTS = ["MintX", "MintY"]
DUST = Decimal("0.000001")

# --- the independent model -------------------------------------------------


def _model_token_amount(ui_token_amount) -> Decimal:
    raw, dec, ui = (
        ui_token_amount.get("amount"),
        ui_token_amount.get("decimals"),
        ui_token_amount.get("uiAmount"),
    )
    if raw is not None and dec is not None:
        return Decimal(raw) / (Decimal(10) ** dec)
    if ui is None:
        return Decimal(0)
    # mirrors Spark's double->decimal cast: shortest decimal repr
    return Decimal(repr(ui))


def model_parse(tx: dict, wallet: str) -> list[tuple[str, Decimal]]:
    meta = tx.get("meta")
    if meta is None:
        return []
    out = []
    keys = [k["pubkey"] for k in tx["transaction"]["message"]["accountKeys"]]
    if wallet in keys:
        i = keys.index(wallet)
        pre, post = meta.get("preBalances") or [], meta.get("postBalances") or []
        if i < len(pre) and i < len(post):
            delta = (Decimal(post[i]) - Decimal(pre[i])) / Decimal(10**9)
            if abs(delta) > DUST:
                out.append(("SOL", delta))
    pre_tok = meta.get("preTokenBalances") or []
    for ptb in meta.get("postTokenBalances") or []:
        if ptb.get("owner") != wallet or ptb.get("owner") is None:
            continue
        match = next(
            (p for p in pre_tok if p.get("accountIndex") == ptb.get("accountIndex")),
            None,
        )
        pre_amt = _model_token_amount(match["uiTokenAmount"]) if match else Decimal(0)
        delta = _model_token_amount(ptb["uiTokenAmount"]) - pre_amt
        if abs(delta) > DUST:
            out.append((ptb["mint"], delta))
    return out


# --- strategies ------------------------------------------------------------

lamports = st.integers(min_value=0, max_value=10**13)

token_amounts = st.fixed_dictionaries(
    {
        "uiAmount": st.one_of(st.none(), st.floats(0, 1e6, allow_nan=False)),
        "decimals": st.integers(0, 9),
        "amount": st.integers(0, 10**15).map(str),
    }
)

token_balances = st.fixed_dictionaries(
    {
        "accountIndex": st.integers(0, 4),
        "mint": st.sampled_from(MINTS),
        "owner": st.one_of(st.none(), st.just(WALLET), st.sampled_from(OTHER_KEYS)),
        "uiTokenAmount": token_amounts,
    }
)


@st.composite
def transactions(draw):
    n_keys = draw(st.integers(1, 4))
    includes_wallet = draw(st.booleans())
    keys = draw(
        st.lists(st.sampled_from(OTHER_KEYS), min_size=n_keys, max_size=n_keys)
    )
    if includes_wallet:
        keys[draw(st.integers(0, n_keys - 1))] = WALLET
    n_bal = draw(st.integers(0, n_keys + 1))
    has_meta = draw(st.booleans())
    # dedupe token balances per accountIndex on the post side: the model's
    # "first match" and the pipeline's explode both emit per post row, but
    # duplicate post accountIndex entries are fine — keep as generated.
    meta = {
        "err": None,
        "fee": draw(st.integers(0, 10**6)),
        "preBalances": draw(st.lists(lamports, min_size=n_bal, max_size=n_bal)),
        "postBalances": draw(st.lists(lamports, min_size=n_bal, max_size=n_bal)),
        "preTokenBalances": draw(st.lists(token_balances, max_size=3)),
        "postTokenBalances": draw(st.lists(token_balances, max_size=3)),
        "logMessages": [],
        "rewards": [],
    }
    return {
        "slot": draw(st.integers(0, 10**9)),
        "blockTime": 1672531200,
        "transaction": {
            "signatures": ["sig"],
            "message": {
                "accountKeys": [
                    {"pubkey": k, "signer": False, "writable": True} for k in keys
                ],
                "instructions": [],
                "recentBlockhash": "h",
            },
        },
        "meta": meta if has_meta else None,
    }


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(txs=st.lists(transactions(), min_size=1, max_size=8))
def test_pipeline_matches_model(_spark, txs):
    rows = [
        (
            f"tx-{i}",
            "u",
            WALLET,
            1672531200,
            f"sig-{i}",
            "solana",
            json.dumps(t),
            None,
        )
        for i, t in enumerate(txs)
    ]
    bronze = _spark.createDataFrame(rows, BRONZE_SCHEMA)
    got = {
        (r.transaction_id, r.asset_symbol, r.amount)
        for r in normalize(bronze, audit_ts=F.lit(None).cast("timestamp")).collect()
    }
    want = set()
    for i, t in enumerate(txs):
        for asset, amount in model_parse(t, WALLET):
            # normalize to the pipeline's Decimal(38,18) scale
            want.add((f"tx-{i}", asset, _q18(amount)))
    got_q = {(a, b, _q18(c)) for a, b, c in got}
    assert got_q == want
