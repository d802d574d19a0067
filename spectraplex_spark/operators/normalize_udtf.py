"""U1 as a Spark 4 Python UDTF — the API-surface twin of the
expression-based :mod:`normalize` pipeline.

The reference models ``parse_solana_transaction`` as a row→N-rows
table function (adapters/src/solana_parser.rs:7-93); Spark 4's
``@udtf`` is the literal mapping of that shape, so this variant exists
to demonstrate the API correspondence and to serve as an independent
second implementation the tests cross-check against the expression
pipeline (same role the hypothesis property model plays, but executable
inside Spark).

THIS IS NOT THE HOT PATH. Per-row Python JSON parsing costs 10-100×
the JVM ``from_json`` expression form (BASELINE.md measures the gap
class); ``normalize()`` remains the production operator. Semantics are
byte-matched to it: decimal-exact deltas, both-token-arrays guard,
3-way owner match, dust threshold, raw-amount-over-uiAmount preference.
"""

from __future__ import annotations

import json
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql.functions import col, udtf

_DUST = Decimal("0.000001")
_LAMPORTS = Decimal(10) ** 9


@udtf(returnType="asset string, amount decimal(38,18)")
class ParseSolanaTx:
    """(wallet_address, raw_metadata) → 0..N (asset, amount) entries."""

    def eval(self, wallet_address: str, raw_metadata: str):  # noqa: C901
        try:
            tx = json.loads(raw_metadata)
        except Exception:
            return  # corrupt JSON → no entries (parse_failures surfaces it)
        if not isinstance(tx, dict):
            return
        meta = tx.get("meta")
        if meta is None:
            return  # solana_parser.rs:15-18

        # native SOL (solana_parser.rs:20-45, 89-93)
        keys = [
            (k or {}).get("pubkey")
            for k in ((tx.get("transaction") or {}).get("message") or {}).get(
                "accountKeys"
            )
            or []
        ]
        if wallet_address in keys:
            i = keys.index(wallet_address)
            pre, post = meta.get("preBalances") or [], meta.get("postBalances") or []
            if i < len(pre) and i < len(post) and pre[i] is not None and post[i] is not None:
                delta = (Decimal(post[i]) - Decimal(pre[i])) / _LAMPORTS
                if abs(delta) > _DUST:
                    yield ("SOL", delta)

        # SPL tokens: BOTH arrays must be present (solana_parser.rs:46-47)
        pre_tok, post_tok = meta.get("preTokenBalances"), meta.get("postTokenBalances")
        if pre_tok is None or post_tok is None:
            return
        for tb in post_tok:
            owner = (tb or {}).get("owner")
            if owner is None or owner != wallet_address:  # 3-way match, rs:50-57
                continue
            pre_amt = Decimal(0)  # missing pre → new token account, rs:61-64
            for p in pre_tok:
                if (p or {}).get("accountIndex") == tb.get("accountIndex"):
                    pre_amt = self._amount(p)
                    break
            delta = self._amount(tb) - pre_amt
            if abs(delta) > _DUST:
                yield (tb.get("mint"), delta)

    @staticmethod
    def _amount(tb: dict) -> Decimal:
        """Exact raw/decimals scale shift, uiAmount fallback — mirrors
        normalize._token_amount_dec including Spark's double→decimal cast
        semantics (BigDecimal.valueOf == Decimal(repr(f)))."""
        ui = (tb or {}).get("uiTokenAmount") or {}
        raw, dec, uia = ui.get("amount"), ui.get("decimals"), ui.get("uiAmount")
        if raw is not None and dec is not None:
            return Decimal(raw) / (Decimal(10) ** int(dec))
        if uia is None:
            return Decimal(0)
        return Decimal(repr(float(uia)))


def normalize_entries_udtf(bronze: DataFrame) -> DataFrame:
    """Bronze → (tx id, asset, amount) via the Python UDTF, LATERAL-joined
    per row — the SQL-surface twin of the explode in ``normalize()``.

    Returns the entry-level columns only (the id/audit decoration of the
    full silver schema is the expression pipeline's job); used by tests
    to cross-check the two implementations row-for-row.
    """
    spark = bronze.sparkSession
    spark.udtf.register("parse_solana_tx_py", ParseSolanaTx)
    bronze.filter(col("chain") == "solana").createOrReplaceTempView("_udtf_bronze_in")
    return spark.sql(
        """
        SELECT b.id AS transaction_id, b.wallet_address, t.asset AS asset_symbol,
               t.amount
        FROM _udtf_bronze_in b,
        LATERAL parse_solana_tx_py(b.wallet_address, b.raw_metadata) t
        """
    )
