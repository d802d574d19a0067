"""Explicit schemas for the medallion tables and the Solana transaction JSON.

Derived from the reference's data model (SURVEY.md §1; FIXTURES.md):
  - Bronze ``transactions``: reference ``core/src/models.rs:21-31`` and
    ``migrations/20251219000000_init.sql:6-15``.
  - Silver ``ledger_entries``: reference ``core/src/models.rs:33-44``,
    ``init.sql:23-32``, denormalized wallet per
    ``migrations/20251219010000_add_wallet_to_ledger.sql:2-12``.
  - ``raw_metadata`` JSON: the minimal-but-sufficient subset of Solana's
    EncodedConfirmedTransactionWithStatusMeta that the reference parser
    reads (``adapters/src/solana_parser.rs:7-93``; golden fixture shape at
    ``adapters/tests/solana_parser_test.rs:11-37``).

Money is DecimalType(38, 18): the reference stores NUMERIC and its golden
test asserts exact decimal equality (solana_parser_test.rs:57-58). We do
NOT replicate its f64 intermediate (solana_parser.rs:89-93) — deltas are
computed in decimal from integer lamports / raw token amounts.

Schemas are declared, never inferred, in production paths (the reference
versions its DDL via sqlx migrations; we version StructTypes in code).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- enums (reference core/src/models.rs:5-19; Postgres enums init.sql:2-3) ---
CHAINS = ("solana", "hyperliquid", "ethereum")
ENTRY_TYPES = ("trade", "fee", "transfer", "staking", "income")

# Exact-decimal money type (reference NUMERIC columns, init.sql:28,30).
MONEY = T.DecimalType(38, 18)

# --- Bronze: transactions (models.rs:21-31) ---
BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("wallet_address", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), False),  # unix seconds
        T.StructField("tx_hash", T.StringType(), False),
        T.StructField("chain", T.StringType(), False),
        T.StructField("raw_metadata", T.StringType(), True),  # JSON string
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# --- Silver: ledger_entries (models.rs:33-44 + wallet denormalization) ---
SILVER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("wallet_address", T.StringType(), False),
        T.StructField("asset_symbol", T.StringType(), False),
        T.StructField("amount", MONEY, False),
        T.StructField("entry_type", T.StringType(), False),
        T.StructField("fiat_value", MONEY, True),  # never populated by reference
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# --- raw_metadata JSON: minimal Solana tx schema (FIXTURES.md §3) ---
_TOKEN_AMOUNT = T.StructType(
    [
        T.StructField("uiAmount", T.DoubleType(), True),
        T.StructField("decimals", T.IntegerType(), True),
        T.StructField("amount", T.StringType(), True),  # raw integer as string
    ]
)

TOKEN_BALANCE = T.StructType(
    [
        T.StructField("accountIndex", T.IntegerType(), True),
        T.StructField("mint", T.StringType(), True),
        T.StructField("owner", T.StringType(), True),  # nullable (parser.rs:50-57)
        T.StructField("uiTokenAmount", _TOKEN_AMOUNT, True),
    ]
)

SOLANA_TX_SCHEMA = T.StructType(
    [
        T.StructField("slot", T.LongType(), True),
        T.StructField("blockTime", T.LongType(), True),
        T.StructField(
            "transaction",
            T.StructType(
                [
                    T.StructField("signatures", T.ArrayType(T.StringType()), True),
                    T.StructField(
                        "message",
                        T.StructType(
                            [
                                T.StructField(
                                    "accountKeys",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField("pubkey", T.StringType(), True),
                                                T.StructField("signer", T.BooleanType(), True),
                                                T.StructField("writable", T.BooleanType(), True),
                                            ]
                                        )
                                    ),
                                    True,
                                ),
                                T.StructField("instructions", T.ArrayType(T.StringType()), True),
                                T.StructField("recentBlockhash", T.StringType(), True),
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        ),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("err", T.StringType(), True),
                    T.StructField("fee", T.LongType(), True),
                    T.StructField("preBalances", T.ArrayType(T.LongType()), True),
                    T.StructField("postBalances", T.ArrayType(T.LongType()), True),
                    T.StructField("preTokenBalances", T.ArrayType(TOKEN_BALANCE), True),
                    T.StructField("postTokenBalances", T.ArrayType(TOKEN_BALANCE), True),
                    T.StructField("logMessages", T.ArrayType(T.StringType()), True),
                    T.StructField("rewards", T.ArrayType(T.StringType()), True),
                ]
            ),
            True,  # nullable meta → tx skipped (parser.rs:15-18)
        ),
    ]
)

# Driver-provided synthetic tables (TESTDATA.md); loaded, never inferred.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
