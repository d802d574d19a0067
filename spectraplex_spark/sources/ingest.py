"""S1: bronze ingestion — conform raw Solana RPC responses to bronze rows.

The reference's ``SolanaAdapter::fetch_history`` (adapters/src/solana.rs:23-58)
wraps each RPC ``get_transaction`` response: fresh UUIDv4 id, nil user id,
``block_time.unwrap_or(0)`` → timestamp, signature → tx_hash, the full
response JSON → raw_metadata. The network fetch itself is a connector
job's problem; this module is the pure conformance step from fetched
JSON to the bronze schema, as a DataFrame transformation:

  raw rows (wallet, signature, response_json) → bronze rows

Divergences (SURVEY §1.2/§4.2): deterministic sha256 ids (re-ingestion
dedupes instead of duplicating), and per-row fetch errors surface as
rows with null response_json → kept in bronze with null raw_metadata or
dropped, by policy flag (the reference logs-and-skips, solana.rs:51-53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from spectraplex_spark.functions.ids import deterministic_id
from spectraplex_spark.schemas import BRONZE_SCHEMA

# What a connector lands per fetched transaction.
RAW_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("wallet_address", T.StringType(), False),
        T.StructField("signature", T.StringType(), False),
        T.StructField("response_json", T.StringType(), True),  # null = fetch error
        T.StructField("chain", T.StringType(), False),
    ]
)

NIL_UUID = "00000000-0000-0000-0000-000000000000"  # reference solana.rs:43


def conform_to_bronze(raw: DataFrame, drop_fetch_errors: bool = True) -> DataFrame:
    """Raw fetch rows → bronze schema.

    timestamp = blockTime or 0 (solana.rs:45); id = sha256(chain|wallet|
    signature) — stable across re-fetches of the same transaction.
    """
    if drop_fetch_errors:
        raw = raw.filter(F.col("response_json").isNotNull())
    block_time = F.get_json_object("response_json", "$.blockTime").cast("long")
    out = raw.select(
        deterministic_id("chain", "wallet_address", "signature").alias("id"),
        F.lit(NIL_UUID).alias("user_id"),
        "wallet_address",
        F.coalesce(block_time, F.lit(0)).alias("timestamp"),
        F.col("signature").alias("tx_hash"),
        "chain",
        F.col("response_json").alias("raw_metadata"),
        F.current_timestamp().alias("created_at"),
    )
    # conform exactly to the declared bronze schema (order + types)
    return out.select(
        *[F.col(f.name).cast(f.dataType) for f in BRONZE_SCHEMA.fields]
    )
