"""Ledger conservation audit: the tx-level invariant a financial
pipeline checks before trusting its silver tables.

For a well-formed Solana transaction the lamports are conserved up to
the fee: ``sum(postBalances) - sum(preBalances) == -fee`` (the fee
leaves the listed accounts; every other movement is between them).
A violated invariant means a torn/corrupted ingest or a parser bug —
exactly what you want to catch BEFORE normalize fans the row out into
ledger entries. The reference trusts Postgres constraints for row
integrity (init.sql) but has no cross-field arithmetic audit; this is
the engine's addition (SURVEY §2 K-family hardening).

All arithmetic is BIGINT lamports (schemas.py pins pre/postBalances
and fee to LongType) — exact, shuffle-order-free, bit-gradable.

100 TB shape: one narrow zero-shuffle projection over the bronze scan
(``zip_with`` + ``aggregate`` fold per row); the optional summary is
one boolean groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from spectraplex_spark.schemas import SOLANA_TX_SCHEMA


def _lamport_delta_sum(tx: Column) -> Column:
    """Exact BIGINT sum of per-account balance deltas for one parsed tx.
    ``zip_with`` pairs pre/post positionally (Solana's contract: both
    arrays index accountKeys); a length mismatch yields nulls, which
    poison the fold to null → flagged unbalanced rather than silently
    skipped."""
    deltas = F.zip_with(
        tx["meta"]["postBalances"],
        tx["meta"]["preBalances"],
        lambda post, pre: post - pre,
    )
    return F.aggregate(deltas, F.lit(0).cast("long"), lambda acc, d: acc + d)


def conservation_report(bronze: DataFrame) -> DataFrame:
    """Per-transaction conservation verdicts over bronze rows.

    Output: ``id, tx_hash, delta_sum, fee, balanced`` — ``balanced`` is
    true iff ``delta_sum + fee == 0`` with both operands present.
    Rows whose meta is null (unparseable / meta-less) are reported with
    null sums and ``balanced = false``: an un-auditable row is not a
    balanced row."""
    parsed = bronze.filter(F.col("chain") == "solana").withColumn(
        "tx", F.from_json("raw_metadata", SOLANA_TX_SCHEMA)
    )
    tx = F.col("tx")
    delta_sum = F.when(tx["meta"].isNotNull(), _lamport_delta_sum(tx))
    fee = tx["meta"]["fee"]
    balanced = F.coalesce((delta_sum + fee) == 0, F.lit(False))
    return parsed.select(
        "id",
        "tx_hash",
        delta_sum.alias("delta_sum"),
        fee.alias("fee"),
        balanced.alias("balanced"),
    )


def conservation_summary(bronze: DataFrame) -> DataFrame:
    """One-row audit summary: total txs, balanced, violations, and the
    exact BIGINT sum of absolute discrepancies (null discrepancies —
    un-auditable rows — count as violations but add 0 here)."""
    rep = conservation_report(bronze)
    disc = F.col("delta_sum") + F.col("fee")
    return rep.agg(
        F.count(F.lit(1)).alias("n_txs"),
        F.sum(F.col("balanced").cast("long")).alias("n_balanced"),
        F.sum((~F.col("balanced")).cast("long")).alias("n_violations"),
        F.coalesce(F.sum(F.abs(disc)), F.lit(0).cast("long")).alias(
            "total_abs_discrepancy"
        ),
    )
