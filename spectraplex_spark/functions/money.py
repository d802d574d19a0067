"""Exact-decimal money math.

The reference computes balance deltas in f64 and then converts to
BigDecimal (reference adapters/src/solana_parser.rs:36,76,89-93) — a
precision hazard we deliberately do NOT replicate (SURVEY §4.2). Deltas
here are computed in DecimalType from integer lamports; the division by
1e9 is exact (scale shift), so the golden assertion `amount == -0.5`
(reference adapters/tests/solana_parser_test.rs:57-58) holds bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

from spectraplex_spark.schemas import MONEY

def lamports_to_sol(lamports: Column) -> Column:
    """Integer lamports → SOL as Decimal(38,18), exactly.

    DECIMAL(38,9) / DECIMAL(10,0) keeps enough precision that the result
    (scale-shift by 9) is exact before the final cast to MONEY.
    Reference: `/ 1_000_000_000.0` in f64 at solana_parser.rs:92.
    """
    per_sol = F.lit(1_000_000_000).cast(T.DecimalType(10, 0))
    return (lamports.cast(T.DecimalType(38, 9)) / per_sol).cast(MONEY)


def to_money(col: Column) -> Column:
    """Cast any numeric column to the canonical money decimal type."""
    return col.cast(MONEY)
