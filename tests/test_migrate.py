"""Schema-evolution migration op (migrations/20251219010000: add column
+ UPDATE..FROM backfill + SET NOT NULL), engine-side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spectraplex_spark.operators.migrate import (
    add_column_with_backfill,
    migrate_add_column,
)


def _tables(spark):
    ledger = spark.createDataFrame(
        [("e1", "t1", 5.0), ("e2", "t1", -2.0), ("e3", "t2", 1.0)],
        "id string, transaction_id string, amount double",
    )
    tx = spark.createDataFrame(
        [("t1", "walletA"), ("t2", "walletB"), ("t9", "walletZ")],
        "id string, wallet_address string",
    )
    return ledger, tx


def test_backfill_join_semantics(spark):
    ledger, tx = _tables(spark)
    out = add_column_with_backfill(
        ledger, tx, on="transaction_id", column="wallet_address", source_key="id"
    )
    got = {(r.id, r.wallet_address) for r in out.collect()}
    assert got == {("e1", "walletA"), ("e2", "walletA"), ("e3", "walletB")}


def test_set_not_null_fails_before_write(spark):
    ledger, tx = _tables(spark)
    orphaned = ledger.union(
        spark.createDataFrame([("e4", "t404", 9.0)], ledger.schema)
    )
    with pytest.raises(ValueError, match="SET NOT NULL would fail: 1"):
        add_column_with_backfill(
            orphaned, tx, on="transaction_id", column="wallet_address", source_key="id"
        )
    # not_null=False keeps the row with NULL (raw UPDATE..FROM semantics)
    out = add_column_with_backfill(
        orphaned, tx, "transaction_id", "wallet_address", "id", not_null=False
    )
    assert out.filter(F.col("wallet_address").isNull()).count() == 1


def test_existing_column_rejected(spark):
    ledger, tx = _tables(spark)
    with pytest.raises(ValueError, match="already has column"):
        add_column_with_backfill(
            ledger.withColumn("wallet_address", F.lit("x")),
            tx,
            "transaction_id",
            "wallet_address",
            "id",
        )


def test_parquet_migration_idempotent(spark, tmp_path):
    ledger, tx = _tables(spark)
    path = str(tmp_path / "ledger")
    ledger.write.parquet(path)
    n = migrate_add_column(path, tx, on="transaction_id", column="wallet_address", source_key="id")
    assert n == 3
    migrated = spark.read.parquet(path)
    assert set(migrated.columns) == {"id", "transaction_id", "amount", "wallet_address"}
    assert migrated.filter(F.col("wallet_address").isNull()).count() == 0
    # second run: column already present → no-op (sqlx skip-applied analog)
    before = migrated.collect()
    assert migrate_add_column(path, tx, "transaction_id", "wallet_address", "id") == 0
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == sorted(
        map(tuple, before)
    )
