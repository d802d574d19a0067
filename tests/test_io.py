"""Idempotent-append protocol (K1/K2) + JSONL round trip (S3/K3)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from spectraplex_spark.schemas import BRONZE_SCHEMA
from spectraplex_spark.sources.io import (
    idempotent_append,
    read_bronze_jsonl,
    write_bronze,
    write_jsonl,
)


def _bronze_rows(spark, ids):
    rows = [
        (f"id-{i}", "u", f"wallet-{i % 3}", 1672531200 + i, f"sig-{i}", "solana", "{}", None)
        for i in ids
    ]
    return spark.createDataFrame(rows, BRONZE_SCHEMA)


def test_idempotent_append_dedups_across_batches(spark, tmp_path):
    target = str(tmp_path / "bronze")
    df1 = _bronze_rows(spark, range(10))
    assert idempotent_append(df1, target) == 10
    # replay the same batch → ON CONFLICT DO NOTHING semantics
    assert idempotent_append(df1, target) == 0
    # overlapping batch → only the new ids land
    df2 = _bronze_rows(spark, range(5, 15))
    assert idempotent_append(df2, target) == 5
    assert spark.read.parquet(target).count() == 15
    assert spark.read.parquet(target).select("id").distinct().count() == 15


def test_idempotent_append_dedups_within_batch(spark, tmp_path):
    target = str(tmp_path / "bronze")
    df = _bronze_rows(spark, [1, 1, 2, 2, 3])
    assert idempotent_append(df, target) == 3


def test_write_bronze_partition_layout(spark, tmp_path):
    target = str(tmp_path / "bronze")
    n = write_bronze(_bronze_rows(spark, range(4)), target)
    assert n == 4
    back = spark.read.parquet(target)
    assert {"chain", "ingest_date"} <= set(back.columns)
    # partition pruning predicate works (chain is a partition dir)
    assert back.filter(F.col("chain") == "solana").count() == 4
    assert back.filter(F.col("chain") == "ethereum").count() == 0


def test_jsonl_round_trip(spark, tmp_path):
    path = str(tmp_path / "out.jsonl")
    df = _bronze_rows(spark, range(6))
    write_jsonl(df.drop("created_at"), path)
    back = read_bronze_jsonl(spark, path)
    assert back.count() == 6
    assert sorted(r.id for r in back.collect()) == sorted(f"id-{i}" for i in range(6))


def test_jsonl_corrupt_line_does_not_abort(spark, tmp_path):
    path = tmp_path / "mixed.jsonl"
    good = {
        "id": "a", "user_id": "u", "wallet_address": "w", "timestamp": 1,
        "tx_hash": "h", "chain": "solana", "raw_metadata": "{}",
    }
    path.write_text(json.dumps(good) + "\n" + "{broken\n")
    df = read_bronze_jsonl(spark, str(path))
    assert df.count() == 2  # corrupt line → all-null row, read survives
    assert df.filter(F.col("id").isNotNull()).count() == 1
