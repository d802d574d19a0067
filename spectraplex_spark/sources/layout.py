"""Physical layout utilities for scale: bucketing and skew salting.

The reference tunes access paths with four covering Postgres indexes
(migrations/20251219000000_init.sql:17-19,34-35); the Spark-native
equivalents are layout decisions:

  - partitioning (sources/io.py): predicate → partition pruning.
  - bucketing (here): pre-shuffling a table ONCE at write time on its
    join/agg key, so every later join or aggregation on that key runs
    with zero exchange. At 100 TB, bucketing bronze/silver by
    wallet_address turns the serving joins and per-wallet reports into
    shuffle-free scans.
  - salting (here): when a key's distribution is pathological (one hot
    wallet = one straggler task), split the hot key into `salt_n`
    sub-keys, aggregate partially, then merge. AQE's skew-join handles
    the join case at runtime; salting is the aggregation-side tool.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table.

    Joins/aggregations between tables bucketed the same way on the same
    keys plan with NO Exchange (verified in tests via the physical plan).
    Sorting within buckets additionally gives sort-merge joins their
    order for free and parquet min/max stats their selectivity.
    """
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode("overwrite").format("parquet").saveAsTable(table_name)


def salted_group_sum(
    df: DataFrame,
    key_cols: list[str],
    sum_col: Column,
    alias: str,
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: partial sums over
    (key, salt) spread the hot key across `salt_n` tasks, then a cheap
    merge over the (tiny) partial results.

    Spark's hash aggregate already does map-side partial aggregation,
    which handles most skew; explicit salting matters when the
    aggregation is non-partial (e.g. collect/exact-distinct) or when a
    single reducer key dominates even the merged stream.
    """
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_n)))
    partial = salted.groupBy(*key_cols, "_salt").agg(F.sum(sum_col).alias("_partial"))
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(alias))
