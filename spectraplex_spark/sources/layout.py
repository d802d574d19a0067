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


def zorder_value(x: Column, y: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` of two bucket ids into a Morton
    (Z-order) value — pure shift/mask expressions, whole-stage codegen.

    Sorting by this value clusters rows that are close in BOTH
    dimensions into the same parquet row groups, so min/max stats prune
    two-predicate scans where a single-column sort can only prune one —
    the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, as plain
    Spark expressions.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_buckets(col: Column, lo: Column, hi: Column, bits: int = 8) -> Column:
    """Map a numeric column onto [0, 2^bits) bucket ids via width_bucket
    over the column's (min, max) — the cheap linear quantizer; swap in
    approx-quantile boundaries for heavily skewed dimensions."""
    n = 2**bits
    return F.least(
        F.lit(n - 1).cast("long"),
        (F.width_bucket(col.cast("double"), lo, hi, F.lit(n)) - 1).cast("long"),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    bits: int = 8,
    block_size: int | None = None,
) -> None:
    """Write parquet Z-ordered on (col_x, col_y): quantize both columns
    against their global min/max (one tiny agg, broadcast), sort by the
    interleaved value (range partition — the one shuffle layout jobs
    pay), write. ``block_size`` shrinks row groups for tests; leave
    None in production (default 128MB groups)."""
    stats = df.agg(
        F.min(F.col(col_x).cast("double")).alias("_xlo"),
        F.max(F.col(col_x).cast("double")).alias("_xhi"),
        F.min(F.col(col_y).cast("double")).alias("_ylo"),
        F.max(F.col(col_y).cast("double")).alias("_yhi"),
    )
    z = zorder_value(
        zorder_buckets(F.col(col_x), F.col("_xlo"), F.col("_xhi"), bits),
        zorder_buckets(F.col(col_y), F.col("_ylo"), F.col("_yhi"), bits),
        bits,
    )
    writer = (
        df.join(F.broadcast(stats))
        .withColumn("_z", z)
        .sort("_z")
        .drop("_z", "_xlo", "_xhi", "_ylo", "_yhi")
        .write.mode("overwrite")
    )
    if block_size is not None:
        writer = writer.option("parquet.block.size", str(block_size))
    writer.parquet(path)


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


def compact_to(
    spark,
    src: str,
    dst: str,
    rows_per_file: int = 1_000_000,
) -> tuple[int, int]:
    """Small-file compaction for append-heavy tables (the operational
    tax of the idempotent-append protocol: every micro-batch lands its
    own files, and at 100 TB a year of batches is millions of tiny
    footers that dominate scan planning time).

    Rewrites ``src`` into ceil(rows / rows_per_file) files at ``dst``
    via ``coalesce`` — a NARROW rewrite: no shuffle, each output task
    concatenates a set of input files. The trade (documented, not
    hidden): coalesced files inherit input skew instead of being
    size-balanced; when balanced output matters more than avoiding the
    shuffle (e.g. compacting the final silver layout once), swap
    ``coalesce`` for ``repartition``. Compact-to-NEW-path by design:
    Spark cannot overwrite a dataset it is reading, and the
    stage-then-swap at the catalog/manifest level is how every table
    format does it. Returns (files_before, files_after)."""
    import math

    df = spark.read.parquet(src)
    files_before = len(df.inputFiles())
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / max(rows_per_file, 1)))
    df.coalesce(n_files).write.mode("overwrite").parquet(dst)
    from spectraplex_spark.sources.commit import write_commit_manifest

    write_commit_manifest(dst)  # publish: readers can validate/read_committed
    return files_before, len(spark.read.parquet(dst).inputFiles())


def zorder_value_n(cols: list[Column], bits: int = 8) -> Column:
    """N-dimensional Morton interleave: bit b of column c lands at
    output position b*len(cols) + c — the multi-column generalization
    of zorder_value (Delta's OPTIMIZE ZORDER BY (a, b, c) curve). Pure
    shift/mask expressions; len(cols)*bits must fit 63 bits. Sorting by
    this value clusters rows close in EVERY listed dimension, so
    min/max stats prune any-subset predicates — at the usual trade:
    per-dimension selectivity dilutes as dimensions are added (2-4
    columns is the practical sweet spot, same guidance as the table
    formats)."""
    n = len(cols)
    if n < 1:
        raise ValueError("need at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long's 63 usable bits")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for c, col in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(col.cast("long"), b).bitwiseAND(F.lit(1)),
                    b * n + c,
                )
            )
    return z
