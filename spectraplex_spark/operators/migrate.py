"""Schema-evolution operators: the reference's add-column + backfill +
constraint migration as an engine op.

Reference flow (migrations/20251219010000_add_wallet_to_ledger.sql:2-15):
  1. ALTER TABLE ledger_entries ADD COLUMN wallet_address VARCHAR(255);
  2. UPDATE ledger_entries le SET wallet_address = tx.wallet_address
     FROM transactions tx WHERE le.transaction_id = tx.id;   -- join backfill
  3. ALTER TABLE ledger_entries ALTER COLUMN wallet_address SET NOT NULL;
  4. CREATE INDEX idx_ledger_wallet_created ...;

Engine mapping: Parquet has no in-place UPDATE, so the migration is a
read → left-join-enrich → validate → rewrite. The UPDATE..FROM is an
inner join on matched rows but leaves unmatched rows in place with the
column NULL — i.e. a LEFT join overall; SET NOT NULL then fails the
migration if any row was left NULL, which we mirror with an explicit
validation raise BEFORE anything is written (the reference's migration
runner is transactional; writing first and failing after would leave a
half-migrated table). The index becomes the rewritten table's partition
/ sort layout — the caller picks it at write time, same as write_silver.

Scale: one shuffle (the backfill join; broadcast the source projection
when it is dimension-sized) plus the rewrite scan. The validation count
rides the same join — no extra pass over the target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def add_column_with_backfill(
    target: DataFrame,
    source: DataFrame,
    on: str | list[str],
    column: str,
    source_key: str | list[str] | None = None,
    not_null: bool = True,
    broadcast_source: bool = False,
) -> DataFrame:
    """ADD COLUMN ``column`` to ``target``, backfilled from ``source``
    via an equi-join of target.``on`` = source.``source_key`` (defaults
    to ``on``) — the UPDATE .. FROM join shape (J2).

    ``not_null=True`` mirrors the migration's SET NOT NULL: raises if
    any target row found no source match, naming the count. Only the
    join keys and the backfilled column are read from the source
    (column pruning keeps the join O(source keys), not O(source
    bytes)); pass ``broadcast_source=True`` when the source projection
    is dimension-sized.
    """
    skey = source_key if source_key is not None else on
    skeys = [skey] if isinstance(skey, str) else list(skey)
    tkeys = [on] if isinstance(on, str) else list(on)
    if column in target.columns:
        raise ValueError(f"target already has column {column!r}")
    proj = source.select(
        *[F.col(s).alias(t) for s, t in zip(skeys, tkeys)], column
    ).dropDuplicates(tkeys)
    if broadcast_source:
        proj = F.broadcast(proj)
    out = target.join(proj, tkeys, "left")
    if not_null:
        n_missing = out.filter(F.col(column).isNull()).count()
        if n_missing:
            raise ValueError(
                f"SET NOT NULL would fail: {n_missing} target rows have no "
                f"source match for backfill column {column!r}"
            )
    return out


def migrate_add_column(
    target_path: str,
    source: DataFrame,
    on: str | list[str],
    column: str,
    source_key: str | list[str] | None = None,
    partition_by: tuple[str, ...] = (),
) -> int:
    """The full migration on a Parquet table: read ``target_path``,
    backfill, validate, rewrite in place. Returns rows rewritten.

    Idempotent: a second run sees the column already present and
    returns 0 without touching the table (the reference's sqlx runner
    skips applied migrations by checksum; the column's presence is the
    engine's equivalent marker). The rewrite localCheckpoints the
    enriched frame first — a lazy overwrite would re-read the path it
    is deleting.
    """
    spark = source.sparkSession
    target = spark.read.parquet(target_path)
    if column in target.columns:
        return 0
    enriched = add_column_with_backfill(target, source, on, column, source_key)
    enriched = enriched.localCheckpoint()
    writer = enriched.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(target_path)
    return enriched.count()
