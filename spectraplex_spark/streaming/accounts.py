"""Account-update consumers — what a subscriber DOES with the
Yellowstone account frames (`decode_yellowstone_accounts`): land the
update stream durably and serve the LATEST account state per pubkey.

The reference describes subscribing to account updates (README.md:3)
but stubs the transport and lands nothing; this module supplies the
standard Geyser-consumer shape:

  * updates are append-only facts, keyed ``pubkey:write_version`` —
    idempotent landing makes at-least-once delivery safe (a replayed
    frame is an anti-join no-op), and history is retained for
    time-travel/audit instead of overwritten;
  * "current state" is a VIEW over the updates — one aggregation,
    ``max_by(row, (slot, write_version))`` per pubkey. max_by over a
    struct ordering key partial-aggregates (map-side combine), so at
    100 TB the shuffle carries one candidate row per (pubkey,
    partition), not the update history; a window/row_number form would
    shuffle everything. Solana orders intra-slot writes by
    write_version, so (slot, write_version) is the total order of
    authority for an account's state.

On Delta/Iceberg the view can be compacted with a MERGE into a
materialized current-state table; plain parquet keeps the append+view
form (same contract as the medallion sinks in sources/io.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from spectraplex_spark.sources.io import idempotent_append
from spectraplex_spark.streaming.yellowstone import decode_yellowstone_accounts


def latest_account_state(
    updates: DataFrame,
    key: str = "pubkey",
    order: tuple[str, ...] = ("slot", "write_version"),
) -> DataFrame:
    """One row per ``key``: the update with the greatest ``order``
    tuple. Output columns = input columns (the winning row, whole)."""
    payload = F.struct(*[F.col(c) for c in updates.columns])
    ordk = F.struct(*[F.col(c) for c in order])
    return (
        updates.groupBy(key)
        .agg(F.max_by(payload, ordk).alias("_row"))
        .select("_row.*")
    )


def land_account_updates(batch: DataFrame, updates_path: str) -> int:
    """Idempotently append decoded account-update rows; the id is
    ``pubkey:slot:write_version`` — slot INCLUDED (review finding r13):
    write_version is a validator-LOCAL counter (it resets on restart
    and differs across nodes), so a ``pubkey:write_version`` identity
    made distinct updates from different slots collide and silently
    drop, serving stale state forever after a subscription failover.
    With the slot in the key, a replayed frame is still an anti-join
    no-op, while updates that genuinely differ in the (slot,
    write_version) order of authority always land. Returns rows
    actually appended."""
    return idempotent_append(
        batch.withColumn(
            "id",
            F.concat_ws(
                ":",
                "pubkey",
                F.col("slot").cast("string"),
                F.col("write_version").cast("string"),
            ),
        ),
        updates_path,
        id_col="id",
    )


def stream_account_updates(
    frames: DataFrame,
    updates_path: str,
    checkpoint_dir: str,
    value_col: str = "value",
):
    """Yellowstone wire frames (streaming) → decoded account updates →
    idempotent parquet landing. Returns the DataStreamWriter.
    ``value_col`` forwards to the decoder (review finding r13: the
    grpc_replay source's frame column is 'frame', and the hardcoded
    default crashed that documented composition)."""

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        land_account_updates(
            decode_yellowstone_accounts(batch_df, value_col), updates_path
        )

    return (
        frames.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def account_state_view(spark: SparkSession, updates_path: str) -> DataFrame:
    """Serving view: the current state of every account seen so far.
    Total over the stream's lifecycle (review finding r13): before the
    first batch lands (path absent / zero rows ever landed) it returns
    an EMPTY state view on the declared schema instead of raising
    AnalysisException at a serving endpoint."""
    from pyspark.errors import AnalysisException

    from spectraplex_spark.streaming.yellowstone import ACCOUNT_UPDATE_SCHEMA

    try:
        updates = spark.read.parquet(updates_path).drop("id")
    except AnalysisException:
        updates = spark.createDataFrame([], ACCOUNT_UPDATE_SCHEMA)
    return latest_account_state(updates)
