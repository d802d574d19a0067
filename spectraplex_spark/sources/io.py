"""Sources and sinks (SURVEY §2.1): JSONL interchange, partitioned
Parquet medallion tables, and the idempotent-append write protocol.

Reference mapping:
  - S3/K3 JSONL source/sink (cli/src/main.rs:126-146, 106-113): schema'd
    ``spark.read.json`` / ``df.write.json`` — never inferred in
    production paths (the reference deserializes strictly into structs).
  - K1/K2 idempotent Postgres sinks (`INSERT ... ON CONFLICT (id) DO
    NOTHING`, repo.rs:13-71): re-expressed as a left-anti join of the
    incoming batch against the target's ids, then append (SURVEY §4.1).
  - Index-driven access paths (init.sql:17-19,34-35): re-expressed as
    partition columns — bronze by (chain, ingest date), silver by
    wallet bucket/date — so the serving predicates partition-prune
    instead of index-seek.

Scale notes: the anti-join reads ONLY the id column of the target
(Parquet column pruning), so its cost is O(ids), not O(data). At 100 TB
with a date-partitioned target, pass ``scope`` to restrict the dedup
window to the partitions the batch can overlap (bounded-state dedup —
same reasoning as a streaming watermark). On Delta/Iceberg this whole
protocol becomes a MERGE; plain Parquet has no transactional upsert, so
append + anti-join is the portable expression.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F

from spectraplex_spark.schemas import BRONZE_SCHEMA


def open_source(
    spark: SparkSession, source: str, table: str | None = None, **jdbc_options
) -> DataFrame:
    """S6 source dispatch (the reference's ``db:`` URI prefix,
    cli/src/main.rs:118-124): a ``jdbc:`` URL reads ``table`` over JDBC —
    the literal twin of the reference's Postgres serving reads
    (repo.rs:73-149) — anything else is a Parquet path.

    JDBC reads push the serving predicates into the database (Catalyst
    JDBC pushdown covers filters and column pruning), exactly the
    reference's `WHERE wallet_address = $1` shape. At scale pass
    ``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``
    through ``jdbc_options`` so the read parallelizes instead of
    funneling through one connection. Tested against embedded Derby
    (the JDBC engine Spark ships); the same code path serves Postgres
    by URL swap.
    """
    if source.startswith("jdbc:"):
        if not table:
            raise ValueError("jdbc source requires a table name")
        reader = spark.read.format("jdbc").option("url", source).option("dbtable", table)
        for k, v in jdbc_options.items():
            reader = reader.option(k, str(v))
        return reader.load()
    return spark.read.parquet(source)


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append", **options
) -> None:
    """K1/K2 JDBC sink shape: bulk batched INSERTs per partition —
    versus the reference's one-round-trip-per-row loop (repo.rs:14-38).
    True ON CONFLICT idempotency needs the database's upsert (or the
    anti-join protocol against a read of the target's ids); plain
    append is the portable core."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        writer = writer.option(k, str(v))
    writer.mode(mode).save()


def read_bronze_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S3: newline-delimited JSON with the declared bronze schema.
    Corrupt lines become all-null rows surfaced by operators.normalize's
    parse_failures rather than aborting the read (PERMISSIVE)."""
    return spark.read.schema(BRONZE_SCHEMA).json(path)


# Spark's JSON default renders timestamps at millisecond precision,
# silently losing micros on a write→read round trip; the sink is an
# interchange format, so it must be lossless. Readers parse these
# fine: the ltz pattern is ISO-with-offset, the ntz pattern plain ISO.
JSON_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
JSON_TS_NTZ_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K3: JSONL sink (one JSON object per line, microsecond-faithful
    timestamps)."""
    (
        df.write.mode(mode)
        .option("timestampFormat", JSON_TS_FORMAT)
        .option("timestampNTZFormat", JSON_TS_NTZ_FORMAT)
        .json(path)
    )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink, interchange-grade: header row, microsecond-faithful
    timestamps (same lossless contract as the JSONL sink — Spark's CSV
    default also truncates to milliseconds), full quoting semantics
    (embedded commas/quotes/newlines survive)."""
    (
        df.write.mode(mode)
        .option("header", "true")
        .option("timestampFormat", JSON_TS_FORMAT)
        .option("timestampNTZFormat", JSON_TS_NTZ_FORMAT)
        .option("escape", '"')
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """CSV source with a DECLARED schema — inference double-scans the
    data and guesses types (a 100 TB anti-pattern and a correctness
    hazard); interchange readers always declare. Multiline quoted
    fields are honored so text columns round-trip."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", JSON_TS_FORMAT)
        .option("timestampNTZFormat", JSON_TS_NTZ_FORMAT)
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib, Spark-native). ORC is binary and columnar, so —
    unlike the JSONL/CSV text sinks — timestamps, decimals and doubles
    round-trip without format options; included so the interchange
    matrix covers the Hive-ecosystem format alongside parquet."""
    df.write.mode(mode).option("compression", "zlib").orc(path)


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """ORC source. The schema is optional (ORC files embed it); passing
    one pins the reader to the declared contract like the other
    interchange readers."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def _target_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds a readable Parquet dataset.

    Probed by attempting a schema-only read rather than via the private
    ``spark._jvm`` Hadoop gateway: the read works identically under Spark
    Connect (no JVM access from the client) and for any filesystem scheme
    the session supports. Schema resolution touches only footers — no
    data scan. A missing/empty path raises AnalysisException → False;
    genuinely corrupt targets still raise on the subsequent real read.
    """
    try:
        spark.read.parquet(path).schema
        return True
    except AnalysisException:
        return False
    # Any OTHER exception (network blip, credentials, permissions)
    # propagates: treating a transient probe failure as "table absent"
    # would skip the schema guard AND the anti-join and land a replayed
    # batch as full duplicates with no error anywhere (review finding).


def _existing_partition_layout(path: str) -> tuple[str, ...]:
    """The ordered partition-column chain of a table's on-disk Hive
    layout, read from the first ``name=value`` directory path (every
    branch of a valid layout carries the same chain)."""
    import os
    from urllib.parse import unquote

    cols: list[str] = []
    cur = path
    while True:
        # NO underscore exclusion: partition columns named _tp/_gb are
        # legitimate (the postings/grams bucket layouts) and Spark's
        # sidecar artifacts (_SUCCESS, _epochs, _config) never contain
        # '=' — the '=' test alone separates the two (full-suite catch
        # r13: the first cut skipped '_tp=...' and refused every
        # incremental index append).
        subs = sorted(
            d
            for d in os.listdir(cur)
            if "=" in d and os.path.isdir(os.path.join(cur, d))
        )
        if not subs:
            return tuple(cols)
        cols.append(unquote(subs[0].split("=", 1)[0]))
        cur = os.path.join(cur, subs[0])


def idempotent_append(
    df: DataFrame,
    path: str,
    id_col: str = "id",
    partition_by: tuple[str, ...] = (),
    scope: F.Column | None = None,
    commit_epochs: bool = True,
) -> int:
    """K1/K2: append only rows whose id is not already in the target.

    Returns the number of rows appended. ``scope`` optionally restricts
    which target partitions are scanned for existing ids (predicate
    pushdown prunes them) — at 100 TB you scope the dedup window, e.g.
    ``col('ingest_date') >= batch_min_date``.

    Within-batch duplicates are also collapsed (first occurrence wins
    arbitrarily among identical ids — the reference's ON CONFLICT keeps
    the first INSERT too, repo.rs:26).

    Each batch that lands is committed as an epoch manifest
    (sources/commit.py) — the append-only analog of the stage-then-swap
    commit marker: readers via ``read_committed_epochs`` never see a
    torn batch, and a writer killed between Spark's job commit and the
    epoch commit is detected (and rolled forward) by
    ``validate_epochs``/``adopt_uncommitted``. The anti-join above
    deliberately reads the RAW directory, not the committed view, so a
    replay after a torn append stays a no-op instead of duplicating the
    orphaned rows.
    """
    spark = df.sparkSession
    batch = df.dropDuplicates([id_col])
    if _target_exists(spark, path):
        existing = spark.read.parquet(path)
        # SCHEMA GUARD: parquet append has no engine-side contract — a
        # batch with a renamed/retyped column would land and silently fork
        # the table's schema (readers then null-fill or fail file-by-file).
        # Compare by name+type, order-insensitive (parquet matches columns
        # by name). Partition columns are compared by NAME only: their
        # read-back type comes from partition-value inference, which can
        # legitimately differ from the written type (e.g. numeric-looking
        # strings).
        from spectraplex_spark.sources.commit import TableInconsistentError

        strict = lambda schema: {  # noqa: E731
            f.name: f.dataType.simpleString()
            for f in schema.fields
            if f.name not in partition_by
        }
        if strict(batch.schema) != strict(existing.schema) or {
            f.name for f in batch.schema.fields
        } != {f.name for f in existing.schema.fields}:
            raise TableInconsistentError(
                f"{path}: append batch schema does not match the table — "
                f"batch {batch.schema.simpleString()} vs table "
                f"{existing.schema.simpleString()}; appending would fork "
                "the parquet schema silently"
            )
        # LAYOUT GUARD (review finding r13): the schema guard cannot see
        # partition-by drift — a flat append into a partitioned table
        # (or vice versa, or a re-ordered nesting) has an identical
        # name+type set, but the files land at the wrong directory
        # depth and every later read fails with 'Conflicting directory
        # structures detected' AFTER the batch committed.  Compare the
        # call's partition_by with the name=value chain actually on
        # disk, in order.
        layout = _existing_partition_layout(path)
        if layout != tuple(partition_by):
            raise TableInconsistentError(
                f"{path}: table is partitioned by {list(layout)} on disk "
                f"but the append asked for partition_by="
                f"{list(partition_by)} — the batch would land at the "
                "wrong directory depth and break every later read"
            )
        if scope is not None:
            existing = existing.filter(scope)
        # Only id_col is read from the target: column pruning keeps this
        # O(row-count), never O(bytes). NULL-SAFE join: a plain equi-key
        # anti-join never matches NULL ids, so a corrupt all-null row
        # (PERMISSIVE read; Spark does not enforce read-schema
        # nullability) would re-append on EVERY replay — the one case
        # the replay-is-a-no-op guarantee would otherwise miss (review
        # finding). dropDuplicates above already collapses null ids to
        # one row within a batch.
        batch = batch.join(
            existing.select(F.col(id_col).alias("_existing_id")),
            F.col(id_col).eqNullSafe(F.col("_existing_id")),
            "left_anti",
        )
    # persist: the filtered batch feeds both the count and the write —
    # without it the scan + anti-join would execute twice
    batch = batch.persist()
    try:
        n = batch.count()
        if n:
            writer = batch.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(path)
            if commit_epochs:
                from spectraplex_spark.sources.commit import commit_append_epoch

                commit_append_epoch(path)
    finally:
        batch.unpersist()
    return n


def write_bronze(df: DataFrame, path: str) -> int:
    """Bronze landing: partitioned by chain + ingest date (the
    (wallet, timestamp) index analog — serving queries prune on both)."""
    with_date = df.withColumn(
        "ingest_date", F.to_date(F.from_unixtime(F.col("timestamp")))
    )
    return idempotent_append(
        with_date, path, id_col="id", partition_by=("chain", "ingest_date")
    )


def land_with_quarantine(
    bronze: DataFrame,
    silver_path: str,
    quarantine_path: str,
    audit_ts: F.Column | None = None,
    prices: DataFrame | None = None,
) -> tuple[int, int]:
    """Bronze → silver with a dead-letter lane: parseable rows normalize
    into the idempotent silver sink; rows whose raw_metadata fails to
    parse land in a quarantine table (id, tx_hash, chain, the raw
    payload, a reason, and when it was quarantined) instead of being
    silently dropped. Returns (n_silver_appended, n_quarantined).

    Both lanes use the same idempotent-append protocol, so replays are
    no-ops on both; quarantined rows stay replayable — fix the parser,
    re-ingest the quarantine as bronze, and the anti-join admits only
    the now-parsing entries. This resolves the reference's CLI/API
    split (abort-on-first-error vs silently-swallow — cli/src/main.rs:155,
    api/src/main.rs:103) with an explicit third way: keep going, keep
    the evidence.

    ``prices`` (optional, columns asset_symbol/price_ts/price) populates
    ``fiat_value`` — the column the reference declares but always leaves
    None (models.rs:43) — via an as-of join: amount × the latest price
    at-or-before the entry's creation time; entries with no prior price
    keep null. Without ``prices`` the landing matches the reference
    byte-for-byte (fiat_value null).
    """
    from spectraplex_spark.operators.normalize import normalize, parse_failures

    # persist: both lanes (normalize + parse_failures), each with a
    # count and a write inside idempotent_append, otherwise re-run the
    # bronze lineage — the JSON parse normalize's docstring calls THE
    # cost — about four times per landing (review finding)
    bronze = bronze.persist()
    try:
        silver = normalize(bronze, audit_ts=audit_ts)
        if prices is not None:
            from spectraplex_spark.operators.temporal import enrich_fiat_value

            silver = enrich_fiat_value(silver, prices)
        n_silver = write_silver(silver, silver_path)
        bad = parse_failures(bronze).select(
            "id",
            "tx_hash",
            "chain",
            "raw_metadata",
            # all-null corrupt-line rows (PERMISSIVE read) carry no
            # payload at all; label them distinctly. They collapse to
            # one null-id representative in the idempotent sink — they
            # are indistinguishable by construction.
            F.when(
                F.col("raw_metadata").isNull(), "corrupt bronze line"
            )
            .otherwise("unparseable raw_metadata")
            .alias("reason"),
            (audit_ts if audit_ts is not None else F.current_timestamp()).alias(
                "quarantined_at"
            ),
        )
        n_bad = idempotent_append(bad, quarantine_path, id_col="id")
    finally:
        bronze.unpersist()
    return n_silver, n_bad


def write_silver(df: DataFrame, path: str) -> int:
    """Silver ledger: partitioned by entry date; wallet_address carried
    denormalized (the reference's add_wallet_to_ledger migration made
    the same layout call for its serving reads)."""
    with_date = df.withColumn("entry_date", F.to_date(F.col("created_at")))
    return idempotent_append(with_date, path, id_col="id", partition_by=("entry_date",))
