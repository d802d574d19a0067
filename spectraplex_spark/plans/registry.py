"""Query registry + table loading shared by the catalog modules."""

from __future__ import annotations

import math
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_SIZE_UNITS = {"k": 1024, "m": 1024**2, "g": 1024**3}

# Tables whose scans root heavy per-row expression work (see
# _spread_unsplittable_scan). Everything else keeps its native split
# layout — spreading a broadcast dim or a join probe side measured
# strictly worse.
_SPREAD_TABLES = {"documents.parquet"}


def _max_partition_bytes(spark: SparkSession) -> int:
    raw = str(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    ).lower().rstrip("b")
    if raw and raw[-1] in _SIZE_UNITS:
        return int(raw[:-1]) * _SIZE_UNITS[raw[-1]]
    return int(raw)


def _spread_unsplittable_scan(
    spark: SparkSession, df: DataFrame, path: str, force: bool = False
) -> DataFrame:
    """Guide §2.5's unsplittable-input remedy, scale-guarded.

    The shipped test parquets are SINGLE-ROW-GROUP files, so a scan can
    never yield more than one task regardless of split configuration —
    every scan-rooted narrow stage (q1's 600k-row decimal partial
    aggregate, the corpus gate/shingle passes, the minhash signature)
    was serializing onto one core of local[32] (r14 optimization round;
    the r7 ledger's 78s→2.85s 'spread rows first' finding, generalized
    from one builder to the shared reader).

    Round-robin repartition to defaultParallelism, applied ONLY when
    the file layout cannot reach that parallelism on its own
    (estimated splits from on-disk bytes / maxPartitionBytes). At a
    production layout — files larger than maxPartitionBytes or many
    files per table — the guard makes this a structural no-op: no
    exchange is added, exactly as the guide prescribes ('fix at the
    source if you can'). Round-robin (not keyed) partitioning keeps
    hash-exchange counts untouched and adds no skew; Spark's default
    sort-before-repartition keeps row placement retry-deterministic.

    Applied per-table, not blanket: measured A/B on the bench showed
    the spread pays only where the scan roots HEAVY per-row compute
    (the documents text family: gates, shingles, signatures — and q1's
    600k-row decimal partial aggregate would qualify, but lineitem is
    also the probe side of the broadcast joins in q3/q5, where an added
    exchange of the filtered fact rows costs more than the parallelized
    aggregate saves: q3 0.64→1.13 s, q5 0.73→1.34 s in the blanket
    experiment). Dim/fact tables therefore stay unspread."""
    if not force and os.path.basename(path) not in _SPREAD_TABLES:
        return df
    target = spark.sparkContext.defaultParallelism
    try:
        if os.path.isdir(path):
            sizes = [
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if not f.startswith(("_", "."))
            ]
        else:
            sizes = [os.path.getsize(path)]
    except OSError:
        return df  # non-local storage: splits come from the layout
    if not sizes:
        return df
    maxpb = _max_partition_bytes(spark)
    est_splits = sum(max(1, math.ceil(s / maxpb)) for s in sizes)
    if est_splits >= target:
        return df
    return df.repartition(target)


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB ANSI SQL; None → rows-only check
    bench: bool = False  # part of the bench.py headline set
    doc: str = ""


CATALOG: dict[str, Query] = {}


def query(name: str, oracle: str | None, bench: bool = False, doc: str = ""):
    """Decorator registering a builder in the catalog."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = Query(name=name, builder=fn, oracle=oracle, bench=bench, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Load a driver-provided parquet table (TESTDATA.md). Parquet scans
    get Catalyst column pruning + predicate pushdown for free; at 100 TB
    these would be partitioned datasets and the same reads partition-prune.

    ``events.ts`` has shipped both as TIMESTAMP(NANOS) (which Spark's
    vectorized reader surfaces as raw nanos under the ``nanosAsLong``
    legacy conf) and as plain ``timestamp[us]`` across test-data
    generations.  We keep the conf set so a nanos file still loads, then
    guard the nanos→micros truncation on the dtype actually read: only a
    ``LongType`` column needs the rewrite.  DuckDB truncates nanos the
    same way, so oracle comparisons stay exact either way.
    """
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        # Set the legacy conf for THIS footer probe, and restore it
        # whenever the file turns out not to need it: leaving it set
        # session-globally leaked nanos-as-long semantics into every
        # later parquet read — a TIMESTAMP(NANOS) column in a checkpoint
        # read-back or user file would silently surface as raw int64
        # nanos far from this code (r14 review finding).  When the file
        # IS a nanos generation, the conf must stay set: the vectorized
        # reader consults it at EXECUTION time, so restoring it would
        # break the (lazy) scan later — that one necessary leak is the
        # documented trade, paid only on nanos-generation test data.
        prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        nanos = False
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            nanos = isinstance(df.schema["ts"].dataType, T.LongType)
            if nanos:
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        finally:
            if not nanos:
                if prior is None:
                    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
                else:
                    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
        return _spread_unsplittable_scan(
            spark, df, f"{sf_dir}/{name}.parquet", force=spread
        )
    path = f"{sf_dir}/{name}.parquet"
    return _spread_unsplittable_scan(
        spark, spark.read.parquet(path), path, force=spread
    )
