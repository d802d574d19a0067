"""Query registry + table loading shared by the catalog modules."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver-provided parquet table (TESTDATA.md). Parquet scans
    get Catalyst column pruning + predicate pushdown for free; at 100 TB
    these would be partitioned datasets and the same reads partition-prune.

    ``events.ts`` is written as TIMESTAMP(NANOS), which Spark's vectorized
    reader refuses; we read it as raw nanos (runtime conf, safe to set on
    any session) and truncate to microseconds — exactly what DuckDB does
    when it reads the same file, so oracle comparisons stay exact.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
