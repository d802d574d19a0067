"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the spectraplex_spark query catalog
(``spectraplex_spark/plans``): every implemented operator from
SURVEY.md §2 is a named query; SQL-expressible ones carry a DuckDB
oracle twin with identically-aliased columns.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spectraplex_spark.plans import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q3-shaped
    join+agg+top-k (broadcast dim, shuffle join, TakeOrderedAndProject)."""
    return CATALOG["q3_shipping_priority"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins (omitted entries → driver rows-only check)."""
    return {name: q.oracle for name, q in CATALOG.items() if q.oracle is not None}
