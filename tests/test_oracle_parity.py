"""Local mirror of the driver's t2 correctness gate: run every catalog
query on Spark AND its DuckDB oracle, compare row count, column names,
and exact values (order-insensitive, columns sorted by name).

Stricter than the driver in one way: values are compared exactly
(after normalizing Decimal scale and timestamp types), so any pass here
implies a driver hash match.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pytest

from spectraplex_spark.plans import CATALOG
from spectraplex_spark.schemas import TESTDATA_TABLES

from tests.conftest import SF_DIR_ORACLE

ORACLE_QUERIES = sorted(name for name, q in CATALOG.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, q in CATALOG.items() if q.oracle is None)


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", v.normalize())
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", v)
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("ts", datetime.datetime(v.year, v.month, v.day).isoformat())
    return (type(v).__name__ if not isinstance(v, (int, bool, str, bytes)) else "v", v)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, ddb, name):
    q = CATALOG[name]
    sdf = q.builder(spark, SF_DIR_ORACLE)
    spark_cols = sorted(c.lower() for c in sdf.columns)
    spark_rows = sdf.collect()

    res = ddb.execute(q.oracle)
    duck_cols_raw = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    duck_cols = sorted(c.lower() for c in duck_cols_raw)

    assert spark_cols == duck_cols, f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row counts differ"
    a = _canon([tuple(r) for r in spark_rows], [c.lower() for c in sdf.columns])
    b = _canon(duck_rows, [c.lower() for c in duck_cols_raw])
    for i, (ra, rb) in enumerate(zip(a, b)):
        assert ra == rb, f"{name}: first differing row #{i}:\n spark={ra}\n duck ={rb}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    """No-oracle ops must at least execute and return a stable schema."""
    df = CATALOG[name].builder(spark, SF_DIR_ORACLE)
    assert df.columns
    df.collect()
