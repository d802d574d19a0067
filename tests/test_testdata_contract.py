"""Loud contract check on the driver-provided test data.

The driver regenerated ``events.parquet`` between rounds 1 and 3 (nanos
timestamps → plain ``timestamp[us]``), which turned 14 catalog queries
into opaque AnalysisExceptions. This test pins the *loaded* dtypes of
every driver table so a future regeneration fails here with a named
assertion instead of deep inside a query plan.

``events.ts`` is normalized by ``plans.registry.table`` regardless of
how the file was written (raw nanos-as-long or native micros), so the
contract below is on the post-load schema — the one every catalog query
actually sees.
"""

from __future__ import annotations

import os

import pytest

from spectraplex_spark.plans import table
from spectraplex_spark.schemas import TESTDATA_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_CONTRACT_SF", "/root/testdata/sf0.001")

# (name, dataType.simpleString()) per table, as loaded via plans.table().
EXPECTED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp_ntz"),  # normalized by table() whether the file is nanos or micros
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


def test_expected_covers_all_driver_tables():
    assert set(EXPECTED) == set(TESTDATA_TABLES)


@pytest.mark.parametrize("name", sorted(TESTDATA_TABLES))
def test_loaded_dtypes_match_contract(spark, name):
    path = os.path.join(SF_DIR, f"{name}.parquet")
    assert os.path.exists(path), f"driver table missing: {path}"
    df = table(spark, SF_DIR, name)
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    if name == "events":
        # The nanos generation (int64 ts read via nanosAsLong) is rewritten
        # by table() through timestamp_micros(), which yields TIMESTAMP
        # (ltz), while the native-micros generation loads as TIMESTAMP_NTZ.
        # Both load fine and hash identically through the UTC-pinned
        # session, so the contract accepts either dtype for ts.
        got = [
            ("ts", "timestamp_ntz") if c == ("ts", "timestamp") else c for c in got
        ]
    assert got == EXPECTED[name], (
        f"test-data contract violated for table {name!r}: the driver appears to "
        f"have regenerated {path} with different dtypes.\n  expected: {EXPECTED[name]}\n  got:      {got}\n"
        "Audit plans/registry.table() (events ts normalization) and every "
        "catalog query touching the changed columns before re-grading."
    )


def test_events_loads_under_either_timestamp_generation(spark, tmp_path):
    """table() must normalize ts whether the parquet stores raw int64 nanos
    (the r1 generation, read via nanosAsLong) or native timestamps (the r3
    generation)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    nanos = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([1_700_000_000_000_000_000, 1_700_000_001_000_000_000], pa.int64()),
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    d = tmp_path / "gen_nanos"
    d.mkdir()
    pq.write_table(nanos, d / "events.parquet")
    df = table(spark, str(d), "events")
    assert df.schema["ts"].dataType.simpleString().startswith("timestamp")
    assert df.count() == 2
