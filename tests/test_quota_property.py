"""Property tests for round-8 exactness contracts: the two-phase
hot-source quota must equal the one-window form on ARBITRARY skew
shapes and parameters, and merge_upsert's escaped partition swap must
survive arbitrary special-character partition values.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spectraplex_spark.operators.textops import (
    cap_per_source,
    cap_per_source_scalable,
)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=5),
    n=st.integers(min_value=1, max_value=7),
    hot_factor=st.integers(min_value=1, max_value=8),
    safety=st.integers(min_value=1, max_value=8),
)
def test_two_phase_quota_equals_window_form(_spark, sizes, n, hot_factor, safety):
    """Identical survivors for every skew shape, cap, hotness cutoff
    and safety margin — including margins small enough to force the
    provable-fallback path."""
    rows = [
        (src * 1000 + i, f"s{src}")
        for src, count in enumerate(sizes)
        for i in range(count)
    ]
    df = _spark.createDataFrame(rows, "doc_id long, source string")
    want = {(r["source"], r["doc_id"]) for r in cap_per_source(df, n).collect()}
    got = {
        (r["source"], r["doc_id"])
        for r in cap_per_source_scalable(
            df, n, hot_factor=hot_factor, safety=safety
        ).collect()
    }
    assert got == want


_PART_VALUES = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="\x00/",  # tar/dir separators aside, anything goes
        min_codepoint=1,
        max_codepoint=0x2FF,
    ),
    min_size=0,
    max_size=8,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(values=st.lists(_PART_VALUES, min_size=1, max_size=3, unique=True))
def test_merge_swap_survives_arbitrary_partition_values(_spark, values, tmp_path_factory):
    """Whatever the partition VALUE spells (colons, percent signs,
    quotes, NULL/empty → Hive sentinel), the swap must find the
    directory Spark's writer actually created: every seeded key must
    reflect its upsert."""
    from spectraplex_spark.sources.merge import merge_upsert

    path = str(tmp_path_factory.mktemp("mrg") / "t")
    rows = [(i, f"v{i}", v) for i, v in enumerate(values)]
    _spark.createDataFrame(rows, "k long, v string, part string").write.partitionBy(
        "part"
    ).parquet(path)
    updates = _spark.createDataFrame(
        [(i, f"v{i}_new", v, "upsert") for i, v in enumerate(values)],
        "k long, v string, part string, _op string",
    )
    stats = merge_upsert(_spark, path, updates, "k", partition_col="part")
    assert stats["upserted"] == len(values)
    got = {r["k"]: r["v"] for r in _spark.read.parquet(path).collect()}
    assert got == {i: f"v{i}_new" for i in range(len(values))}
    assert not [d for d in os.listdir(os.path.dirname(path)) if "__staged" in d]


def test_scalable_keeps_null_id_rows_like_the_window_form(_spark):
    """Review finding r12 (confirmed live before the fix): md5(NULL) is
    NULL, so NULL-doc_id rows of a HOT source fell out of both the
    survivor filter and the fallback complement — the scalable form
    kept different rows than the window form. NULL keys sort first in
    the window order, so both forms must keep them."""
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.textops import (
        cap_per_source,
        cap_per_source_scalable,
    )

    rows = [(i, "hot") for i in range(200)] + [(None, "hot"), (None, "hot")]
    rows += [(1000 + i, "cold") for i in range(3)]
    df = _spark.createDataFrame(rows, "doc_id long, source string")

    def keyset(out):
        return sorted(
            ((r["doc_id"] if r["doc_id"] is not None else -1, r["source"])
             for r in out.collect())
        )

    a = keyset(cap_per_source(df, n_per_source=5))
    b = keyset(cap_per_source_scalable(df, n_per_source=5, hot_factor=16))
    assert a == b
    assert sum(1 for i, s in a if i == -1 and s == "hot") == 2  # NULLs kept
