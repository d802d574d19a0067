"""Snapshot reconciliation — the audit tool for idempotent sinks.

The medallion write protocol (sources/io.py) promises replays change
nothing; ``table_diff`` is how you PROVE it on real tables: a key-wise
full-outer join classifying every row as added / removed / changed
between two snapshots. One shuffle on the key columns; payload
comparison happens through a single md5 over the canonicalized value
concatenation, so wide tables compare with one hash column instead of
N comparisons riding the shuffle.

The payload hash goes through ``to_json(struct(...))`` — JSON-escaped,
column-delimited, null-distinguishing — so a value containing a
delimiter byte can never shift column boundaries and alias two
different rows to one hash (a plain concat_ws('\\x1f', ...) canonical
form had exactly that flaw). The hash never crosses engines: the
catalog's DuckDB oracle compares column values directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _row_hash(cols: list[str]):
    return F.md5(F.to_json(F.struct(*[F.col(c) for c in cols])))


def table_diff(
    before: DataFrame,
    after: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(keys..., diff_status) for every row that differs between the
    snapshots: ``added`` (only in after), ``removed`` (only in before),
    ``changed`` (same key, different payload). Unchanged rows are
    dropped — at scale the diff is small even when the tables are not.
    """
    compare = compare_cols or [c for c in after.columns if c not in key_cols]
    a = after.select(*key_cols, _row_hash(compare).alias("_ha"))
    b = before.select(*key_cols, _row_hash(compare).alias("_hb"))
    status = (
        F.when(F.col("_hb").isNull(), "added")
        .when(F.col("_ha").isNull(), "removed")
        .when(F.col("_ha") != F.col("_hb"), "changed")
        .otherwise("unchanged")
    )
    return (
        a.join(b, key_cols, "full_outer")
        .withColumn("diff_status", status)
        .filter(F.col("diff_status") != "unchanged")
        .select(*key_cols, "diff_status")
    )


def assert_replay_noop(before: DataFrame, after: DataFrame, key_cols: list[str]) -> None:
    """Raise if a replay changed anything — the idempotency audit."""
    diff = table_diff(before, after, key_cols)
    sample = diff.limit(5).collect()
    if sample:
        raise AssertionError(f"replay was not a no-op; first diffs: {sample}")
