"""Config sidecar for the persistent near-dup indexes.

The incremental gates (streaming/neardup.py, streaming/neardup_embedding.py)
keep their LSH state as append-only parquet. Index rows are only
meaningful under the exact parameters that produced them: a batch run
with a different ``num_hashes``/``bands``/``shingle_n`` computes
band hashes the index never contains (silently stops matching
near-dups), and flipping ``verify_on_text`` changes the ``_h`` payload
between hashed-long and string arrays (the array_intersect verify then
fails on a type mismatch). Nothing in the parquet itself enforces that
bit-compatibility across calls or restarts — this sidecar does.

Protocol: a one-row parquet dataset at ``{index_dir}/_config`` written
once when the index is first created, and asserted against the incoming
parameters at the top of every batch call. Parquet (not a bare JSON
file) so the sidecar rides the same filesystem abstraction as the index
itself — any scheme the SparkSession can read/write, no local-FS
assumption, and the probe costs a footer-only schema read plus a
one-row scan per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from spectraplex_spark.sources.io import _target_exists


def read_index_config(spark: SparkSession, index_dir: str) -> dict[str, str] | None:
    """The stored sidecar as a dict (string values), or None if the
    index has never been created. Lets a caller recover persisted
    parameters (e.g. the embedding gate's vector dimension) instead of
    re-probing them from batch data."""
    path = f"{index_dir}/_config"
    if not _target_exists(spark, path):
        return None
    return {r["key"]: r["value"] for r in spark.read.parquet(path).collect()}


def ensure_index_config(
    spark: SparkSession, index_dir: str, config: dict[str, object]
) -> None:
    """Assert ``config`` matches the sidecar at ``index_dir``, writing
    the sidecar first if the index is brand new.

    Values are compared as strings (parquet round-trip keeps the
    key/value frame a single stable string,string schema regardless of
    the parameter types). Raises ``ValueError`` naming every mismatched
    parameter — the caller should either restore the original
    parameters or rebuild the index from scratch.
    """
    path = f"{index_dir}/_config"
    want = {k: str(v) for k, v in config.items()}
    if _target_exists(spark, path):
        stored = {
            r["key"]: r["value"] for r in spark.read.parquet(path).collect()
        }
        if stored != want:
            diffs = sorted(set(stored) | set(want))
            detail = ", ".join(
                f"{k}: index={stored.get(k, '<absent>')!r} call={want.get(k, '<absent>')!r}"
                for k in diffs
                if stored.get(k) != want.get(k)
            )
            raise ValueError(
                f"near-dup index at {index_dir!r} was built with different "
                f"parameters than this call ({detail}); index rows are only "
                "bit-compatible under the original parameters — rerun with "
                "them, or rebuild the index from scratch."
            )
        return
    # First creation: write the sidecar BEFORE any index append. A crash
    # after this write but before the first append leaves config-only
    # state, which the next call treats as "new index, params already
    # pinned" — consistent either way.
    spark.createDataFrame(
        sorted(want.items()), "key string, value string"
    ).coalesce(1).write.mode("overwrite").parquet(path)
