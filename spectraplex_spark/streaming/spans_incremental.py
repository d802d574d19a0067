"""Incremental repeated-span detection — the streaming member of the
span family (operators/spans.py), under the same discipline as the
incremental near-dup gates (streaming/neardup.py): persistent
partition-pruned parquet state, a ``_config`` sidecar pinning the
parameters the index rows are only meaningful under, and
replay-idempotent appends for at-least-once transports.

Per micro-batch, the gate answers: *which token spans of THIS batch's
documents are repeated against everything ingested so far (previous
batches AND this batch — including a gram occurring twice inside one
new doc)?* That is the ingest-time boilerplate detector: headers /
license blocks / templated paragraphs light up as soon as their second
occurrence arrives. Retroactive spans of PREVIOUS batches' docs (their
first occurrence only became "repeated" now) are by design not
re-emitted per batch — re-evaluating history is a batch run of
``operators.spans.repeated_spans`` over the corpus, which shares this
index's gram pass.

State shape & cost per batch (measured flat, the neardup.py property):
  - ``{index_dir}/grams``: (id=doc:pos, doc_id, pos, gram, _gb) —
    the positional gram stream, partitioned by a gram-hash bucket
    ``_gb`` so the repeated-gram probe PARTITION-PRUNES to the
    batch's buckets (the postings-index layout recipe);
  - one narrow positional-shingle pass over the batch, one idempotent
    append, one pruned groupBy over the probed buckets, one per-doc
    islands window over batch hits only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from spectraplex_spark.operators.spans import positional_shingles
from spectraplex_spark.sources.io import _target_exists, idempotent_append
from spectraplex_spark.streaming.index_state import ensure_index_config

GRAM_BUCKETS = 64


def spans_filter_batch(
    batch: DataFrame,
    index_dir: str,
    k: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    n_buckets: int = GRAM_BUCKETS,
) -> DataFrame:
    """One micro-batch through the span gate: append the batch's gram
    positions to the index (replay-idempotent), then return
    (doc_id, span_start, span_end) for the batch's docs whose k-grams
    occur >= min_count times across the whole ingested history.
    Callable directly for batch ingestion; ``stream_spans_report``
    wraps it for foreachBatch."""
    spark = batch.sparkSession
    grams_path = f"{index_dir}/grams"
    ensure_index_config(
        spark,
        index_dir,
        {
            "kind": "repeated-span-grams",
            "k": k,
            "n_buckets": n_buckets,
            "tokenizer": "ws-lower-v1",
            # string grams, not polynomial hashes: the gate's verdicts
            # are exact (a 31-bit hash collision would mint a false
            # span); at 100 TB flip to the hashed stream knowingly.
            "grams": "string",
        },
    )
    bg = (
        batch.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(positional_shingles(F.col(text_col), k)).alias("pos", "gram"),
        )
        .withColumn("_gb", F.pmod(F.xxhash64("gram"), F.lit(n_buckets)))
        .withColumn("id", F.concat_ws(":", "doc_id", "pos"))
        .localCheckpoint(eager=False)  # read by the append AND the probe
    )
    idempotent_append(bg, grams_path, id_col="id", partition_by=("_gb",))
    if not _target_exists(spark, grams_path):
        # every doc so far was shorter than k — nothing indexed yet
        return spark.createDataFrame(
            [], "doc_id long, span_start long, span_end long"
        )
    # Probe: counts for the batch's grams over the FULL history — the
    # _gb IN (...) predicate partition-prunes the index scan to the
    # batch's buckets, then the gram filter is a pruned-scan semi-join.
    wanted = [r["_gb"] for r in bg.select("_gb").distinct().collect()]
    idx = (
        spark.read.parquet(grams_path)
        .filter(F.col("_gb").isin(wanted))
        .join(bg.select("gram").distinct(), "gram", "left_semi")
    )
    repeated = (
        idx.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("gram")
    )
    hits = bg.join(repeated, "gram", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(k)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    return (
        hits.withColumn(
            "_island", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("doc_id", "_island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k)).cast("long").alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def stream_spans_report(
    docs_stream: DataFrame,
    report_path: str,
    index_dir: str,
    checkpoint_dir: str,
    **kwargs,
):
    """foreachBatch wrapper: each micro-batch's detected spans land
    idempotently at ``report_path`` (id = doc:start so a replayed
    batch re-detecting the same span appends nothing)."""

    def _one_batch(batch_df: DataFrame, batch_id: int) -> None:
        spans = spans_filter_batch(batch_df, index_dir, **kwargs)
        idempotent_append(
            spans.withColumn(
                "id", F.concat_ws(":", "doc_id", "span_start")
            ),
            report_path,
            id_col="id",
        )

    return (
        docs_stream.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
