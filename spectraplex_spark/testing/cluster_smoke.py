"""Multi-executor smoke: run flagship catalog queries on a REAL
multi-process cluster (``local-cluster[2,2,…]`` — separate executor
JVMs + separate Python workers) and digest the results, so the suite
catches single-process assumptions the local[n] tests can't see:
broadcast values crossing process boundaries, localCheckpoint block
visibility, Python-worker env/serialization propagation, Arrow batch
transfer to remote pythons.

A JVM hosts one SparkContext, so tests/test_cluster_smoke.py runs this
module as a SUBPROCESS (``python -m spectraplex_spark.testing.
cluster_smoke <sf_dir> <master>``) and compares its digests against
the in-process local-mode session's — execution-mode parity, not just
"it didn't crash".

Query battery (one per risk class):
  - q3_shipping_priority: broadcast dim + shuffle join + TakeOrdered
  - q1_pricing_summary: decimal hash aggregation (partial-agg merge
    across executor processes)
  - dedup_exact_docs: fingerprint shuffle + min-id survivor
  - nfc_dedup_groups: Arrow pandas UDF on remote Python workers
  - minhash_estimate_error: expression HOF pipeline, zero shuffle
  - minhash_neardup_pairs: lazy localCheckpoint blocks read back from
    MULTIPLE downstream stages — the block-visibility risk class
  - simsearch_cosine_topk: literal-vector scoring + global top-k
  - stream_interval_join_replay: Structured Streaming symmetric-hash
    join — state-store providers living in separate executor
    processes, checkpoint dir shared across them
  - epoch_tail_stream_roundtrip (r10): a PYTHON streaming Data Source
    on a real multi-process cluster — InputPartitions deserialized and
    read (pyarrow) by REMOTE Python workers, offsets planned on the
    driver
  - perceptron_quality_trajectory (r10): iterative literal-weight
    aggregation — per-epoch partial-agg merges across executor
    processes feeding driver-held weights
  - bpe_encode_pandas_topk (r10): mapInPandas with a closure-broadcast
    trained tokenizer on remote Python workers
  - unigram_trained_vocab (r11): hard-EM loop — per-iteration Arrow
    Viterbi on remote Python workers feeding vocab-sized driver
    collects, trajectory must be partition/process-order independent
  - pagerank_conserving_ranks (r11): per-round broadcast of 1-row
    aggregates (dangling mass, total) across executor processes plus
    the checkpointed node-order frame re-read by every round
  - wordpiece_trained_merges (r11 cont.): likelihood-scored argmax —
    per-iteration broadcast hash joins of the symbol-count frame onto
    the pair frame across executor processes, DECIMAL div exactness
    under partial-agg merge order
  - training_shuffle_shards (r11 cont.): two-phase distributed ranking
    — range-exchange boundary sampling, stamped-pid localCheckpoint
    blocks read back by two consumers, broadcast offset map; the rank
    must be identical to single-process execution BY CONSTRUCTION
"""

from __future__ import annotations

import hashlib
import json
import sys

QUERIES = [
    "q3_shipping_priority",
    "q1_pricing_summary",
    "dedup_exact_docs",
    "nfc_dedup_groups",
    "minhash_estimate_error",
    "minhash_neardup_pairs",
    "simsearch_cosine_topk",
    "stream_interval_join_replay",
    "epoch_tail_stream_roundtrip",
    "perceptron_quality_trajectory",
    "bpe_encode_pandas_topk",
    "unigram_trained_vocab",
    "pagerank_conserving_ranks",
    "wordpiece_trained_merges",
    "training_shuffle_shards",
    "hybrid_rrf_fusion",
    "stream_funnel_watermarked_replay",
]

DEFAULT_MASTER = "local-cluster[2,2,2048]"


def collect_digests(spark, sf_dir: str) -> dict[str, dict]:
    """Row count + order-independent md5 of every battery query's
    result (repr round-trips floats exactly, so identical values
    digest identically across processes)."""
    from spectraplex_spark.plans import CATALOG

    out: dict[str, dict] = {}
    for name in QUERIES:
        rows = CATALOG[name].builder(spark, sf_dir).collect()
        h = hashlib.md5(
            "\n".join(sorted(repr(tuple(r)) for r in rows)).encode()
        ).hexdigest()
        out[name] = {"rows": len(rows), "md5": h}
    return out


def run(sf_dir: str, master: str = DEFAULT_MASTER) -> dict[str, dict]:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(master)
        .appName("spectraplex_cluster_smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.executor.memory", "1536m")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        return collect_digests(spark, sf_dir)
    finally:
        spark.stop()


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    master = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_MASTER
    print("SMOKE_RESULT " + json.dumps(run(sf_dir, master), sort_keys=True))
