"""Realistic-vocab BPE training probe (the 10x-probe discipline,
BASELINE.md): the graded catalog entries train n_merges=10 over a
TPC-H-derived vocab — tiny on both axes. This probe trains at a REAL
tokenizer shape — >=1000 merges over a >=100k-distinct-word Zipf
vocab — and records the per-iteration cost curve, so the "per-iteration
cost is vocab-bound and flat" claim is measured, not asserted.

The corpus scan is one pass by construction (build_vocab), so the probe
constructs the word-frequency table directly (vocab_df input): 120k
distinct deterministic pseudo-words, Zipf frequencies (freq_i =
max(1, 200_000 // (i+1)), ~2.4M tokens), word lengths 4-11.

Per iteration the trainer runs (a) the vocab-sized pair-count shuffle +
k=1 TakeOrdered collect and (b) the touched-words-only re-segmentation
fold + persist/count. Expected curve: per-iteration time DROPS after
the early merges (the exists() guard confines the interpreted fold to
the shrinking touched slice) and then flattens at the fixed cost of two
vocab-cache scans + job overhead — flat-or-named growth, no
driver-side bottleneck (the only collect is the k=1 argmax).

Run:  PYTHONPATH=/root/repo python -m spectraplex_spark.testing.probe_bpe_scale [n_merges]
"""

from __future__ import annotations

import json
import sys
import time


def make_vocab(spark, n_words: int = 120_000, top_freq: int = 200_000):
    import pyspark.sql.functions as F

    alpha = "abcdefghijklmnopqrstuvwxyz"

    def word(i: int) -> str:
        x = (i * 2654435761) % (1 << 61)
        length = 4 + (i % 8)
        out = []
        for _ in range(length):
            out.append(alpha[x % 26])
            x //= 26
            x = (x * 1103515245 + 12345) % (1 << 61)
        return "".join(out)

    rows = [(word(i), max(1, top_freq // (i + 1))) for i in range(n_words)]
    # pseudo-words can collide; keep the max-freq copy so w is distinct
    df = (
        spark.createDataFrame(rows, "w string, freq long")
        .groupBy("w")
        .agg(F.max("freq").alias("freq"))
        .withColumn("symbols", F.split(F.col("w"), ""))
    )
    return df


def main(n_merges: int = 1000) -> dict:
    from spectraplex_spark.operators.bpe import bpe_train
    from spectraplex_spark.session import get_spark

    spark = get_spark("bpe_scale_probe")
    vocab = make_vocab(spark)
    n_distinct = vocab.count()
    times: list[float] = []
    t0 = time.monotonic()

    def obs(i, a, b, pf, secs):
        times.append(secs)
        if (i + 1) % 100 == 0:
            print(
                f"iter {i + 1:5d}  merge=({a!r},{b!r})  pair_freq={pf}  "
                f"{secs:.2f}s/iter  elapsed={time.monotonic() - t0:.0f}s",
                flush=True,
            )

    merges, final_vocab = bpe_train(
        None, n_merges=n_merges, min_freq=2, vocab_df=vocab, on_iteration=obs
    )
    final_vocab.unpersist()
    buckets = {}
    for s in range(0, len(times), 100):
        chunk = sorted(times[s : s + 100])
        buckets[f"{s + 1}-{s + len(chunk)}"] = {
            "median_s": round(chunk[len(chunk) // 2], 3),
            "p90_s": round(chunk[int(len(chunk) * 0.9)], 3),
            "total_s": round(sum(chunk), 1),
        }
    out = {
        "n_distinct_words": n_distinct,
        "n_merges_done": len(merges),
        "total_s": round(sum(times), 1),
        "last_pair_freq": merges[-1][2] if merges else None,
        "per_iteration_buckets": buckets,
    }
    print("BPE_PROBE_RESULT " + json.dumps(out, sort_keys=True), flush=True)
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000)
