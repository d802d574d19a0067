#!/usr/bin/env python
"""Benchmark harness: runs the catalog's headline queries (bench=True)
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Execution is forced through the noop sink (full plan runs, nothing
collected to the driver) — the honest way to time a distributed plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spectraplex_spark.plans import CATALOG  # noqa: E402
from spectraplex_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _drop_cached(spark) -> None:
    """Deterministically drop every cached artifact between timed runs.

    A bare ``spark.catalog.clearCache()`` right after the action returns
    races straggler task-end events still in the DAGScheduler queue —
    their accumulator updates then reference just-unregistered
    accumulators and stamp a benign-but-noisy ``Failed to update
    accumulator`` ERROR stack into every bench log (BENCH_r04 tail).
    Instead: wait for the scheduler's job queue to drain, clear the SQL
    cache, then blocking-unpersist every remaining persistent RDD
    (localCheckpoints included) so the next timed run starts cold with
    no async cleanup in flight.
    """
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    deadline = time.time() + 5.0
    while (
        tracker.getActiveJobsIds() or tracker.getActiveStageIds()
    ) and time.time() < deadline:
        time.sleep(0.05)
    # settle: task-END events for just-finished stages can still be in
    # the DAGScheduler event queue after the job/stage trackers read
    # empty — unregistering accumulators under them stamps a benign
    # 'Failed to update accumulator' ERROR into the log (r14 tail; the
    # r5 fix waited on jobs only, which no longer suffices once a query
    # carries AQE stage-retry straggler events).
    time.sleep(0.1)
    spark.catalog.clearCache()
    # py4j auto-converts the Java map to a dict-like view — iterate it
    # directly (a .toArray() here is an AttributeError, not a Java call)
    for jrdd in list(sc._jsc.getPersistentRDDs().values()):
        jrdd.unpersist(True)


def run_query(q, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    q.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    # Operators persist intermediates (shingle hashes, LSH signatures,
    # gated corpora) that live for the session; dropping them between
    # timed runs keeps every query cold-cache and stops early queries'
    # leftovers from pressuring the ones that run last.
    _drop_cached(spark)
    return dt


# min-of-N: first run pays one-time codegen/plan compile. N=3 since r8:
# cross-day machine-epoch noise reached ±40% on identical plans (r6
# recorded corpus_prep at 3.89s, the byte-identical plan measured
# 5.4-5.8s on r8's machine with zero load) — one extra sample per query
# costs ~15s total and reliably recovers the fastest steady-state run.
RUNS = 3


def main() -> None:
    # Size the shuffle to the data, not the core count: at sf<=1 the
    # whole working set is a few tens of MB, so 8 partitions beats 32
    # (~30% less scheduling overhead; AQE coalesces bytes but each
    # planned partition still costs a task). Scan splits at 16MB so an
    # 11MB file still parallelizes. On a real cluster both scale with
    # data volume — this is the local-mode instance of the same rule.
    spark = get_spark(
        "spectraplex_bench",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    # Known-benign log raciness (r14 tail; same class as the r5 fix):
    # a straggler task-end event arriving after its job already
    # completed (limit/take early-exit, AQE stage retry) updates
    # accumulators the ContextCleaner has unregistered, and
    # DAGScheduler stamps a full ERROR stack into the recorded tail.
    # Results/rc are unaffected — real failures RAISE in the driver
    # regardless of logging — so the bench process (only) quiets that
    # logger; engine sessions keep full scheduler logging.
    jvm = spark.sparkContext._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.scheduler.DAGScheduler",
        jvm.org.apache.logging.log4j.Level.FATAL,
    )
    # Pinned execution order matching BASELINE.md so round-over-round
    # numbers are comparable regardless of catalog registration order
    # (r3's graded-window reordering put normalize_throughput first and
    # it absorbed session warmup).
    BENCH_ORDER = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_region_revenue",
        "join_broadcast_brand_revenue",
        "dedup_exact_docs",
        "simsearch_cosine_topk",
        "minhash_neardup_pairs",
        "normalize_throughput",
        "corpus_prep_pipeline",
    ]
    flagged = [q.name for q in CATALOG.values() if q.bench]
    assert set(flagged) == set(BENCH_ORDER), (
        f"bench set drifted from pinned order: {sorted(set(flagged) ^ set(BENCH_ORDER))}"
    )
    bench_queries = [CATALOG[n] for n in BENCH_ORDER]
    # JVM/codegen warmup on the tiny SF so measured times are steady-state
    for q in bench_queries:
        q.builder(spark, WARMUP_DIR).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    shuffles: dict[str, int] = {}
    plan_breaks: dict[str, int] = {}
    roundrobins: dict[str, int] = {}
    for q in bench_queries:
        timings[q.name] = round(min(run_query(q, spark, SF_DIR) for _ in range(RUNS)), 4)
        # shuffle-consciousness evidence: exchanges in the executed plan.
        # CAVEAT recorded alongside: a localCheckpoint boundary replaces
        # its upstream plan with an ExistingRDD scan, so exchanges paid
        # INSIDE checkpointed segments don't appear in this string —
        # plan_breaks counts those boundaries so a drop in the shuffle
        # number can be told apart from a genuinely removed exchange.
        try:
            plan = (
                q.builder(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
            )
            # real data shuffles only: broadcasts ship a dim to every
            # executor once and are the cheap path, not a shuffle
            shuffles[q.name] = plan.count("Exchange hashpartitioning")
            plan_breaks[q.name] = plan.count("ExistingRDD")
            # round-robin placement exchanges (the opt-in scan spread)
            # are not data shuffles but DO cost a stage — counted
            # separately since r15 so plan cost is no longer invisible
            # when hash-exchange signatures stay flat (r14 verdict §5).
            roundrobins[q.name] = plan.count("Exchange RoundRobinPartitioning")
        except Exception:
            shuffles[q.name] = -1
            plan_breaks[q.name] = -1
            roundrobins[q.name] = -1

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
                "runs": RUNS,
                "shuffles": shuffles,
                "plan_breaks": plan_breaks,
                "roundrobin_exchanges": roundrobins,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
