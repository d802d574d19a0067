"""Sketch-class operators (the mandate's "novel sketch" slot, SURVEY
§2.11): bounded-state approximate summaries plus a distributed heavy-
hitters operator whose final answer is EXACT.

Design stance for 100 TB:
  - Spark's own mergeable sketches (HyperLogLog++ behind
    ``approx_count_distinct``, KLL-style ``percentile_approx``) already
    do map-side partial aggregation — use them, don't reimplement.
  - Heavy hitters get the two-pass shape streaming systems use:
    per-partition Misra-Gries candidate generation (bounded memory, one
    pass, no shuffle) followed by an exact recount of the (tiny)
    candidate set. The MG superset guarantee makes pass 2's output
    exactly the items at/above the threshold — an approximate algorithm
    arranged so the final answer is exact, and therefore DuckDB
    oracle-verifiable.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def approx_event_profile(
    df: DataFrame,
    group_col: str = "event_type",
    distinct_col: str = "user_id",
    value_col: str = "value",
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group sketch summary: HLL++ distinct count (relative std dev
    ``rsd``) + KLL-style p50/p95. Both sketches merge associatively, so
    the plan is one partial-agg shuffle regardless of scale; pytest
    bounds the error against exact twins (no oracle — approximate by
    construction)."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(distinct_col, rsd=rsd).alias("approx_distinct"),
        F.percentile_approx(value_col, 0.5, 10_000).alias("p50"),
        F.percentile_approx(value_col, 0.95, 10_000).alias("p95"),
    )


def frequent_items(
    df: DataFrame,
    item_col: str,
    one_in: int = 200,
    capacity_factor: int = 4,
) -> DataFrame:
    """EXACT heavy hitters: every item occurring in at least 1-in-
    ``one_in`` rows, with its exact count — computed without ever
    shuffling full per-item state.

    Pass 1 (narrow, bounded memory): each partition runs Misra-Gries
    with ``capacity_factor * one_in`` counters and emits its surviving
    candidate items. Pigeonhole: an item with global count ≥ n/one_in
    has count_p ≥ n_p/one_in in some partition, and MG with k counters
    keeps any item with count_p > n_p/(k+1) — the factor-4 capacity
    margin guarantees survival, so the union of candidates is a SUPERSET
    of the true heavy hitters.
    Pass 2: candidates (a few hundred items) broadcast back; exact
    counts for just those items; threshold filter. False positives die
    here, so the result is exactly the ≥-threshold items. The threshold
    ``ceil(n / one_in)`` is computed in integer arithmetic — identical
    in the DuckDB oracle (a float 0.005*n would round differently).
    """
    k = capacity_factor * one_in

    def mg_candidates(batches):
        counters: Counter = Counter()
        for pdf in batches:
            for item in pdf[item_col]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all; drop zeros (the MG eviction step)
                    for key in list(counters):
                        counters[key] -= 1
                        if counters[key] == 0:
                            del counters[key]
        yield pd.DataFrame({item_col: list(counters.keys())})

    schema = df.select(item_col).schema
    cands = (
        df.select(item_col)
        .mapInPandas(mg_candidates, schema)
        .dropDuplicates([item_col])
    )
    n = df.count()
    threshold = (n + one_in - 1) // one_in
    return (
        df.join(F.broadcast(cands), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= threshold)
    )
