"""Distributed integer-exact linear-classifier training (batch
perceptron) — the quality-classifier training loop (fastText-style
doc-quality filters are trained ON the corpus the pipeline curates;
cf. reference's quality gates, api/src/main.rs scoring surface) as the
catalog's fifth iterative-algorithm class, after k-means, label
propagation, BPE and PageRank.

Why a BATCH perceptron and why integers:

  - The classic per-row perceptron is sequential (each update depends
    on the previous row's weights) — unimplementable without a total
    order, and order-dependent results cannot bit-grade. The BATCH
    variant updates once per epoch with the SUM of y_i·x_i over all
    currently-misclassified rows: a plain aggregation, commutative and
    partition-order-independent, so the whole weight trajectory is
    deterministic on any cluster layout.
  - Integer features + unit learning rate keep every margin, update
    and weight in BIGINT — exact on both engines (the pq/sq/bq
    integer-grid discipline), where a float sigmoid/logistic path
    would FMA-drift cross-engine.

Scale shape at 100 TB: the feature projection is ONE narrow pass,
checkpointed (scan-once, flat lineage — the iterative-algorithm
discipline from bpe/components/graph); each epoch is one
partial-aggregated scan of the cached k+1 columns with the epoch's
weights inlined as LITERALS (no lineage growth, no join), and the only
driver traffic is k+1 scalars per epoch — the bounded-collect
contract, same as BPE's k=1 argmax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def perceptron_trajectory(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    epochs: int = 3,
) -> DataFrame:
    """Train a batch perceptron for ``epochs`` rounds and return the full
    weight TRAJECTORY — one row per epoch: ``(epoch, n_mis, w0..wk-1)``
    where ``n_mis`` is the number of misclassified rows the update saw
    and ``w*`` are the weights AFTER that epoch's update.

    Contract: every feature column must be integral (cast to BIGINT
    here), the label must be exactly ±1, and the caller supplies its
    own bias column (a literal 1) if it wants one. Update rule with
    unit rate:  w ← w + Σ_{y·(w·x) ≤ 0} y·x  — rows ON the boundary
    (margin 0, including the all-zero first epoch) count as
    misclassified, the standard convention that makes epoch 1 a pure
    class-imbalance step. Exact BIGINT end to end.
    """
    k = len(feature_cols)
    feats = df.select(
        F.col(label_col).cast("long").alias("_y"),
        *[F.col(c).cast("long").alias(f"_x{j}") for j, c in enumerate(feature_cols)],
    ).localCheckpoint(eager=True)

    w = [0] * k
    rows: list[tuple] = []
    for e in range(1, epochs + 1):
        margin = F.lit(0).cast("long")
        for j in range(k):
            margin = margin + F.lit(w[j]) * F.col(f"_x{j}")
        mis = (F.col("_y") * margin) <= 0
        got = feats.agg(
            *[
                F.sum(F.when(mis, F.col("_y") * F.col(f"_x{j}"))).alias(f"d{j}")
                for j in range(k)
            ],
            F.count(F.when(mis, F.lit(1))).cast("long").alias("nm"),
        ).collect()[0]  # bounded: k+1 scalars per epoch
        w = [w[j] + int(got[f"d{j}"] or 0) for j in range(k)]
        rows.append((e, int(got["nm"]), *w))

    schema = "epoch int, n_mis long, " + ", ".join(f"w{j} long" for j in range(k))
    return df.sparkSession.createDataFrame(rows, schema)
