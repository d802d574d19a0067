"""Connected components over a pair/edge list — the iterative-algorithm
class (label propagation), used to turn near-duplicate PAIRS into
dedup GROUPS: if A~B and B~C, all three are one duplicate cluster even
when A~C was never emitted by LSH.

Algorithm: iterative min-label propagation. Each node starts labeled
with itself; every round, each node adopts the smallest label among
itself and its neighbors; converged when no label changes. Rounds are
O(graph diameter) — near-dup clusters are small and dense, so this
converges in 2-4 rounds in practice. Each round is one join + one
aggregation (two shuffles on node id); no driver-side graph state, so
it scales with the edge list. This is the DataFrame re-expression of
GraphX/graphframes connected components (public algorithm).

The checkpoint/persist per round truncates the lineage — without it the
plan doubles every iteration and the job dies of planning time long
before data size matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """(node, component) for every node in the edge list; component =
    min node id in the connected component."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    # localCheckpoint (not persist): truncates lineage each round —
    # an iterative plan otherwise grows by two joins per iteration and
    # planning time explodes long before data size matters.
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def neardup_groups(pairs: DataFrame) -> DataFrame:
    """Near-dup pairs → (component, n_docs, members sorted) groups."""
    comps = connected_components(pairs)
    return (
        comps.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list("node")).alias("members"),
        )
    )


def dedup_keep_representative(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Remove near-duplicates: keep only the min-id representative of
    each duplicate cluster (plus all documents that appear in no pair)."""
    comps = connected_components(pairs)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
