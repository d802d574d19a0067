"""Iterative graph ranking — integer-exact PageRank over an edge list.

Rounds out the engine's iterative-algorithm classes (Lloyd's k-means:
bounded-state refit; label propagation: monotone min; BPE: global
argmax per step) with the damping/normalization class: per iteration
every node redistributes a damped share of its mass along its
out-edges. Web-curation motivation: link-graph centrality is a
standard quality prior for crawl corpora (harmonic/PageRank scores in
CommonCrawl-derived datasets decide which hosts are worth keeping).

Exactness contract (the repo-wide bit-grading discipline): ranks live
on a 1/scale integer grid and every step is BIGINT floor division —
  contrib(u→v) = (damping_pct · rank_q(u) div 100) div outdeg(u)
  rank_q'(v)   = base + Σ contribs,  base = ((100−damping_pct)·scale
                 div 100) div N
so Spark and the unrolled-CTE DuckDB oracle replay the identical
trajectory. Simplifications, documented: dangling-node mass is DROPPED
(not redistributed) and floor losses are not re-normalized — total
mass therefore decays slightly; fine for a RANKING prior, wrong for a
probability. Fixed iteration count (no float convergence test — same
rationale as kmeans_fit_predict's fixed ``iters``).

Scale shape: per iteration one edge-ranks join (edges pre-joined with
out-degrees once) and one partial-aggregated groupBy on dst; lineage
truncated per round (the connected_components discipline). Driver
state: a single node-count scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spectraplex_spark.operators.components import lineage_truncate


def pagerank_integer(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """(node, rank_q) after ``iters`` exact integer PageRank rounds
    over the distinct edge list (self-loops allowed but pointless;
    duplicate edges collapse). rank_q is on the 1/scale grid."""
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    ed = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v")).distinct()
    deg = ed.groupBy("_u").agg(F.count(F.lit(1)).alias("_outd"))
    nodes = (
        ed.select(F.col("_u").alias("node"))
        .unionByName(ed.select(F.col("_v").alias("node")))
        .distinct()
    )
    edeg = ed.join(deg, "_u")
    n = nodes.count()  # one scalar of driver state
    if n == 0:
        return nodes.withColumn("rank_q", F.lit(None).cast("long"))
    init = scale // n
    base = (((100 - damping_pct) * scale) // 100) // n
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank_q"))
    for _ in range(iters):
        contrib = edeg.join(
            ranks.withColumnRenamed("node", "_u"), "_u"
        ).select(
            F.col("_v").alias("node"),
            F.expr(f"(({damping_pct} * rank_q) div 100) div _outd").alias("_c"),
        )
        agg = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        ranks = lineage_truncate(
            nodes.join(agg, "node", "left").select(
                "node",
                (F.lit(base) + F.coalesce(F.col("_s"), F.lit(0)))
                .cast("long")
                .alias("rank_q"),
            ),
            reliable_checkpoint,
        )
    return ranks
