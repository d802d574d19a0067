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
trajectory. By DEFAULT (``conserve_dangling=True``, flipped in r12 once
the conserving variant carried its own graded entry — r11 verdict task
#5) the ranks are a true probability on the grid: dangling-node mass is
shared uniformly and floor residuals are returned largest-remainder
style, so Σ rank_q == scale after every round.  The legacy
ranking-prior mode (``conserve_dangling=False``) DROPS dangling mass
and floor losses — total mass decays slightly; it remains for rank-
order-only consumers (one fewer bounded aggregate per round) and for
the original ``pagerank_ranks`` graded trajectory. Fixed iteration count (no float convergence
test — same rationale as kmeans_fit_predict's fixed ``iters``).

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
    conserve_dangling: bool = True,
) -> DataFrame:
    """(node, rank_q) after ``iters`` exact integer PageRank rounds
    over the distinct edge list (self-loops allowed but pointless;
    duplicate edges collapse). rank_q is on the 1/scale grid.

    ``conserve_dangling=True`` (r10 verdict task #4; the DEFAULT since
    r12) makes the ranks a true probability on the grid: Σ rank_q ==
    scale EXACTLY after every round.  Three leaks are plugged, each
    deterministically:

      - dangling-node mass (nodes with no out-edges) is redistributed
        uniformly — one extra bounded aggregate per round (a 1-row
        dangling-mass sum, cross-joined back broadcast);
      - per-round floor losses (teleport base, per-edge contributions,
        the dangling share) are summed as ``residual = scale − Σ pre``
        and returned uniformly: every node gets ``residual div N`` and
        the first ``residual mod N`` nodes BY NODE ORDER get +1 (the
        largest-remainder trick — portable SQL, so the DuckDB oracle
        replays it bit-for-bit);
      - the initial vector gets the same ``scale mod N`` top-up, so the
        invariant holds from round 0.

    Node order is loop-invariant, so the global row_number sort runs
    ONCE over the narrow node frame (checkpointed) and is hash-joined
    per round (nodes ≪ edges; the edge join and the dst aggregation —
    the actual data-volume work — stay fully distributed).  Cost per
    round vs the default: one 1-row anti-join aggregate, one 1-row
    total, one node-keyed join against the precomputed order.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    # One scan + distinct-shuffle over the raw edges, materialized once:
    # deg, nodes and edeg all derive from the truncated frame.
    ed = lineage_truncate(
        edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v")).distinct(),
        reliable_checkpoint,
    )
    deg = ed.groupBy("_u").agg(F.count(F.lit(1)).alias("_outd"))
    nodes = (
        ed.select(F.col("_u").alias("node"))
        .unionByName(ed.select(F.col("_v").alias("node")))
        .distinct()
    )
    # Loop-invariant frames truncated ONCE before the loop: every
    # iteration's plan re-embedded the raw edges.distinct + degree
    # subtree otherwise (Catalyst compiles each round's lineage fresh;
    # exchange reuse is per-physical-plan only), so iters rounds paid
    # iters redundant passes over the LARGEST frame in the job — the
    # exact cost the docstring's "pre-joined with out-degrees once"
    # claimed away (r14 review finding; nr already had the fix).
    deg = lineage_truncate(deg, reliable_checkpoint)
    nodes = lineage_truncate(nodes, reliable_checkpoint)
    edeg = lineage_truncate(ed.join(deg, "_u"), reliable_checkpoint)
    n = nodes.count()  # one scalar of driver state
    if n == 0:
        return nodes.withColumn("rank_q", F.lit(None).cast("long"))
    init = scale // n
    base = (((100 - damping_pct) * scale) // 100) // n

    if conserve_dangling:
        # Node order is loop-invariant: pay the global row_number sort
        # ONCE (over the narrow 2-column node frame), checkpoint it, and
        # hash-join it per round — not one single-partition sort per
        # iteration. (The per-round exchanges on "node" co-partition with
        # the dst aggregation's key, so the join adds no extra shuffle.)
        from pyspark.sql.window import Window

        nr = lineage_truncate(
            nodes.select(
                "node", F.row_number().over(Window.orderBy("node")).alias("_rn")
            ),
            reliable_checkpoint,
        )
        ranks = nr.select(
            "node",
            (F.lit(init) + F.when(F.col("_rn") <= scale % n, 1).otherwise(0))
            .cast("long")
            .alias("rank_q"),
        )
    else:
        ranks = nodes.select("node", F.lit(init).cast("long").alias("rank_q"))
    for _ in range(iters):
        contrib = edeg.join(
            ranks.withColumnRenamed("node", "_u"), "_u"
        ).select(
            F.col("_v").alias("node"),
            F.expr(f"(({damping_pct} * rank_q) div 100) div _outd").alias("_c"),
        )
        agg = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        if conserve_dangling:
            # (1) dangling mass, damped, shared uniformly (1-row aggregate)
            dang = (
                ranks.join(deg.select(F.col("_u").alias("node")), "node", "left_anti")
                .agg(F.coalesce(F.sum("rank_q"), F.lit(0)).cast("long").alias("_dm"))
            )
            pre = (
                nr.join(agg, "node", "left")
                .crossJoin(F.broadcast(dang))
                .select(
                    "node",
                    "_rn",
                    (
                        F.lit(base)
                        + F.coalesce(F.col("_s"), F.lit(0))
                        + F.expr(f"(({damping_pct} * _dm) div 100) div {n}")
                    )
                    .cast("long")
                    .alias("_pre"),
                )
            )
            # (2) return ALL floor losses: residual = scale − Σ pre ≥ 0
            # (every term floors an exact decomposition of scale), spread
            # largest-remainder style so Σ rank_q == scale exactly.
            tot = pre.agg(F.sum("_pre").cast("long").alias("_tot"))
            ranks = lineage_truncate(
                pre.crossJoin(F.broadcast(tot)).select(
                    "node",
                    (
                        F.col("_pre")
                        + F.expr(f"({scale} - _tot) div {n}")
                        + F.when(
                            F.col("_rn") <= F.expr(f"({scale} - _tot) % {n}"), 1
                        ).otherwise(0)
                    )
                    .cast("long")
                    .alias("rank_q"),
                ),
                reliable_checkpoint,
            )
        else:
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
