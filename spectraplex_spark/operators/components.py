"""Connected components over a pair/edge list — the iterative-algorithm
class (label propagation), used to turn near-duplicate PAIRS into
dedup GROUPS: if A~B and B~C, all three are one duplicate cluster even
when A~C was never emitted by LSH.

Algorithm: iterative min-label propagation with ADAPTIVE pointer
jumping (path halving). Each node starts labeled with itself; every
round, each node adopts the smallest label among itself and its
neighbors. The first two rounds run plain propagation (dense star/
clique dup-clusters converge there at one join+agg per round); if
labels are still changing, later rounds add the jump — component :=
label(component) — making convergence O(log diameter) so path-shaped
duplicate graphs (A~B~C~... similarity chains) can't stall the loop.
No driver-side graph state, so it scales with the edge list. This is
the DataFrame re-expression of the classic pointer-doubling / GraphX
connected components (public algorithm).

The checkpoint/persist per round truncates the lineage — without it the
plan doubles every iteration and the job dies of planning time long
before data size matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def lineage_truncate(frame: DataFrame, reliable: bool = False) -> DataFrame:
    """Truncate a frame's lineage for iterative / multi-read reuse.

    ``reliable=False`` → ``localCheckpoint``: executor-local blocks,
    freed by the ContextCleaner, no checkpoint dir needed — but blocks
    do NOT recompute on executor loss (moot single-JVM; the documented
    trade everywhere this family runs locally). ``reliable=True`` → a
    RELIABLE checkpoint to the SparkContext's checkpoint dir (the
    caller must have pointed ``setCheckpointDir`` at fault-tolerant
    storage): on a preemptible-node cluster a lost block becomes a
    storage re-read instead of a failed job. Both are lazy
    (``eager=False``) so plan construction stays side-effect free and
    the first action doubles as the materialization."""
    if reliable:
        if frame.sparkSession.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                "reliable_checkpoint=True needs "
                "spark.sparkContext.setCheckpointDir(<fault-tolerant dir>) first"
            )
        return frame.checkpoint(eager=False)
    return frame.localCheckpoint(eager=False)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    edges_deduped: bool = False,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """(node, component) for every node in the edge list; component =
    min node id in the connected component.

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iter`` rounds — silently returning unconverged labels would
    split one duplicate cluster into several and let near-dups through.
    With pointer jumping, max_iter=20 covers diameters up to ~2^20; a
    graph that still fails deserves a loud failure, not a wrong answer.

    ``edges_deduped``: promise that the edge list is already distinct
    with ``src < dst`` on every row (the contract of the LSH pair
    miners, which dropDuplicate their output). The symmetrized frame is
    then union-of-disjoint-halves and the dedup shuffle is skipped —
    one full edge-list exchange saved, here and at 100 TB. The flag is
    a pure performance knob: duplicate or self-loop rows in ``sym``
    cannot change min-label propagation's result (min is idempotent),
    so a mislabeled input costs shuffle bytes, never correctness.
    """
    # Repartition on the join key BEFORE caching: the per-round
    # neighbor-min join then finds the edge side already hash-
    # partitioned on v and re-exchanges only the (much smaller) label
    # side — at scale this removes a full edge-list shuffle from every
    # iteration.
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    if not edges_deduped:
        sym = sym.distinct()
    sym = sym.repartition("v").persist()
    # Round 0 fused into initialization: with identity labels the
    # neighbor-min join is a no-op mapping (label(v) == v), so the first
    # propagation collapses to ONE groupBy over the symmetrized edges —
    # component = min(self, min(neighbors)). This also covers every
    # node (symmetrization puts each node on the u side), so the
    # separate distinct-nodes pass disappears: two exchanges saved per
    # call versus the init-then-join form, at any scale.
    # localCheckpoint (not persist): truncates lineage each round —
    # an iterative plan otherwise grows by two joins per iteration and
    # planning time explodes long before data size matters. eager=False:
    # the first convergence probe (round 1) is the first action over the
    # label chain, so for star/clique near-dup graphs (converged at
    # round 0) the whole components pass is exactly ONE job.
    labels = (
        lineage_truncate(
            sym.groupBy(F.col("u").alias("node")).agg(
                F.least(F.min("u"), F.min("v")).alias("component")
            ),
            reliable_checkpoint,
        )
    )
    if max_iter == 1:
        # EXACT convergence check without a propagation round: labels
        # are converged ⟺ every edge's endpoints agree.  The old
        # heuristic ("no label moved off the identity") was only a
        # sufficient condition — identity ⟹ converged, but a single
        # edge (1,2) converges at round 0 with node 2's label at 1,
        # and the heuristic raised a false 'did not converge' for it,
        # making max_iter=1 unusable (r14 review finding).  Cost: one
        # edge⋈label join pair, paid only on this rarely-used path.
        try:
            lu = labels.select(F.col("node").alias("u"), F.col("component").alias("_cu"))
            lv = labels.select(F.col("node").alias("v"), F.col("component").alias("_cv"))
            disagree = (
                sym.join(lu, "u")
                .join(lv, "v")
                .filter(F.col("_cu") != F.col("_cv"))
                .limit(1)
                .count()
            )
            if disagree:
                raise RuntimeError(
                    "connected_components did not converge within max_iter=1 rounds; "
                    "labels were still changing — raise max_iter (the result would be "
                    "wrong, not approximate: unconverged labels split duplicate clusters)"
                )
            return labels
        finally:
            sym.unpersist()
    # try/finally owns BOTH caches (r14 review finding: a failed action
    # mid-round — executor OOM, storage fault — previously leaked the
    # persisted symmetrized edge list and the jump round's propagated
    # frame in block-manager storage for the rest of the session).
    propagated = None  # the jump rounds' persisted frame, released per round
    try:
        for it in range(1, max_iter):
            neighbor_min = (
                sym.join(labels, sym.v == labels.node)
                .groupBy("u")
                .agg(F.min("component").alias("nbr_component"))
            )
            # Carry the pre-round label as _old so convergence detection is a
            # column compare INSIDE the round's one materialization — the
            # old per-round (new join old) count was a whole extra job; the
            # flag makes the check a scan of already-checkpointed batches.
            propagated = labels.join(
                neighbor_min, labels.node == neighbor_min.u, "left"
            ).select(
                "node",
                F.col("component").alias("_old"),
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
            if it < 2:
                # Near-dup graphs are typically dense star/clique clusters
                # that converge in 1-2 plain rounds — skip the jump's extra
                # join while that's still plausible.
                # eager=False: the convergence probe below is the FIRST
                # action over this frame, so it doubles as the checkpoint
                # materialization — one job per round instead of two.
                new_labels = lineage_truncate(
                    propagated.withColumn(
                        "_changed", F.col("component") != F.col("_old")
                    ).drop("_old"),
                    reliable_checkpoint,
                )
                propagated = None
            else:
                # Still unconverged after 2 rounds → a long-path component
                # exists. Pointer jump (path halving): component :=
                # label(component), turning O(diameter) convergence into
                # O(log diameter) so similarity CHAINS can't stall the loop.
                # persist (lazy), not localCheckpoint (eager): the jump reads
                # propagated twice — the cache makes the second read free
                # WITHOUT an extra materialization job per round; lineage is
                # truncated at new_labels' checkpoint.
                propagated = propagated.persist()
                parent = propagated.select(
                    F.col("node").alias("component"), F.col("component").alias("_grand")
                )
                new_labels = (
                    propagated.join(parent, "component", "left")
                    .select(
                        "node",
                        F.col("_old"),
                        F.least(
                            F.col("component"), F.coalesce(F.col("_grand"), F.col("component"))
                        ).alias("component"),
                    )
                    .withColumn("_changed", F.col("component") != F.col("_old"))
                    .drop("_old")
                )
                new_labels = lineage_truncate(new_labels, reliable_checkpoint)
            # This probe is the round's ONE action (it materializes the lazy
            # checkpoint chain, round 0's fused groupBy included on the
            # first pass); round 1 probing zero changes is how round-0
            # convergence — the common star/clique case — is detected.
            changed = new_labels.filter(F.col("_changed")).limit(1).count()
            if propagated is not None:
                propagated.unpersist()
                propagated = None
            labels = new_labels.drop("_changed")
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge within max_iter={max_iter} rounds; "
                "labels were still changing — raise max_iter (the result would be wrong, "
                "not approximate: unconverged labels split duplicate clusters)"
            )
        return labels
    finally:
        sym.unpersist()
        if propagated is not None:
            propagated.unpersist()


def neardup_groups(pairs: DataFrame) -> DataFrame:
    """Near-dup pairs → (component, n_docs, members sorted) groups."""
    # LSH pair miners emit dropDuplicated (id_a < id_b) rows — the
    # edges_deduped contract — so the symmetrize-dedup shuffle is waived
    comps = connected_components(pairs, edges_deduped=True)
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
    comps = connected_components(pairs, edges_deduped=True)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
