"""E4 training-batch preparation: sequence packing and deterministic
dataset splits (driver-mandated extension class, SURVEY §2.11 — no
reference analog; the reference stops at the silver tables).

Sequence packing assigns documents to fixed token-budget "packs" (the
pre-tokenization step of LLM batch assembly). The exact greedy packer is
inherently sequential; the scalable form used here is the standard
shard-local prefix-sum approximation:

  shard   = doc_id % n_shards          (any deterministic shard key)
  pack_id = floor(exclusive_prefix_token_sum(within shard) / budget)

One window per shard — state never leaves the shard, so the only
shuffle is the hash partition on the shard key, and shards scale
linearly with data. A pack may overrun the budget by at most one
document (the documented tradeoff vs. the sequential packer); callers
that need hard caps split oversized documents upstream. Crucially it is
pure SQL (window sum), so the DuckDB oracle verifies every assignment.

Dataset splitting must be deterministic and stable under corpus growth
(a document's split may never depend on what else is in the corpus), so
it hashes the document id: the first 4 hex chars of md5(id) order
lexicographically exactly as their numeric value, making fixed hex
thresholds a consistent-hash split that both engines compute
identically.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window as W, functions as F

from spectraplex_spark.operators.textops import token_count, tokens

# md5-prefix thresholds: [0000, 0ccc) ≈ 5% test, [0ccc, 1998) ≈ 5% val.
TEST_MAX_HEX = "0ccc"
VAL_MAX_HEX = "1998"


def _h4(key):
    """First 4 hex chars of md5(key) — the module's 16-bit consistent-
    hash grid (one definition; was copy-pasted five times, review
    finding r12)."""
    return F.substring(F.md5(key.cast("string")), 1, 4)


def _hex16(t: int) -> str:
    """A 16-bit threshold as its 4-char hex literal, clamped to the
    grid (thresholds >= 65536 mean keep-everything and are handled by
    the callers' explicit keep-all predicate)."""
    return format(max(0, min(65535, int(t))), "04x")


def _domain_token_totals(df, domain_col, parts, text_col):
    """Per-domain corpus token totals restricted to the weighted
    domains — the one aggregation pass shared by mixture_thresholds
    and mixture_repeat_plan (was duplicated verbatim)."""
    return {
        r[0]: int(r[1])
        for r in df.filter(F.col(domain_col).isin(*parts))
        .groupBy(domain_col)
        .agg(F.sum(token_count(F.col(text_col)).cast("long")))
        .collect()
        if r[1] is not None
    }


def assign_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic train/val/test split column (~90/5/5).

    Consistent hashing on md5(id): adding or removing other documents
    never moves an existing document between splits, and re-runs are
    bit-identical — the property UUID- or rand()-based splits lack.
    """
    h4 = _h4(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(h4 < TEST_MAX_HEX, "test")
        .when(h4 < VAL_MAX_HEX, "val")
        .otherwise("train"),
    )


def assign_split_grouped(
    df: DataFrame, group_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split (~90/5/5): the consistent hash
    is keyed on the GROUP (domain, source, author…), so every document
    of a group lands in the SAME split. Doc-keyed splits leak at
    evaluation time — near-duplicate pages of one site straddle
    train/test and the model is scored on memorized boilerplate; group
    keying is the standard fix (the GroupShuffleSplit semantics).

    Same determinism contract as assign_split: md5 consistent hashing,
    bit-identical re-runs, corpus growth never moves an existing group.
    NULL groups carry no identity to key on — they fall back to the
    doc-keyed hash (documented: filter or repair upstream if NULL means
    'unknown but same site')."""
    key = F.coalesce(F.col(group_col).cast("string"), F.col(id_col).cast("string"))
    h4 = _h4(key)
    return df.withColumn(
        "split",
        F.when(h4 < TEST_MAX_HEX, "test")
        .when(h4 < VAL_MAX_HEX, "val")
        .otherwise("train"),
    )


def temperature_shares(
    df: DataFrame,
    domain_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture shares (the multilingual/multi-domain
    upsampling rule from mT5/XLM-R: sample domain i with probability
    ∝ n_i^(1/T) so tail domains aren't drowned by the head), computed
    BIT-EXACTLY at T=2 via integer sqrt: weight_i = isqrt(n_i),
    temp_share_q = 1e6 · weight_i // Σ weight — pure BIGINT end to end.
    isqrt is a TRUE integer sqrt: the float floor(sqrt(double(n))) seed
    is corrected by one BIGINT adjust step in each direction
    (w -= (w·w > n); w += ((w+1)² ≤ n)), so a count near/above 2^52 —
    where the double cast loses ulps and sqrt rounding can cross an
    integer boundary — still lands on the exact floor. Exact for all
    n < 2^62 ((w+1)² stays in BIGINT); a float POW(n, 1/T) would not
    grade. The oracle replays the identical seed+adjust.

    Returns one row per domain: (domain, n_docs, n_tokens, raw_share_q,
    temp_share_q) on the 1e-6 grid — raw vs temperature columns side by
    side is the planning view: how much the rule upweights each tail
    domain. One partial-aggregated scan; |domains| rows."""
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count(F.col(text_col)).cast("long")).cast("long").alias("n_tokens"),
    )
    n = F.col("n_docs")
    w0 = F.floor(F.sqrt(n.cast("double"))).cast("long")
    w1 = F.when(w0 * w0 > n, w0 - F.lit(1).cast("long")).otherwise(w0)
    w = F.when((w1 + 1) * (w1 + 1) <= n, w1 + F.lit(1).cast("long")).otherwise(w1)
    # |domains|-row frame, materialized ONCE: the totals collect below
    # and the returned select would otherwise each recompute the full
    # corpus groupBy (two scans + shuffles for a bounded result, and a
    # changing source could skew shares off their own denominators —
    # review finding r12)
    from spectraplex_spark.operators.components import lineage_truncate

    weighted = lineage_truncate(per.withColumn("_w", w))
    totals = weighted.agg(
        F.sum("n_docs").alias("_nd"), F.sum("_w").alias("_sw")
    ).collect()[0]
    if totals["_nd"] is None:  # empty corpus: no domains, no shares
        return weighted.select(
            "domain",
            "n_docs",
            "n_tokens",
            F.lit(None).cast("long").alias("raw_share_q"),
            F.lit(None).cast("long").alias("temp_share_q"),
        ).limit(0)
    nd, sw = int(totals["_nd"]), int(totals["_sw"])
    return weighted.select(
        "domain",
        "n_docs",
        "n_tokens",
        # BIGINT floor division (div), never float /: the grid must be
        # exact, not truncated-after-rounding
        F.expr(f"(n_docs * 1000000L) div {nd}L").alias("raw_share_q"),
        F.expr(f"(_w * 1000000L) div {sw}L").alias("temp_share_q"),
    )


def stratified_sample(
    df: DataFrame,
    label_col: str,
    fractions: dict,
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-class deterministic sampling (class rebalancing for training
    mixes): keep a row iff its md5(id) 16-bit prefix falls under the
    class's threshold. Consistent hashing — a row's keep/drop decision
    never depends on the rest of the corpus, re-runs are bit-identical,
    and the same row is kept at every fraction above its hash point
    (nested samples come for free). Fractions are quantized to 1/65536
    so the hex-string threshold compare is exact in both engines.
    """
    h4 = _h4(F.col(id_col))

    def keep_all(frac: float) -> bool:
        # Quantization rounds fractions in [65535.5/65536, 1.0) up to
        # 65536, whose 5-char hex '10000' compares LESS than most 4-char
        # prefixes lexicographically — treat the whole top bucket as
        # keep-everything instead.
        return round(frac * 65536) >= 65536

    def hex_threshold(frac: float) -> str:
        return _hex16(round(frac * 65536))

    keep = F.lit(keep_all(default_fraction)) | (h4 < hex_threshold(default_fraction))
    for label, frac in fractions.items():
        keep = F.when(
            F.col(label_col) == label,
            F.lit(keep_all(frac)) | (h4 < hex_threshold(frac)),
        ).otherwise(keep)
    return df.filter(keep)


def pack_documents(
    df: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each document to (shard, pack_id) under a token budget.

    Per shard, documents are ordered by (id, *order_cols) and packed by
    exclusive prefix token sum: a document opens a new pack when the
    tokens before it already fill the current one. ``tokens_before`` is
    included so a consumer can compute each document's offset inside its
    pack without re-aggregating.

    DETERMINISM CONTRACT: ``(id_col, *order_cols)`` must be unique per
    row.  Duplicate keys make the running sum partition-order-dependent
    (re-runs flap) — the documented chunk-stream composition
    (chunking.py emits one row per (doc_id, chunk_id)) must pass
    ``order_cols=("chunk_id",)`` (review finding r12).

    ``pack_id`` is BIGINT via integer floor division: the old
    ``floor(float)/cast(int)`` wrapped at ~1.1e12 tokens per shard —
    inside the 100 TB envelope — while the oracle's INTEGER cast
    errored, so the pair could never agree at scale (review finding
    r12)."""
    n_tok = token_count(F.col(text_col)).cast("int")
    shard = (F.col(id_col) % n_shards).cast("int")
    w = (
        W.partitionBy("shard")
        .orderBy(id_col, *order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in order_cols],
            n_tok.alias("n_tokens"),
            shard.alias("shard"),
        )
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            *order_cols,
            "n_tokens",
            "shard",
            (F.col("_cum") - F.col("n_tokens")).cast("long").alias("tokens_before"),
            F.expr(f"CAST((_cum - n_tokens) div {int(budget)} AS BIGINT)").alias(
                "pack_id"
            ),
        )
    )


def pack_stats(packed: DataFrame, budget: int = 512) -> DataFrame:
    """Per-(shard, pack) fill report: document count, token sum, and
    budget utilization — the packing-efficiency metric."""
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        (F.sum("n_tokens") / budget).cast("double").alias("fill_ratio"),
    )


def mixture_thresholds(
    df: DataFrame,
    domain_col: str,
    parts: dict[str, int],
    token_budget: int,
    text_col: str = "text",
) -> dict[str, int]:
    """Per-domain keep thresholds (on the 16-bit md5 grid) that sample
    each domain down to its share of a TOKEN budget: domain d with
    weight parts[d]/sum(parts) gets ~token_budget*w_d tokens.

    All arithmetic is INTEGER (floor((65536*budget*parts) / (sum_parts*
    domain_tokens))) so thresholds are bit-reproducible in any engine —
    no float rates, no rounding-mode divergence. A threshold >= 65536
    means the domain is under-represented vs its target and is kept
    whole (this operator only downsamples; upweighting by repetition is
    a separate concern). One aggregation pass; the result is a
    #domains-sized driver dict, the planner's only state."""
    totals = _domain_token_totals(df, domain_col, parts, text_col)
    s = sum(parts.values())
    return {
        d: (65536 * token_budget * parts[d]) // (s * totals[d])
        for d in parts
        if totals.get(d)
    }


def slice_token_examples(
    df: DataFrame,
    seq_len: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    eos: str | None = None,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The OTHER standard pre-training layout (pack_documents keeps
    docs whole; this one doesn't): concatenate the corpus token stream
    and cut EXACT ``seq_len`` windows, examples crossing document
    boundaries — the GPT-style "concat with EOS, slice fixed blocks"
    pipeline. ``eos`` (e.g. ``"<|eos|>"``) appends a separator token to
    every document's stream before slicing, so the model can learn
    document boundaries — the standard practice; None slices the bare
    concatenation. Deterministic and shard-local: docs land on
    ``id % n_shards`` shards, each shard's stream is ordered by id,
    per-shard prefix sums give every token a global position, and
    example k is positions [k·L, (k+1)·L). The trailing partial
    example of each shard is dropped (the standard waste; bounded by
    n_shards·(L-1) tokens — at 100 TB, noise).

    Cost shape: one doc-level window for the prefix sums (shard-keyed
    shuffle of (id, n_tokens) only), then ONE token-level exchange
    keyed (shard, example_idx) to assemble examples — the honest
    minimum, since boundary-crossing examples by definition mix tokens
    of different docs. Returns (shard, example_idx, tokens) with
    ``size(tokens) == seq_len`` on every row."""
    toks = tokens(F.col(text_col))
    if eos is not None:
        toks = F.concat(toks, F.array(F.lit(eos)))
    base = df.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in order_cols],
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        toks.alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    # same uniqueness contract as pack_documents: duplicate
    # (_id, *order_cols) keys would collide _gpos and silently drop
    # the merged over-long groups at the == seq_len filter
    w = (
        W.partitionBy("shard")
        .orderBy("_id", *order_cols)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = base.withColumn("_start", F.coalesce(F.sum("_n").over(w), F.lit(0)))
    tok = offs.select(
        "shard",
        F.posexplode("_toks").alias("_p", "_tok"),
        (F.col("_start") + F.col("_p")).alias("_gpos"),
    ).select(
        "shard",
        # integer division: float / goes off-grid past 2^53 (review r12)
        F.expr(f"CAST(_gpos div {int(seq_len)} AS BIGINT)").alias("example_idx"),
        (F.col("_gpos") % seq_len).cast("int").alias("_slot"),
        "_tok",
    )
    return (
        tok.groupBy("shard", "example_idx")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_slot", "_tok"))),
                lambda s: s["_tok"],
            ).alias("tokens")
        )
        .filter(F.size("tokens") == seq_len)
    )


def mixture_repeat_plan(
    df: DataFrame,
    domain_col: str,
    parts: dict[str, int],
    token_budget: int,
    text_col: str = "text",
) -> dict[str, tuple[int, int, int, int]]:
    """Per-domain REPEAT plan to hit a token-budget mixture — the
    upweighting half mixture_thresholds explicitly leaves out (tail
    domains in a curated mix are repeated for multiple epochs, the
    standard LLM-mix practice; head domains are downsampled). For
    domain d with corpus tokens T_d and target tokens
    tgt_d = budget·w_d: every doc gets ``tgt_d // T_d`` full copies,
    plus ONE extra copy iff its md5 16-bit prefix falls under
    ``65536·(tgt_d mod T_d) // T_d`` — so expected tokens hit the
    target while up- and downsampling are the same rule (full=0 +
    tail ≡ mixture_sample's downsample; full≥1 + tail ≡ fractional
    epochs). All arithmetic BIGINT floor division — bit-reproducible.

    Returns {domain: (corpus_tokens, target_tokens, full_repeats,
    tail_threshold)} — one aggregation pass, |parts| driver entries
    (the mixture_thresholds contract)."""
    totals = _domain_token_totals(df, domain_col, parts, text_col)
    s = sum(parts.values())
    plan = {}
    for d in parts:
        t = totals.get(d)
        if not t:
            continue
        tgt = (token_budget * parts[d]) // s
        plan[d] = (t, tgt, tgt // t, (65536 * (tgt % t)) // t)
    return plan


def mixture_upsample(
    df: DataFrame,
    domain_col: str,
    parts: dict[str, int],
    token_budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the repeat plan: each kept doc appears
    ``full_repeats (+1 if its hash falls under the tail threshold)``
    times, tagged with ``repeat_idx`` (0-based — downstream shuffles/
    packers must treat copies as distinct rows; dedup stages run
    BEFORE upsampling, obviously). Docs outside the weighted domains
    drop. One narrow explode pass; plan state is |parts| literals."""
    plan = mixture_repeat_plan(df, domain_col, parts, token_budget, text_col)
    h4 = _h4(F.col(id_col))
    copies = F.lit(0)
    for d, (_t, _tgt, reps, thr) in plan.items():
        extra = (
            (h4 < _hex16(thr)).cast("int")
            if thr > 0
            else F.lit(0)
        )
        copies = F.when(F.col(domain_col) == d, F.lit(reps) + extra).otherwise(
            copies
        )
    return (
        df.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn("repeat_idx", F.explode(F.sequence(F.lit(0), F.col("_copies") - 1)))
        .drop("_copies")
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    parts: dict[str, int],
    token_budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-weighted corpus mixture to a token budget (the training-
    mix curriculum op): docs outside the weighted domains drop; each
    weighted domain is consistently-hash-downsampled to its token
    share. Same nested/deterministic md5 guarantees as
    stratified_sample; the planning pass is one aggregation, the sample
    itself a narrow filter."""
    thr = mixture_thresholds(df, domain_col, parts, token_budget, text_col)
    h4 = _h4(F.col(id_col))
    keep = F.lit(False)
    for d, t in thr.items():
        keep = F.when(
            F.col(domain_col) == d,
            F.lit(t >= 65536) | (h4 < _hex16(t)),
        ).otherwise(keep)
    return df.filter(keep)


def pack_documents_scalable(
    df: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_cols: tuple[str, ...] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """SCALE twin of :func:`pack_documents` — IDENTICAL assignments
    (pytest-pinned), without the plain form's parallelism cap.

    The plain window partitions by ``shard``, so the whole corpus runs
    through exactly ``n_shards`` tasks — each one buffering corpus/N
    rows (~10^12 at 100 TB / 8 shards) regardless of cluster size
    (review finding r12).  This twin computes the same per-shard
    exclusive prefix sums two-phase (the ``shuffle_shards_scalable``
    discipline, adapted from ranks to sums):

      1. range-partition by (shard, id, *order_cols) into as many
         partitions as the cluster likes and sort within partitions —
         each partition holds a CONTIGUOUS slice of one-or-more shards'
         streams (eager localCheckpoint pins the layout);
      2. one bounded aggregate of per-(partition, shard) token totals —
         ≤ #partitions + n_shards rows, since slices are contiguous —
         folded on the driver into per-(partition, shard) global
         offsets;
      3. an Arrow ``mapInPandas`` pass over the sorted partitions adds
         offset + local exclusive running sum — no second shuffle, no
         window, state is one counter per shard present in the
         partition.

    The offset lookup fails LOUDLY on a missing (partition, shard) key
    (the ``_offset_lookup`` discipline: silent 0 would emit duplicate
    pack ids).  Same uniqueness contract on (id, *order_cols) as the
    plain form.  NULL ``text`` matches the plain form bit-for-bit too
    (r12 ADVICE): the window SUM skips NULL n_tokens, so a NULL-text
    row gets NULL tokens_before/pack_id and does not advance the
    running sum — this twin does exactly that instead of raising."""
    from pyspark.sql import types as T

    n_tok = token_count(F.col(text_col)).cast("int")
    shard = (F.col(id_col) % n_shards).cast("int")
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in order_cols],
        n_tok.alias("n_tokens"),
        shard.alias("shard"),
    )
    parted = (
        base.repartitionByRange(
            *([num_partitions] if num_partitions else []),
            "shard",
            id_col,
            *order_cols,
        )
        .sortWithinPartitions("shard", id_col, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    groups = sorted(
        # `s or 0`: SUM over a group whose n_tokens are ALL NULL (every
        # doc in that (partition, shard) slice has NULL text) is NULL —
        # such rows contribute 0 to the running sum in the plain window
        # form, so they must contribute 0 to the offsets here too, not
        # crash int(None) (review finding r13)
        ((r["shard"], r["_pid"]), int(r["s"] or 0))
        for r in parted.groupBy("_pid", "shard")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()  # bounded: contiguous slices → ≤ partitions + shards rows
    )
    offsets: dict[tuple[int, int], int] = {}
    acc_shard, acc = None, 0
    for (sh, pid), tot in groups:
        if sh != acc_shard:
            acc_shard, acc = sh, 0
        offsets[(pid, sh)] = acc
        acc += tot

    out_schema = T.StructType(
        parted.schema.fields
        + [T.StructField("tokens_before", T.LongType(), True)]
    )

    def add_running(batches):
        carry: dict[int, int] = {}

        def off(pid: int, sh: int) -> int:
            got = offsets.get((pid, sh))
            if got is None:  # fail loud: drifted partitioning
                raise RuntimeError(
                    f"pack_documents_scalable: partition {pid} shard {sh} "
                    "missing from the offset map — checkpointed "
                    "partitioning drifted"
                )
            return got

        for pdf in batches:
            before: list[int | None] = []
            for pid, sh, nt in zip(pdf["_pid"], pdf["shard"], pdf["n_tokens"]):
                if pd.isna(nt):
                    # plain-form parity: the window SUM skips NULL
                    # n_tokens, so the row gets NULL tokens_before (and
                    # NULL pack_id downstream) and the running sum is
                    # unchanged.  Arrow delivers the NULL as NaN here.
                    before.append(None)
                    continue
                sh = int(sh)
                c = carry.get(sh)
                if c is None:
                    c = off(int(pid), sh)
                before.append(c)
                carry[sh] = c + int(nt)
            pdf = pdf.copy()
            pdf["tokens_before"] = pd.array(before, dtype="Int64")
            yield pdf

    return parted.mapInPandas(add_running, schema=out_schema).select(
        id_col,
        *order_cols,
        "n_tokens",
        "shard",
        F.col("tokens_before").cast("long").alias("tokens_before"),
        F.expr(f"CAST(tokens_before div {int(budget)} AS BIGINT)").alias("pack_id"),
    )
