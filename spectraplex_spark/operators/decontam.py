"""Benchmark decontamination: flag training documents that share long
token n-grams with an evaluation/benchmark corpus.

The missing cross-corpus member of the E1 dedup family: exact/minhash/
simhash dedup compare the corpus with ITSELF; decontamination compares
it against a (much smaller) held-out benchmark set so evaluation
answers don't leak into training data.  The standard recipe is exact
long-n-gram collision (the GPT-3/PaLM-style 8-13 token overlap test):
a training doc is contaminated if any of its n-grams appears verbatim
in any benchmark doc.

Scale design (the asymmetry IS the design):
  - the benchmark side is tiny (MBs — eval suites, not corpora) → its
    exploded n-gram set is BROADCAST; the 100 TB training side is never
    shuffled for the probe.  The only shuffle anywhere is the per-doc
    groupBy of the (rare) colliding rows.
  - per-doc n-gram sets are `array_distinct` expression arrays (one
    text pass, same shingle machinery as MinHash — dedup.shingles);
    the corpus-side explode is a narrow map stage.
  - attaching per-doc totals back to the hit counts broadcasts the
    small HIT side, not the corpus: at no point does document text or
    the full n-gram stream cross the network.
  - the graded path joins on n-gram STRINGS (SQL-oracle-able); at
    100 TB pass ``hashed=True`` to join on xxhash64 of the hashed
    shingle stream instead (dedup.shingle_hashes — no n-gram string is
    ever materialized; identical verdicts absent 31-bit collisions).
"""

from __future__ import annotations

from math import floor as math_floor

from pyspark.sql import DataFrame, functions as F

from spectraplex_spark.operators.dedup import shingle_hashes, shingles


def contamination_report(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str = "eval_doc_id",
    hashed: bool = False,
) -> DataFrame:
    """Per-contaminated-doc report: how many distinct n-grams collide
    with the benchmark set, with how many distinct benchmark docs, out
    of how many n-grams total.

    Returns (id_col, hits, n_eval_docs, n_ngrams, contamination_share)
    — only docs with >= 1 colliding n-gram (the clean corpus is the
    complement via left_anti on the same frame).
    """
    gram = (
        (lambda c: shingle_hashes(c, n)) if hashed else (lambda c: shingles(c, n))
    )
    # lazy checkpoint barrier: the n-gram pass is THE expensive text scan
    # and two consumers read it (per-doc sizes, the exploded probe) —
    # without the barrier Catalyst inlines the expression into both and
    # the corpus is tokenized twice (same discipline as the minhash
    # miner's hashed-shingle pass).
    from spectraplex_spark.operators.components import lineage_truncate

    corpus = lineage_truncate(
        docs.select(F.col(id_col), gram(F.col(text_col)).alias("_ngrams"))
    )
    sizes = corpus.select(id_col, F.size("_ngrams").alias("n_ngrams"))
    exploded = corpus.select(id_col, F.explode("_ngrams").alias("_ngram"))
    bench = eval_docs.select(
        F.col(eval_id_col), gram(F.col(text_col)).alias("_ngrams")
    ).select(eval_id_col, F.explode("_ngrams").alias("_ngram"))

    hits = (
        exploded.join(F.broadcast(bench), "_ngram")
        .groupBy(id_col)
        .agg(
            F.count_distinct("_ngram").alias("hits"),
            F.count_distinct(eval_id_col).alias("n_eval_docs"),
        )
    )
    return sizes.join(F.broadcast(hits), id_col).select(
        id_col,
        "hits",
        "n_eval_docs",
        "n_ngrams",
        (F.col("hits") / F.col("n_ngrams")).alias("contamination_share"),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = True,
) -> DataFrame:
    """The corpus with contaminated docs REMOVED — the form a training
    pipeline composes after the near-dup gate.  Anti-join against the
    report keys; the report itself is broadcast-sized (benchmark
    collisions are rare by construction)."""
    dirty = contamination_report(
        docs, eval_docs, n, text_col, id_col, hashed=hashed
    ).select(id_col)
    return docs.join(F.broadcast(dirty), id_col, "left_anti")


def semantic_contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold_q: int = 900_000,
    quantize: int = 1024,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eval_vec_col: str | None = None,
) -> DataFrame:
    """The EMBEDDING member of the decontamination family (n-gram
    collision catches verbatim leakage; paraphrased leakage needs the
    semantic test — the SemDeDup/semantic-dedup idea pointed across
    corpora): per corpus row, how many benchmark embeddings sit at or
    above a cosine threshold. Returns ``(id_col, n_hits)`` for rows
    with at least one hit; ``decontaminate_semantic`` anti-joins it.

    Integer-exact grading without a float argmax: embeddings quantize
    to the 1/`quantize` grid (the knn_join_topk_arrow discipline) and
    the cosine test runs on SQUARES —

        hit  ⟺  dot > 0  AND  dot² · 10¹² ≥ t_q² · |a|² · |e|²

    with dot/|a|²/|e|² BIGINT and the comparison in DECIMAL(38,0)
    (HUGEINT on the DuckDB side): no sqrt, no division, no float
    ordering anywhere — bit-identical cross-engine by construction.
    t_q is the threshold on the 1e-6 grid (900000 = cosine 0.9).

    Scale shape (the decontam asymmetry again): the benchmark side is
    collected ONCE (bounded, eval-suite-sized — the DSIR 64-row-collect
    contract) and rides into tasks as constant-folded literal arrays;
    the corpus pass is one narrow zero-shuffle projection — corpus
    embeddings never cross the network.
    """
    from pyspark.sql import types as T

    evc = eval_vec_col or vec_col
    rows = eval_df.select(evc).collect()
    evals = []
    for i, r in enumerate(rows):
        # Descriptive validation instead of a bare TypeError deep in the
        # quantize comprehension (r14 review finding): say WHICH eval
        # row is bad, like every other validation path in this function.
        if r[0] is None:
            raise ValueError(
                f"semantic_contamination_report: eval row {i} has a NULL "
                f"{evc} embedding"
            )
        vec = list(r[0])
        if any(x is None for x in vec):
            raise ValueError(
                f"semantic_contamination_report: eval row {i} has a NULL "
                f"element inside its {evc} embedding"
            )
        evals.append(vec)
    if not evals:
        raise ValueError("semantic_contamination_report: empty eval set")
    dec = T.DecimalType(38, 0)

    # Overflow is a SAFETY failure mode here: under non-ANSI sessions a
    # DECIMAL(38,0) overflow yields NULL, NULL makes the hit predicate
    # NULL, and a contaminated row would silently read as CLEAN (fails
    # open — the wrong direction for a decontamination filter). Two
    # layers: (1) up-front, bound the eval side exactly (it is in hand)
    # and derive the corpus-norm headroom DECIMAL(38,0) leaves — both
    # compared products are ≤ na2·ne2·max(grid, tq2) by Cauchy–Schwarz —
    # and (2) at runtime, coalesce a NULL hit count into raise_error so
    # overflow (or a NULL embedding element) can never read as "clean".
    ne2_max = max(
        sum(int(math_floor(float(x) * quantize + 0.5)) ** 2 for x in vec)
        for vec in evals
    )
    if ne2_max <= 0:
        raise ValueError("semantic_contamination_report: all-zero eval embedding")
    worst_factor = max(10**12, int(threshold_q) ** 2)
    na2_headroom = (10**38 - 1) // (ne2_max * worst_factor)
    if na2_headroom < 1:
        raise ValueError(
            "semantic_contamination_report: eval embedding norms too large "
            f"for DECIMAL(38,0) at quantize={quantize} (|qe|² max {ne2_max}); "
            "reduce quantize or normalize the eval embeddings"
        )

    def q(col):
        return F.transform(
            col, lambda x: F.floor(x.cast("double") * quantize + F.lit(0.5)).cast("long")
        )

    # Accumulate squared norms and dot products in DECIMAL(38,0) from
    # the FIRST multiply — not in long with a decimal cast at the end:
    # a quantized element beyond ~3e9 makes x*x exceed 2^63 inside the
    # long accumulator, and non-ANSI long overflow WRAPS silently (it
    # does not NULL), so a wrong-but-non-NULL product would sail past
    # the raise_error containment layer and a contaminated row could
    # read as clean — the exact fail-open this guard stack documents
    # away (r14 review finding).  Decimal overflow is NULL under
    # non-ANSI (caught by layer 2) and a loud error under ANSI.
    def sq_norm(qcol):
        return F.aggregate(
            qcol,
            F.lit(0).cast(dec),
            lambda acc, x: acc + x.cast(dec) * x.cast(dec),
        )

    qa = q(F.col(vec_col))
    na2 = sq_norm(qa)
    tq2 = F.lit(int(threshold_q) ** 2).cast(dec)
    grid = F.lit(10**12).cast(dec)
    hits = []
    for vec in evals:
        lit = F.array(*[F.lit(float(x)) for x in vec])
        qe = q(lit)  # constant-folded once by Catalyst
        ne2 = sq_norm(qe)
        d = F.aggregate(
            F.zip_with(qa, qe, lambda a, b: a.cast(dec) * b.cast(dec)),
            F.lit(0).cast(dec),
            lambda acc, x: acc + x,
        )
        hits.append(((d > 0) & (d * d * grid >= tq2 * na2 * ne2)).cast("int"))
    n_hits = sum(hits[1:], hits[0])
    # Layer (2): one guard on the summed count — any NULL hit (decimal
    # overflow from an oversized corpus norm, or a NULL element inside a
    # non-NULL embedding) poisons the sum to NULL, and coalesce's lazy
    # second arm turns that into a loud failure instead of "clean".
    # A row whose WHOLE embedding is NULL stays unreportable-but-passing,
    # matching the pre-guard behavior (nothing to compare against).
    checked = F.when(F.col(vec_col).isNull(), F.lit(0)).otherwise(
        F.coalesce(
            n_hits,
            F.raise_error(
                F.lit(
                    "semantic_contamination_report: NULL hit count — "
                    "DECIMAL(38,0) overflow (corpus |qa|² exceeds headroom "
                    f"{na2_headroom}) or NULL embedding element; a silent "
                    "NULL here would pass contaminated rows as clean"
                )
            ).cast("int"),
        )
    )
    return (
        corpus.select(F.col(id_col), checked.alias("_nh"))
        .filter(F.col("_nh") > 0)
        .select(id_col, F.col("_nh").cast("long").alias("n_hits"))
    )


def decontaminate_semantic(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold_q: int = 900_000,
    quantize: int = 1024,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eval_vec_col: str | None = None,
) -> DataFrame:
    """The corpus with semantically contaminated rows REMOVED (the
    composing form, like ``decontaminate``): anti-join against the
    broadcast-sized report."""
    dirty = semantic_contamination_report(
        corpus, eval_df, threshold_q, quantize, vec_col, id_col, eval_vec_col
    ).select(id_col)
    return corpus.join(F.broadcast(dirty), id_col, "left_anti")
