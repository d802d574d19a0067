"""DSIR-style data selection via importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling")
— the target-distribution-matching stage of a pretraining pipeline:
given a small TARGET slice (e.g. wiki-quality or in-language pages),
re-rank the raw corpus so documents whose hashed n-gram profile looks
like the target float to the top of each stratum's sample.

Integer-grid variant (the quality_linear_score discipline): the paper
scores log p_target(d) - log p_raw(d) over hashed n-gram features; the
exact-gradable re-expression here gives each feature bucket an additive
weight on the 1e-6 integer grid,

    wq(b) = ((target_count(b) + 1) * 1_000_000) div (raw_count(b) + B)

(add-one smoothing over B buckets — a bucket the target never uses
still gets a floor weight, so unseen-feature docs don't degenerate),
and a document's importance score is the pure BIGINT sum of its
tokens' bucket weights. Ranking and selection are integer compares —
no float boundary anywhere. Production swaps in trained log-ratio
weights quantized to the same grid; the OPERATOR (hash → corpus-level
bucket stats → broadcast weights → in-row scoring → per-stratum top-k)
is the deliverable.

Scale shape (100 TB): two narrow passes over the corpus. Pass 1
explodes (bucket) rows but hash-aggregate partial combine caps the
shuffle at n_buckets rows per task; the bucket table is then a
BOUNDED collect (n_buckets rows — the k-means-centroid contract) and
ships back as an array literal, so pass 2 scores fully in-row with
zero shuffle. The only real exchange is the per-stratum top-k window,
keyed by the stratum column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from spectraplex_spark.operators.textops import (
    QSCORE_BUCKETS,
    hashed_bucket,
    tokens,
)

DSIR_SCALE = 1_000_000


def dsir_bucket_weights(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    n_buckets: int = QSCORE_BUCKETS,
) -> DataFrame:
    """(bucket, raw_count, target_count, wq): corpus-level hashed-token
    stats and the smoothed integer importance weight per bucket.
    ``target_pred`` marks the rows forming the target distribution."""
    b = df.select(
        F.explode(
            F.transform(
                tokens(F.col(text_col)), lambda t: hashed_bucket(t, n_buckets)
            )
        ).alias("bucket"),
        target_pred.alias("_t"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("raw_count"),
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).cast("long").alias(
                "target_count"
            ),
        )
        .withColumn(
            "wq",
            F.expr(
                f"((target_count + 1) * {DSIR_SCALE}) div (raw_count + {n_buckets})"
            ).cast("long"),
        )
    )


def _importance_score(
    df: DataFrame, target_pred: Column, text_col: str, n_buckets: int
) -> Column:
    """The broadcast-weights importance score expression — the ONE
    definition both twins build on (r14 review finding: the ~20-line
    collect/wlit/per_tok/score block was duplicated verbatim between
    them, the drift mode dedup.perm_constants' r13 note warns about;
    the r12 floor_wq fix already had to land twice).

    Emits NULL for token-free documents (they carry no feature
    evidence — the callers' documented exclusion) and the BIGINT bucket
    -weight sum otherwise.  The NULL-initialized accumulator makes one
    aggregate carry both facts: an empty token array never runs the
    merge lambda, so the init NULL IS the token-free verdict, and the
    first merge coalesces it to 0 — so the lower/regex/split tokenize
    chain (the dominant per-row cost, measured 9x on the decontam
    scan, dedup.py:63) evaluates exactly once per row.  The previous
    ``filter(size(toks) > 0)`` + separate score projection ran it
    twice (HOF chains are interpreted and outside both codegen CSE and
    cross-operator CSE).
    """
    w = {
        r["bucket"]: r["wq"]
        for r in dsir_bucket_weights(
            df, target_pred, text_col, n_buckets
        ).collect()  # bounded: n_buckets rows (the centroid-collect contract)
    }
    # A bucket absent from the stats has raw_count == target_count == 0,
    # so its smoothed weight is the add-one floor ((0+1)*SCALE) div (0+B)
    # — NOT 0 (review finding r12: a 0 default contradicted the module's
    # documented "unseen-feature docs don't degenerate" smoothing;
    # unreachable when scoring the same df the stats came from, but the
    # contract must hold if the source drifts between the two passes).
    floor_wq = DSIR_SCALE // n_buckets
    wlit = F.array(
        *[F.lit(int(w.get(b, floor_wq))).cast("long") for b in range(n_buckets)]
    )
    per_tok = F.transform(
        tokens(F.col(text_col)),
        lambda t: F.element_at(wlit, hashed_bucket(t, n_buckets) + 1),
    )
    return F.aggregate(
        per_tok,
        F.lit(None).cast("long"),
        lambda acc, v: F.coalesce(acc, F.lit(0).cast("long")) + v,
    )


def dsir_importance_sample(
    df: DataFrame,
    target_pred: Column,
    k: int = 10,
    stratum_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = QSCORE_BUCKETS,
) -> DataFrame:
    """Top-``k`` docs per stratum by hashed-n-gram importance score
    (see module docstring). Returns (stratum, id, score_q, rk) —
    deterministic: score desc, id asc. Token-free documents carry no
    feature evidence and are excluded (they'd otherwise tie at score 0
    by accident of smoothing, not by similarity to the target)."""
    score = _importance_score(df, target_pred, text_col, n_buckets)
    scored = df.select(
        F.col(stratum_col), F.col(id_col), score.alias("score_q")
    ).filter(F.col("score_q").isNotNull())
    win = Window.partitionBy(stratum_col).orderBy(
        F.desc("score_q"), F.asc(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(win).cast("long"))
        .where(F.col("rk") <= k)
    )


def dsir_importance_sample_scalable(
    df: DataFrame,
    target_pred: Column,
    k: int = 10,
    stratum_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = QSCORE_BUCKETS,
    hot_factor: int = 64,
    safety: int = 8,
) -> DataFrame:
    """SCALE twin of :func:`dsir_importance_sample` — IDENTICAL
    survivors (pytest-pinned), but a pathologically hot stratum (one
    language being 80% of 100 TB) is percentile-PREFILTERED before the
    top-k window instead of funneling every scored row through a
    single window task (the cap_per_domain_scalable discipline, review
    finding r12).

    Exactness never rides on the percentile sketch: keep everything
    with ``score_q >= thr`` (ties inclusive), then a bounded verify
    proves each hot stratum kept >= min(k, total) rows — the true
    top-k all score >= the kth score >= thr, so they are among the
    survivors; any stratum failing the proof falls back to its full
    complement.  Pipeline sizes: per-stratum counts (bounded strata),
    one percentile pass over hot-stratum rows only, a broadcast
    threshold join, and a window over ~safety·k rows per hot stratum.
    """
    from spectraplex_spark.operators.components import lineage_truncate

    score = _importance_score(df, target_pred, text_col, n_buckets)
    # scored once, lineage-truncated: counts / percentile / prefilter /
    # verify each re-read it (Catalyst does not CSE the HOF chain)
    scored = lineage_truncate(
        df.select(
            F.col(stratum_col).alias("_st"), F.col(id_col), score.alias("score_q")
        ).filter(F.col("score_q").isNotNull())
    )
    counts = {
        r["_st"]: int(r["n"])
        for r in scored.groupBy("_st").agg(F.count(F.lit(1)).alias("n")).collect()
    }  # bounded: one row per stratum
    hot = [st for st, n in counts.items() if n > hot_factor * k and st is not None]
    pre = scored
    if hot:
        # fraction keeping >= safety*k rows, rounded DOWN on the 2^-e
        # grid (keeps more, never fewer); percentile_approx needs a
        # foldable fraction so each hot stratum gets its own literal
        thr_rows = []
        for st in hot:
            frac = max(0.0, 1.0 - (safety * k) / counts[st])
            e = 0
            while e < 40 and (1.0 - 2.0 ** -(e + 1)) <= frac:
                e += 1
            f = 1.0 - 2.0 ** -e  # <= frac: keeps at least the target
            thr = (
                scored.filter(F.col("_st") == st)
                .agg(F.percentile_approx("score_q", f, 10000).alias("t"))
                .collect()[0]["t"]
            )
            thr_rows.append((st, int(thr)))
        # Threshold frame typed from the ACTUAL stratum column — the old
        # hardcoded "_st string" crashed createDataFrame for any non-
        # string stratum (int domain ids) while the plain twin handled
        # them fine (r14 review finding).
        from pyspark.sql import types as T

        thr_schema = T.StructType(
            [
                T.StructField("_st", scored.schema["_st"].dataType),
                T.StructField("_thr", T.LongType()),
            ]
        )
        thr_df = F.broadcast(
            scored.sparkSession.createDataFrame(thr_rows, thr_schema)
        )
        pre = scored.join(thr_df, "_st", "left").filter(
            F.col("_thr").isNull() | (F.col("score_q") >= F.col("_thr"))
        ).drop("_thr")
        # bounded verify: every hot stratum must keep >= min(k, total);
        # ties at thr are inclusive so the proof is exact, but a
        # degenerate sketch could under-keep — those strata fall back
        kept = {
            r["_st"]: int(r["n"])
            for r in pre.groupBy("_st").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        failing = [
            st for st in hot if kept.get(st, 0) < min(k, counts[st])
        ]
        if failing:  # provable fallback: full complement for those strata
            # NULL-safe on both sides: `~isin(failing)` is NULL for a
            # NULL stratum and filter drops NULLs, so the old form
            # silently erased the NULL stratum's rows whenever any hot
            # stratum fell back (r14 review finding; `failing` holds
            # non-NULL strata only — `hot` excludes None).
            pre = pre.filter(
                F.coalesce(~F.col("_st").isin(failing), F.lit(True))
            ).unionByName(
                scored.filter(
                    F.coalesce(F.col("_st").isin(failing), F.lit(False))
                )
            )
    win = Window.partitionBy("_st").orderBy(F.desc("score_q"), F.asc(id_col))
    return (
        pre.withColumn("rk", F.row_number().over(win).cast("long"))
        .where(F.col("rk") <= k)
        .withColumnRenamed("_st", stratum_col)
    )
