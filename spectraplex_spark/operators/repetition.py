"""E4 repetition-quality signals (the Gopher/MassiveText filter family;
Rae et al. 2021, table A1) for LLM-data pipelines — driver-mandated
extension, SURVEY §2.11; no reference citation (the reference has no
text-quality surface).

Two signal families over word n-grams:

  - ``top_ngram_char_frac(text, n)`` — fraction of characters covered
    by the single most frequent word n-gram (n=2..4 in Gopher). High
    values flag keyword stuffing / SEO spam.
  - ``dup_ngram_char_frac(text, n)`` — fraction of characters covered
    by n-grams that occur more than once (n=5..10 in Gopher). High
    values flag templated / looping text.

Definitions are made exact so both engines bit-agree:

  - "characters" of an occurrence = ``length(gram)`` of the
    space-joined n-gram (internal separator spaces included), times the
    occurrence count; the denominator is ``length(normalized(text))``.
    This is the standard non-overlap-adjusted variant (overlapping
    occurrences double-count shared characters); Gopher's
    overlap-adjusted char marking needs per-position state that buys
    nothing on whitespace-tokenized corpora.
  - ties for "most frequent" resolve to the lexicographically smallest
    n-gram: the Spark side scans the SORTED gram array keeping strict
    maxima, the DuckDB oracle orders ``cnt DESC, gram ASC``.
  - numerators and denominators are exact BIGINTs; the one division is
    int/int → IEEE double, which both engines round identically, so
    the fractions bit-grade without a ROUND.

100 TB shape: everything here is a per-row higher-order-function
expression — whole-stage codegen, zero shuffle, zero Python. The gram
arrays live only inside one projection (never materialized to a
column of exploded rows), so the scan stays a narrow map stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from spectraplex_spark.operators.textops import (
    let1,
    normalized,
    tokens,
    tokens_from_normalized,
)


def ngram_strings(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array (empty when the doc
    has fewer than ``n`` tokens — ``F.sequence`` would otherwise count
    DOWN and fabricate grams)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _top_stats_from(toks: Column, n: int) -> Column:
    """top_ngram_stats over an already-bound token array."""
    grams = F.array_sort(ngram_strings(toks, n))
    return F.aggregate(
        grams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best_cnt"),
            F.lit("").alias("best_gram"),
        ),
        lambda acc, x: _top_step(acc, x),
        lambda acc: F.struct(
            acc["best_cnt"].alias("cnt"),
            F.length(acc["best_gram"]).cast("long").alias("gram_chars"),
        ),
    )


def top_ngram_stats(text: Column, n: int) -> Column:
    """``struct(cnt BIGINT, gram_chars BIGINT)`` of the most frequent
    word n-gram: one run-length scan over the sorted gram array (strict
    ``>`` keeps the lexicographically smallest gram among count ties).
    let1 binds the token array ONCE: ngram_strings references its
    ``toks`` argument inside the per-gram transform lambda, so an
    inlined tokenize chain used to re-execute once PER GRAM (r14
    optimization round)."""
    return let1(tokens(text), lambda toks: _top_stats_from(toks, n))


def _top_step(acc: Column, x: Column) -> Column:
    run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
    better = run > acc["best_cnt"]
    return F.struct(
        x.alias("prev"),
        run.alias("run"),
        F.when(better, run).otherwise(acc["best_cnt"]).alias("best_cnt"),
        F.when(better, x).otherwise(acc["best_gram"]).alias("best_gram"),
    )


def top_ngram_cover_chars(text: Column, n: int) -> Column:
    """BIGINT characters covered by the most frequent word n-gram
    (count × gram length; 0 for docs with fewer than n tokens), as ONE
    aggregate expression. Higher-order functions run interpreted (no
    whole-stage codegen) and Catalyst does not common-subexpression-
    eliminate duplicate references inside a projection — so every
    column reference re-runs the whole gram-build+sort+scan. Folding
    cnt×len into the finish lambda keeps each metric at exactly one
    aggregate evaluation per row (measured 3× on the report)."""
    return let1(tokens(text), lambda toks: _top_cover_from(toks, n))


def _top_cover_from(toks: Column, n: int) -> Column:
    """top_ngram_cover_chars over an already-bound token array."""
    grams = F.array_sort(ngram_strings(toks, n))
    return F.aggregate(
        grams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best_cnt"),
            F.lit("").alias("best_gram"),
        ),
        lambda acc, x: _top_step(acc, x),
        lambda acc: acc["best_cnt"] * F.length(acc["best_gram"]).cast("long"),
    )


def top_ngram_char_frac(text: Column, n: int) -> Column:
    """Fraction of normalized-text characters covered by the most
    frequent word n-gram (0.0 for docs with fewer than n tokens).
    ``cover`` is referenced exactly once: a gramless doc has cover 0
    and 0/total == 0.0, so no separate cnt>0 guard is needed."""
    return let1(
        normalized(text),
        lambda nrm: let1(
            tokens_from_normalized(nrm),
            lambda toks: _frac(_top_cover_from(toks, n), F.length(nrm).cast("long")),
        ),
    )


def _frac(chars: Column, total: Column) -> Column:
    return F.when(
        total > 0, chars.cast("double") / total.cast("double")
    ).otherwise(F.lit(0.0))


def dup_ngram_chars(text: Column, n: int) -> Column:
    """BIGINT characters covered by word n-grams occurring more than
    once (count × gram length summed over duplicated grams): one
    run-length scan over the sorted gram array, the trailing run folded
    in by the finish lambda."""
    return let1(tokens(text), lambda toks: _dup_chars_from(toks, n))


def _dup_chars_from(toks: Column, n: int) -> Column:
    """dup_ngram_chars over an already-bound token array."""
    grams = F.array_sort(ngram_strings(toks, n))
    return F.aggregate(
        grams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("acc"),
        ),
        lambda st, x: _dup_step(st, x),
        lambda st: st["acc"] + _run_chars(st["run"], st["prev"]),
    )


def _run_chars(run: Column, gram: Column) -> Column:
    return F.when(run > 1, run * F.length(gram).cast("long")).otherwise(
        F.lit(0).cast("long")
    )


def _dup_step(st: Column, x: Column) -> Column:
    new_run = F.when(x == st["prev"], st["run"] + 1).otherwise(
        F.lit(1).cast("long")
    )
    closed = F.when(x == st["prev"], F.lit(0).cast("long")).otherwise(
        _run_chars(st["run"], st["prev"])
    )
    return F.struct(
        x.alias("prev"), new_run.alias("run"), (st["acc"] + closed).alias("acc")
    )


def dup_ngram_char_frac(text: Column, n: int) -> Column:
    """Fraction of normalized-text characters covered by duplicated
    word n-grams (0.0 for docs with fewer than n tokens)."""
    return let1(
        normalized(text),
        lambda nrm: let1(
            tokens_from_normalized(nrm),
            lambda toks: _frac(_dup_chars_from(toks, n), F.length(nrm).cast("long")),
        ),
    )


def repetition_report(
    df: DataFrame,
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7),
) -> DataFrame:
    """Per-document Gopher repetition signals: ``top{n}_gram_frac`` for
    each n in ``top_ns`` and ``dup{n}_gram_frac`` for each n in
    ``dup_ns``. One zero-shuffle projection.  All metrics share ONE
    let1-bound normalize+tokenize inside a struct column (per-metric
    wrappers would tokenize once per metric — 6×; r14 optimization
    round; equality with the per-metric form is pytest-pinned)."""
    t = F.col(text_col)

    def _metrics(nrm):
        def _inner(toks):
            total = F.length(nrm).cast("long")
            fields = [
                _frac(_top_cover_from(toks, n), total).alias(f"top{n}_gram_frac")
                for n in top_ns
            ] + [
                _frac(_dup_chars_from(toks, n), total).alias(f"dup{n}_gram_frac")
                for n in dup_ns
            ]
            return F.struct(*fields)

        return let1(tokens_from_normalized(nrm), _inner)

    out = df.withColumn("_rep", let1(normalized(t), _metrics))
    for n in top_ns:
        out = out.withColumn(f"top{n}_gram_frac", F.col("_rep").getField(f"top{n}_gram_frac"))
    for n in dup_ns:
        out = out.withColumn(f"dup{n}_gram_frac", F.col("_rep").getField(f"dup{n}_gram_frac"))
    return out.drop("_rep")


# Integer-grid gate thresholds: frac < num/den is evaluated as
# cnt_chars * den < total_chars * num — exact BIGINT arithmetic, no
# float boundary (a doc sitting exactly ON a float threshold can
# otherwise flip between engines).
TOP2_MAX = (20, 100)  # top-2-gram char fraction must be < 0.20
DUP5_MAX = (30, 100)  # dup-5-gram char fraction must be < 0.30


def repetition_gate(
    df: DataFrame,
    text_col: str = "text",
    top2_max: tuple[int, int] = TOP2_MAX,
    dup5_max: tuple[int, int] = DUP5_MAX,
) -> DataFrame:
    """Keep documents passing the Gopher repetition thresholds, with
    exact integer threshold arithmetic (the textops quality-classifier
    discipline). Adds a ``repetition_pass`` boolean rather than
    filtering, so callers can report as well as gate."""
    t = F.col(text_col)
    n2, d2 = top2_max
    n5, d5 = dup5_max

    # ONE let1-bound normalize+tokenize for the whole gate (the three
    # unbound sub-expressions each re-ran the chain; r14 round).
    def _passes(nrm):
        def _inner(toks):
            total = F.length(nrm).cast("long")
            return (
                (total > 0)
                & (_top_cover_from(toks, 2) * d2 < total * n2)
                & (_dup_chars_from(toks, 5) * d5 < total * n5)
            )

        return let1(tokens_from_normalized(nrm), _inner)

    return df.withColumn("repetition_pass", let1(normalized(t), _passes))
