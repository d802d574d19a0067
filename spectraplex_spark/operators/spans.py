"""Exact repeated-substring span removal — the "dedup within documents"
member of the E1 family (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better": remove every substring that appears more
than once in the corpus, not just whole near-dup documents).

Whole-document dedup (exact/minhash/simhash) misses the dominant
real-world duplication mode: boilerplate SPANS — headers, footers,
license blocks, templated paragraphs — embedded inside otherwise
unique documents. The reference corpus-prep pipeline has no answer for
these; this operator marks and strips them at token granularity.

Token-level formulation (the suffix-array recipe re-expressed as
DataFrame ops):
  1. every token position p of every doc emits its k-gram (the tokens
     [p, p+k)) — the positional shingle array the minhash miner already
     computes (dedup.shingles / shingle_hashes: array index = token
     offset), posexploded instead of set-collapsed;
  2. one global groupBy counts each gram; grams occurring >= min_count
     times anywhere in the corpus (across docs OR repeated inside one
     doc) are "repeated";
  3. a semi-join marks the positions whose gram is repeated; per doc,
     the intervals [p, p+k) merge into maximal covered spans by the
     classic gaps-and-islands pass (a new island starts where
     p > max(prev end); touching intervals merge — covered tokens form
     contiguous runs);
  4. ``remove_repeated_spans`` rebuilds each doc's text from the tokens
     NOT covered by any span (reconstruction is over NORMALIZED text —
     the same canonical form every other dedup op grades on).

Scale design: one narrow gram pass (zip_with shingles — tokenize once
per doc, not once per gram), one groupBy of (gram, doc, pos) rows, one
equi-semi-join back, one per-doc window. No corpus broadcast, no
self-join, no quadratic anything; the only state is the repeated-gram
frame, which at 100 TB is written once and reused by every consumer
(the decontam asymmetry does not apply — both sides are the corpus).
``hashed=True`` runs the gram pass on dedup.shingle_hashes longs (no
gram string ever materializes — the 100 TB path); the default string
path is what the SQL oracle replays exactly (the decontam precedent).

Cited reference behavior: the reference has no span-level op
(dedup is whole-row ON CONFLICT in repo.rs:26); this extends SURVEY
§2.11's E1 with the standard within-document recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from spectraplex_spark.operators.dedup import _P, _POLY_C
from spectraplex_spark.operators.textops import let1, tokens


def positional_shingles(text_col, n: int):
    """k-gram STRING array where index i (0-based) is the gram starting
    at token offset i; docs shorter than n yield an empty array. Same
    zip_with discipline as dedup.shingles (tokenize once per pass, not
    once per gram) but WITHOUT the array_distinct/whole-doc fallback —
    spans need every occurrence at its offset, not the set."""
    def _from(th):
        acc = th
        for j in range(1, n):
            acc = F.zip_with(
                acc,
                F.slice(th, j + 1, F.greatest(F.size(th) - j, F.lit(1))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        windowed = F.slice(acc, 1, F.greatest(F.size(th) - (n - 1), F.lit(1)))
        return F.when(F.size(th) >= n, windowed).otherwise(
            F.array().cast("array<string>")
        )

    # let1: bind the token array once — the body references it ~2n
    # times and each reference used to re-inline the tokenize chain
    # (r14 optimization round, same fix as dedup.shingles).
    return let1(tokens(text_col), _from)


def positional_shingle_hashes(text_col, n: int):
    """Positional twin of dedup.shingle_hashes: polynomial-combined
    token-hash longs at each offset, no gram string ever materialized —
    the 100 TB path (31-bit collision caveat as in the minhash miner)."""
    def _from(th):
        acc = th
        for j in range(1, n):
            acc = F.zip_with(
                acc,
                F.slice(th, j + 1, F.greatest(F.size(th) - j, F.lit(1))),
                lambda a, b: F.pmod(a * F.lit(_POLY_C) + b, F.lit(_P)),
            )
        windowed = F.slice(acc, 1, F.greatest(F.size(th) - (n - 1), F.lit(1)))
        return F.when(F.size(th) >= n, windowed).otherwise(
            F.array().cast("array<bigint>")
        )

    # let1: tokenize+hash once, not once per body reference (r14).
    return let1(
        F.transform(tokens(text_col), lambda t: F.pmod(F.xxhash64(t), F.lit(_P))),
        _from,
    )


def _gram_positions(
    df: DataFrame, k: int, text_col: str, id_col: str, hashed: bool
) -> DataFrame:
    """(doc_id, pos, _g): the k-gram starting at token offset pos
    (0-based)."""
    gram = (
        positional_shingle_hashes(F.col(text_col), k)
        if hashed
        else positional_shingles(F.col(text_col), k)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(gram).alias("pos", "_g"),
    )


def repeated_spans(
    df: DataFrame,
    k: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    hashed: bool = False,
) -> DataFrame:
    """Maximal repeated spans per document: (doc_id, span_start,
    span_end) in token offsets, end-exclusive — every k-gram inside a
    span occurs >= min_count times in the corpus, and spans are merged
    maximally (no two spans of one doc overlap or touch)."""
    grams = _gram_positions(df, k, text_col, id_col, hashed)
    rep = (
        grams.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("_g")
    )
    hits = grams.join(rep, "_g", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(k)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end), F.lit(1)
    ).otherwise(F.lit(0))
    islands = hits.withColumn(
        "_island", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy("doc_id", "_island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k)).cast("long").alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def remove_repeated_spans(
    df: DataFrame,
    k: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    hashed: bool = False,
) -> DataFrame:
    """(<id_col>, n_tokens, n_removed, clean_text): each doc's NORMALIZED
    text with every repeated span stripped at token granularity. Docs
    with no repeated span pass through with n_removed = 0 (their
    clean_text is the normalized full text — reconstruction is always
    from the token array, so output text is canonical either way)."""
    spans = repeated_spans(df, k, text_col, id_col, min_count, hashed)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    )
    joined = toks.join(per_doc, "doc_id", "left")
    covered = lambda i: F.exists(  # noqa: E731 — 0-based token offset i
        F.col("_spans"),
        lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
    )
    kept = F.when(F.col("_spans").isNull(), F.col("_toks")).otherwise(
        F.filter(F.col("_toks"), lambda t, i: ~covered(i))
    )
    return joined.select(
        F.col("doc_id").alias(id_col),  # preserve the caller's id name
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )
