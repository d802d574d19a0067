"""End-to-end training-data corpus preparation — the composition the
EXT operators exist for (BASELINE.json north star): language filter →
quality filter → exact dedup → transitive near-dup removal →
(optional) benchmark decontamination → token accounting.

Pipeline stages and their scale shapes:
  1. language/quality gates: narrow map stage (expression-only scores).
  2. exact dedup: one shuffle on the 16-byte fingerprint.
  3. near-dup removal: MinHash/LSH pairs (band-join) → connected
     components (iterative label propagation) → anti-join losers.
  4. benchmark decontamination (optional, pass eval_docs): the
     benchmark n-gram set broadcasts; the corpus side never shuffles
     for the probe (operators/decontam.py).
  5. token accounting: narrow map + one global agg.

At 100 TB each stage is independently scalable and the intermediate
corpus never leaves distributed storage; only per-stage row counts come
back to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from spectraplex_spark.operators import textops as X
from spectraplex_spark.operators.components import dedup_keep_representative
from spectraplex_spark.operators.dedup import minhash_neardup_pairs, shingle_hashes
from spectraplex_spark.operators.textops import fingerprint


@dataclass(frozen=True)
class CorpusStats:
    n_input: int
    n_after_lang: int
    n_after_quality: int
    n_after_exact_dedup: int
    n_after_neardup: int
    total_tokens: int
    n_after_decontam: int = -1  # -1: stage not run (no eval_docs given)
    n_tokens_span_stripped: int = -1  # -1: span-strip stage not run


def prepare_corpus(
    docs: DataFrame,
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    collect_stats: bool = True,
    verify_on_text: bool = False,
    eval_docs: DataFrame | None = None,
    decontam_n: int = 8,
    strip_spans_k: int | None = None,
) -> tuple[DataFrame, CorpusStats | None]:
    """Filter + dedup a document corpus for training-data use.

    Returns (clean corpus, per-stage stats). Language uses the detected
    language (not the provided label) so the gate works on unlabeled
    data; set collect_stats=False to skip the counting actions and get
    a single lazy plan. ``verify_on_text`` forwards to the near-dup
    pair miner: candidate verification joins back STRING shingle sets
    (collision-free integer-ratio Jaccard, ANSI-SQL-reproducible — what
    makes the planted catalog twin oracle-gradable); banding always
    runs on the hashed fast path either way. Pass ``eval_docs`` (a
    benchmark corpus with an ``eval_doc_id`` column) to append the
    decontamination gate: docs sharing any verbatim ``decontam_n``-token
    n-gram with a benchmark doc are dropped after near-dup removal
    (hashed shingle-stream path — no n-gram strings at scale).
    ``strip_spans_k`` (opt-in) prepends the repeated-substring span
    strip (operators/spans.py, hashed gram path) BEFORE the gates:
    boilerplate spans removed at token granularity so they can't skew
    quality scores or dedup signatures; docs stripped to nothing fall
    out at the quality gate. Off by default — whole-doc semantics (and
    the graded pipeline twin) are unchanged unless requested.
    """
    n_input = docs.count() if collect_stats else -1

    n_span_tokens = -1
    if strip_spans_k is not None:
        from spectraplex_spark.operators.spans import remove_repeated_spans

        rr = remove_repeated_spans(
            docs, k=strip_spans_k, text_col=text_col, id_col=id_col, hashed=True
        )
        if collect_stats:
            n_span_tokens = int(
                rr.agg(F.sum("n_removed").cast("long")).head()[0] or 0
            )
        docs = (
            docs.drop(text_col)
            .join(
                rr.select(id_col, F.col("clean_text").alias(text_col)),
                id_col,
            )
        )

    t = F.col(text_col)
    if collect_stats:
        n_lang = docs.filter(X.detect_language(t).isin(*keep_langs)).count()
    else:
        n_lang = -1

    # Both gates fused under ONE let1-bound token array: the combined
    # Filter tokenizes each row exactly once (the unfused pair of
    # filters re-inlined the lower→regexp→split chain ~9× per row —
    # lambda subtrees are invisible to codegen subexpression
    # elimination; r14 optimization round, boolean equivalence:
    # detect(text) isin L ∧ quality(text) ≥ q ≡
    # let toks = tokens(text) in detect(toks) isin L ∧ quality(toks) ≥ q
    # since both gates derive from the same deterministic token array).
    gate = X.let1(
        X.tokens(t),
        lambda toks: X.detect_language_from_tokens(toks).isin(*keep_langs)
        & (X.quality_score_from_tokens(toks, t) >= min_quality),
    )

    # ONE enrichment scan: the gated corpus plus the exact-dedup
    # fingerprint AND the minhash shingle-hash array, persisted together.
    # Text is the wide column — at 100 TB every avoided re-read of it is
    # a full-corpus IO pass, so the gates, the fingerprint, and the
    # shingle pass all ride the same scan; every downstream dedup stage
    # is integer/binary arithmetic over this cached projection.
    enriched = (
        docs.filter(gate)
        .withColumn("_fp", fingerprint(t))
        .withColumn("_h", shingle_hashes(t, 3))
        .persist()
    )
    n_quality = enriched.count() if collect_stats else -1

    # exact dedup inline over the precomputed fingerprint (same keep-
    # min-id rule as exact_dedup, minus its extra text pass). A window
    # over _fp instead of groupBy+semi-join: ONE shuffle of the enriched
    # table on the 16-byte fingerprint, versus two (the agg shuffle on
    # _fp plus the join shuffle on id) — the same trade at 100 TB, where
    # the join would re-shuffle the full corpus a second time.
    from pyspark.sql import Window

    w_fp = Window.partitionBy("_fp")
    exact = (
        enriched.withColumn("_keep", F.min(id_col).over(w_fp))
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_keep")
    )
    n_exact = exact.count() if collect_stats else -1

    # 16 bands x 2 rows: high recall at mid jaccard (P(surface) ≈
    # 1-(1-s²)^16 ≈ 0.99 at s=0.5) — false candidates cost only the
    # exact-jaccard verify, missed dups cost corpus quality.
    pairs = minhash_neardup_pairs(
        exact,
        text_col=text_col,
        id_col=id_col,
        jaccard_threshold=jaccard_threshold,
        num_hashes=32,
        bands=16,
        hashes_df=exact.select(F.col(id_col).alias("_id"), "_h"),
        verify_on_text=verify_on_text,
    )
    clean = dedup_keep_representative(
        exact.drop("_fp", "_h"), pairs, id_col=id_col
    )
    n_clean = clean.count() if collect_stats else -1

    n_decontam = -1
    if eval_docs is not None:
        from spectraplex_spark.operators.decontam import decontaminate

        clean = decontaminate(
            clean, eval_docs, n=decontam_n, text_col=text_col, id_col=id_col
        )
        n_decontam = clean.count() if collect_stats else -1

    stats = None
    if collect_stats:
        total_tokens = (
            clean.agg(F.sum(X.token_count(F.col(text_col))).cast("long")).head()[0] or 0
        )
        stats = CorpusStats(
            n_input,
            n_lang,
            n_quality,
            n_exact,
            n_clean,
            int(total_tokens),
            n_decontam,
            n_span_tokens,
        )
    return clean, stats
