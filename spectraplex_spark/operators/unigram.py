"""Unigram-LM (SentencePiece-style) tokenizer TRAINER — the sixth
iterative-algorithm class (after Lloyd's k-means, label propagation,
BPE, PageRank, the batch perceptron): hard-EM over a substring vocab.

What Llama-class models actually ship is a unigram tokenizer (Kudo
2018): each piece carries a probability, a word's segmentation is the
Viterbi-best product of piece probabilities, and training alternates
(E) re-segment the corpus under current piece scores with (M)
re-estimate scores from segmentation counts.  This module implements
the hard-EM variant under the repo's bit-grading discipline:

  - **Integer-grid log-probs.** Piece cost = ilog2q(total) − ilog2q(n)
    on a 2^-16 grid, where ``ilog2q`` is a PURE-INTEGER fixed-point
    log2 (exponent from the bit length, 16 fraction bits by repeated
    mantissa squaring — the classical shift-and-square algorithm).  No
    float log anywhere, so Spark, Python, and the DuckDB oracle agree
    bit-for-bit (the verify-ledger rule: cross-engine float transcend-
    entals may differ in the last ulp and a floor() amplifies that to
    a full grid step).
  - **Viterbi E-step** over pieces of length 1–2 with a deterministic
    tie-break (bigram only when STRICTLY cheaper), run per DISTINCT
    word (corpora repeat words heavily — cost is vocabulary-sized).
    The per-word DP is genuinely inexpressible as a fixed Catalyst
    expression (variable-length recurrence), so it rides the
    apply_bpe_pandas precedent: an Arrow-batched mapInPandas with the
    cost table broadcast in the closure.
  - **M-step in Spark**: explode chosen pieces, partial-aggregated
    groupBy, one VOCAB-SIZED collect per iteration (the bpe_train /
    perceptron bounded-collect contract — counts are |alphabet| +
    |alphabet|² at most, never corpus-sized).
  - **Flat lineage**: the distinct-word frame is computed once and
    checkpointed; each E-step re-reads it (the r9 iterative-loop rule).

Simplifications vs full SentencePiece, documented: pieces are capped
at length 2 and words at ``max_word_len`` chars (the oracle unrolls
the DP positionally; raise the caps together), the seed vocab is all
observed chars + adjacent bigrams (substring-frequency seeding), and
the prune schedule (:func:`prune_vocab`, opt-in via ``vocab_size``) is
a hard top-K cut rather than SentencePiece's likelihood-loss ranking.
Fixed iteration count, like every trainer here.

Scale shape at 100 TB: the corpus is touched once (token explode →
word-count shuffle); every EM iteration runs on the distinct-word
frame (≪ corpus) with zero additional corpus scans; driver state is
vocab-sized per iteration.

Reference surface: the reference repo has no tokenizer trainer — this
is part of the [EXT] LLM-data-pipeline mandate (SURVEY.md §2 E4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spectraplex_spark.operators.components import lineage_truncate
from spectraplex_spark.operators.textops import tokens

#: Sentinel cost for pieces absent from the current vocab — large enough
#: to dominate any real path (word caps × real costs stay far below it)
#: while keeping every DP sum well inside BIGINT.
BIG_COST = 1 << 40

FRAC_BITS = 16
_Q = 30  # mantissa fixed-point for the squaring iteration


def ilog2q(x: int, frac_bits: int = FRAC_BITS) -> int:
    """floor-ish log2(x) on the 2^-frac_bits grid, pure integer.

    exponent = bit_length − 1; fraction by ``frac_bits`` rounds of
    mantissa squaring in Q30 (y ∈ [1,2): square; if ≥2 emit 1 and
    halve, else emit 0).  Every operation is exact BIGINT arithmetic —
    the DuckDB oracle unrolls the same 16 steps as chained CTEs and
    reproduces every bit.  x must be ≥ 1.
    """
    if x < 1:
        raise ValueError(f"ilog2q: x must be >= 1, got {x}")
    e = x.bit_length() - 1
    y = (x << _Q) >> e  # Q30 mantissa in [1, 2)
    f = 0
    for _ in range(frac_bits):
        ysq = (y * y) >> _Q
        if ysq >= (2 << _Q):
            y = ysq >> 1
            f = f * 2 + 1
        else:
            y = ysq
            f = f * 2
    return (e << frac_bits) + f


def piece_costs(counts: dict[str, int]) -> dict[str, int]:
    """M-step finish: counts → integer-grid costs
    cost(p) = ilog2q(Σ counts) − ilog2q(count_p)  (≈ −log2 p on the grid)."""
    total = sum(counts.values())
    it = ilog2q(total)
    return {p: it - ilog2q(c) for p, c in counts.items()}


def viterbi_segment(word: str, cost: dict[str, int], big: int = BIG_COST) -> list[str]:
    """Min-cost segmentation into pieces of length 1–2; bigram wins only
    when STRICTLY cheaper (the tie-break the SQL oracle replays)."""
    n = len(word)
    b = [0] * (n + 1)
    # backpointers (chosen piece length per position), reconstructed once
    # at the end — the old full-path-per-position build copied O(n) lists
    # at every k, O(n^2) time/memory per word (review finding r12)
    back = [1] * (n + 1)
    for k in range(1, n + 1):
        best = b[k - 1] + cost.get(word[k - 1], big)
        blen = 1
        if k >= 2:
            alt = b[k - 2] + cost.get(word[k - 2 : k], big)
            if alt < best:
                best = alt
                blen = 2
        b[k] = best
        back[k] = blen
    pieces: list[str] = []
    k = n
    while k > 0:
        pieces.append(word[k - back[k] : k])
        k -= back[k]
    pieces.reverse()
    return pieces


def word_frequencies(
    df: DataFrame, text_col: str = "text", max_word_len: int = 12
) -> DataFrame:
    """(word, freq) over the corpus — the one corpus-sized pass.  Words
    longer than ``max_word_len`` are excluded from TRAINING (documented:
    the oracle's DP unrolls positionally; at real scale raise the cap —
    the Spark side is length-agnostic)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word").between(1, max_word_len))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _seed_counts(words: DataFrame) -> DataFrame:
    """Substring-frequency seeding: every char position and every
    adjacent bigram of every word, weighted by word frequency.
    NB: Spark's sequence(1, 0) DESCENDS ([1, 0]) — the single-char word
    case needs the explicit empty-array guard."""
    chars = words.select(
        F.explode(F.expr("sequence(1, length(word))")).alias("k"), "word", "freq"
    ).select(F.expr("substring(word, k, 1)").alias("piece"), "freq")
    bigrams = (
        words.select(
            F.explode(
                F.when(
                    F.length("word") >= 2, F.expr("sequence(1, length(word) - 1)")
                ).otherwise(F.expr("array()"))
            ).alias("k"),
            "word",
            "freq",
        )
        .select(F.expr("substring(word, k, 2)").alias("piece"), "freq")
    )
    return (
        chars.unionByName(bigrams)
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def prune_vocab(counts: dict[str, int], vocab_size: int) -> dict[str, int]:
    """SentencePiece-style prune schedule step: keep the ``vocab_size``
    highest-count pieces (count DESC, piece ASC — deterministic) plus
    ALL single characters (the standard always-keep set, so every word
    stays segmentable without sentinel costs)."""
    if len(counts) <= vocab_size:
        return counts
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = {p for p, _ in ranked[:vocab_size]}
    keep |= {p for p in counts if len(p) == 1}
    return {p: c for p, c in counts.items() if p in keep}


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    iters: int = 3,
    max_word_len: int = 12,
    reliable_checkpoint: bool = False,
    vocab_size: int | None = None,
) -> DataFrame:
    """Hard-EM unigram trainer.  Returns the full TRAJECTORY — one row
    per (iteration, piece used in that iteration's Viterbi output):

      iter INT, piece STRING, cost_q BIGINT (the cost the E-step used,
      derived from the PREVIOUS counts; BIG_COST if out-of-vocab),
      n_uses BIGINT (freq-weighted uses in the new segmentation)

    so the whole EM trajectory — not just the final vocab — bit-grades
    against the unrolled-CTE oracle.

    ``vocab_size`` enables the SentencePiece prune schedule: after every
    M-step (and on the seed), the vocab is cut to the highest-count
    ``vocab_size`` pieces plus all single chars (:func:`prune_vocab`) —
    lower-probability pieces stop competing in the next Viterbi round.
    The graded catalog entry trains unpruned (None).
    """
    from pyspark.sql import types as T

    spark = df.sparkSession
    words = lineage_truncate(
        word_frequencies(df, text_col, max_word_len), reliable_checkpoint
    )
    counts = {
        r["piece"]: r["cnt"] for r in _seed_counts(words).collect()
    }  # vocab-sized (≤ |alphabet| + |alphabet|²)
    if not counts:  # loud seam, not an ilog2q(0) ValueError three calls deep
        raise ValueError(
            "unigram_train: empty training corpus — no words of length "
            f"1..{max_word_len} in column {text_col!r}"
        )
    if vocab_size is not None:
        counts = prune_vocab(counts, vocab_size)

    seg_schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("freq", T.LongType()),
            T.StructField("pieces", T.ArrayType(T.StringType())),
        ]
    )
    out_rows: list[tuple[int, str, int, int]] = []
    for i in range(1, iters + 1):
        cost = piece_costs(counts)

        def seg_batches(batches, cost=cost):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["pieces"] = [
                    viterbi_segment(w, cost) for w in pdf["word"]
                ]
                yield pdf

        seg = words.mapInPandas(seg_batches, schema=seg_schema)
        counts = {
            r["piece"]: r["n_uses"]
            for r in (
                seg.select(F.explode("pieces").alias("piece"), "freq")
                .groupBy("piece")
                .agg(F.sum("freq").cast("long").alias("n_uses"))
                .collect()  # vocab-sized, the bounded-collect contract
            )
        }
        if vocab_size is not None:
            counts = prune_vocab(counts, vocab_size)
        out_rows.extend(
            (i, p, cost.get(p, BIG_COST), n) for p, n in sorted(counts.items())
        )
    return spark.createDataFrame(
        out_rows, "iter int, piece string, cost_q long, n_uses long"
    )


def unigram_encode(
    df: DataFrame,
    cost: dict[str, int],
    text_col: str = "text",
    *,
    max_word_len: int | None,
) -> DataFrame:
    """Apply a trained unigram tokenizer: per row, Viterbi-segment every
    token under the (broadcast) cost table — the shared
    ``pandas_token_encode`` harness (zero shuffle, Arrow batches,
    partition-scoped word→pieces cache, plan-time root-locale refusal).

    ``max_word_len`` is REQUIRED (keyword-only, no default — r12 ADVICE:
    a silent-drop default is a data-loss trap for library callers), and
    words longer than the cap contribute NO pieces.  Pass the TRAINING
    cap (the catalog uses 12) when encoding under the bit-graded oracle:
    over-cap words were never seen by training (word_frequencies filters
    them) and the positional-unroll oracle cannot encode them, so an
    uncapped encode would diverge on any corpus with a 13+-char token
    (review finding r12: parity previously held only because the
    fixtures' longest token is 8 chars).  Pass ``None`` for a
    length-agnostic encode at real scale (segmentation is O(len) via
    backpointer DP) — just not under the bit-graded oracle."""
    from spectraplex_spark.operators.bpe import pandas_token_encode

    def seg(w: str) -> list[str]:
        if max_word_len is not None and len(w) > max_word_len:
            return []
        return viterbi_segment(w, cost)

    return pandas_token_encode(df, seg, "unigram_pieces", text_col)
