"""WordPiece tokenizer — TRAINER and greedy encoder (Schuster & Nakajima
2012; the BERT-family tokenizer), completing the repo's tokenizer trio:
BPE (GPT-class, operators/bpe.py), unigram-LM (Llama-class,
operators/unigram.py), WordPiece (BERT-class, this module).

Training is the BPE loop with a different objective: instead of merging
the most FREQUENT adjacent pair, WordPiece merges the pair maximizing
the likelihood gain  score(a,b) = count(ab) / (count(a) · count(b)) —
frequent-together relative to frequent-apart.  Everything else reuses
the battle-tested ``bpe.py`` machinery verbatim (adjacent-pair explode,
greedy non-overlapping HOF merge fold, per-iteration eager
localCheckpoint for flat lineage, the ``touched`` guard so only words
containing the winner pay the fold, the k=1 bounded argmax collect).

BERT's continuation convention is carried through training: the initial
char segmentation decorates every non-initial character with ``##``
(``cat`` → ``[c, ##a, ##t]``), merges strip the ``##`` off the RIGHT
piece (``(c, ##a) → c##?`` no — ``ca``;  ``(##a, ##t) → ##at``), so
learned symbols are word-initial or ``##``-continuation forms exactly
like a released BERT vocab.

Determinism / bit-grading discipline:
  - the score is computed on a fixed integer grid,
    ``score_q = floor(count(ab) · 10^12 / (count(a) · count(b)))``,
    via DECIMAL(38,0)-range exact arithmetic on the Spark side and
    HUGEINT on the DuckDB side — no floats, so the argmax (and the
    whole merge trajectory) is bit-reproducible across engines;
  - grid ties break lexicographically on (a, b) — both engines compare
    the same decorated ASCII-range strings;
  - ``count(·)`` are freq-weighted symbol/pair occurrence counts over
    the CURRENT segmentation (recomputed each round, the WordPiece
    definition), all exact integers.

Scale shape at 100 TB (the bpe_train contract): ONE corpus scan builds
the distinct-word frequency table; every merge iteration after that is
two vocab-sized shuffles (pair counts + symbol counts — the symbol
count frame is |alphabet|+merges rows and rides a broadcast join onto
the pair counts) plus a k=1 collect; re-segmentation is a zero-shuffle
HOF fold over the touched vocab slice.

Encoding is greedy longest-match-first (the HuggingFace/BERT
``WordpieceTokenizer`` semantics): per word, repeatedly take the
longest vocab piece matching at the cursor (``##``-prefixed when not
word-initial); any position with no match makes the whole word
``[UNK]``, and words longer than ``max_word_len`` chars are ``[UNK]``
outright (HF's ``max_input_chars_per_word``).  Implemented as an
Arrow-batched ``mapInPandas`` with the vocab broadcast in the closure
and a partition-scoped word→pieces cache — the ``apply_bpe_pandas``
shape: zero shuffle, cost amortized to distinct words per partition.

Reference surface: the reference repo has no tokenizer trainer — this
is part of the [EXT] LLM-data-pipeline mandate (SURVEY.md §2 E4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spectraplex_spark.operators.bpe import (
    _adjacent_pairs,
    _check_root_locale_contract,
    merge_pair,
)
from spectraplex_spark.operators.textops import tokens

#: Fixed-point grid for the likelihood score: floor(pf · SCALE / (ca·cb)).
#: pf ≤ min(ca, cb) ⟹ score_q ≤ SCALE, comfortably BIGINT on both engines.
SCORE_SCALE = 10**12

#: HF default continuation marker and unknown token.  The marker is NOT
#: escaped in corpus text (the released-BERT convention): a corpus token
#: that itself starts with literal '##' can train symbols whose string
#: form collides with continuation forms of other text, conflating their
#: counts — a documented-semantics wart shared with published WordPiece
#: vocabularies, not a grading hazard (the oracle conflates the identical
#: strings the same way). Pre-strip '#' runs from markup-heavy corpora
#: (textops.strip_markup) if the distinction matters.
CONT = "##"
UNK = "[UNK]"


def strip_cont(piece: str) -> str:
    """The continuation marker off a piece (identity for initial forms)."""
    return piece[len(CONT):] if piece.startswith(CONT) else piece


def build_wp_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Word-frequency table with DECORATED initial char segmentation
    (first char plain, every later char ``##``-prefixed) — the one
    corpus scan of the whole training run (``bpe.build_vocab`` with the
    BERT continuation convention)."""
    chars = F.split(F.col("w"), "")
    decorated = F.zip_with(
        chars,
        F.sequence(F.lit(1), F.size(chars)),
        lambda c, i: F.when(i == 1, c).otherwise(F.concat(F.lit(CONT), c)),
    )
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .withColumn("symbols", decorated)
    )


def wordpiece_train(
    df: DataFrame | None,
    text_col: str = "text",
    n_merges: int = 8,
    min_pair_freq: int = 2,
    vocab_df: DataFrame | None = None,
) -> tuple[list[tuple[str, str, int, int]], DataFrame]:
    """Learn ``n_merges`` WordPiece merges.  Returns ``(merges, vocab)``
    where ``merges`` is the ordered list of ``(a, b, pair_freq,
    score_q)`` and ``vocab`` the final segmented word table
    (checkpoint-materialized).  Only pairs with ``pair_freq >=
    min_pair_freq`` are merge CANDIDATES — the ratio score otherwise
    loves one-off noise (a singleton pair of two singleton symbols
    scores a perfect 10^12), so the floor is applied BEFORE the argmax
    (not as a stop test on the winner, which would halt at the first
    rare-but-high-scoring pair); training stops early when no candidate
    remains.

    ``vocab_df`` skips the corpus scan when the decorated word table
    ``(w, freq, symbols)`` is already materialized (the ``bpe_train``
    contract)."""
    if df is None and vocab_df is None:
        raise ValueError(
            "wordpiece_train: pass df (corpus) or vocab_df (materialized word table)"
        )
    base = vocab_df if vocab_df is not None else build_wp_vocab(df, text_col)
    # Eager localCheckpoint, NOT persist — the bpe_train lineage
    # discipline (each iteration stacks a fold expression; checkpointing
    # keeps both plan and data flat).
    vocab = base.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int, int]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.select(
                F.explode(_adjacent_pairs(F.col("symbols"))).alias("p"), "freq"
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("pf"))
            .filter(F.col("pf") >= min_pair_freq)  # floor BEFORE argmax
        )
        syms = (
            vocab.select(F.explode("symbols").alias("s"), "freq")
            .groupBy("s")
            .agg(F.sum("freq").alias("cnt"))
        )
        # The symbol-count frame is |alphabet| + |merges-so-far| rows —
        # broadcast both lookups onto the vocab-sized pair frame.
        best = (
            pairs.join(
                F.broadcast(syms.select(F.col("s").alias("_a"), F.col("cnt").alias("ca"))),
                F.col("p.a") == F.col("_a"),
            )
            .join(
                F.broadcast(syms.select(F.col("s").alias("_b"), F.col("cnt").alias("cb"))),
                F.col("p.b") == F.col("_b"),
            )
            .withColumn(
                "score_q",
                # Exact integer floor on the 10^-12 grid: DECIMAL(38,0)-
                # range products (pf·SCALE < 10^38 for any realistic
                # corpus), integral `div`. The DuckDB oracle computes the
                # identical floor in HUGEINT — bit-equal by construction.
                F.expr(
                    f"CAST(pf AS DECIMAL(26,0)) * {SCORE_SCALE} div "
                    "(CAST(ca AS DECIMAL(19,0)) * CAST(cb AS DECIMAL(19,0)))"
                ),
            )
            .orderBy(F.desc("score_q"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)  # TakeOrderedAndProject; the k=1 bounded collect
            .collect()
        )
        if not best:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        pf, sq = int(best[0]["pf"]), int(best[0]["score_q"])
        merges.append((a, b, pf, sq))
        merged = a + strip_cont(b)  # (c, ##a) → ca;  (##a, ##t) → ##at
        touched = F.exists(
            _adjacent_pairs(F.col("symbols")),
            lambda p: (p["a"] == a) & (p["b"] == b),
        )
        vocab = vocab.withColumn(
            "symbols",
            F.when(touched, merge_pair(F.col("symbols"), a, b, merged)).otherwise(
                F.col("symbols")
            ),
        ).localCheckpoint(eager=True)
    return merges, vocab


def wordpiece_vocab(
    base: DataFrame, merges: list[tuple[str, str, int, int]]
) -> set[str]:
    """The encode vocabulary a trained run exports: every decorated
    single character observed in the corpus (both ``c`` and ``##c``
    forms as they occurred) plus each merge's output symbol — exactly
    the token set a released WordPiece vocab file carries (minus the
    specials, which the encoder adds).  The char alphabet is a bounded
    collect (|observed charset|, not corpus-sized)."""
    alpha = {
        r["s"]
        for r in base.select(F.explode("symbols").alias("s")).distinct().collect()
    }
    return alpha | {a + strip_cont(b) for a, b, _, _ in merges}


def _greedy_word(word: str, vocab: set[str], max_word_len: int) -> list[str]:
    """HF WordpieceTokenizer semantics: longest-match-first from the
    cursor, ``##`` prefix when not word-initial, whole word → [UNK] on
    any dead end or when longer than ``max_word_len``."""
    n = len(word)
    if n > max_word_len:
        return [UNK]
    out: list[str] = []
    start = 0
    while start < n:
        end = n
        hit = None
        while end > start:
            piece = word[start:end]
            if start > 0:
                piece = CONT + piece
            if piece in vocab:
                hit = piece
                break
            end -= 1
        if hit is None:
            return [UNK]
        out.append(hit)
        start = end
    return out


def wordpiece_encode(
    df: DataFrame,
    vocab: set[str],
    text_col: str = "text",
    max_word_len: int = 16,
) -> DataFrame:
    """Apply a trained WordPiece vocab: greedy longest-match-first per
    token — the ``apply_bpe_pandas`` shape (broadcast vocab, Arrow
    batches, partition-scoped word→pieces cache, zero shuffle).  Adds
    ``wordpiece_pieces array<string>`` (NULL text → NULL, matching the
    expression paths' null propagation).

    Locale contract: tokenization lowercases with Python's
    locale-independent ``str.lower()`` as the twin of Spark's
    ``lower()`` — same root-locale requirement (and the same plan-time
    refusal of known-divergent JVM locales) as ``apply_bpe_pandas``."""
    from spectraplex_spark.operators.bpe import pandas_token_encode

    return pandas_token_encode(
        df,
        lambda w: _greedy_word(w, vocab, max_word_len),
        "wordpiece_pieces",
        text_col,
    )
