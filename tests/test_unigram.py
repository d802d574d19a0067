"""Unigram-LM tokenizer trainer (operators/unigram.py): integer log2
exactness, Viterbi determinism, and full-trajectory equality against a
pure-Python EM replica."""

from __future__ import annotations

import math

import pytest

from spectraplex_spark.operators.unigram import (
    BIG_COST,
    ilog2q,
    piece_costs,
    unigram_encode,
    unigram_train,
    viterbi_segment,
)


def test_ilog2q_tracks_log2_on_the_grid():
    """The fixed-point integer log2 stays within one grid step of the
    float answer for every magnitude the trainer can see, and is exact
    on powers of two."""
    for x in [1, 2, 3, 7, 10, 97, 1024, 10**6, 10**12, (1 << 53) - 1]:
        got = ilog2q(x) / (1 << 16)
        assert abs(got - math.log2(x)) < 2 / (1 << 16), x
    for e in range(0, 60):
        assert ilog2q(1 << e) == e << 16
    with pytest.raises(ValueError):
        ilog2q(0)


def test_viterbi_properties():
    cost = {"a": 10, "b": 10, "ab": 15, "ba": 50}
    # 'ab' (15) beats 'a'+'b' (20)
    assert viterbi_segment("ab", cost) == ["ab"]
    # tie → singles (bigram must be STRICTLY cheaper)
    assert viterbi_segment("ab", {"a": 10, "b": 10, "ab": 20}) == ["a", "b"]
    # out-of-vocab input still segments: one sentinel bigram (1×BIG)
    # strictly beats two sentinel singles (2×BIG)
    assert viterbi_segment("xy", cost) == ["xy"]
    assert viterbi_segment("x", cost) == ["x"]
    # pieces always reassemble the word
    for w in ("", "a", "abba", "abab", "zzzab"):
        assert "".join(viterbi_segment(w, cost)) == w
    # global optimum, not greedy: 'aab' with cheap 'ab' splits a|ab
    assert viterbi_segment("aab", cost) == ["a", "ab"]


def test_ilog2q_properties_hypothesis():
    """Monotone, grid-accurate, and width-safe across the full BIGINT
    range the oracle's CASE-guarded shift must also handle."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=1, max_value=(1 << 62) - 1))
    def check(x):
        v = ilog2q(x)
        assert abs(v / (1 << 16) - math.log2(x)) < 2 / (1 << 16)
        if x > 1:
            assert ilog2q(x - 1) <= v  # monotone non-decreasing

    check()


def test_viterbi_optimal_vs_bruteforce_hypothesis():
    """The DP's cost equals the true minimum over ALL 1/2-piece
    segmentations (enumerated), and the pieces always reassemble the
    word — on random words and random cost tables."""
    from hypothesis import given, settings, strategies as st

    def brute_min(word, cost, big=BIG_COST):
        if not word:
            return 0
        best = cost.get(word[0], big) + brute_min(word[1:], cost, big)
        if len(word) >= 2:
            alt = cost.get(word[:2], big) + brute_min(word[2:], cost, big)
            best = min(best, alt)
        return best

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(alphabet="abc", min_size=0, max_size=9),
        st.dictionaries(
            st.text(alphabet="abc", min_size=1, max_size=2),
            st.integers(min_value=0, max_value=1000),
            max_size=12,
        ),
    )
    def check(word, cost):
        pieces = viterbi_segment(word, cost)
        assert "".join(pieces) == word
        got = sum(cost.get(p, BIG_COST) for p in pieces)
        assert got == brute_min(word, cost)

    check()


def _py_unigram_train(word_freqs, iters=3):
    """Pure-Python hard-EM replica of unigram_train's trajectory."""
    counts: dict[str, int] = {}
    for w, f in word_freqs.items():
        for k in range(len(w)):
            counts[w[k]] = counts.get(w[k], 0) + f
            if k + 1 < len(w):
                counts[w[k : k + 2]] = counts.get(w[k : k + 2], 0) + f
    out = []
    for i in range(1, iters + 1):
        cost = piece_costs(counts)
        new: dict[str, int] = {}
        for w, f in word_freqs.items():
            for p in viterbi_segment(w, cost):
                new[p] = new.get(p, 0) + f
        counts = new
        out.extend(
            (i, p, cost.get(p, BIG_COST), n) for p, n in sorted(counts.items())
        )
    return out


def test_unigram_train_matches_python_replica(spark):
    """Trajectory equality on a corpus with repeated words, a
    single-char word (the Spark sequence(1,0)-descends trap), and mixed
    case (tokens() lowers)."""
    rows = [
        (1, "the theme the them"),
        (2, "a ab abb the"),
        (3, "THE Theme  ab\tba"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wf = {
        "the": 4, "theme": 2, "them": 1, "a": 1, "ab": 2, "abb": 1, "ba": 1,
    }
    got = [
        (r["iter"], r["piece"], r["cost_q"], r["n_uses"])
        for r in unigram_train(df, iters=3).collect()
    ]
    assert got == _py_unigram_train(wf, iters=3)
    # and the counts conserve mass: Σ n_uses·len(piece) == Σ freq·len(word)
    total_chars = sum(f * len(w) for w, f in wf.items())
    for i in (1, 2, 3):
        assert (
            sum(n * len(p) for it, p, _, n in got if it == i) == total_chars
        ), i


def test_prune_vocab_rules():
    from spectraplex_spark.operators.unigram import prune_vocab

    counts = {"a": 5, "b": 1, "ab": 10, "ba": 10, "bb": 2}
    got = prune_vocab(counts, 3)
    # top-3 by (count desc, piece asc) = ab, ba, a — plus ALL chars
    assert got == {"a": 5, "b": 1, "ab": 10, "ba": 10}
    assert prune_vocab(counts, 10) == counts  # no-op when under budget


def test_unigram_train_prune_schedule(spark):
    """vocab_size caps the competing pieces each round (single chars
    always survive), and the pruned trajectory matches a pure-Python
    replica with the same schedule."""
    from spectraplex_spark.operators.unigram import prune_vocab

    rows = [(1, "the theme the them"), (2, "a ab abb the")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wf = {"the": 3, "theme": 1, "them": 1, "a": 1, "ab": 1, "abb": 1}
    K = 12

    counts: dict[str, int] = {}
    for w, f in wf.items():
        for k in range(len(w)):
            counts[w[k]] = counts.get(w[k], 0) + f
            if k + 1 < len(w):
                counts[w[k : k + 2]] = counts.get(w[k : k + 2], 0) + f
    counts = prune_vocab(counts, K)
    expect = []
    for i in (1, 2):
        cost = piece_costs(counts)
        new: dict[str, int] = {}
        for w, f in wf.items():
            for p in viterbi_segment(w, cost):
                new[p] = new.get(p, 0) + f
        counts = prune_vocab(new, K)
        expect.extend(
            (i, p, cost.get(p, BIG_COST), n) for p, n in sorted(counts.items())
        )

    got = [
        (r["iter"], r["piece"], r["cost_q"], r["n_uses"])
        for r in unigram_train(df, iters=2, vocab_size=K).collect()
    ]
    assert got == expect
    # the schedule binds: never more than K + (surviving chars) pieces
    for i in (1, 2):
        n_i = sum(1 for it, *_ in got if it == i)
        n_chars_i = sum(1 for it, p, _, _ in got if it == i and len(p) == 1)
        assert n_i <= K + n_chars_i


def test_unigram_train_long_words_excluded(spark):
    """Words over max_word_len never reach the trainer (documented cap:
    the oracle's DP unrolls positionally)."""
    df = spark.createDataFrame(
        [(1, "short " + "x" * 20)], "doc_id long, text string"
    )
    got = unigram_train(df, iters=1, max_word_len=12).collect()
    assert all("x" not in r["piece"] for r in got)
    assert any(r["piece"] == "sh" or r["piece"] == "s" for r in got)


def test_unigram_train_empty_corpus_fails_loudly(spark):
    """NULL-only text and only-overlong words both yield an empty
    training vocabulary — a clear ValueError, not an ilog2q(0) raise
    three calls deep."""
    import pytest

    nulls = spark.createDataFrame([(1, None)], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty training corpus"):
        unigram_train(nulls, iters=1)
    overlong = spark.createDataFrame(
        [(1, "x" * 40 + " " + "y" * 30)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="empty training corpus"):
        unigram_train(overlong, iters=1, max_word_len=12)


def test_unigram_encode_roundtrip(spark):
    """Encode applies the trained costs per token: pieces reassemble the
    lowered-tokenized text; NULL text propagates; the word cache and the
    pinned Java-\\s tokenization match the BPE twin's discipline."""
    df = spark.createDataFrame(
        [(1, "ab ab  ba"), (2, None), (3, "AB")],
        "doc_id long, text string",
    )
    cost = {"a": 10, "b": 10, "ab": 15}
    got = {
        r["doc_id"]: r["unigram_pieces"]
        for r in unigram_encode(df, cost, max_word_len=12).collect()
    }
    assert got[1] == ["ab", "ab", "b", "a"]
    assert got[2] is None
    assert got[3] == ["ab"]
