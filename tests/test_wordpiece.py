"""WordPiece trainer + greedy encoder (operators/wordpiece.py):
trajectory equality against a pure-Python likelihood-scored replica,
greedy longest-match semantics, and the decorated-segmentation rules.
Cross-engine grading is in test_oracle_parity.py
(wordpiece_trained_merges / wordpiece_encode_topk)."""

from __future__ import annotations

import re

import pytest

from spectraplex_spark.operators.wordpiece import (
    CONT,
    SCORE_SCALE,
    UNK,
    _greedy_word,
    build_wp_vocab,
    strip_cont,
    wordpiece_encode,
    wordpiece_train,
    wordpiece_vocab,
)


def _py_words(corpus):
    """Python twin of textops.tokens() word frequencies (Java-\\s pinned)."""
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    freqs: dict[str, int] = {}
    for t in corpus:
        if t is None:
            continue
        for w in ws.sub(" ", t.lower()).strip(" ").split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _py_wordpiece_train(word_freqs, n_merges, min_pf):
    """Pure-Python replica: decorated segmentation, likelihood-scored
    argmax on the 10^-12 integer grid, candidate floor BEFORE argmax."""
    seg = {w: [w[0]] + [CONT + c for c in w[1:]] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        pf: dict[tuple[str, str], int] = {}
        sc: dict[str, int] = {}
        for w, f in word_freqs.items():
            s = seg[w]
            for x in s:
                sc[x] = sc.get(x, 0) + f
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pf[p] = pf.get(p, 0) + f
        cand = {p: c for p, c in pf.items() if c >= min_pf}
        if not cand:
            break

        def score(p):
            return (cand[p] * SCORE_SCALE) // (sc[p[0]] * sc[p[1]])

        best = min(cand, key=lambda p: (-score(p), p[0], p[1]))
        a, b = best
        merges.append((a, b, cand[best], score(best)))
        merged = a + strip_cont(b)
        for w in seg:
            s = seg[w]
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seg[w] = out
    return merges, seg


def test_wordpiece_train_matches_python_replica(spark):
    """Full (a, b, pair_freq, score_q) trajectory AND the final
    segmented vocab match the replica — on a corpus with repeated
    words, single-char words, NULL and empty text, and mixed case."""
    corpus = [
        "the cat sat on the mat",
        "the cats chatter",
        "a mat a cat a hat",
        "CHAT that  matters",
        None,
        "",
    ]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    ref_merges, ref_seg = _py_wordpiece_train(_py_words(corpus), 6, 2)
    merges, vocab = wordpiece_train(df, n_merges=6, min_pair_freq=2)
    assert merges == ref_merges
    got_seg = {r["w"]: list(r["symbols"]) for r in vocab.collect()}
    assert got_seg == ref_seg
    # scores sit on the grid and never exceed it (pf <= min(ca, cb))
    assert all(0 <= sq <= SCORE_SCALE for _, _, _, sq in merges)
    # continuation discipline: merged symbols keep the LEFT piece's form
    for a, b, _, _ in merges:
        m = a + strip_cont(b)
        assert m.startswith(CONT) == a.startswith(CONT)


def test_wordpiece_differs_from_bpe_objective(spark):
    """The likelihood argmax picks a RARER-apart pair over the most
    frequent one: 'er' appears 3× but e/r barely occur elsewhere, while
    'th' appears 4× with 't'/'h' everywhere — WordPiece must merge the
    high-ratio pair first, BPE the high-count one."""
    from spectraplex_spark.operators.bpe import bpe_train

    corpus = ["ter ter ter", "th th th th", "t h t h t h", "hat hot"]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    wp, _ = wordpiece_train(df, n_merges=1, min_pair_freq=2)
    bp, _ = bpe_train(df, n_merges=1, min_freq=2)
    assert (wp[0][0], wp[0][1]) == ("##e", "##r")
    assert (bp[0][0], bp[0][1]) != ("##e", "##r")  # plain chars, count argmax


def test_wordpiece_early_stop_and_empty(spark):
    """No candidate pair above the floor → zero merges (and training on
    only 1-char words yields no pairs at all)."""
    df = spark.createDataFrame([("a b c d",)], "text string")
    merges, _ = wordpiece_train(df, n_merges=5, min_pair_freq=2)
    assert merges == []
    uniq = spark.createDataFrame([("ab cd",)], "text string")
    merges, _ = wordpiece_train(uniq, n_merges=5, min_pair_freq=2)
    assert merges == []  # every pair occurs once < floor


def test_wordpiece_train_requires_input():
    with pytest.raises(ValueError, match="pass df"):
        wordpiece_train(None)


def test_greedy_word_semantics():
    vocab = {"un", "##aff", "##able", "##a", "u", "##n", "b", "##l", "##e"}
    # longest-match-first, continuation prefixes
    assert _greedy_word("unaffable", vocab, 16) == ["un", "##aff", "##able"]
    # dead end mid-word → whole word UNK (no partial output)
    assert _greedy_word("unz", vocab, 16) == [UNK]
    # over the length cap → UNK outright
    assert _greedy_word("unaffable", vocab, 5) == [UNK]
    # single known char
    assert _greedy_word("u", vocab, 16) == ["u"]
    # word-initial form required at position 0 ('##a' does not match 'a...')
    assert _greedy_word("affable", vocab, 16) == [UNK]


def test_greedy_covers_or_unks_hypothesis():
    """Pieces always reassemble the word exactly (modulo ## markers), or
    the output is exactly [UNK] — on random words and random vocabs."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(alphabet="abc", min_size=1, max_size=10),
        st.sets(st.text(alphabet="abc", min_size=1, max_size=3), max_size=10),
    )
    def check(word, base):
        vocab = set(base) | {CONT + p for p in base}
        out = _greedy_word(word, vocab, 16)
        if out == [UNK]:
            return
        assert out[0] == out[0].removeprefix(CONT)  # initial piece plain
        assert all(p.startswith(CONT) for p in out[1:])
        assert "".join(strip_cont(p) for p in out) == word
        # greedy: the first piece is the LONGEST vocab prefix
        first_len = len(out[0])
        for L in range(len(word), first_len, -1):
            assert word[:L] not in vocab

    check()


def test_wordpiece_encode_roundtrip(spark):
    """mapInPandas encode matches _greedy_word per token; NULL text
    propagates; tokens over the cap become [UNK]."""
    corpus = ["the cat", None, "THE  cathedral-like"]
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    merges, _ = wordpiece_train(
        spark.createDataFrame([(corpus[0],)], "text string"),
        n_merges=3,
        min_pair_freq=1,
    )
    vset = wordpiece_vocab(
        build_wp_vocab(spark.createDataFrame([(corpus[0],)], "text string")),
        merges,
    )
    got = {
        r["doc_id"]: r["wordpiece_pieces"]
        for r in wordpiece_encode(df, vset, max_word_len=8).collect()
    }
    assert got[1] is None
    assert got[0] == _greedy_word("the", vset, 8) + _greedy_word("cat", vset, 8)
    # 'cathedral-like' (14 chars) > cap 8 → [UNK]; 'the' still encodes
    assert got[2] == _greedy_word("the", vset, 8) + [UNK]


def test_wordpiece_vocab_exports_alphabet_and_merges(spark):
    df = spark.createDataFrame([("cat cat",)], "text string")
    merges, _ = wordpiece_train(df, n_merges=2, min_pair_freq=2)
    vset = wordpiece_vocab(build_wp_vocab(df), merges)
    assert {"c", "##a", "##t"} <= vset  # decorated alphabet as observed
    assert "a" not in vset  # 'a' never word-initial in this corpus
    for a, b, _, _ in merges:
        assert a + strip_cont(b) in vset
