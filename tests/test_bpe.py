"""Iterative BPE training (operators/bpe.py) vs an independent pure-
Python reference implementation of Sennrich et al. 2016."""

from collections import Counter

from pyspark.sql import functions as F

from spectraplex_spark.operators.bpe import apply_bpe, bpe_train, merge_pair


# --- pure-Python reference BPE ------------------------------------------


def py_vocab(texts):
    words = Counter()
    for t in texts:
        words.update(w for w in t.lower().split() if w)
    return {w: (list(w), f) for w, f in words.items()}


def py_merge_word(symbols, a, b):
    out, carry = [], None
    for s in symbols:
        if carry is None:
            carry = s
        elif carry == a and s == b:
            out.append(a + b)
            carry = None
        else:
            out.append(carry)
            carry = s
    if carry is not None:
        out.append(carry)
    return out


def py_bpe_train(texts, n_merges, min_freq=2):
    vocab = py_vocab(texts)
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for symbols, f in vocab.values():
            for i in range(len(symbols) - 1):
                pairs[(symbols[i], symbols[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), pf = best
        if pf < min_freq:
            break
        merges.append((a, b, pf))
        vocab = {w: (py_merge_word(s, a, b), f) for w, (s, f) in vocab.items()}
    return merges, vocab


TEXTS = [
    "low lower lowest low low",
    "newer newest new new newer",
    "wider wide widest wider",
    "low newer wide low",
]


def test_merge_pair_greedy_nonoverlapping(spark):
    df = spark.createDataFrame([(["a", "a", "a"],)], ["s"])
    got = df.select(merge_pair(F.col("s"), "a", "a").alias("m")).first().m
    assert got == ["aa", "a"]  # leftmost-first, non-overlapping


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], ["i", "text"])
    merges, vocab = bpe_train(df, n_merges=8, min_freq=2)
    ref_merges, ref_vocab = py_bpe_train(TEXTS, 8, min_freq=2)
    assert merges == ref_merges  # ordered, incl. exact pair frequencies
    got_vocab = {r.w: (list(r.symbols), r.freq) for r in vocab.collect()}
    assert got_vocab == ref_vocab
    vocab.unpersist()


def test_apply_bpe_segments_with_learned_merges(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], ["i", "text"])
    merges, vocab = bpe_train(df, n_merges=5, min_freq=2)
    vocab.unpersist()
    out = apply_bpe(
        spark.createDataFrame([(0, "low newest")], ["i", "text"]), merges
    ).first()
    # replay the reference segmentation for the same two words
    ref = []
    for w in ["low", "newest"]:
        s = list(w)
        for a, b, _ in merges:
            s = py_merge_word(s, a, b)
        ref.extend(s)
    assert list(out.bpe_symbols) == ref


def test_apply_bpe_equals_vocab_join_expansion(spark):
    """The scale encode path (broadcast-join each word's train-time
    segmentation) must emit exactly the symbols the per-document
    merge-replay fold (apply_bpe) emits — the tokenizer contract the
    graded bpe_encode_topk rides on."""
    from collections import Counter

    from pyspark.sql import functions as F

    from spectraplex_spark.operators.bpe import apply_bpe, bpe_train
    from spectraplex_spark.operators.textops import tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges, vocab = bpe_train(docs, n_merges=10, min_freq=2)
    fold = Counter(
        s
        for r in apply_bpe(docs, merges).select("bpe_symbols").collect()
        for s in r["bpe_symbols"]
    )
    joined = Counter(
        r["symbol"]
        for r in docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .join(F.broadcast(vocab.select("w", "symbols")), "w")
        .select(F.explode("symbols").alias("symbol"))
        .collect()
    )
    vocab.unpersist()
    assert fold == joined


def test_apply_bpe_pandas_bit_equal_to_expression_fold(spark):
    """The realistic-merge-count pandas encode path must emit EXACTLY the
    per-row segmentation of apply_bpe's expression fold — same greedy
    left-to-right non-overlapping in-order replay, same tokenization
    (incl. unicode whitespace, where Java's ASCII-only \\s could diverge
    from Python's unicode-aware one if not pinned)."""
    from spectraplex_spark.operators.bpe import apply_bpe, apply_bpe_pandas, bpe_train

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges, vocab = bpe_train(docs, n_merges=10, min_freq=2)
    vocab.unpersist()
    extra = spark.createDataFrame(
        [
            (90001, "s", "AAa aaa aab  \t MiXeD\ncase", 0.0),
            (90002, "s", "", 0.0),
            (90003, "s", None, 0.0),
            (90004, "s", "  leading trailing  ", 0.0),
        ],
        "doc_id long, source string, text string, quality double",
    )
    both = docs.select("doc_id", "source", "text").unionByName(
        extra.select("doc_id", "source", "text")
    )
    expr = {
        r["doc_id"]: r["bpe_symbols"]
        for r in apply_bpe(both, merges).select("doc_id", "bpe_symbols").collect()
    }
    pand = {
        r["doc_id"]: r["bpe_symbols"]
        for r in apply_bpe_pandas(both, merges)
        .select("doc_id", "bpe_symbols")
        .collect()
    }
    assert expr == pand


def test_apply_bpe_pandas_locale_contract(spark):
    """The bit-equality contract assumes a root-family JVM locale: the
    known divergent locales (tr/az/lt special-case dotted/dotless I) are
    refused loudly at plan time; root-family locales (incl. the running
    session's) pass (r10 ADVICE #4)."""
    import pytest

    from spectraplex_spark.operators.bpe import (
        _check_root_locale_contract,
        apply_bpe_pandas,
    )

    for bad in ("tr", "az", "lt"):
        with pytest.raises(ValueError, match="locale-sensitive case mappings"):
            _check_root_locale_contract(bad)
    for ok in ("en", "", None, "de"):
        _check_root_locale_contract(ok)
    # the running session's JVM locale is root-family: the guard is silent
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    got = apply_bpe_pandas(df, [("a", "b", 2)]).collect()
    assert got[0]["bpe_symbols"] == ["ab", "ab"]
