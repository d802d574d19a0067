"""Inverted-index retrieval (operators/retrieval.py): postings
invariants, conjunctive/phrase search vs brute force, BM25 vs an
independent Python reference, and partition pruning on the
materialized index. Cross-engine grading of the integer rankings is in
test_oracle_parity.py (index_conjunctive_topk / index_phrase_search).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import pytest

from spectraplex_spark.operators.retrieval import (
    append_postings_batch,
    bm25_topk,
    build_postings,
    conjunctive_topk,
    doc_lengths,
    materialize_postings,
    phrase_match,
    read_postings,
)

DOCS = [
    (0, "spark window join window spark"),
    (1, "fast table fast table fast"),
    (2, "the quick fox jumps over the lazy dog"),
    (3, "spark join"),
    (4, "window window window"),
    (5, "a a a a"),
    (6, "fast  Table extra   spaces"),  # normalization folds case/space
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_postings_invariants(spark):
    p = build_postings(_df(spark)).collect()
    for r in p:
        assert r["tf"] == len(r["positions"])
        assert r["positions"] == sorted(r["positions"])
    # sum of tf over a doc == its token count
    by_doc = {}
    for r in p:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + r["tf"]
    dls = {r["doc_id"]: r["dl"] for r in doc_lengths(_df(spark)).collect()}
    assert by_doc == dls


def test_conjunctive_matches_bruteforce(spark):
    got = conjunctive_topk(_df(spark), ["spark", "join"], k=10).collect()
    want = []
    for did, text in DOCS:
        toks = text.lower().split()
        if "spark" in toks and "join" in toks:
            want.append((did, toks.count("spark") + toks.count("join")))
    want.sort(key=lambda x: (-x[1], x[0]))
    assert [(r["doc_id"], r["tf_sum"]) for r in got] == want


def test_phrase_match_counts_occurrences(spark):
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(_df(spark), ["fast", "table"]).collect()
    }
    # doc 1: "fast table fast table fast" -> 2; doc 6 normalizes to
    # "fast table extra spaces" -> 1
    assert got == {1: 2, 6: 1}


def test_phrase_match_repeated_term(spark):
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(_df(spark), ["a", "a"]).collect()
    }
    assert got == {5: 3}  # "a a a a" holds 3 overlapping "a a" starts
    got3 = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(_df(spark), ["window", "window", "window"]).collect()
    }
    assert got3 == {4: 1}


def test_phrase_match_no_false_positives_on_nonadjacent(spark):
    # doc 0 has spark...join but never adjacent as "join spark"
    assert phrase_match(_df(spark), ["join", "spark"]).count() == 0


def test_bm25_matches_python_reference(spark):
    terms = ["spark", "window", "fast"]
    got = [(r["doc_id"], r["bm25"]) for r in bm25_topk(_df(spark), terms, k=7).collect()]

    docs = {did: text.lower().split() for did, text in DOCS}
    # doc 6 normalizes "Table" -> "table"; split on raw lower is enough here
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfs = {t: sum(1 for toks in docs.values() if t in toks) for t in terms}
    k1, b = 1.2, 0.75

    def score(toks):
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        return s

    want = sorted(
        ((did, score(toks)) for did, toks in docs.items() if score(toks) > 0),
        key=lambda x: (-x[1], x[0]),
    )
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, c) in zip(got, want):
        assert abs(a - c) < 1e-9


def test_incremental_postings_two_batch_equals_oneshot(spark, tmp_path):
    idx = str(tmp_path / "inc_idx")
    b1 = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    b2 = spark.createDataFrame(DOCS[4:], "doc_id long, text string")
    n1 = append_postings_batch(b1, idx, n_partitions=8)
    n2 = append_postings_batch(b2, idx, n_partitions=8)
    assert n1 > 0 and n2 > 0
    got = {
        (r["term"], r["doc_id"], r["tf"], tuple(r["positions"]))
        for r in spark.read.parquet(f"{idx}/postings").collect()
    }
    want = {
        (r["term"], r["doc_id"], r["tf"], tuple(r["positions"]))
        for r in build_postings(_df(spark)).collect()
    }
    assert got == want


def test_incremental_postings_replay_is_noop(spark, tmp_path):
    idx = str(tmp_path / "replay_idx")
    b1 = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    assert append_postings_batch(b1, idx, n_partitions=8) > 0
    # at-least-once redelivery: the identical batch must append nothing
    assert append_postings_batch(b1, idx, n_partitions=8) == 0


def test_incremental_postings_pins_layout_config(spark, tmp_path):
    idx = str(tmp_path / "cfg_idx")
    b1 = spark.createDataFrame(DOCS[:2], "doc_id long, text string")
    append_postings_batch(b1, idx, n_partitions=8)
    with pytest.raises(ValueError, match="different parameters"):
        append_postings_batch(b1, idx, n_partitions=16)


def test_incremental_index_serves_search(spark, tmp_path):
    idx = str(tmp_path / "serve_idx")
    for lo, hi in ((0, 3), (3, 7)):
        append_postings_batch(
            spark.createDataFrame(DOCS[lo:hi], "doc_id long, text string"),
            idx,
            n_partitions=8,
        )
    postings = read_postings(spark, f"{idx}/postings", ["spark", "join"], n_partitions=8)
    got = conjunctive_topk(None, ["spark", "join"], k=10, postings=postings).collect()
    want = conjunctive_topk(_df(spark), ["spark", "join"], k=10).collect()
    assert [(r["doc_id"], r["tf_sum"]) for r in got] == [
        (r["doc_id"], r["tf_sum"]) for r in want
    ]


def test_materialized_index_partition_prunes(spark, tmp_path):
    path = str(tmp_path / "postings_idx")
    materialize_postings(_df(spark), path, n_partitions=16)
    probe = read_postings(spark, path, ["spark", "fast"], n_partitions=16)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the _tp IN (...) predicate must land in the scan's partition
    # filters, not a post-scan Filter over all buckets
    assert "PartitionFilters: [" in plan and "_tp" in plan.split("PartitionFilters:")[1]
    # probing the index returns the same postings as an inline build
    inline = build_postings(_df(spark)).filter(F.col("term").isin(["spark", "fast"]))
    got = {(r["term"], r["doc_id"], r["tf"]) for r in probe.collect()}
    want = {(r["term"], r["doc_id"], r["tf"]) for r in inline.collect()}
    assert got == want


def test_bm25_grid_ranks_like_float_bm25(spark):
    """The integer-grid graded variant must produce the same document
    ordering as the float production ranking whenever scores are
    separated by more than the grid granularity (~2^-16 on idf)."""
    from spectraplex_spark.operators.retrieval import bm25_topk_grid

    terms = ["spark", "window", "fast"]
    fl = [r["doc_id"] for r in bm25_topk(_df(spark), terms, k=7).collect()]
    gr = [r["doc_id"] for r in bm25_topk_grid(_df(spark), terms, k=7).collect()]
    assert fl == gr
    # integer scores, strictly ordered desc with doc_id ties
    rows = bm25_topk_grid(_df(spark), terms, k=7).collect()
    scores = [r["bm25_q"] for r in rows]
    assert all(isinstance(s, int) for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_duplicate_query_terms_collapse(spark):
    """['spark','spark','join'] must mean the conjunction over
    {spark, join}, not an unsatisfiable 3-term requirement; BM25 must
    count a repeated term once, not twice."""
    from spectraplex_spark.operators.retrieval import bm25_topk_grid

    base = conjunctive_topk(_df(spark), ["spark", "join"], k=10).collect()
    dup = conjunctive_topk(_df(spark), ["spark", "spark", "join"], k=10).collect()
    assert [(r["doc_id"], r["tf_sum"]) for r in base] == [
        (r["doc_id"], r["tf_sum"]) for r in dup
    ]
    assert len(base) > 0  # the fixture does have conjunctive hits
    b1 = [(r["doc_id"], r["bm25"]) for r in bm25_topk(_df(spark), ["spark", "fast"], k=7).collect()]
    b2 = [(r["doc_id"], r["bm25"]) for r in bm25_topk(_df(spark), ["spark", "spark", "fast"], k=7).collect()]
    assert b1 == b2
    g1 = [(r["doc_id"], r["bm25_q"]) for r in bm25_topk_grid(_df(spark), ["spark", "fast"], k=7).collect()]
    g2 = [(r["doc_id"], r["bm25_q"]) for r in bm25_topk_grid(_df(spark), ["spark", "spark", "fast"], k=7).collect()]
    assert g1 == g2


def test_bm25_never_broadcasts_corpus_side(spark):
    """The r5 verdict's one flagged scale bug: BM25's length
    normalization must read the denormalized dl from the postings, not
    join (broadcast or otherwise) a corpus-sized doc-length table. The
    plan therefore contains NO join at all — one filter + one groupBy."""
    plan = bm25_topk(_df(spark), ["spark", "fast"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    from spectraplex_spark.operators.retrieval import bm25_topk_grid

    plan_g = bm25_topk_grid(_df(spark), ["spark", "fast"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan_g


def test_bm25_rejects_v1_postings_without_dl(spark):
    """A layout-v1 index (no dl column) must fail loudly, not NPE or
    silently rejoin the corpus."""
    import pytest as _pytest

    v1 = build_postings(_df(spark)).drop("dl")
    with _pytest.raises(ValueError, match="dl"):
        bm25_topk(_df(spark), ["spark"], postings=v1)


def test_read_postings_uses_pinned_bucket_count(spark, tmp_path):
    """A probe against an append-managed index must resolve the bucket
    count from the _config sidecar; a conflicting caller value raises
    instead of silently hashing probes into the wrong buckets."""
    import pytest as _pytest

    from spectraplex_spark.operators.retrieval import (
        append_postings_batch,
        conjunctive_topk,
        read_postings,
    )

    idx = str(tmp_path / "idx")
    df = spark.createDataFrame(
        [(1, "spark join"), (2, "spark window join")], "doc_id long, text string"
    )
    append_postings_batch(df, idx, n_partitions=8)
    # no n_partitions passed: sidecar resolves 8, both docs found
    p = read_postings(spark, f"{idx}/postings", ["spark", "join"])
    got = conjunctive_topk(None, ["spark", "join"], k=10, postings=p).collect()
    assert {r["doc_id"] for r in got} == {1, 2}
    with _pytest.raises(ValueError, match="pinned"):
        read_postings(spark, f"{idx}/postings", ["spark"], n_partitions=64)


def test_bm25_with_df_none_requires_corpus_stats(spark):
    import pytest as _pytest

    from spectraplex_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_grid,
        build_postings,
    )

    df = spark.createDataFrame(
        [(1, "spark join fast"), (2, "slow")], "doc_id long, text string"
    )
    p = build_postings(df).filter("term = 'spark'")  # term-filtered probe
    with _pytest.raises(ValueError, match="corpus_stats"):
        bm25_topk(None, ["spark"], postings=p)
    with _pytest.raises(ValueError, match="corpus_stats"):
        bm25_topk_grid(None, ["spark"], postings=p)
    # and WITH stats the probe path matches the corpus-frame path
    full = {r["doc_id"]: r["bm25"] for r in bm25_topk(df, ["spark"]).collect()}
    probed = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(
            None, ["spark"], postings=p, corpus_stats=(2, 4)
        ).collect()
    }
    assert probed == full


def test_append_id_separator_no_collisions(spark, tmp_path):
    """doc_id 'a:b' term 'c' must not collide with doc_id 'a' term
    'b:c' (the old ':' separator collapsed them)."""
    from spectraplex_spark.operators.retrieval import append_postings_batch

    idx = str(tmp_path / "idx")
    df1 = spark.createDataFrame([("a:b", "c")], "doc_id string, text string")
    df2 = spark.createDataFrame([("a", "b:c")], "doc_id string, text string")
    assert append_postings_batch(df1, idx, n_partitions=4) == 1
    assert append_postings_batch(df2, idx, n_partitions=4) == 1  # not dropped
    got = spark.read.parquet(f"{idx}/postings").select("doc_id", "term").collect()
    assert {(r["doc_id"], r["term"]) for r in got} == {("a:b", "c"), ("a", "b:c")}


def test_query_terms_fold_like_the_index_tokenizer(spark):
    """Postings hold fold_case'd terms; raw 'Spark' (or İ-bearing)
    query terms must match them instead of silently returning nothing
    (review finding r13). Duplicates collapse AFTER the fold."""
    from spectraplex_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_grid,
        conjunctive_topk,
        phrase_match,
    )

    df = spark.createDataFrame(
        [(1, "spark joins data"), (2, "spark reads fast"), (3, "İstanbul data")],
        "doc_id long, text string",
    )
    assert [r["doc_id"] for r in conjunctive_topk(df, ["Spark", "SPARK"]).collect()] == [1, 2]
    assert {r["doc_id"] for r in phrase_match(df, ["Spark", "Joins"]).collect()} == {1}
    assert {r["doc_id"] for r in phrase_match(df, ["İstanbul", "data"]).collect()} == {3}
    assert [r["doc_id"] for r in bm25_topk(df, ["JOINS"], k=3).collect()] == [1]
    assert [r["doc_id"] for r in bm25_topk_grid(df, ["JOINS"], k=3).collect()] == [1]


def test_append_id_unit_separator_no_collisions(spark, tmp_path):
    """\\x1f is not regex \\s, so it can survive tokenization into a
    term and appear in a string doc_id — the length-prefixed id must
    keep such (doc_id, term) pairs distinct (review finding r13)."""
    from spectraplex_spark.operators.retrieval import append_postings_batch

    idx = str(tmp_path / "idx")
    df1 = spark.createDataFrame([("d\x1fa", "b")], "doc_id string, text string")
    df2 = spark.createDataFrame([("d", "a\x1fb")], "doc_id string, text string")
    assert append_postings_batch(df1, idx, n_partitions=4) == 1
    assert append_postings_batch(df2, idx, n_partitions=4) == 1  # not dropped
    got = spark.read.parquet(f"{idx}/postings").select("doc_id", "term").collect()
    assert {(r["doc_id"], r["term"]) for r in got} == {("d\x1fa", "b"), ("d", "a\x1fb")}


def test_empty_corpus_bm25_raises_loudly(spark):
    import pytest as _pytest

    from spectraplex_spark.operators.retrieval import bm25_topk

    empty = spark.createDataFrame([], "doc_id long, text string")
    with _pytest.raises(ValueError, match="empty corpus"):
        bm25_topk(empty, ["spark"])
