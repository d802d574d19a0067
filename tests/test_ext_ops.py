"""EXT operator behavior tests (E1-E4) beyond the oracle harness:
synthetic duplicates, cross-implementation parity, stub plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spectraplex_spark.operators import dedup as D
from spectraplex_spark.operators import multimodal as M
from spectraplex_spark.operators import simsearch as S
from spectraplex_spark.operators import textops as X
from spectraplex_spark.plans.registry import table
from tests.conftest import SF_DIR


def _docs_with_dups(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog again and again", "en"),
        (2, "the  quick   brown fox jumps over the lazy dog again and again ", "en"),  # ws/case dup of 1
        (3, "The quick brown fox jumps over the lazy cat again and again", "en"),  # near-dup of 1
        (4, "Completely different text about spark shuffles and partitions here", "en"),
        (5, "El rapido zorro marron salta sobre el perro perezoso una y otra vez", "es"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup_collapses_normalized_dups(spark):
    docs = _docs_with_dups(spark)
    kept = D.exact_dedup(docs)
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [1, 3, 4, 5]  # 2 collapses into 1 (min-id representative)


def test_minhash_finds_near_dup(spark):
    docs = _docs_with_dups(spark)
    pairs = D.minhash_neardup_pairs(
        docs, shingle_n=2, jaccard_threshold=0.5, num_hashes=32, bands=16
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got  # exact dup always surfaces
    assert all(a < b for a, b in got)


def test_ngram_jaccard_bruteforce_superset_of_lsh(spark):
    docs = _docs_with_dups(spark)
    bf = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, shingle_n=2, threshold=0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in D.minhash_neardup_pairs(
            docs, shingle_n=2, jaccard_threshold=0.5, num_hashes=32, bands=16
        ).collect()
    }
    assert lsh <= bf


def test_simhash_identical_signatures_for_dups(spark):
    docs = _docs_with_dups(spark)
    groups = D.simhash_dup_groups(docs).collect()
    assert any(g.representative == 1 and g.n_docs >= 2 for g in groups)


def test_simsearch_pandas_matches_expression(spark):
    em = table(spark, SF_DIR, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).head()["embedding"]]
    rest = em.filter(F.col("vec_id") != 0)
    expr_ids = [r.vec_id for r in S.cosine_topk(rest, qvec, k=15).collect()]
    pd_ids = [r.vec_id for r in S.cosine_topk_pandas(rest, qvec, k=15).collect()]
    assert expr_ids == pd_ids


def test_ann_lsh_subset_of_bruteforce_ranking(spark):
    em = table(spark, SF_DIR, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).head()["embedding"]]
    rest = em.filter(F.col("vec_id") != 0)
    ann = S.ann_topk_lsh(rest, qvec, k=10, n_bits=4)
    rows = ann.collect()
    assert 0 < len(rows) <= 10
    # scores must agree with the exact scorer for the same ids
    exact = {r.vec_id: r.cosine for r in S.cosine_scores(rest, qvec).collect()}
    for r in rows:
        assert r.cosine == pytest.approx(exact[r.vec_id], abs=0)


def test_multimodal_payload_roundtrip_and_features(spark):
    docs = table(spark, SF_DIR, "documents").limit(50)
    mm = M.attach_binary_payload(docs)
    row = mm.head()
    assert row["meta"]["media_type"] == "text"
    assert row["meta"]["n_bytes"] == len(bytes(row["payload"]))
    feats = M.extract_features(mm).collect()
    assert len(feats) == 50
    assert all(len(r.feature) == 8 for r in feats)
    assert all(0.0 <= v <= 1.0 for r in feats for v in r.feature)
    # deterministic: same payload → same feature
    again = {r.doc_id: r.feature for r in M.extract_features(mm).collect()}
    assert all(again[r.doc_id] == r.feature for r in feats)


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M.decode_stub(b"\x89PNG...")


def test_quality_and_langid_sane(spark):
    docs = _docs_with_dups(spark)
    stats = X.with_text_stats(docs).collect()
    by_id = {r.doc_id: r for r in stats}
    assert by_id[1].lang_detected == "en"
    assert by_id[5].lang_detected == "es"
    assert by_id[1].quality >= 0.5
    assert by_id[1].fingerprint == by_id[2].fingerprint  # normalized dup
    assert by_id[1].fingerprint != by_id[3].fingerprint


def test_connected_components_chains_pairs(spark):
    """A~B, B~C, D~E → components {A,B,C} and {D,E} even though A~C is
    not an edge (transitive closure via label propagation)."""
    from spectraplex_spark.operators.components import (
        connected_components,
        dedup_keep_representative,
        neardup_groups,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comps = {(r.node, r.component) for r in connected_components(edges).collect()}
    assert comps == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}

    groups = {tuple(r.members) for r in neardup_groups(edges).collect()}
    assert groups == {(1, 2, 3), (10, 11)}

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 10, 11, 99)], "doc_id long, text string"
    )
    kept = sorted(r.doc_id for r in dedup_keep_representative(docs, edges).collect())
    assert kept == [1, 10, 99]  # representatives + untouched doc


def test_neardup_end_to_end_minhash_to_groups(spark):
    """LSH pairs → transitive groups on real dup-shaped documents."""
    from spectraplex_spark.operators.components import neardup_groups

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " "),          # exact-ish dup of 1
        (3, base.replace("dog", "cat")),  # near-dup of 1 and 2
        (4, "completely unrelated text about spark and shuffles and joins"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = D.minhash_neardup_pairs(
        docs, shingle_n=2, jaccard_threshold=0.5, num_hashes=32, bands=16
    )
    groups = {tuple(r.members) for r in neardup_groups(pairs).collect()}
    assert any({1, 2} <= set(g) for g in groups)


def test_corpus_prep_pipeline(spark):
    """Stage-by-stage corpus prep on a crafted corpus: the es doc falls
    to the language gate, the whitespace dup to exact dedup, the
    near-dup to LSH+components; stats account for every drop."""
    from spectraplex_spark.operators.corpus import prepare_corpus

    docs = _docs_with_dups(spark)
    clean, stats = prepare_corpus(
        docs, keep_langs=("en",), min_quality=0.5, jaccard_threshold=0.5
    )
    kept = sorted(r.doc_id for r in clean.collect())
    assert stats.n_input == 5
    assert stats.n_after_lang == 4       # es doc 5 dropped
    assert stats.n_after_exact_dedup == 3  # 2 collapsed into 1
    assert stats.n_after_neardup == 2    # 3 (near-dup of 1) dropped
    assert kept == [1, 4]
    assert stats.total_tokens > 0
