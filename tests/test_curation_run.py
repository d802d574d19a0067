"""Composition tests for the end-to-end curation run (r12 verdict
task #8, catalog entry ``curation_run_e2e``): the per-stage operators
are each replica-tested in their own modules; these tests pin the
COMPOSITION behavior on a planted corpus — survivor propagation across
stage boundaries and the internal consistency of the joined output —
the failure modes a per-stage grade cannot see.
"""

import pytest

from pyspark.sql import functions as F


def _run(spark, rows, k=3):
    """The catalog entry's exact stage chain over an in-memory corpus."""
    from spectraplex_spark.operators.corpus import prepare_corpus
    from spectraplex_spark.operators.decontam import decontaminate
    from spectraplex_spark.operators.dsir import dsir_importance_sample
    from spectraplex_spark.operators.packing import pack_documents
    from spectraplex_spark.operators.shuffling import shuffle_shards_scalable

    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "text"
    )
    train = docs.filter(F.col("doc_id") % 7 != 0)
    clean, _ = prepare_corpus(train, keep_langs=("en",), collect_stats=False)
    dc = decontaminate(clean, bench, n=8, hashed=False)
    sel = dsir_importance_sample(
        dc, F.col("doc_id") % 3 == 0, k=k, stratum_col="source"
    )
    kept = dc.join(sel.select("doc_id", "score_q", "rk"), "doc_id")
    packed = pack_documents(kept, budget=64, n_shards=4)
    shf = shuffle_shards_scalable(kept.select("doc_id"), n_shards=8, seed=7)
    return dc, sel, packed, shf


_WORDS = [
    "river", "garden", "castle", "harbor", "forest", "valley", "bridge",
    "meadow", "market", "temple", "island", "desert", "canyon", "orchard",
    "tundra", "lagoon", "plateau", "grove", "quarry", "summit",
]


def _en(i):
    # 14 tokens of stopword-bearing English (passes the lang + quality
    # gates) with 5 DISTINCT content words per doc, so cross-doc
    # 2-shingle Jaccard stays far below the 0.8 near-dup threshold and
    # no 8-gram repeats across docs (each 8-token window spans at least
    # one distinct word)
    w = [_WORDS[(i * 5 + j) % len(_WORDS)] + str(i) for j in range(5)]
    return (
        f"the {w[0]} and a {w[1]} of the {w[2]} in a {w[3]} is {w[4]} here"
    )


@pytest.fixture(scope="module")
def planted(spark):
    rows = []
    # benchmark docs (doc_id % 7 == 0): entirely distinct wording so
    # only the deliberately planted 8-gram collides
    rows.append((7, "zero one two three four five six seven eight nine ten", "srcA"))
    rows.append((14, "alpha beta gamma delta epsilon zeta eta theta iota", "srcA"))
    # ordinary survivors
    for i in (1, 2, 3, 4, 5, 6, 8, 9, 10, 11, 12, 13):
        rows.append((i, _en(i), "srcA" if i % 2 else "srcB"))
    # 15 is CONTAMINATED: contains benchmark doc 14's 8-gram verbatim
    rows.append(
        (15, _en(15) + " alpha beta gamma delta epsilon zeta eta theta", "srcA")
    )
    # 16/17 are EXACT duplicates (normalized) — min id 16 survives
    rows.append((16, _en(99), "srcB"))
    rows.append((17, _en(99).upper(), "srcB"))
    # 18/19 are NEAR duplicates (one token differs) — min id 18 survives
    rows.append((18, _en(42) + " tail alpha", "srcB"))
    rows.append((19, _en(42) + " tail omega", "srcB"))
    # 20 is non-English — lang gate drops it
    rows.append((20, "el la de que y en un perro grande corre aqui hoy", "srcB"))
    return rows


def test_stage_survivors_propagate(spark, planted):
    dc, sel, packed, shf = _run(spark, planted)
    ids = {r["doc_id"] for r in dc.select("doc_id").collect()}
    assert 15 not in ids, "contaminated doc must be decontaminated away"
    assert 17 not in ids and 16 in ids, "exact-dup loser must not survive"
    assert 19 not in ids and 18 in ids, "near-dup loser must not survive"
    assert 20 not in ids, "non-English doc must not pass the lang gate"
    assert 7 not in ids and 14 not in ids, "benchmark docs are held out"
    assert {1, 2, 3, 4, 5, 6}.issubset(ids), "clean docs must all survive"


def test_selection_feeds_pack_and_shuffle_consistently(spark, planted):
    """The three output families (DSIR selection, pack assignment,
    shuffle shards) must cover exactly the same doc set, and the joined
    catalog-entry shape must be key-unique."""
    dc, sel, packed, shf = _run(spark, planted)
    s = {r["doc_id"] for r in sel.select("doc_id").collect()}
    p = {r["doc_id"] for r in packed.select("doc_id").collect()}
    f = {r["doc_id"] for r in shf.select("doc_id").collect()}
    assert s == p == f and s, (s, p, f)
    out = sel.join(packed, "doc_id").join(shf, "doc_id")
    assert out.count() == len(s)
    # shuffle invariants on the selection: ranked shards balanced to ±1,
    # every position unique within its shard
    rows = shf.collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard_ranked"], []).append(r["shard_pos"])
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) - min(sizes) <= 1
    for v in by_shard.values():
        assert sorted(v) == list(range(len(v)))


def test_pack_prefix_sums_over_the_selection(spark, planted):
    """tokens_before is the shard-local exclusive prefix sum over the
    SELECTED docs only (stage ordering: pack runs after DSIR, so a
    dropped doc must not contribute tokens)."""
    dc, sel, packed, shf = _run(spark, planted)
    rows = sorted(
        packed.select("shard", "doc_id", "n_tokens", "tokens_before").collect(),
        key=lambda r: (r["shard"], r["doc_id"]),
    )
    run: dict[int, int] = {}
    for r in rows:
        assert r["tokens_before"] == run.get(r["shard"], 0), r
        run[r["shard"]] = run.get(r["shard"], 0) + r["n_tokens"]
