"""Property-based tests (hypothesis) for the round-6 operator family:
repeated-span invariants vs an independent Python model, chunking
coverage arithmetic, and merge_upsert vs a dict model.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spectraplex_spark.operators.chunking import chunk_documents
from spectraplex_spark.operators.spans import repeated_spans

# tiny vocab → dense gram collisions, the interesting regime
_WORDS = ["aa", "bb", "cc", "dd"]
_texts = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _model_spans(docs, k, min_count=2):
    """Independent Python model of repeated_spans."""
    toks = {i: t.split() if t.strip() else [] for i, t in docs}
    from collections import Counter

    grams = Counter()
    pos = {}
    for i, ts in toks.items():
        pos[i] = []
        for p in range(len(ts) - k + 1):
            g = " ".join(ts[p : p + k])
            grams[g] += 1
            pos[i].append((p, g))
    out = []
    for i, plist in pos.items():
        hits = sorted(p for p, g in plist if grams[g] >= min_count)
        cur = None
        for p in hits:
            if cur is None or p > cur[1]:
                if cur:
                    out.append((i, cur[0], cur[1]))
                cur = [p, p + k]
            else:
                cur[1] = max(cur[1], p + k)
        if cur:
            out.append((i, cur[0], cur[1]))
    return sorted(out)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_texts, k=st.integers(min_value=2, max_value=4))
def test_repeated_spans_match_python_model(_spark, texts, k):
    docs = list(enumerate(texts))
    df = _spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(df, k=k).collect()
    )
    assert got == _model_spans(docs, k)
    # structural invariants: spans sorted, non-overlapping, non-touching
    by_doc = {}
    for d, s, e in got:
        assert 0 <= s < e
        by_doc.setdefault(d, []).append((s, e))
    for spans in by_doc.values():
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1  # maximal merge: strictly separated


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    n_tokens=st.integers(min_value=0, max_value=30),
    max_tokens=st.integers(min_value=1, max_value=8),
    stride_frac=st.integers(min_value=1, max_value=8),
)
def test_chunking_covers_every_token_exactly(_spark, n_tokens, max_tokens, stride_frac):
    stride = min(stride_frac, max_tokens)
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = _spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_id"], r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, max_tokens=max_tokens, stride=stride).collect()
    )
    if n_tokens == 0:
        assert rows == []
        return
    # starts are 0, stride, ... < n; chunk sizes min(max_tokens, n-start)
    want_starts = list(range(0, n_tokens, stride))
    assert [r[1] for r in rows] == want_starts
    for _, start, size, ctext in rows:
        assert size == min(max_tokens, n_tokens - start)
        assert ctext.split() == [f"t{i}" for i in range(start, start + size)]
    # every token is covered at least once (stride <= max_tokens)
    covered = set()
    for _, start, size, _ in rows:
        covered.update(range(start, start + size))
    assert covered == set(range(n_tokens))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    seed_keys=st.sets(st.integers(min_value=0, max_value=12), min_size=1, max_size=8),
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.sampled_from(["upsert", "delete"]),
        ),
        min_size=0,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
)
def test_merge_upsert_matches_dict_model(_spark, tmp_path_factory, seed_keys, ops):
    from spectraplex_spark.sources.merge import merge_upsert

    path = str(tmp_path_factory.mktemp("merge") / "t")
    seed = [(k, f"v{k}", "p" + str(k % 2)) for k in sorted(seed_keys)]
    _spark.createDataFrame(seed, "k long, v string, part string").write.partitionBy(
        "part"
    ).parquet(path)
    updates = [(k, f"u{k}", "p" + str(k % 2), op) for k, op in ops]
    # python model
    model = {k: (v, p) for k, v, p in seed}
    for k, op in ops:
        if op == "delete":
            model.pop(k, None)
        else:
            model[k] = (f"u{k}", "p" + str(k % 2))
    if updates:
        udf = _spark.createDataFrame(
            updates, "k long, v string, part string, _op string"
        )
        merge_upsert(_spark, path, udf, "k", partition_col="part")
    got = {
        r["k"]: (r["v"], r["part"])
        for r in _spark.read.parquet(path).collect()
    }
    assert got == model
