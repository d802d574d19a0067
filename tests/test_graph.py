"""Integer-exact PageRank (operators/graph.py): trajectory equality
against a pure-Python replica on arbitrary graphs, plus directional
sanity (a sink everyone links to outranks the spokes)."""

from __future__ import annotations

import pytest

from spectraplex_spark.operators.graph import pagerank_integer


def _py_pagerank(edges, iters=3, damping_pct=85, scale=10**12):
    ed = sorted(set(edges))
    nodes = sorted({u for u, _ in ed} | {v for _, v in ed})
    outd = {}
    for u, _ in ed:
        outd[u] = outd.get(u, 0) + 1
    n = len(nodes)
    init = scale // n
    base = (((100 - damping_pct) * scale) // 100) // n
    r = {v: init for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v in ed:
            s[v] += ((damping_pct * r[u]) // 100) // outd[u]
        r = {v: base + s[v] for v in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank_q"] for r in pagerank_integer(df, **kw).collect()}


def test_pagerank_matches_python_replica(spark):
    edges = [(i, (i * 7 + 3) % 23) for i in range(60)] + [(1, 2), (2, 1), (5, 5)]
    got = _run(spark, edges, iters=3)
    assert got == _py_pagerank(edges, iters=3)


def test_pagerank_star_sink_outranks_spokes(spark):
    edges = [(i, 0) for i in range(1, 9)]  # all spokes -> hub
    got = _run(spark, edges, iters=2)
    assert got[0] > max(got[i] for i in range(1, 9))
    # spokes are structurally identical -> identical ranks
    assert len({got[i] for i in range(1, 9)}) == 1
    # mass never exceeds the grid (floor losses + dangling drop only shrink it)
    assert sum(got.values()) <= 10**12


def test_pagerank_rejects_bad_damping(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank_integer(df, damping_pct=100)
