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
    got = _run(spark, edges, iters=3, conserve_dangling=False)
    assert got == _py_pagerank(edges, iters=3)


def test_pagerank_star_sink_outranks_spokes(spark):
    edges = [(i, 0) for i in range(1, 9)]  # all spokes -> hub
    got = _run(spark, edges, iters=2, conserve_dangling=False)
    assert got[0] > max(got[i] for i in range(1, 9))
    # spokes are structurally identical -> identical ranks
    assert len({got[i] for i in range(1, 9)}) == 1
    # mass never exceeds the grid (floor losses + dangling drop only shrink it)
    assert sum(got.values()) <= 10**12


def _py_pagerank_conserving(edges, iters=3, damping_pct=85, scale=10**12):
    """Pure-Python replica of the conserve_dangling trajectory: dangling
    mass shared uniformly, floor residual returned largest-remainder
    style by node order — Σ rank == scale after EVERY round."""
    ed = sorted(set(edges))
    nodes = sorted({u for u, _ in ed} | {v for _, v in ed})
    outd = {}
    for u, _ in ed:
        outd[u] = outd.get(u, 0) + 1
    n = len(nodes)
    base = (((100 - damping_pct) * scale) // 100) // n
    r = {
        v: scale // n + (1 if i < scale % n else 0)
        for i, v in enumerate(nodes)
    }
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v in ed:
            s[v] += ((damping_pct * r[u]) // 100) // outd[u]
        dm = sum(r[v] for v in nodes if v not in outd)
        dshare = ((damping_pct * dm) // 100) // n
        pre = {v: base + s[v] + dshare for v in nodes}
        residual = scale - sum(pre.values())
        assert residual >= 0
        r = {
            v: pre[v] + residual // n + (1 if i < residual % n else 0)
            for i, v in enumerate(nodes)
        }
    return r


def test_pagerank_conserving_matches_python_replica(spark):
    """Dangling nodes present (22 is a sink in the functional graph slice
    below): the conserving trajectory matches the pure-Python replica
    exactly at every iteration depth."""
    edges = [(i, (i * 7 + 3) % 23) for i in range(0, 60, 3)] + [(1, 2), (2, 1)]
    for iters in (1, 2, 3):
        got = _run(spark, edges, iters=iters)  # conserving is the default
        assert got == _py_pagerank_conserving(edges, iters=iters)


def test_pagerank_conserving_total_mass_invariant(spark):
    """Σ rank_q == scale EXACTLY after every round (the property the
    variant exists for), on a star graph whose hub is DANGLING — the
    harshest dangling-mass case: the entire damped mass funnels into
    the sink each round and must come back out uniformly."""
    edges = [(i, 0) for i in range(1, 9)]  # all spokes -> dangling hub
    for iters in (1, 2, 3, 4):
        got = _run(spark, edges, iters=iters, conserve_dangling=True)
        assert sum(got.values()) == 10**12, iters
    # directional sanity survives conservation
    assert got[0] > max(got[i] for i in range(1, 9))
    # and the default mode still decays (the documented contrast)
    lossy = _run(spark, edges, iters=2, conserve_dangling=False)
    assert sum(lossy.values()) < 10**12


def test_pagerank_rejects_bad_damping(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank_integer(df, damping_pct=100)
