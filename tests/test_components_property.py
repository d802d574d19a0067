"""Property-based check of connected_components against a pure-Python
union-find model: on arbitrary random edge lists, the distributed
label-propagation (with adaptive pointer jumping) must produce exactly
the min-id-per-component labeling. Iterative DataFrame algorithms are
where silent wrong-answers live (round 1 shipped a max_iter that could
split clusters), so this is the operator that earns a property test."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spectraplex_spark.operators.components import connected_components


def _union_find_model(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {node: find(node) for node in parent}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=60,
    )
)
def test_components_match_union_find(spark, edges):
    want = _union_find_model(edges)
    df = spark.createDataFrame(edges, "id_a long, id_b long").coalesce(2)
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == want


def test_converged_input_with_max_iter_one(spark):
    """A graph already converged at initialization (self-loop-only edge
    list) must return correct labels under max_iter=1 instead of raising
    — the round-0 probe skip only applies when a later probe exists."""
    edges = spark.createDataFrame([(1, 1), (2, 2)], "id_a long, id_b long")
    got = sorted(
        (r.node, r.component) for r in connected_components(edges, max_iter=1).collect()
    )
    assert got == [(1, 1), (2, 2)]


def test_empty_edges_with_max_iter_one(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges, max_iter=1).count() == 0
