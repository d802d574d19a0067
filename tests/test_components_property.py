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


def test_real_edge_converged_at_round_zero_with_max_iter_one(spark):
    """max_iter=1 must ACCEPT a graph that is converged after the fused
    round 0 even though labels moved off the identity — the old
    identity-only heuristic raised a false 'did not converge' for the
    single edge (1,2), making max_iter=1 unusable (r14 review finding:
    convergence is exactly 'every edge's endpoints agree')."""
    edges = spark.createDataFrame([(1, 2), (5, 6)], "id_a long, id_b long")
    got = sorted(
        (r.node, r.component)
        for r in connected_components(edges, max_iter=1).collect()
    )
    assert got == [(1, 1), (2, 1), (5, 5), (6, 5)]


def test_unconverged_path_still_raises_with_max_iter_one(spark):
    """A path graph that genuinely needs a second round must still fail
    loudly under max_iter=1 (the check stays exact, not permissive)."""
    import pytest

    edges = spark.createDataFrame(
        [(2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1).collect()
