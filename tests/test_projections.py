"""Dimensionality reduction (operators/projections.py): covariance
exactness vs numpy, PCA recovery of planted structure, JL distance
preservation. Cross-engine grading is in test_oracle_parity.py
(embedding_covariance_report / embedding_jl_projection).
"""

from __future__ import annotations

import numpy as np

from spectraplex_spark.operators.projections import (
    covariance_matrix,
    jl_project_quantized,
    jl_signs,
    pca_fit,
    pca_project,
)

VEC_SCHEMA = "vec_id long, embedding array<float>"


def _df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)], VEC_SCHEMA
    )


def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(300, 6)).astype(np.float32)
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(_df(spark, mat), dim=6).collect()
    }
    want = np.cov(mat.astype(np.float64).T, bias=True)  # population form
    for (i, j), c in got.items():
        assert abs(c - want[i, j]) < 1e-9
    assert len(got) == 6 * 7 // 2


def test_pca_recovers_planted_axis(spark):
    """Data stretched 20x along a planted direction: the first
    principal component must align with it."""
    rng = np.random.default_rng(5)
    axis = rng.normal(size=8)
    axis /= np.linalg.norm(axis)
    coeff = rng.normal(scale=20.0, size=(400, 1))
    noise = rng.normal(scale=0.5, size=(400, 8))
    mat = (coeff * axis + noise).astype(np.float32)
    df = _df(spark, mat)
    comps = pca_fit(covariance_matrix(df, dim=8), dim=8, k=2)
    align = abs(float(np.dot(comps[0], axis)))
    assert align > 0.99
    proj = pca_project(df, comps)
    assert len(proj.head()["projected"]) == 2


def test_jl_preserves_pairwise_distances(spark):
    """The JL guarantee at k=32 for a handful of points: projected
    distances (scaled by 1/(quantize*sqrt(k))) within 40% of the
    originals — loose band, structural check not a tuning test."""
    rng = np.random.default_rng(9)
    mat = rng.normal(size=(12, 64)).astype(np.float32)
    df = _df(spark, mat)
    rows = {
        r["vec_id"]: np.array(r["projected"], dtype=np.float64)
        for r in jl_project_quantized(df, k=32, quantize=1024).collect()
    }
    scale = 1024.0 * np.sqrt(32.0)
    m64 = mat.astype(np.float64)
    for a in range(4):
        for b in range(a + 1, 8):
            orig = np.linalg.norm(m64[a] - m64[b])
            proj = np.linalg.norm(rows[a] - rows[b]) / scale
            assert 0.6 * orig < proj < 1.4 * orig


def test_jl_exactness_vs_python_integer_replay(spark):
    """The projection must be the exact integer the seeded signs imply."""
    mat = np.array([[0.25, -0.5, 0.125, 1.0]], dtype=np.float32)
    df = _df(spark, mat)
    got = jl_project_quantized(df, k=3, quantize=1024, dim=4).head()["projected"]
    signs = jl_signs(4, 3, 42)
    q = np.floor(mat.astype(np.float64)[0] * 1024 + 0.5).astype(np.int64)
    want = [int((q * signs[r]).sum()) for r in range(3)]
    assert list(got) == want


def test_covariance_state_merge_equals_recompute_bitwise(spark):
    """Two-batch state merge must equal the one-shot state and the
    one-shot covariance BIT-FOR-BIT (decimal sums are exact and
    associative — the incremental_rollup_merge guarantee extended to
    second moments)."""
    from spectraplex_spark.operators.projections import (
        covariance_state,
        finalize_covariance,
        merge_covariance_states,
    )

    rng = np.random.default_rng(11)
    mat = rng.normal(size=(120, 5)).astype(np.float32)
    df = _df(spark, mat)
    b1 = df.filter("vec_id % 2 = 0")
    b2 = df.filter("vec_id % 2 = 1")
    merged = merge_covariance_states(
        covariance_state(b1, dim=5), covariance_state(b2, dim=5)
    )
    oneshot = covariance_state(df, dim=5)
    key = lambda r: (r["i"], r["j"])  # noqa: E731
    ms = {key(r): (r["n"], str(r["sx_i"]), str(r["sx_j"]), str(r["sxx"])) for r in merged.collect()}
    os_ = {key(r): (r["n"], str(r["sx_i"]), str(r["sx_j"]), str(r["sxx"])) for r in oneshot.collect()}
    assert ms == os_  # bit-identical decimal state
    fm = {key(r): r["cov"] for r in finalize_covariance(merged).collect()}
    fo = {key(r): r["cov"] for r in covariance_matrix(df, dim=5).collect()}
    assert fm == fo  # identical doubles
