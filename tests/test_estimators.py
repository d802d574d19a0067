"""MinHash estimator-error report (operators/estimators.py).
Cross-engine grading is in test_oracle_parity.py
(minhash_estimate_error).
"""

from __future__ import annotations

import math

import pytest

from spectraplex_spark.operators.estimators import (
    EST_SCALE,
    minhash_error_report,
    perm_constants,
)


def test_prefix_truncation_makes_b_a_subset(spark):
    """Every shingle of the truncated doc is a window of the full doc,
    so inter == n_b exactly — a structural invariant of the planted
    pairs that pins the shingle/intersect arithmetic."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = minhash_error_report(docs).collect()
    assert len(rows) > 10
    for r in rows:
        assert r["inter"] == r["n_b"], r
        assert r["jacc_q"] == r["inter"] * EST_SCALE // (r["n_a"] + r["n_b"] - r["inter"])
        assert r["est_q"] == r["sig_matches"] * (EST_SCALE // 16)
        assert r["err_q"] == abs(r["est_q"] - r["jacc_q"])


def test_estimator_error_tracks_broder_bound(spark):
    """Mean |error| across the sample stays within 3x the Broder
    standard error sqrt(J(1-J)/m) at the sample's mean J — a loose but
    real statistical guard that would catch a broken permutation
    family (constant sigs → error ~= 1-J everywhere)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rows = minhash_error_report(docs).collect()
    js = [r["jacc_q"] / EST_SCALE for r in rows]
    errs = [r["err_q"] / EST_SCALE for r in rows]
    mean_j = sum(js) / len(js)
    bound = 3 * math.sqrt(mean_j * (1 - mean_j) / 16)
    assert sum(errs) / len(errs) < bound
    # and the planted mutation really sweeps a range of true J
    assert max(js) - min(js) > 0.2


def test_scale_must_divide(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="must divide"):
        minhash_error_report(docs, num_hashes=7)


def test_perm_family_is_odd_a(spark):
    for a, b in perm_constants(32):
        assert a % 2 == 1  # a must be invertible-ish / non-degenerate
