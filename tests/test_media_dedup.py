"""Perceptual-hash media dedup (operators/media_dedup.py): code
determinism, near-similarity behavior on planted rasters, the blocked
hamming<=k candidate join. Cross-engine grading is in
test_oracle_parity.py (media_phash_planted).
"""

from __future__ import annotations

import numpy as np

from spectraplex_spark.operators.media_dedup import (
    phash64,
    phash64_bytes,
    phash_dup_pairs,
)

SCHEMA = "doc_id long, payload binary"


def _gradient(n=1024):
    return bytes((np.arange(n) % 251).astype(np.uint8))


def _perturb(b, n_flips, seed, delta=3):
    rng = np.random.default_rng(seed)
    out = bytearray(b)
    for i in rng.choice(len(b), n_flips, replace=False):
        out[i] = (out[i] + delta) % 256
    return bytes(out)


def test_identical_payloads_identical_codes_distributed(spark):
    base = _gradient()
    df = spark.createDataFrame([(0, base), (1, base), (2, _gradient(777))], SCHEMA)
    codes = {r["doc_id"]: r["phash"] for r in phash64(df, "payload").collect()}
    assert codes[0] == codes[1]
    assert codes[0] == np.int64(np.uint64(phash64_bytes(base)))  # driver kernel parity


def test_small_perturbation_small_hamming_unrelated_large(spark):
    base = _gradient()
    near = _perturb(base, 40, seed=2)
    far = bytes(np.random.default_rng(3).integers(0, 256, 1024, dtype=np.uint8))
    c0 = phash64_bytes(base)
    cn = phash64_bytes(near)
    cf = phash64_bytes(far)
    assert bin(c0 ^ cn).count("1") <= 6
    assert bin(c0 ^ cf).count("1") >= 16


def test_blocked_join_finds_hamming_le_k_pairs(spark):
    base = _gradient()
    near = _perturb(base, 60, seed=7)
    ham = bin(phash64_bytes(base) ^ phash64_bytes(near)).count("1")
    assert 0 < ham <= 3  # planted: close but not identical
    far = bytes(np.random.default_rng(8).integers(0, 256, 1024, dtype=np.uint8))
    df = spark.createDataFrame([(0, base), (1, near), (2, far)], SCHEMA)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_dup_pairs(df, max_hamming=3).collect()
    }
    assert (0, 1) in got and got[(0, 1)] == ham
    assert not any(2 in k for k in got)
    # exact-join config must NOT pair the perturbed twin
    assert phash_dup_pairs(df, max_hamming=0).count() == 0


def test_empty_payload_raises_descriptive_error():
    import pytest

    from spectraplex_spark.operators.media_dedup import phash64_bytes

    with pytest.raises(ValueError, match="empty media payload"):
        phash64_bytes(b"")
