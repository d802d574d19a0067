"""E1 × E3: perceptual-hash near-duplicate detection for MEDIA payloads
— image dedup for multimodal training corpora (the pHash recipe:
downsample → 2D DCT → keep the 8×8 low-frequency block → sign-vs-median
→ 64-bit code; visually-similar images land within a few Hamming bits).

Environment honesty (the multimodal.py discipline): real codecs are
absent here, so the DECODE step interprets the payload bytes directly
as a grayscale raster (deterministic, documented); production swaps a
real decoder into ``_decode_gray`` and NOTHING else changes — the DCT,
code derivation, and pair mining are the real algorithm, exercised by
tests on planted byte-rasters (gradient + noise → near codes).

Determinism discipline: the DCT basis is QUANTIZED to an integer grid
(floor(cos·2^15+0.5), the ADC-LUT precedent), the raster is uint8, so
every transform coefficient is an exact integer, the median of the 64
block coefficients is an exact integer pick, and the sign code is
bit-reproducible on any executor/engine — no float anywhere after the
basis constants. The graded catalog twin (``media_phash_planted``)
certifies decode→code determinism end to end: identical payloads MUST
collide at Hamming 0, and the pair set equals the exact-payload-dup
pairs the SQL oracle derives independently; near-similarity quality is
pytest-verified (the embedding_neardup planted-twin precedent).

Scale shape: code computation is one Arrow mapInPandas pass (numpy
integer matmuls over 32×32 rasters); pair mining joins on the exact
64-bit code (and, for hamming<=k, on the simhash-style rotated prefix
blocks) — only (id, code) longs shuffle, never payloads.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F, types as T

RASTER = 32  # decode target: 32x32 grayscale
BLOCK = 8  # low-frequency DCT block kept
DCT_SCALE = 1 << 15  # integer grid for the DCT basis (ADC-LUT precedent)


def _dct_basis_q() -> np.ndarray:
    """(RASTER, RASTER) DCT-II orthonormal basis rows, quantized to the
    2^15 integer grid — every engine/executor derives the identical
    matrix from this closed form."""
    n = RASTER
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    basis = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    basis[0] *= 1.0 / np.sqrt(2.0)
    basis *= np.sqrt(2.0 / n)
    return np.floor(basis * DCT_SCALE + 0.5).astype(np.int64)


def _decode_gray(payload: bytes) -> np.ndarray:
    """Deterministic byte-raster 'decode': payload bytes tiled/truncated
    into a RASTER×RASTER uint8 grid. Production: replace with a real
    image decode + resize; everything downstream is unchanged."""
    if len(payload) == 0:
        raise ValueError(
            "phash: empty media payload (0 bytes) — cannot raster; filter "
            "or null-guard payload rows before hashing"
        )
    need = RASTER * RASTER
    b = (payload * (need // len(payload) + 1))[:need]
    return np.frombuffer(bytes(b), dtype=np.uint8).reshape(RASTER, RASTER)


def phash64_bytes(payload: bytes, basis_q: np.ndarray | None = None) -> int:
    """Exact-integer pHash of one payload (the per-row kernel)."""
    T_q = _dct_basis_q() if basis_q is None else basis_q
    X = _decode_gray(payload).astype(np.int64)
    C = T_q @ X @ T_q.T  # exact integer 2D DCT (scaled by DCT_SCALE^2)
    block = C[:BLOCK, :BLOCK].ravel()
    med = int(np.median(block[1:]))  # skip DC term; 63 values → exact middle
    code = 0
    for idx, v in enumerate(block):
        if idx == 0:
            continue  # DC carries brightness, not structure
        if int(v) > med:
            code |= 1 << (idx - 1)
    return code


def phash64(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, phash bigint): one Arrow pass; only ids+codes come back."""
    basis_q = _dct_basis_q()
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            codes = [
                # store as signed 64-bit (bit 63 flips the sign — fine,
                # codes are identity values, not magnitudes)
                np.int64(np.uint64(phash64_bytes(bytes(p), basis_q)))
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "phash": codes})

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def phash_dup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 0,
) -> DataFrame:
    """(id_a, id_b, hamming) media near-dup pairs. max_hamming=0 joins
    on the exact code (one hash shuffle of (id, code) longs — the
    graded configuration). For 0 < max_hamming <= 3 the candidate join
    uses the simhash recipe: split the code into max_hamming+1 blocks —
    a pair within the bound must agree exactly on >= 1 block
    (pigeonhole), so candidates come from block-equality buckets and
    only candidates pay the popcount verify."""
    codes = phash64(df, payload_col, id_col).localCheckpoint(eager=False)
    if max_hamming == 0:
        a = codes.select(F.col(id_col).alias("id_a"), F.col("phash").alias("_c"))
        b = codes.select(F.col(id_col).alias("id_b"), F.col("phash").alias("_c"))
        return (
            a.join(b, "_c")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.lit(0).cast("long").alias("hamming"))
        )
    n_blocks = max_hamming + 1
    width = 64 // n_blocks
    cands = None
    for blk in range(n_blocks):
        key = F.shiftrightunsigned(F.col("phash"), blk * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        a = codes.select(F.col(id_col).alias("id_a"), F.col("phash").alias("_ca"), key.alias("_k"))
        b = codes.select(F.col(id_col).alias("id_b"), F.col("phash").alias("_cb"), key.alias("_k"))
        c = (
            a.join(b, "_k")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "_ca", "_cb")
        )
        cands = c if cands is None else cands.unionByName(c)
    ham = F.bit_count(F.col("_ca").bitwiseXOR(F.col("_cb"))).cast("long")
    return (
        cands.dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
