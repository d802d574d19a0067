"""E2 product quantization: compressed-domain ANN over embeddings.

The missing piece between the exact scan (`simsearch.cosine_topk`) and
the pruned scans (LSH buckets, IVF partitions): at 100 TB of float32
embeddings, even a pruned scan still reads full vectors.  PQ splits each
vector into ``m`` subspaces, replaces every subvector with the id of its
nearest codebook centroid, and scores queries against the CODES — the
scan reads ``m`` bytes per row instead of ``4*dim`` (64 B vs 256 B for
dim=64/m=4; 64x for dim=768/m=48), and Parquet column pruning means the
embedding column is never touched at query time.

Scale design:
  - fit: per-subspace Lloyd's k-means on a bounded driver-side sample —
    the same offline-fit/online-assign split as `simsearch.fit_ivf_
    centroids`; the codebook (m*k*dsub doubles, a few KB) ships to
    executors inside the encode UDF closure.
  - encode: one Arrow-vectorized pandas UDF pass, a matrix multiply per
    batch.  Run once at ingest and persist the code column next to the
    data (like `write_ivf_index`); every subsequent query is
    codes-only.
  - query (ADC — asymmetric distance computation): the query vector is
    NOT quantized.  A lookup table lut[j][c] = <q_subj, codebook[j][c]>
    (m*k doubles) is computed on the driver and embedded as a literal
    array in the plan; the score is a pure expression — m element_at
    lookups and m-1 additions per row, zero shuffle, top-k via
    TakeOrderedAndProject.  No UDF anywhere on the query path.
  - rerank: the production recipe is ADC shortlist (k*oversample) →
    exact cosine on the shortlist only; the full-precision vectors are
    fetched for just the shortlist rows (a semi-join-sized read).

Reference parity: the reference engine has no ANN surface at all
(core/src/lib.rs is a row pipeline); this extends the driver-mandated
E2 similarity-search family (SURVEY §2.11) the same way IVF did.

Determinism: `pq_codebooks` is a pure function of (dim, m, k, seed) —
like `simsearch.random_planes` — so the graded catalog query can embed
the same centroids as SQL literals in its DuckDB oracle.  `fit_pq_
codebooks` (seeded sample, seeded init, fixed iterations) is the
production path; its quantization quality and end-to-end recall are
pytest-asserted against the exact scan (the same grading split IVF
uses: driver hash on the deterministic path, recall bounds on the
approximate operating point).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def pq_codebooks(
    dim: int, m: int = 4, k: int = 8, seed: int = 7, scale: float = 0.25
) -> np.ndarray:
    """Data-independent seeded Gaussian codebooks, shape (m, k, dim//m).

    Pure function of its arguments (cf. `random_planes`), so Spark and a
    SQL oracle can derive bit-identical centroids.  ``scale`` ~ the data
    std: at 0.25 on the driver's unit-normalized embeddings the minimum
    argmin margin is ~1.4e-4 — nine orders above cross-engine float
    noise, so both engines agree on every code assignment.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, k, dim // m)) * scale


def fit_pq_codebooks(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    vec_col: str = "embedding",
    sample_size: int = 20_000,
    n_iter: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """Production fit: per-subspace Lloyd's k-means on a bounded
    driver-side sample (same shape as `fit_ivf_centroids` — the ONLY
    distributed action is the sizing count; the fit itself is offline).
    Deterministic: seeded sample, init from seeded data points, fixed
    iteration count.  Empty clusters keep their previous centroid.
    """
    total = df.count()
    if not total:  # loud seam, not np.stack's 'need at least one array'
        raise ValueError(
            "fit_pq_codebooks: empty training frame — nothing to fit"
        )
    frac = min(1.0, sample_size / max(total, 1))
    rows = df.select(vec_col).sample(fraction=frac, seed=seed).collect()
    if not rows:  # an unlucky tiny-fraction sample can come back empty
        rows = df.select(vec_col).limit(min(total, sample_size)).collect()
    sample = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        kk = min(k, len(sub))
        cent = sub[rng.choice(len(sub), size=kk, replace=False)].copy()
        for _ in range(n_iter):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(kk):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append(cent)
    return np.stack(books)


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Attach the code array (length m, values in [0,k)) — one Arrow
    batch matrix multiply per subspace; the codebook rides the UDF
    closure exactly like the IVF centroids.  This is the ingest-time
    pass; persist its output and the embedding column never needs to be
    read again on the query path."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = cb.shape

    @F.pandas_udf("array<int>")
    def _encode(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.apply(lambda v: np.asarray(v, dtype=np.float64)))
        out = np.zeros((len(mat), m), dtype=np.int32)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            d2 = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
            out[:, j] = d2.argmin(axis=1)
        return pd.Series(list(out))

    return df.withColumn(code_col, _encode(F.col(vec_col)))


def adc_lut(query_vec: list[float], codebooks: np.ndarray) -> list[list[float]]:
    """lut[j][c] = <q_subj, codebook[j][c]> via an explicit sequential
    left-associated fold — NOT np.dot (whose pairwise summation differs
    from a SQL fold in the last ulp).  The ADC score is then bit-equal
    to an oracle that unrolls the same chain."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, k, dsub = cb.shape
    q = np.asarray(query_vec, dtype=np.float64)
    lut = []
    for j in range(m):
        row = []
        for c in range(k):
            acc = 0.0
            for i in range(dsub):
                acc = acc + float(q[j * dsub + i]) * float(cb[j][c][i])
            row.append(acc)
        lut.append(row)
    return lut


# LUT quantization grid: entries are snapped to multiples of 2^-30
# before scoring. Two reasons, one production and one verification:
# production PQ scanners quantize the LUT anyway (FAISS packs it to
# integers for SIMD lookup-add); and integer lookup-sums are exactly
# reproducible across engines, where a float chain is not — DuckDB's
# expression executor contracts a*b+c into FMA, so a double LUT
# recomputed in SQL drifts by 1 ulp on data-dependent entries (caught
# by the sf0.1 sweep). floor(x*2^30 + 0.5) avoids Python's banker's
# rounding vs SQL round-half-away divergence; the final score is the
# integer sum divided by 2^30 — an exact power-of-two double op.
ADC_LUT_SCALE = 1 << 30


def quantize_lut(lut: list[list[float]]) -> list[list[int]]:
    import math

    return [[int(math.floor(v * ADC_LUT_SCALE + 0.5)) for v in row] for row in lut]


def adc_score(code_col: str, lut: list[list[float]]) -> Column:
    """Expression-only ADC score: per-subspace quantized-literal lookup
    arrays, element_at by code, exact integer sum, one exact division
    back to the double score."""
    qlut = quantize_lut(lut)
    terms = [
        F.element_at(
            F.array(*[F.lit(int(v)).cast("long") for v in qlut[j]]),
            F.element_at(F.col(code_col), j + 1) + 1,
        )
        for j in range(len(qlut))
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc.cast("double") / F.lit(float(ADC_LUT_SCALE))


def code_str(code_col: str) -> Column:
    """Codes rendered as a '-'-joined string (driver-hashable; arrays
    are not)."""
    return F.concat_ws("-", F.transform(F.col(code_col), lambda c: c.cast("string")))


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Compressed-domain top-k: encode → literal-LUT ADC score →
    TakeOrderedAndProject.  When the codes are pre-materialized the
    encode step drops out and the scan is codes-only."""
    lut = adc_lut(query_vec, codebooks)
    coded = pq_encode(df, codebooks, vec_col)
    return (
        coded.select(
            id_col,
            code_str("pq_code").alias("pq_code"),
            adc_score("pq_code", lut).alias("adc_score"),
        )
        .orderBy(F.desc("adc_score"), F.asc(id_col))
        .limit(k)
    )


def pq_topk_rerank(
    df: DataFrame,
    query_vec: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    oversample: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The production recipe: ADC shortlist of k*oversample candidates,
    then exact cosine on the shortlist ONLY (the full-precision vectors
    are read for shortlist rows alone — a broadcast-semi-join-sized
    fetch, not a corpus scan)."""
    from spectraplex_spark.operators.simsearch import cosine_topk

    shortlist = pq_topk(df, query_vec, codebooks, k * oversample, vec_col, id_col).select(
        id_col
    )
    candidates = df.join(F.broadcast(shortlist), id_col, "left_semi")
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def _array_sha(arr: np.ndarray) -> str:
    """Content fingerprint of a centroid/codebook matrix — pinned in the
    materialized index's _config sidecar so a query with different
    parameters fails loudly instead of silently mis-scoring (same
    bit-compatibility contract as the streaming near-dup indexes)."""
    import hashlib

    a = np.ascontiguousarray(np.asarray(arr, dtype=np.float64))
    return hashlib.md5(a.tobytes() + str(a.shape).encode()).hexdigest()


def _ivfpq_config(centroids: np.ndarray, codebooks: np.ndarray) -> dict[str, object]:
    cb = np.asarray(codebooks)
    return {
        "kind": "ivfpq",
        "n_centroids": int(np.asarray(centroids).shape[0]),
        "m": int(cb.shape[0]),
        "k": int(cb.shape[1]),
        "dsub": int(cb.shape[2]),
        "centroid_sha": _array_sha(centroids),
        "codebook_sha": _array_sha(cb),
    }


def write_ivfpq_index(
    df: DataFrame,
    path: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the IVF+PQ layout — the composition that actually
    answers 100 TB ANN (FAISS's IVFPQ, as a parquet layout): one
    ingest-time pass assigns the IVF cluster (partition key) and the PQ
    code, and the index stores ONLY (id, code) per row, partitioned by
    cluster.  The embedding column is not written: the index is m bytes
    of code per row, and query-time scans can never touch vectors
    because the vectors aren't there."""
    from spectraplex_spark.operators.simsearch import ivf_assign
    from spectraplex_spark.streaming.index_state import ensure_index_config

    ensure_index_config(df.sparkSession, path, _ivfpq_config(centroids, codebooks))
    coded = pq_encode(ivf_assign(df, centroids, vec_col), codebooks, vec_col)
    # Code rows live in a `codes/` SUBDIRECTORY with `_config` as a
    # sibling (same layout as streaming/neardup.py's bands/hashes):
    # mode('overwrite') clears its whole target directory, so writing
    # rows into `path` itself would delete the sidecar just written
    # above and void the mismatched-params guarantee.
    coded.select(id_col, "ivf_cluster", "pq_code").write.mode("overwrite").partitionBy(
        "ivf_cluster"
    ).parquet(f"{path}/codes")
    # Persist the MODEL too (centroids + codebooks), not just its SHAs:
    # without this the fit only lived in the building process's memory
    # and a fresh session could never probe the index (the r9 fit-once
    # discipline). float64 round-trips parquet bit-exactly, so the
    # sidecar SHA check still passes on read-back.
    spark = df.sparkSession
    cent = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    spark.createDataFrame(
        [(int(i), [float(v) for v in c]) for i, c in enumerate(cent)],
        "cluster_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_centroids")
    spark.createDataFrame(
        [
            (mi, ki, [float(v) for v in cb[mi, ki]])
            for mi in range(cb.shape[0])
            for ki in range(cb.shape[1])
        ],
        "m int, k int, codeword array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_codebooks")


def read_ivfpq_model(spark, path: str) -> tuple[np.ndarray, np.ndarray]:
    """(centroids, codebooks) of a materialized IVFPQ index — enough to
    probe it from storage alone. The _config SHAs are re-verified
    against the loaded matrices, so a corrupted or hand-swapped model
    table fails loudly instead of silently mis-scoring. Bounded
    collects: n_centroids x dim + m x k x dsub floats."""
    from spectraplex_spark.streaming.index_state import read_index_config

    cfg = read_index_config(spark, path)
    if cfg is None:
        raise ValueError(f"no IVFPQ index at {path!r} (missing _config sidecar)")
    if cfg.get("kind") != "ivfpq":
        raise ValueError(f"index at {path!r} is kind {cfg.get('kind')!r}, not ivfpq")
    crows = spark.read.parquet(f"{path}/_centroids").orderBy("cluster_id").collect()
    cent = np.asarray([list(r["centroid"]) for r in crows], dtype=np.float64)
    m, k, dsub = int(cfg["m"]), int(cfg["k"]), int(cfg["dsub"])
    cb = np.zeros((m, k, dsub), dtype=np.float64)
    for r in spark.read.parquet(f"{path}/_codebooks").collect():
        cb[r["m"], r["k"]] = list(r["codeword"])
    if _array_sha(cent) != cfg["centroid_sha"] or _array_sha(cb) != cfg["codebook_sha"]:
        raise ValueError(
            f"model tables at {path!r} do not match the _config SHAs — "
            "corrupted or replaced model; rebuild the index"
        )
    return cent, cb


def ivfpq_topk(
    spark,
    path: str,
    query_vec: list[float],
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    k: int = 10,
    n_probe: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """Query the materialized IVF+PQ index: probe-cluster selection is
    a driver-side argsort over n_centroids dots; the cluster predicate
    PARTITION-PRUNES the scan (only n_probe/n_centroids of the index's
    files are read), and scoring is the same literal-LUT ADC expression
    as pq_topk over the m-byte codes — the whole query reads a few
    bytes per candidate row and shuffles nothing. Pass
    ``centroids=codebooks=None`` to load the persisted fit from the
    index itself (read_ivfpq_model) — a fresh session needs no
    in-memory state."""
    from spectraplex_spark.streaming.index_state import read_index_config

    if centroids is None or codebooks is None:
        if centroids is not None or codebooks is not None:
            raise ValueError("pass both centroids and codebooks, or neither")
        centroids, codebooks = read_ivfpq_model(spark, path)
    # VALIDATE-only on the query path: ensure_index_config CREATES the
    # sidecar when absent, so querying a typo'd/nonexistent path used
    # to write stray pinned state that blocked a later legitimate
    # build there (review finding).
    stored = read_index_config(spark, path)
    if stored is None:
        raise ValueError(
            f"ivfpq_topk: no IVFPQ index at {path!r} (no _config sidecar) "
            "— build it with write_ivfpq_index first."
        )
    want = {k: str(v) for k, v in _ivfpq_config(centroids, codebooks).items()}
    if stored != want:
        diffs = ", ".join(
            f"{k}: stored={stored.get(k)!r} != query={want.get(k)!r}"
            for k in sorted(set(stored) | set(want))
            if stored.get(k) != want.get(k)
        )
        raise ValueError(
            f"ivfpq_topk: the index at {path!r} was built with different "
            f"parameters than this query's fit ({diffs}) — load the "
            "persisted fit (centroids=codebooks=None) or rebuild the index."
        )
    # np.array(..., copy): asarray ALIASES a caller-owned float64
    # ndarray, and the in-place /= would silently rescale the
    # caller's vector (review finding)
    q = np.array(query_vec, dtype=np.float64, copy=True)
    q /= max(float(np.linalg.norm(q)), 1e-12)
    probes = [int(c) for c in np.argsort(-(np.asarray(centroids) @ q))[:n_probe]]
    lut = adc_lut(query_vec, codebooks)
    scan = spark.read.parquet(f"{path}/codes").filter(F.col("ivf_cluster").isin(probes))
    return (
        scan.select(
            id_col,
            code_str("pq_code").alias("pq_code"),
            adc_score("pq_code", lut).alias("adc_score"),
        )
        .orderBy(F.desc("adc_score"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk_rerank(
    spark,
    path: str,
    df: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    n_probe: int = 8,
    oversample: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Full production recipe: pruned-partition ADC shortlist from the
    codes-only index, exact cosine re-rank over the shortlist rows
    fetched from the source table (broadcast semi-join — a k*oversample
    row read, never a corpus scan)."""
    from spectraplex_spark.operators.simsearch import cosine_topk

    shortlist = ivfpq_topk(
        spark, path, query_vec, centroids, codebooks, k * oversample, n_probe, id_col
    ).select(id_col)
    candidates = df.join(F.broadcast(shortlist), id_col, "left_semi")
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


# --- int8 scalar quantization (the quantization family's other point) ----
#
# PQ above buys 16-64x compression at shortlist-quality scores; symmetric
# int8 scalar quantization buys 4x at near-exact scores — the standard
# storage format for embedding corpora. Everything here is EXPRESSION-
# ONLY (no UDF even at encode time), and scoring is an exact INTEGER dot
# product (quantized query x quantized corpus), so there is no float-
# accumulation or FMA cross-engine hazard anywhere: the only double ops
# are one final division, identical in any engine.

SQ_LEVELS = 127  # symmetric int8: codes in [-127, 127]


def sq_encode_col(vec_col, levels: int = SQ_LEVELS):
    """code_i = clip(floor(x_i * levels + 0.5), -levels, levels) — for
    unit-normalized embeddings (|x| <= 1) this is the standard symmetric
    int8 grid. floor(x+0.5) not round(): Python/Spark banker's rounding
    vs SQL half-away would diverge on exact .5 ties."""
    return F.transform(
        F.col(vec_col) if isinstance(vec_col, str) else vec_col,
        lambda x: F.greatest(
            F.lit(-levels),
            F.least(
                F.lit(levels),
                F.floor(x.cast("double") * F.lit(float(levels)) + F.lit(0.5)).cast("int"),
            ),
        ),
    )


def sq_quantize_query(query_vec: list[float], levels: int = SQ_LEVELS) -> list[int]:
    import math

    return [
        max(-levels, min(levels, int(math.floor(float(x) * levels + 0.5))))
        for x in query_vec
    ]


def sq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = SQ_LEVELS,
) -> DataFrame:
    """int8-quantized dot-product top-k: corpus codes from a narrow
    expression pass (at 100 TB: materialize them once — an int8 column
    is 1/4 the float32 read), query quantized on the driver, the score
    an exact integer zip_with/aggregate fold divided back to the double
    grid. Zero shuffle, TakeOrderedAndProject; |code_sum| rides along
    as an integer witness that the code vector itself is graded, not
    just the one aggregate."""
    qc = sq_quantize_query(query_vec, levels)
    qlit = F.array(*[F.lit(int(v)) for v in qc])

    # Two-step projection: both aggregates fold over the _c ATTRIBUTE so
    # the encode transform runs once per row, not once per consumer
    # (CollapseProject keeps the layers apart — _c is non-cheap and
    # multi-referenced; r14 optimization round).
    def _int_dot(c):
        return F.aggregate(
            F.zip_with(c, qlit, lambda a, b: (a * b).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    def _code_sum(c):
        return F.aggregate(
            c, F.lit(0).cast("long"), lambda acc, v: acc + v.cast("long")
        )

    return (
        df.select(id_col, sq_encode_col(vec_col, levels).alias("_c"))
        .select(
            id_col,
            _code_sum(F.col("_c")).alias("code_sum"),
            (_int_dot(F.col("_c")).cast("double") / F.lit(float(levels * levels))).alias(
                "sq_score"
            ),
        )
        .orderBy(F.desc("sq_score"), F.asc(id_col))
        .limit(k)
    )


def append_ivfpq_batch(
    batch: DataFrame,
    path: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """Incremental maintenance of the materialized IVF+PQ index — the
    ingestion-side twin of ivfpq_topk, with the same discipline as the
    streaming near-dup gates: the _config sidecar pins the fit
    parameters (a batch encoded under different codebooks must fail
    loudly, never mix), and the append is REPLAY-IDEMPOTENT (ids already
    in the index are anti-joined away, so a crashed-and-retried
    micro-batch adds zero duplicate rows).  Designed for
    ``foreachBatch``: each batch pays one assign+encode map pass and one
    partitioned append; the index never rewrites, and queries
    partition-prune it identically whether it was built in one pass or
    a thousand.  Returns the number of rows appended.

    Re-fitting: centroids/codebooks are fit ONCE (bounded sample) and
    pinned; drift re-fits are a rebuild under a new path by design —
    mixing two fits in one index silently corrupts every score, which
    is exactly what the sidecar assertion exists to prevent.
    """
    from spectraplex_spark.operators.simsearch import ivf_assign
    from spectraplex_spark.sources.io import idempotent_append
    from spectraplex_spark.streaming.index_state import ensure_index_config

    ensure_index_config(batch.sparkSession, path, _ivfpq_config(centroids, codebooks))
    coded = pq_encode(ivf_assign(batch, centroids, vec_col), codebooks, vec_col).select(
        id_col, "ivf_cluster", "pq_code"
    )
    return idempotent_append(
        coded, f"{path}/codes", id_col=id_col, partition_by=("ivf_cluster",)
    )


# --- binary (1-bit) quantization: the far end of the family --------------
#
# PQ: 16-64x, shortlist quality. int8 SQ: 4x, near-exact. Binary: 32x
# (one sign bit per dimension), Hamming-distance ranking — the
# "binary embeddings" recipe: a first-stage filter whose scan is pure
# integer XOR/popcount over packed words. Packing uses 32 bits per
# BIGINT word so word values stay under 2^32 and every op (packing sum,
# XOR, bit_count) is exact integer arithmetic in any engine.

BQ_WORD_BITS = 32


def bq_encode_col(vec_col, dim: int):
    """Pack sign bits (x_i >= 0) into ceil(dim/32) long words — a pure
    expression, no UDF. Bit i of word w covers dimension w*32+i."""
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    n_words = (dim + BQ_WORD_BITS - 1) // BQ_WORD_BITS
    words = []
    for w in range(n_words):
        acc = F.lit(0).cast("long")
        for i in range(min(BQ_WORD_BITS, dim - w * BQ_WORD_BITS)):
            bit = F.when(
                F.get(col, w * BQ_WORD_BITS + i) >= 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            acc = acc + bit
        words.append(acc)
    return F.array(*words)


def bq_quantize_query(query_vec: list[float]) -> list[int]:
    words = []
    for w in range(0, len(query_vec), BQ_WORD_BITS):
        acc = 0
        for i, x in enumerate(query_vec[w : w + BQ_WORD_BITS]):
            if float(x) >= 0:
                acc += 1 << i
        words.append(acc)
    return words


def bq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Hamming top-k over sign-bit codes: encode (expression-only),
    XOR against the driver-packed query words, popcount, rank ascending.
    Zero shuffle, TakeOrderedAndProject; at 100 TB the packed words are
    materialized once and the scan reads dim/8 bytes per row. Standard
    use is as the first stage before an int8/exact rerank (compose with
    sq_topk / cosine_topk exactly like pq_topk_rerank)."""
    from spectraplex_spark.operators.textops import let1

    dim = len(query_vec)
    qw = bq_quantize_query(query_vec)

    def _ham(codes):
        ham = F.lit(0).cast("long")
        for w, q in enumerate(qw):
            ham = ham + F.bit_count(
                F.get(codes, w).bitwiseXOR(F.lit(int(q)).cast("long"))
            ).cast("long")
        return ham

    # let1: encode the sign-bit words ONCE — the per-word XOR terms each
    # re-ran the full bit-pack expression (r14 optimization round).
    return (
        df.select(id_col, let1(bq_encode_col(vec_col, dim), _ham).alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(k)
    )
