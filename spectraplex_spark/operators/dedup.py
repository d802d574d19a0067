"""E1 deduplication operators (driver-mandated extension, SURVEY §2.11).

Scale design (the point of each variant):
  - exact_dedup: one hash-shuffle on the fingerprint — the only full
    shuffle any dedup here performs; at 100 TB the fingerprint (16 bytes)
    shuffles, never the document text.
  - MinHash+LSH: near-dup detection WITHOUT the O(n²) all-pairs compare.
    Everything up to the band join is a narrow map stage (shingles →
    minhash signature → band keys, all JVM expressions); the only shuffle
    is the self-join on (band, band_hash), whose output is only the
    candidate pairs (documents agreeing on ≥1 band). Candidates are then
    verified with exact shingle Jaccard. Band count b and rows-per-band r
    trade recall vs candidate volume: P(pair surfaces) = 1-(1-s^r)^b.
  - SimHash: 64-bit signature per doc; near-dups = small Hamming
    distance. Signature build is one aggregate expression; candidate
    generation joins on rotated prefix blocks (here: exact-signature
    buckets, the degenerate-but-shuffle-cheap variant).

All signatures use xxhash64 with distinct seeds — deterministic across
runs and executors, no fitting/state (unlike MLlib's MinHashLSH model,
which would need a fit step; at 100 TB stateless is the right call).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spectraplex_spark.operators.textops import fingerprint, normalized, tokens

# Mersenne prime for the minhash family. 2^31-1 keeps a*h+b within a
# long under ANSI arithmetic (a,h < 2^31 → product < 2^62): Spark 4
# throws on long overflow instead of wrapping.
_P = (1 << 31) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact normalized-text match.

    The groupBy shuffles only (fingerprint, id): with min() as the pick
    rule the result is deterministic (unlike dropDuplicates, whose
    survivor depends on partition order).
    """
    fp = fingerprint(F.col(text_col))
    keep = (
        df.select(F.col(id_col), fp.alias("_fp"))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
        .drop("_fp")
    )
    return df.join(keep, id_col, "left_semi")


def shingles(text_col, n: int = 3):
    """Word n-gram shingle set as an array column (expression-only)."""
    toks = tokens(text_col)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_signature(shingle_col, num_hashes: int = 32):
    """Array of `num_hashes` minhash values over the shingle set.

    h_i(s) = ((a_i * xxhash64(s) + b_i) mod P); coefficients derive
    deterministically from the hash index, so signatures are reproducible
    on any executor with no broadcast state.
    """
    def one_hash(a: int, b: int):
        # closure factory: a default-arg lambda would read as a 3-arg HOF
        # lambda to PySpark's signature inspection. Reduce the 64-bit
        # xxhash to < 2^31 first so a*h+b never overflows a long (ANSI).
        return F.array_min(
            F.transform(
                shingle_col,
                lambda s: F.pmod(
                    F.pmod(F.xxhash64(s), F.lit(_P)) * F.lit(a) + F.lit(b), F.lit(_P)
                ),
            )
        )

    return F.array(
        *[
            one_hash((0x9E3779B9 * (i + 1)) % _P | 1, (0x85EBCA6B * (i + 1)) % _P)
            for i in range(num_hashes)
        ]
    )


def minhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact shingle Jaccard ≥
    threshold, found via LSH banding (no all-pairs compare)."""
    rows_per_band = num_hashes // bands
    sig = (
        df.select(F.col(id_col).alias("_id"), shingles(F.col(text_col), shingle_n).alias("_sh"))
        .withColumn("_sig", minhash_signature(F.col("_sh"), num_hashes))
    )
    banded = sig.select(
        "_id",
        "_sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band))
                ),
            )
        ).alias("_band", "_bandhash"),
    )
    left = banded.select(
        F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), "_band", "_bandhash"
    )
    right = banded.select(
        F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"), "_band", "_bandhash"
    )
    cands = (
        left.join(right, ["_band", "_bandhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold — the O(n²) baseline the
    LSH variant approximates. Only for small candidate sets (tests,
    oracle); the cross join does NOT scale and says so."""
    s = df.select(F.col(id_col).alias("_id"), shingles(F.col(text_col), shingle_n).alias("_sh"))
    a = s.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    b = s.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(text_col, shingle_n: int = 2):
    """64-bit SimHash over word shingles, as a single aggregate expression.

    Per bit: sum +1/-1 weighted votes of each shingle's xxhash64 bit,
    then take the sign. One narrow pass, no shuffle.
    """
    sh = shingles(text_col, shingle_n)

    def add_votes(acc, s):
        h = F.xxhash64(s)
        bit_votes = F.array(
            *[
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                )
                for i in range(64)  # Python ints: shiftright needs a literal
            ]
        )
        return F.zip_with(acc, bit_votes, lambda a, v: a + v)

    votes = F.aggregate(sh, F.array_repeat(F.lit(0), 64), add_votes)
    sig = F.lit(0).cast("long")
    for i in range(64):
        bit = 1 << i if i < 63 else -(1 << 63)  # bit 63 = long sign bit
        sig = sig.bitwiseOR(
            F.when(F.get(votes, i) > 0, F.lit(bit).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def simhash_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Documents sharing an identical 64-bit SimHash (Hamming distance 0
    buckets — the shuffle-cheap screen; near buckets would join on
    rotated prefixes)."""
    sig = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("simhash"))
    return (
        sig.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("representative"))
        .filter(F.col("n_docs") > 1)
    )
