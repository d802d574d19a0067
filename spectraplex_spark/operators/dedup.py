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

from pyspark.sql import DataFrame, Window, functions as F

from spectraplex_spark.operators.textops import fingerprint, let1, normalized, tokens

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
    """Word n-gram shingle set as an array column (expression-only).

    Built by (n-1) zip_with passes — ``acc[i]`` after pass j is tokens
    i..i+j joined by spaces — NOT by ``transform(sequence, i ->
    slice(toks, i, n))``: a lambda that references ``toks`` re-evaluates
    the whole lower/regex/split tokenization chain PER ELEMENT (HOF
    lambdas defeat common-subexpression elimination — the same trap
    shingle_hashes documents). Here the token array only ever appears
    as a HOF *argument*, evaluated once per pass, so cost is
    O(n·tokenize) per row instead of O(n_grams·tokenize) — measured 9x
    on the decontamination scan (11.8s → 1.3s at sf0.1).
    zip_with pads the shorter side with null and concat propagates it,
    so tails null out and are sliced off, exactly as in shingle_hashes.
    """
    def _from(th):
        acc = th
        for j in range(1, n):
            acc = F.zip_with(
                acc,
                F.slice(th, j + 1, F.greatest(F.size(th) - j, F.lit(1))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        windowed = F.slice(acc, 1, F.greatest(F.size(th) - (n - 1), F.lit(1)))
        whole = F.array(F.concat_ws(" ", th))
        return F.array_distinct(F.when(F.size(th) >= n, windowed).otherwise(whole))

    # let1: bind the token array ONCE — the body references it ~2n times
    # and each reference used to re-inline (and re-execute) the whole
    # lower→regexp→split tokenize chain (r14 optimization round).
    return let1(tokens(text_col), _from)


_POLY_C = 1_000_003  # < 2^31 so pmod-chained combination never overflows


def shingle_hashes_from(th, n: int = 3):
    """Polynomial n-gram combine over an ALREADY-HASHED token array
    (< 2^31 longs) — THE single definition of the shingle-combine
    family, shared by the production signatures (:func:`shingle_hashes`,
    xxhash64 base) and the cross-engine estimator twin
    (estimators.py, md5 portable base).  One definition so a combine
    tweak can't silently drift the graded estimator off the production
    shingle family — the same rationale as :func:`perm_constants`
    (r13 review finding; the estimator copy unified here r14).

    acc[i] = hash of tokens[i .. i+j] after pass j; zip_with pads the
    shorter side with null, so tails become null and are sliced off.
    """
    acc = th
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(th, j + 1, F.greatest(F.size(th) - j, F.lit(1))),
            lambda a, b: F.pmod(a * F.lit(_POLY_C) + b, F.lit(_P)),
        )
    windowed = F.slice(acc, 1, F.greatest(F.size(th) - (n - 1), F.lit(1)))
    whole = F.array(
        F.aggregate(
            th, F.lit(0).cast("long"), lambda a, b: F.pmod(a * F.lit(_POLY_C) + b, F.lit(_P))
        )
    )
    return F.array_distinct(F.when(F.size(th) >= n, windowed).otherwise(whole))


def shingle_hashes(text_col, n: int = 3):
    """Shingle set reduced to < 2^31 longs, WITHOUT materializing shingle
    strings: hash each token once (xxhash64 → pmod), then combine n
    neighboring token hashes polynomially via (n-1) zip_with passes of
    integer arithmetic (:func:`shingle_hashes_from`). Equivalent
    identity semantics to hashing the joined shingle string, at a
    fraction of the cost (no per-shingle concat; the text is touched
    exactly once).

    This is THE expensive per-document pass — compute it once and
    persist; signatures, bands, and Jaccard are integer-array arithmetic
    over this array and never touch the text again.
    """
    # let1: bind the hashed token array ONCE — shingle_hashes_from
    # references it ~8 times and every reference used to re-inline the
    # whole tokenize+xxhash chain (measured 3.2× on the sf0.1 shingle
    # pass: 0.97 s → 0.30 s, identical output — r14 optimization round).
    th = F.transform(tokens(text_col), lambda t: F.pmod(F.xxhash64(t), F.lit(_P)))
    return let1(th, lambda v: shingle_hashes_from(v, n))


def perm_constants(num_hashes: int) -> list[tuple[int, int]]:
    """The (a, b) affine-permutation family behind minhash_signature
    (golden-ratio / Murmur mixing constants) — THE single definition;
    estimators.minhash_error_report grades exactly this family by
    importing it from here (review finding r13: a copy-pasted twin
    could silently drift from the production signatures)."""
    return [
        ((0x9E3779B9 * (j + 1)) % _P | 1, (0x85EBCA6B * (j + 1)) % _P)
        for j in range(num_hashes)
    ]


def minhash_signature(hash_col, num_hashes: int = 32):
    """Array of `num_hashes` minhash values over HASHED shingles
    (see shingle_hashes).

    h_i(x) = (a_i * x + b_i) mod P; coefficients derive deterministically
    from the hash index (perm_constants), so signatures are reproducible
    on any executor with no broadcast state. x, a_i < 2^31 keeps a*x+b
    within a long under ANSI arithmetic (Spark 4 throws on overflow).
    """

    def one_hash(a: int, b: int):
        # closure factory: a default-arg lambda would read as a 3-arg HOF
        # lambda to PySpark's signature inspection
        return F.array_min(
            F.transform(hash_col, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_P)))
        )

    return F.array(*[one_hash(a, b) for a, b in perm_constants(num_hashes)])


def band_keys(sig_col, num_hashes: int, bands: int):
    """Per-band LSH bucket keys over an ALREADY-COMPUTED minhash
    signature column: xxhash64 of each ``rows_per_band``-slice.

    The single source of truth for band derivation — the batch pair
    miner and the incremental gate (streaming/neardup.py) must produce
    bit-identical keys or their parquet band indexes silently stop
    matching. Takes the signature as a column (not the hash array)
    deliberately: embedding minhash_signature inside the per-band
    lambda would re-evaluate all ``num_hashes`` minhashes once PER BAND
    (HOF lambdas defeat common-subexpression elimination).
    """
    rows_per_band = num_hashes // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(
                ",", F.slice(sig_col, b * F.lit(rows_per_band) + 1, rows_per_band)
            )
        ),
    )


def minhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    max_band_bucket: int = 256,
    verify_on_text: bool = False,
    hashes_df: DataFrame | None = None,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact shingle Jaccard ≥
    threshold, found via LSH banding (no all-pairs compare).

    Skew guard (``max_band_bucket``): a band bucket holding m documents
    normally emits m(m-1)/2 candidates — boilerplate/empty-doc clusters
    collapse into ONE bucket and go quadratic at scale. Buckets larger
    than the cap switch to STAR pairing (every member pairs with the
    bucket's min id only → m-1 candidates), so a pathological bucket can
    no longer blow up the shuffle; the star graph has diameter 2, so
    downstream connected components converge in O(1) rounds. Candidate
    volume is thus O(Σ min(m², m·cap)) — linear in the worst bucket.

    Recall trade-off of the star form: member–member pairs in an
    over-cap bucket survive only transitively through the min-id head,
    and each star edge must still pass the exact-Jaccard verify. If the
    head is a banding false positive (hashed into the bucket without
    being a true near-dup of the members), genuinely similar member
    pairs in that bucket are dropped. In practice over-cap buckets are
    overwhelmingly boilerplate clusters where every member is mutually
    similar — but recall 1.0 is NOT guaranteed past the cap; other bands
    usually (not provably) re-surface the lost pairs.
    """
    # Structural rules that make this scale (and run at all — see git
    # history: the naive expression nesting recomputed the text pass
    # 2×bands×hashes times because HOF lambdas defeat common-
    # subexpression elimination):
    #  1. hash the string shingles to longs ONCE and persist; signatures,
    #     bands and Jaccard are integer-array arithmetic from then on.
    #     At 100 TB this table is written to storage once and reused.
    #  2. only (id, band, bandhash) rides through the explode +
    #     self-join; shingle-hash arrays are joined back for the (much
    #     smaller) candidate set only.
    # ``hashes_df`` lets a caller that already materialized the shingle-
    # hash pass (e.g. prepare_corpus, which folds it into the one
    # enrichment scan) hand it in as (_id, _h) and skip the text pass
    # here entirely.
    # Lazy localCheckpoint, not persist: the signature/band/verify
    # stages all re-read this frame, and persist() entries live in the
    # CacheManager for the whole session — repeated calls (serving, a
    # long bench session) would accumulate cached text-pass outputs.
    # Checkpoint blocks are RDD-scoped and freed by the ContextCleaner
    # when the frame is garbage collected; eager=False keeps plan
    # construction side-effect free (materialization happens on the
    # first action, exactly like persist).
    # Known trade: localCheckpoint blocks do NOT recompute from lineage
    # on executor loss (persist blocks do) — in local mode that's moot;
    # on a preemptible-node cluster pass ``reliable_checkpoint=True``
    # (with setCheckpointDir on fault-tolerant storage) or hand in a
    # storage-backed ``hashes_df`` via write_shingle_hashes — either
    # way a lost block is a re-read, not a failed job.
    from spectraplex_spark.operators.components import lineage_truncate

    if hashes_df is not None:
        hashed = lineage_truncate(
            hashes_df.select("_id", "_h"), reliable_checkpoint
        )
    else:
        hashed = lineage_truncate(
            df.select(
                F.col(id_col).alias("_id"),
                shingle_hashes(F.col(text_col), shingle_n).alias("_h"),
            ),
            reliable_checkpoint,
        )
    banded = hashed.select(
        "_id",
        minhash_signature(F.col("_h"), num_hashes).alias("_sig"),
    ).select(
        "_id",
        F.posexplode(band_keys(F.col("_sig"), num_hashes, bands)).alias(
            "_band", "_bandhash"
        ),
    )
    wb = Window.partitionBy("_band", "_bandhash")
    # lazy checkpoint: three consumers read this frame (both sides of
    # the quadratic self-join and the star branch); without it the
    # signature+window pass re-executes per consumer unless Catalyst
    # happens to reuse the exchange — the checkpoint makes the single
    # materialization structural, not plan-luck.
    # Measured (r6, sf0.1, min of 4 alternating runs): checkpoint 2.07s,
    # no-checkpoint 1.99s, persist 2.18s — all within session noise, so
    # the checkpoint's materialization cost is NOT a bottleneck at this
    # SF; it stays because at 100 TB one banding shuffle + a
    # materialized read beats three full window shuffles (ReuseExchange
    # was observed NOT to kick in across the three consumers). A
    # groupBy+collect_list rewrite (pairs generated expression-side, no
    # self-join) also measured equal (1.98s) with identical output, but
    # puts an O(bucket-size) array in a single row for over-cap buckets
    # — a driver-row memory hazard the window+filter form doesn't have,
    # so the window form stays.
    sized = lineage_truncate(
        banded.withColumn("_bsz", F.count(F.lit(1)).over(wb)).withColumn(
            "_head", F.min("_id").over(wb)
        ),
        reliable_checkpoint,
    )
    small = sized.filter(F.col("_bsz") <= max_band_bucket).select(
        "_id", "_band", "_bandhash"
    )
    pairs_quadratic = (
        small.alias("a")
        .join(small.alias("b"), ["_band", "_bandhash"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
    )
    pairs_star = sized.filter(
        (F.col("_bsz") > max_band_bucket) & (F.col("_id") != F.col("_head"))
    ).select(F.col("_head").alias("id_a"), F.col("_id").alias("id_b"))
    cands = pairs_quadratic.unionByName(pairs_star).dropDuplicates(["id_a", "id_b"])
    # Default verify: Jaccard over hashed shingles == string Jaccard up
    # to negligible 31-bit collisions, at a fraction of the compare cost.
    # verify_on_text instead joins back STRING shingle sets for the
    # (small) candidate set — collision-free and reproducible in ANSI
    # SQL, which is what makes the planted-pair catalog query
    # oracle-gradable; banding still runs on the hashed fast path.
    if verify_on_text:
        verify = df.select(
            F.col(id_col).alias("_id"), shingles(F.col(text_col), shingle_n).alias("_h")
        )
    else:
        verify = hashed
    jac = F.size(F.array_intersect("h_a", "h_b")) / F.size(F.array_union("h_a", "h_b"))
    return (
        cands.join(verify.select(F.col("_id").alias("id_a"), F.col("_h").alias("h_a")), "id_a")
        .join(verify.select(F.col("_id").alias("id_b"), F.col("_h").alias("h_b")), "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def write_shingle_hashes(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> None:
    """Materialize the hashed-shingle table ``(_id, _h)`` to storage —
    the documented 100 TB shape for the whole LSH family: the text
    pass (shingle + hash, the expensive narrow scan) runs ONCE; every
    signature/band/verify consumer re-reads the table (recompute on
    executor loss is a storage re-read, never a failed job); and
    repeated near-dup runs — parameter sweeps over bands/num_hashes/
    thresholds, which all reuse the same shingle hashes — skip the
    text pass entirely. Feed back via
    ``minhash_neardup_pairs(df, hashes_df=spark.read.parquet(path))``
    (parity with the inline path is pytest-pinned)."""
    df.select(
        F.col(id_col).alias("_id"),
        shingle_hashes(F.col(text_col), shingle_n).alias("_h"),
    ).write.mode("overwrite").parquet(path)


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
    buckets — the shuffle-cheap screen; near-miss pairs go through
    :func:`simhash_neighbor_pairs`)."""
    sig = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("simhash"))
    return (
        sig.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("representative"))
        .filter(F.col("n_docs") > 1)
    )


def simhash_neighbor_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_n: int = 2,
) -> DataFrame:
    """SimHash near-miss pairs: (id_a < id_b, hamming ≤ max_hamming),
    found WITHOUT an all-pairs compare via 16-bit block buckets.

    Pigeonhole guarantee: two 64-bit signatures within Hamming distance
    ≤ 3 differ in at most 3 of the 4 disjoint 16-bit blocks, so they
    agree EXACTLY on ≥ 1 block — candidate recall is 1.0 (for
    max_hamming ≤ 3; distance 4+ pairs may or may not surface). The
    equi-join on (block index, block value) shuffles only
    (id, signature, 2-byte key); candidates are verified with
    bit_count(xor) — one JVM expression.

    Scale: 4 rows per document ride the shuffle; bucket sizes follow the
    16-bit key distribution (65k buckets per block), so candidate volume
    is driven by real signature clusters, not n².
    """
    sig = df.select(F.col(id_col).alias("_id"), simhash64(F.col(text_col), shingle_n).alias("_sig"))
    blocks = sig.select(
        "_id",
        "_sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("_sig", 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("_blk", "_key"),
    )
    hamming = F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig")))
    return (
        blocks.alias("a")
        .join(blocks.alias("b"), ["_blk", "_key"])
        .filter(F.col("a._id") < F.col("b._id"))
        .filter(hamming <= max_hamming)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming.cast("int").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def cross_corpus_neardup(
    corpus: DataFrame,
    probe: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str = "text",
    probe_id_col: str = "probe_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    verify_on_text: bool = False,
) -> DataFrame:
    """FUZZY decontamination: corpus documents near-duplicating any doc
    of a (small) probe set — the MinHash member of the decontamination
    family. decontam.contamination_report answers "shares an exact long
    n-gram with the benchmark"; this answers "IS a near-duplicate of a
    benchmark doc" (paraphrased eval answers, reformatted few-shot
    exemplars — the leakage exact n-grams miss).

    Returns (id_col, probe_id_col, jaccard) pairs with exact shingle
    Jaccard >= threshold, found via cross-table LSH banding.

    Scale design (the decontam asymmetry, applied to banding): the
    probe side is eval-set-sized (MBs), so its band table BROADCASTS —
    the 100 TB corpus is banded in a narrow map pass and probed by a
    broadcast hash join; no corpus-side shuffle, no self-join, no star
    cap needed (candidate volume is bounded by the probe's bucket
    membership). Only the (rare) banding candidates pay the exact
    verify join. verify_on_text=True verifies on string shingle sets
    (collision-free, SQL-oracle-able — the graded path); default
    verifies on the hashed stream (the 100 TB path, identical verdicts
    absent 31-bit collisions).
    """

    def _bands(df, tcol, icol, alias):
        hashed = df.select(
            F.col(icol).alias(alias),
            shingle_hashes(F.col(tcol), shingle_n).alias("_h"),
        ).localCheckpoint(eager=False)
        # let1: bind the 32-hash signature ONCE — nesting it directly in
        # band_keys' per-band transform lambda re-evaluated the whole
        # signature once PER BAND (16×; lambda subtrees are invisible to
        # subexpression elimination — r14 optimization round).
        banded = hashed.select(
            alias,
            F.posexplode(
                let1(
                    minhash_signature(F.col("_h"), num_hashes),
                    lambda s: band_keys(s, num_hashes, bands),
                )
            ).alias("_band", "_bandhash"),
        )
        return hashed, banded

    c_hashed, c_bands = _bands(corpus, text_col, id_col, "id_c")
    p_hashed, p_bands = _bands(probe, probe_text_col, probe_id_col, "id_p")
    cands = (
        c_bands.join(F.broadcast(p_bands), ["_band", "_bandhash"])
        .select("id_c", "id_p")
        .dropDuplicates(["id_c", "id_p"])
    )
    if verify_on_text:
        c_v = corpus.select(
            F.col(id_col).alias("id_c"), shingles(F.col(text_col), shingle_n).alias("h_c")
        )
        p_v = probe.select(
            F.col(probe_id_col).alias("id_p"),
            shingles(F.col(probe_text_col), shingle_n).alias("h_p"),
        )
    else:
        c_v = c_hashed.select(F.col("id_c"), F.col("_h").alias("h_c"))
        p_v = p_hashed.select(F.col("id_p"), F.col("_h").alias("h_p"))
    jac = F.size(F.array_intersect("h_c", "h_p")) / F.size(F.array_union("h_c", "h_p"))
    # cands is probe-bounded (docs sharing a band bucket with the eval
    # set) — broadcast it into the corpus-side verify join so the
    # corpus never shuffles here either.
    return (
        c_v.join(F.broadcast(cands), "id_c")
        .join(F.broadcast(p_v), "id_p")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select(
            F.col("id_c").alias(id_col),
            F.col("id_p").alias(probe_id_col),
            "jaccard",
        )
    )
