"""E4 inverted-index text retrieval over the document corpus: postings
build, conjunctive top-k, exact phrase search, BM25 ranking.

Why a training-data pipeline needs it: corpus curation is queries —
"show me the docs mentioning X", "how often does this exact phrase
occur", "rank the corpus against this probe" — and at 100 TB you
answer them from a materialized inverted index, not a full-text rescan
per question. This is the text twin of the IVF/PQ embedding indexes:
build once at ingest, probe cheaply forever.

Scale design:
  - build_postings is ONE explode + ONE groupBy; the shuffled rows are
    (term, doc_id, pos) triples, never document text.
  - materialize_postings writes the index partitioned by
    pmod(xxhash64(term), n_partitions): a probe for q query terms reads
    at most q partitions (plan-asserted partition pruning in
    tests/test_retrieval.py — same layout discipline as the IVF index).
  - searches touch only the probed terms' postings: after the term
    filter the frame is query-sized, so the per-term joins broadcast;
    the corpus is never rescanned.
  - scoring:
      * conjunctive_topk ranks by Σ tf — ALL-integer arithmetic, ties
        to the lowest doc_id: bit-gradable in any engine.
      * phrase_match counts exact phrase occurrences by position-list
        intersection (positions of term i shifted by -i) — integers
        end to end; the SQL oracle recounts via n-gram string equality,
        an INDEPENDENT formulation of the same quantity.
      * bm25_topk is the production relevance ranking (k1/b, log idf).
        Its idf/avgdl constants are driver-computed from two bounded
        aggregates; length normalization reads the dl column the
        postings DENORMALIZE at build time (layout v2) — never a
        corpus-sided join. The raw per-doc score is float — ln() and
        float accumulation make it non-bit-gradable cross-engine by
        the same argument as simhash (FIXTURES.md FMA note) — so the
        graded entry (``bm25_topk_grid``) snaps each per-posting
        contribution to a 2^-20 integer grid before the sum, making
        the ranking itself exact-integer and hash-gradable while the
        ungridded float path stays pytest-verified.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from spectraplex_spark.operators.textops import fold_case_py, tokens


def _fold_terms(terms: list[str]) -> list[str]:
    """Apply the index tokenizer's case fold to caller query terms.

    Postings are built from ``tokens()``, whose text goes through
    ``fold_case`` — a raw 'Spark' (or İ-bearing) query term would
    otherwise silently match nothing against an index that only holds
    'spark' (review finding r13).  Order is preserved (phrase queries
    are positional); callers that need de-duplication do it after the
    fold so 'Spark'/'spark' collapse to one term."""
    return [fold_case_py(t) for t in terms]


def _postings_with_stats(
    df: DataFrame | None,
    text_col: str,
    id_col: str,
    postings: DataFrame | None,
    corpus_stats: tuple[int, int] | None,
    fn: str,
) -> tuple[DataFrame, int, int]:
    """Shared precondition dance for the BM25 rankers: resolve the
    postings frame, refuse dl-less (pre-v2) layouts, and resolve
    (n_docs, total_tokens) — from the corpus when given, else from the
    caller's ``corpus_stats`` (a term-filtered postings frame cannot
    reproduce corpus-level idf/length stats, so ``df=None`` without
    stats refuses to guess).  One body, two callers (review finding
    r13: the copies had already drifted)."""
    p = postings if postings is not None else build_postings(df, text_col, id_col)
    if "dl" not in p.columns:
        raise ValueError(
            f"{fn} needs postings with the denormalized 'dl' column "
            "(layout postings-dl-v2+, written by build_postings / "
            "append_postings_batch). A v1 index has no per-posting doc "
            "length — rebuild it; joining a corpus-sized doc_lengths "
            "table at query time is a 100 TB anti-pattern this module "
            "refuses to reintroduce."
        )
    if df is None:
        if corpus_stats is None:
            raise ValueError(
                f"{fn}: with df=None pass corpus_stats=(n_docs, "
                "total_tokens) — a term-filtered postings frame cannot "
                "reproduce corpus-level idf/length stats (record the two "
                "numbers at index build time, e.g. in the _config "
                "sidecar)."
            )
        n_docs, s_tok = int(corpus_stats[0]), int(corpus_stats[1])
        if n_docs <= 0:
            raise ValueError(f"{fn}: corpus_stats reports an empty corpus")
    else:
        stats = doc_lengths(df, text_col, id_col).agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
        ).head()
        if not int(stats["n"]):
            raise ValueError(f"{fn}: empty corpus — no documents to score")
        n_docs, s_tok = int(stats["n"]), int(stats["s"])
    return p, n_docs, s_tok


def build_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, tf, positions, dl) — the classic inverted index.
    positions are 0-based token offsets, sorted; tf == size(positions)
    by construction. ``dl`` (document token length) is DENORMALIZED
    into every posting at build time — it is known for free during
    tokenization, and carrying it means BM25's length normalization
    never joins a corpus-sized doc-length table at query time (the
    same denormalize-for-lookup trade as the reference's
    add_wallet_to_ledger migration, migrations/20251219010000:1-15)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    )
    t = toks.select(
        "doc_id",
        F.size("_toks").cast("long").alias("dl"),
        F.posexplode("_toks").alias("pos", "term"),
    )
    return t.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
        F.first("dl").alias("dl"),
    )


def doc_lengths(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("dl"),
    )


def materialize_postings(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: int = 64,
) -> None:
    """Write the index partitioned by a term-hash bucket so probes
    partition-prune: `_tp=pmod(xxhash64(term), n)` directories, the
    same layout recipe as the materialized IVF index."""
    (
        build_postings(df, text_col, id_col)
        .withColumn("_tp", F.pmod(F.xxhash64("term"), F.lit(n_partitions)))
        .write.mode("overwrite")
        .partitionBy("_tp")
        .parquet(path)
    )


def append_postings_batch(
    batch: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: int = 64,
) -> int:
    """Incremental maintenance of the materialized inverted index — the
    ingestion-side twin of materialize_postings, under the same
    discipline as the IVFPQ and near-dup indexes: the ``_config``
    sidecar pins the layout (bucket count AND tokenizer version —
    postings are only meaningful under the tokenization that wrote
    them; a changed tokenizer must fail loudly, never mix), and the
    append is REPLAY-IDEMPOTENT: (doc_id, term) rows already indexed
    are anti-joined away, so a crashed-and-retried micro-batch adds
    zero duplicate postings and tf counts never double. Designed for
    ``foreachBatch``; probes partition-prune identically whether the
    index was built in one pass or a thousand. Postings land at
    ``{index_dir}/postings`` (pass that to read_postings). Returns the
    number of rows appended."""
    from spectraplex_spark.sources.io import idempotent_append
    from spectraplex_spark.streaming.index_state import ensure_index_config

    spark = batch.sparkSession
    ensure_index_config(
        spark,
        index_dir,
        {
            "kind": "inverted-postings",
            "n_partitions": n_partitions,
            "tokenizer": "ws-lower-v1",
            # layout v3: postings carry the denormalized doc length
            # (dl, since v2) and the length-prefixed idempotency id
            # (below). Appending to an older-layout index fails loudly
            # here (ensure_index_config raises on any mismatch) instead
            # of mixing id encodings.
            "layout": "postings-dl-v3",
        },
    )
    doc_s = F.col("doc_id").cast("string")
    p = (
        build_postings(batch, text_col, id_col)
        .withColumn("_tp", F.pmod(F.xxhash64("term"), F.lit(n_partitions)))
        # LENGTH-PREFIXED id: len(doc) ‖ \x1f ‖ doc ‖ term.  A bare
        # separator is not enough — \x1f is not regex \s, so it can
        # survive tokenization into a term AND appear in a string
        # doc_id, recreating the ':' collision class the r12 fix
        # targeted (doc 'd\x1fa' + term 'b' vs doc 'd' + term
        # 'a\x1fb'); the length prefix delimits the doc part exactly,
        # so distinct (doc_id, term) pairs can never collide and the
        # idempotent anti-join never silently drops a posting (review
        # finding r13).
        .withColumn(
            "id",
            F.concat(
                F.length(doc_s).cast("string"), F.lit("\x1f"), doc_s, F.col("term")
            ),
        )
    )
    return idempotent_append(
        p, f"{index_dir}/postings", id_col="id", partition_by=("_tp",)
    )


def read_postings(
    spark, path: str, terms: list[str], n_partitions: int | None = None
) -> DataFrame:
    """Probe the materialized index: the `_tp IN (...)` predicate is a
    partition filter, so only the probed terms' buckets are read.

    The bucket count is resolved from the ``_config`` sidecar when the
    index carries one (an append-managed ``{index_dir}/postings`` path
    — the sidecar sits in the parent): a caller-supplied value that
    disagrees with the pinned one raises instead of silently hashing
    probes into the wrong buckets and returning empty postings for
    ~half the terms (review finding). Sidecar-less (materialize-only)
    indexes fall back to the caller's value or the build default 64."""
    import os as _os

    from spectraplex_spark.streaming.index_state import read_index_config

    terms = _fold_terms(terms)
    cfg = read_index_config(spark, path)
    if cfg is None and _os.path.basename(path.rstrip("/")) == "postings":
        cfg = read_index_config(spark, _os.path.dirname(path.rstrip("/")))
    pinned = int(cfg["n_partitions"]) if cfg and "n_partitions" in cfg else None
    if pinned is not None and n_partitions is not None and pinned != n_partitions:
        raise ValueError(
            f"read_postings: caller asked for n_partitions={n_partitions} "
            f"but the index at {path!r} is pinned to {pinned} — probing "
            "with the wrong bucket count silently drops postings."
        )
    n_partitions = pinned if pinned is not None else (n_partitions or 64)
    buckets = spark.createDataFrame(
        [(t,) for t in terms], "term string"
    ).select(F.pmod(F.xxhash64("term"), F.lit(n_partitions)).alias("_tp"))
    wanted = [r["_tp"] for r in buckets.distinct().collect()]
    return (
        spark.read.parquet(path)
        .filter(F.col("_tp").isin(wanted))
        .filter(F.col("term").isin(terms))
        .drop("_tp")
    )


def conjunctive_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Docs containing ALL query terms, ranked by Σ tf (integer), ties
    to the lowest doc_id. Pass ``postings`` to search a prebuilt /
    materialized index instead of rescanning the corpus.

    Duplicate query terms are collapsed up front: conjunction over
    ['spark','spark','join'] means {spark, join} — without the dedupe,
    count_distinct(term) could never reach len(terms) and the query
    would silently return zero rows."""
    terms = list(dict.fromkeys(_fold_terms(terms)))
    p = (postings if postings is not None else build_postings(df, text_col, id_col))
    hits = p.filter(F.col("term").isin(terms))
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct("term").alias("_nt"),
            F.sum("tf").alias("tf_sum"),
        )
        .filter(F.col("_nt") == len(terms))
        .orderBy(F.desc("tf_sum"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "tf_sum")
    )


def phrase_match(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Exact phrase occurrences per doc: intersect the position lists of
    each phrase term shifted by its offset (pos_i - i) — a phrase start
    survives every intersection iff all terms sit consecutively. Pure
    integer array ops; per-term frames are query-sized after the term
    filter, so the joins broadcast. Returns (doc_id, n_occurrences > 0).

    Repeated-term phrases work unchanged: each occurrence of the
    repeated term contributes its own (shifted) position list per slot.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    phrase = _fold_terms(phrase)
    p = (postings if postings is not None else build_postings(df, text_col, id_col))
    acc = None
    for i, term in enumerate(phrase):
        shifted = p.filter(F.col("term") == term).select(
            "doc_id",
            F.transform("positions", lambda x: x - i).alias(f"_s{i}"),
        )
        acc = shifted if acc is None else acc.join(F.broadcast(shifted), "doc_id")
    starts = F.col("_s0")
    for i in range(1, len(phrase)):
        starts = F.array_intersect(starts, F.col(f"_s{i}"))
    return (
        acc.select("doc_id", F.size(starts).cast("long").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )


BM25_GRID = 65536  # 2^16 — idf quantization grid for the graded ranking


def bm25_topk_grid(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
    grid: int = BM25_GRID,
    corpus_stats: tuple[int, int] | None = None,
) -> DataFrame:
    """BM25 ranking on an EXACT-INTEGER grid — the driver-gradable twin
    of bm25_topk (same recipe as sq_topk/quality_linear_score: put the
    score on an integer lattice so the ranking is bit-identical in any
    engine).

    With the standard constants as exact rationals (k1 = 6/5, b = 3/4)
    and avgdl = S/N (S = total corpus tokens, N = docs), the per-posting
    BM25 term multiplies out to idf · 44·S·tf / (20·S·tf + 6·S + 18·dl·N)
    — numerator and denominator are exact BIGINTs. Quantizing idf to
    ``floor(ln(1 + (2(N-df)+1)/(2df+1)) · grid)`` makes the whole
    contribution ``(idf_q · 44·S·tf) div (20·S·tf + 6·S + 18·dl·N)`` —
    pure integer multiply/divide, summed exactly. The ONLY float op is
    that one ln over an exactly-representable rational, identical input
    in every engine; a driver-side guard asserts the quantized value
    sits far from its floor boundary (and that the integer products fit
    in 62 bits), so a pathological libm divergence fails loudly instead
    of flipping a rank. Scale shape is identical to bm25_topk: narrow
    pass over the probed postings, one groupBy, TakeOrderedAndProject.
    """
    terms = list(dict.fromkeys(_fold_terms(terms)))
    p, n_docs, s_tok = _postings_with_stats(
        df, text_col, id_col, postings, corpus_stats, "bm25_topk_grid"
    )
    hits = p.filter(F.col("term").isin(terms))
    # max(dl) rides in the same per-term aggregate — a separate
    # hits.agg(max(dl)) action re-read the probed postings once more
    # per query (review finding r13)
    tstats = hits.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df"),
        F.max("tf").alias("max_tf"),
        F.max("dl").alias("max_dl"),
    ).collect()
    dfs = {r["term"]: int(r["df"]) for r in tstats}
    tf_max = {r["term"]: int(r["max_tf"]) for r in tstats}
    idf_q: dict[str, int] = {}
    for t in terms:
        d = dfs.get(t, 0)
        v = math.log(1.0 + (2 * (n_docs - d) + 1) / (2 * d + 1)) * grid
        if abs(v - round(v)) < 1e-6:
            raise ValueError(
                f"idf grid value for term {t!r} sits within 1e-6 of an "
                f"integer boundary ({v!r}); pick a different grid to keep "
                "the ranking engine-independent."
            )
        idf_q[t] = int(math.floor(v))
    # PER-TERM products (a global max-idf x global max-tf pairs the
    # rarest term with the commonest term's tf and spuriously rejects
    # healthy corpora — review finding), plus the DENOMINATOR, whose
    # 18*N*dl term the old guard ignored entirely.
    max_dl = max((int(r["max_dl"]) for r in tstats), default=0)
    worst_num = max(
        (idf_q[t] * 44 * s_tok * tf_max.get(t, 1) for t in terms), default=0
    )
    worst_den = 20 * s_tok * max(tf_max.values(), default=1) + 6 * s_tok + 18 * n_docs * max_dl
    if worst_num >= 2**62 or worst_den >= 2**62:
        raise ValueError(
            "bm25_topk_grid integer products would overflow 62 bits at "
            f"this corpus size (S={s_tok}, worst numerator={worst_num}, "
            f"worst denominator={worst_den}); lower the grid."
        )
    idf_map = F.create_map(
        *[F.lit(x) for t in terms for x in (t, idf_q[t])]
    )
    num = (
        F.element_at(idf_map, F.col("term")).cast("long")
        * (F.lit(44 * s_tok).cast("long") * F.col("tf"))
    )
    den = (
        F.lit(20 * s_tok).cast("long") * F.col("tf")
        + F.lit(6 * s_tok).cast("long")
        + F.lit(18 * n_docs).cast("long") * F.col("dl")
    )
    return (
        hits.select("doc_id", num.alias("_num"), den.alias("_den"))
        .select("doc_id", F.expr("_num div _den").alias("_c"))
        .groupBy("doc_id")
        .agg(F.sum("_c").cast("long").alias("bm25_q"))
        .orderBy(F.desc("bm25_q"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
    corpus_stats: tuple[int, int] | None = None,
) -> DataFrame:
    """Standard BM25 (disjunctive): score(d) = Σ_t idf(t) · tf(t,d)(k1+1)
    / (tf(t,d) + k1(1-b+b·dl/avgdl)), idf = ln(1 + (N-df+.5)/(df+.5)).

    N/avgdl come from one corpus aggregate and per-term df from one
    query-sized aggregate — both bounded driver collects; idf rides as
    literals, so scoring is a single narrow pass over the probed
    postings. Length normalization reads the ``dl`` column the postings
    carry since layout v2 (denormalized at build time) — the query
    never joins, let alone broadcasts, a corpus-sized doc-length table.
    Duplicate query terms are collapsed (a repeated term contributes
    one BM25 summand, not two). Float scores: the production ranking,
    pytest-verified against a Python reference; grading goes through
    the integer-grid contract oracle (``bm25_topk_grid``)."""
    terms = list(dict.fromkeys(_fold_terms(terms)))
    # Corpus stats (N, avgdl) resolve through the shared precondition
    # helper (corpus aggregate when df is given, caller corpus_stats
    # otherwise — a term-filtered postings frame cannot reproduce
    # corpus-level idf/avgdl, so df=None without stats refuses to
    # guess). avgdl = S/N is the same double division Spark's AVG
    # performs (long sum / long count).
    p, n_docs, s_tok = _postings_with_stats(
        df, text_col, id_col, postings, corpus_stats, "bm25_topk"
    )
    avgdl = s_tok / n_docs
    hits = p.filter(F.col("term").isin(terms))
    dfs = {
        r["term"]: int(r["df"])
        for r in hits.groupBy("term").agg(F.count_distinct("doc_id").alias("df")).collect()
    }
    idf = {
        t: math.log(1.0 + (n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))
        for t in terms
    }
    idf_map = F.create_map(*[F.lit(x) for t in terms for x in (t, idf[t])])
    contrib = (
        F.element_at(idf_map, F.col("term"))
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    )
    return (
        hits.select("doc_id", contrib.alias("_c"))
        .groupBy("doc_id")
        .agg(F.sum("_c").alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )
