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
        aggregates; the per-doc score is float — ln() and float
        accumulation make it non-bit-gradable cross-engine by the same
        argument as simhash (FIXTURES.md FMA note), so it is
        pytest-verified against an independent Python reference
        instead, and the integer rankings above carry the driver hash.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from spectraplex_spark.operators.textops import tokens


def build_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, tf, positions) — the classic inverted index.
    positions are 0-based token offsets, sorted; tf == size(positions)
    by construction."""
    t = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    )
    return t.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
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
        },
    )
    p = (
        build_postings(batch, text_col, id_col)
        .withColumn("_tp", F.pmod(F.xxhash64("term"), F.lit(n_partitions)))
        .withColumn("id", F.concat_ws(":", F.col("doc_id"), F.col("term")))
    )
    return idempotent_append(
        p, f"{index_dir}/postings", id_col="id", partition_by=("_tp",)
    )


def read_postings(spark, path: str, terms: list[str], n_partitions: int = 64) -> DataFrame:
    """Probe the materialized index: the `_tp IN (...)` predicate is a
    partition filter, so only the probed terms' buckets are read."""
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
    materialized index instead of rescanning the corpus."""
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


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Standard BM25 (disjunctive): score(d) = Σ_t idf(t) · tf(t,d)(k1+1)
    / (tf(t,d) + k1(1-b+b·dl/avgdl)), idf = ln(1 + (N-df+.5)/(df+.5)).

    N/avgdl come from one corpus aggregate and per-term df from one
    query-sized aggregate — both bounded driver collects; idf rides as
    literals, so scoring is a single narrow pass over the probed
    postings. Float scores: the production ranking, pytest-verified
    against a Python reference (see module docstring for why the
    integer rankings are the bit-graded ones)."""
    p = (postings if postings is not None else build_postings(df, text_col, id_col))
    dls = doc_lengths(df, text_col, id_col)
    stats = dls.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).head()
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"])
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
        hits.join(F.broadcast(dls), "doc_id")
        .select("doc_id", contrib.alias("_c"))
        .groupBy("doc_id")
        .agg(F.sum("_c").alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )
