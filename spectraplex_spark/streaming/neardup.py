"""Streaming near-duplicate filtering — the E1 MinHash/LSH dedup as an
INCREMENTAL operator over a document stream.

The batch operators (operators/dedup.py) answer "which pairs in this
corpus are near-dups"; a training-data INGESTION pipeline asks the
incremental question instead: "is this new document a near-dup of
anything already accepted?" Re-running the batch pairs job per
micro-batch would re-scan the whole accepted corpus; this operator
keeps the LSH *index* (band signatures + hashed shingle sets) as an
append-only parquet store, so each micro-batch costs:

  1. one narrow pass over the batch (shingle-hash + signature + bands);
  2. a band equi-join against the index — candidates only, never a
     corpus scan of text (the index rows are (band, bandhash, id):
     16 bytes of key per band per doc);
  3. exact-Jaccard verification of candidates via the stored hashed
     shingle sets (joined for the candidate ids only);
  4. in-batch self-dedup with the same banding (min-id survives);
  5. idempotent append of survivors' docs/bands/hashes — replays add
     zero rows (sources/io.idempotent_append's anti-join protocol), so
     the accepted corpus and the index cannot diverge on restart.

State is storage, not executor memory: the index lives in parquet and
scales with the corpus, not with watermark windows — near-dup identity
has no event-time expiry, so applyInPandasWithState (bounded keyed
state) is the wrong tool; foreachBatch + idempotent storage is the
standard Spark shape for unbounded dedup state.

At 100 TB: partition the band store by ``pmod(bandhash, N)`` so the
per-batch band join partition-prunes, and scope the doc store append's
anti-join by ingest date. Both knobs exist on the underlying helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spectraplex_spark.operators.dedup import (
    band_keys,
    minhash_signature,
    shingle_hashes,
    shingles,
)
from spectraplex_spark.sources.io import _target_exists, idempotent_append
from spectraplex_spark.streaming.index_state import ensure_index_config


def _lsh_frames(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    verify_on_text: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """``(hashes, bands)`` for a batch — the narrow LSH pass, split so
    the banded frame carries ONLY ``(_id, _band, _bandhash)``: the old
    single frame rode the full ``_h`` shingle array through posexplode,
    replicating every document's hash set once PER BAND (16x by
    default) into the checkpoint materialization and through both band
    equi-joins, which never read it (r14 review finding — at 1M docs ×
    ~1KB arrays × 16 bands that is ~16 GB of redundant shuffle/cache
    payload vs ~1 GB).

    ``hashes`` is ``(_id, _h)``, one row per doc — the verify payload
    AND the hashes-store append row, straight from the single text
    pass.  ``verify_on_text`` stores STRING shingle sets for
    verification (banding still uses hashed shingles) —
    collision-free integer-ratio Jaccard, reproducible in ANSI SQL for
    the oracle-graded catalog twin; the hashed default is the cheap
    production path.  Both frames are lazily checkpointed: the text
    pass materializes once, and the banded frame's three consumers
    (index join, both sides of the self-join, the bands append) read
    its narrow blocks instead of re-running signature derivation.
    """
    # banding ALWAYS runs on hashed shingles (integer minhash); only the
    # verification payload `_h` switches representation
    cols = [
        F.col(id_col).alias("_id"),
        shingle_hashes(F.col(text_col), shingle_n).alias("_bh"),
    ]
    if verify_on_text:
        cols.append(shingles(F.col(text_col), shingle_n).alias("_h"))
    hashed = docs.select(*cols).localCheckpoint(eager=False)
    batch_hashes = hashed.select(
        "_id", F.col("_h" if verify_on_text else "_bh").alias("_h")
    ).dropDuplicates(["_id"])
    # two-step select: signature computed ONCE per row, then the shared
    # band_keys derivation (dedup.py) — the same expression the batch
    # pair miner uses, so the parquet band index stays bit-compatible
    bf = (
        hashed.select(
            "_id", minhash_signature(F.col("_bh"), num_hashes).alias("_sig")
        )
        .select(
            "_id",
            F.posexplode(band_keys(F.col("_sig"), num_hashes, bands)).alias(
                "_band", "_bandhash"
            ),
        )
        .localCheckpoint(eager=False)
    )
    return batch_hashes, bf


def neardup_filter_batch(
    batch: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    verify_on_text: bool = False,
) -> DataFrame:
    """One micro-batch through the incremental near-dup gate.

    Returns the batch's SURVIVORS (not near-dups of the accepted corpus
    nor of a smaller-id batch sibling) and appends their signatures to
    the index stores idempotently. Callable directly for batch
    ingestion; ``stream_neardup_filter`` wraps it for foreachBatch.
    """
    spark = batch.sparkSession
    bands_path = f"{index_dir}/bands"
    hashes_path = f"{index_dir}/hashes"
    # Index rows are only bit-compatible under the parameters that wrote
    # them (band hashes: num_hashes/bands/shingle_n; the _h verify
    # payload: verify_on_text). Pin them in a sidecar on first creation
    # and refuse mismatched calls — a silent mismatch would stop
    # matching near-dups, not fail loudly. jaccard_threshold is NOT
    # pinned: it gates verification only, so tuning it between batches
    # is legitimate and leaves the index valid.
    ensure_index_config(
        spark,
        index_dir,
        {
            "kind": "text-minhash-lsh",
            "num_hashes": num_hashes,
            "bands": bands,
            "shingle_n": shingle_n,
            "verify_on_text": verify_on_text,
        },
    )

    batch_hashes, bf = _lsh_frames(
        batch, text_col, id_col, num_hashes, bands, shingle_n, verify_on_text
    )

    jac = F.size(F.array_intersect("h_a", "h_b")) / F.size(F.array_union("h_a", "h_b"))

    def verified(cands: DataFrame, left_hashes: DataFrame, right_hashes: DataFrame):
        return (
            cands.join(left_hashes.select(F.col("_id").alias("id_a"), F.col("_h").alias("h_a")), "id_a")
            .join(right_hashes.select(F.col("_id").alias("id_b"), F.col("_h").alias("h_b")), "id_b")
            .filter(jac >= jaccard_threshold)
            .select("id_b")
        )

    losers = None
    # Both stores must exist: hashes is appended BEFORE bands below, so
    # bands present ⇒ hashes present; checking both still guards against
    # an externally half-built index dir.
    if _target_exists(spark, bands_path) and _target_exists(spark, hashes_path):
        idx_bands = spark.read.parquet(bands_path)
        idx_hashes = spark.read.parquet(hashes_path)
        cands_vs_index = (
            idx_bands.alias("a")
            .join(bf.alias("b"), ["_band", "_bandhash"])
            # id inequality, not just band match: a REPLAYED batch meets
            # its own index entries (jaccard 1.0 vs itself) — without
            # this, at-least-once redelivery would reject every
            # previously-accepted doc as a self-duplicate and the
            # survivors append would permanently drop it.
            .filter(F.col("a._id") != F.col("b._id"))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        losers = verified(cands_vs_index, idx_hashes, batch_hashes)

    # in-batch self-dedup: smaller id wins (same rule as the batch op)
    self_cands = (
        bf.alias("a")
        .join(bf.alias("b"), ["_band", "_bandhash"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    self_losers = verified(self_cands, batch_hashes, batch_hashes)
    all_losers = (
        self_losers if losers is None else losers.unionByName(self_losers)
    ).dropDuplicates(["id_b"]).withColumnRenamed("id_b", id_col)

    survivors = batch.join(all_losers, id_col, "left_anti").localCheckpoint(
        eager=False
    )
    surviving_ids = survivors.select(F.col(id_col).alias("_id"))
    # hashes FIRST, bands second: the index-presence probe above keys on
    # bands, so a crash between the two appends leaves a state the next
    # batch treats as consistent (hashes-only = no index yet; both =
    # full index). The reverse order would leave bands without hashes —
    # an unrecoverable read failure on every subsequent batch.
    idempotent_append(
        batch_hashes.join(surviving_ids, "_id", "left_semi")
        .withColumn("id", F.col("_id")),
        hashes_path,
        id_col="id",
    )
    idempotent_append(
        bf.join(surviving_ids, "_id", "left_semi").select("_id", "_band", "_bandhash")
        .withColumn("id", F.concat_ws(":", "_id", "_band")),
        bands_path,
        id_col="id",
    )
    return survivors


def stream_neardup_filter(
    docs_stream: DataFrame,
    survivors_path: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    **kwargs,
):
    """Streaming wrapper: each micro-batch flows through
    :func:`neardup_filter_batch`; survivors land idempotently, so a
    replayed batch neither re-admits a dropped near-dup nor duplicates
    a survivor. Returns the DataStreamWriter (call .start())."""

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        survivors = neardup_filter_batch(batch_df, index_dir, id_col=id_col, **kwargs)
        idempotent_append(
            survivors.withColumn("id", F.col(id_col)), survivors_path, id_col="id"
        )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
