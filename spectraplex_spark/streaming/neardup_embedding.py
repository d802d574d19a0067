"""Incremental EMBEDDING near-duplicate gate — the vector twin of the
text gate (streaming/neardup.py): "is this new embedding a near-dup
(cosine ≥ threshold) of anything already accepted?" without rescanning
the accepted corpus.

Index state (append-only parquet, storage not executor memory):
  - ``sigs``:  (id, table, signature) — multi-table hyperplane LSH keys,
    8 bytes of signature per table per vector;
  - ``vecs``:  (id, vector as double array) — joined back only for the
    candidate ids, for exact-cosine verification.

Per micro-batch: one narrow signature pass, a signature equi-join
against the index (plus in-batch self-join), exact cosine on candidates
only, idempotent appends. Same recovery discipline as the text gate:
vecs appends BEFORE sigs, the presence probe keys on sigs, so a crash
between the two leaves a state the next batch treats as "no index yet"
rather than a broken read; candidate pairs exclude id-equality so an
at-least-once replay re-emits its survivors instead of rejecting them
as self-duplicates.

Recall follows the multi-table LSH bound (1-(1-p^bits)^tables,
p = 1-θ/π) — exact duplicates are always caught (identical signatures
in every table). At 100 TB partition the sig store by (table,
pmod(signature, N)) so the probe join partition-prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spectraplex_spark.operators.simsearch import (
    _dot,
    _norm,
    hyperplane_signature,
    random_planes,
)
from spectraplex_spark.sources.io import _target_exists, idempotent_append
from spectraplex_spark.streaming.index_state import (
    ensure_index_config,
    read_index_config,
)


def _sig_frame(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_bits: int,
    n_tables: int,
    seed: int,
    dim: int,
) -> DataFrame:
    """(id, vector-as-double, table, signature): one row per (vector,
    table) — the narrow LSH pass, plus the double-cast vector carried
    for candidate verification. ``dim`` is resolved by the caller (from
    the index sidecar or a batch probe), never from head() of an
    arbitrary first row — a null embedding there would hand
    random_planes a None dimension."""
    sigs = [
        hyperplane_signature(vec_col, random_planes(dim, n_bits, seed + t))
        for t in range(n_tables)
    ]
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        *[sigs[t].alias(f"_s{t}") for t in range(n_tables)],
    ).select(
        "_id",
        "_v",
        F.posexplode(F.array(*[F.col(f"_s{t}") for t in range(n_tables)])).alias(
            "_t", "_sig"
        ),
    )


def embedding_neardup_filter_batch(
    batch: DataFrame,
    index_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.8,
    n_bits: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """One micro-batch through the incremental embedding near-dup gate;
    returns survivors and appends their signatures/vectors to the index
    idempotently.

    ``dim`` (the vector dimension) may be passed explicitly; otherwise
    it is recovered from the index sidecar, falling back to a
    max(size) probe over the batch's non-null vectors on first
    creation. Null or wrong-dimension vectors are quarantined (dropped
    from survivors and never indexed) — signatures computed from them
    would be incomparable with the index.
    """
    spark = batch.sparkSession
    sigs_path = f"{index_dir}/sigs"
    vecs_path = f"{index_dir}/vecs"

    # empty micro-batch (e.g. a trigger with no new files): nothing to
    # gate or index — and nothing to probe a dimension from
    if batch.isEmpty():
        return batch

    if dim is None:
        stored = read_index_config(spark, index_dir)
        if stored is not None and "dim" in stored:
            dim = int(stored["dim"])
        else:
            # max over non-null rows (size(NULL) is NULL and max skips
            # it) — robust to a null embedding in the first row, unlike
            # a head() probe
            dim = batch.agg(F.max(F.size(vec_col)).alias("d")).head()["d"]
    if dim is None:
        # every vector in the batch is null: all quarantined
        return batch.limit(0)
    # Pin the signature-defining parameters before touching the index:
    # a call with different (n_bits, n_tables, seed, dim) computes
    # signatures the index never contains — fail loudly instead.
    # threshold is not pinned (verification-only, tunable per batch).
    ensure_index_config(
        spark,
        index_dir,
        {
            "kind": "embedding-hyperplane-lsh",
            "n_bits": n_bits,
            "n_tables": n_tables,
            "seed": seed,
            "dim": dim,
        },
    )
    valid = batch.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))

    sf = _sig_frame(
        valid, vec_col, id_col, n_bits, n_tables, seed, dim
    ).localCheckpoint(eager=False)
    batch_vecs = sf.select("_id", "_v").dropDuplicates(["_id"])

    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))

    def verified(cands: DataFrame, left_vecs: DataFrame, right_vecs: DataFrame):
        return (
            cands.join(
                left_vecs.select(F.col("_id").alias("id_a"), F.col("_v").alias("va")),
                "id_a",
            )
            .join(
                right_vecs.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb")),
                "id_b",
            )
            .filter(cos >= threshold)
            .select("id_b")
        )

    losers = None
    if _target_exists(spark, sigs_path) and _target_exists(spark, vecs_path):
        idx_sigs = spark.read.parquet(sigs_path)
        idx_vecs = spark.read.parquet(vecs_path)
        cands = (
            idx_sigs.alias("a")
            .join(sf.alias("b"), ["_t", "_sig"])
            .filter(F.col("a._id") != F.col("b._id"))  # replay self-match guard
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        losers = verified(cands, idx_vecs, batch_vecs)

    self_cands = (
        sf.alias("a")
        .join(sf.alias("b"), ["_t", "_sig"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    self_losers = verified(self_cands, batch_vecs, batch_vecs)
    all_losers = (
        self_losers if losers is None else losers.unionByName(self_losers)
    ).dropDuplicates(["id_b"]).withColumnRenamed("id_b", id_col)

    # anti-join from `valid`, not `batch`: quarantined rows are neither
    # survivors nor losers — they exit the gate entirely
    survivors = valid.join(all_losers, id_col, "left_anti").localCheckpoint(eager=False)
    surviving = survivors.select(F.col(id_col).alias("_id"))
    # vecs first, sigs second: presence probe keys on sigs (see module doc)
    idempotent_append(
        batch_vecs.join(surviving, "_id", "left_semi").withColumn("id", F.col("_id")),
        vecs_path,
        id_col="id",
    )
    idempotent_append(
        sf.select("_id", "_t", "_sig")
        .join(surviving, "_id", "left_semi")
        .withColumn("id", F.concat_ws(":", "_id", "_t")),
        sigs_path,
        id_col="id",
    )
    return survivors


def stream_embedding_neardup_filter(
    vec_stream: DataFrame,
    survivors_path: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    **kwargs,
):
    """Streaming wrapper (foreachBatch): survivors land idempotently;
    replays add zero rows. Returns the DataStreamWriter."""

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        survivors = embedding_neardup_filter_batch(
            batch_df, index_dir, id_col=id_col, **kwargs
        )
        idempotent_append(
            survivors.withColumn("id", F.col(id_col)), survivors_path, id_col="id"
        )

    return (
        vec_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
