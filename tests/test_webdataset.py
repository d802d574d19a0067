"""WebDataset tar-shard sink/source (sources/webdataset.py):
byte-deterministic export, distributed read-back fidelity, shard
assignment. Cross-engine grading is in test_oracle_parity.py
(webdataset_roundtrip).
"""

from __future__ import annotations

import glob
import hashlib
import os
import tarfile

from spectraplex_spark.sources.webdataset import (
    read_webdataset_shards,
    write_webdataset_shards,
)

SCHEMA = "doc_id long, text string"


def _docs(spark, n=25):
    return spark.createDataFrame(
        [(i, f"document number {i} with text çödë {i}") for i in range(n)], SCHEMA
    )


def test_roundtrip_preserves_every_sample(spark, tmp_path):
    out = str(tmp_path / "wds")
    n_shards = write_webdataset_shards(_docs(spark), out, samples_per_shard=10)
    assert n_shards == 3  # 25 docs → 10+10+5
    back = read_webdataset_shards(spark, out)
    rows = {r["doc_id"]: (r["shard"], r["text"]) for r in back.collect()}
    assert len(rows) == 25
    for i in range(25):
        assert rows[i][0] == i // 10
        assert rows[i][1] == f"document number {i} with text çödë {i}"  # utf-8 exact


def test_reexport_is_byte_identical(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = _docs(spark).repartition(8)  # partitioning must not matter
    write_webdataset_shards(df, a, samples_per_shard=7)
    write_webdataset_shards(df.repartition(3), b, samples_per_shard=7)
    ha = {os.path.basename(f): hashlib.md5(open(f, "rb").read()).hexdigest()
          for f in glob.glob(f"{a}/*.tar")}
    hb = {os.path.basename(f): hashlib.md5(open(f, "rb").read()).hexdigest()
          for f in glob.glob(f"{b}/*.tar")}
    assert ha == hb and len(ha) == 4


def test_shards_are_loader_consumable_tars(spark, tmp_path):
    """A vanilla tar reader (what a dataloader uses) must see key-sorted
    entries with the declared extension."""
    out = str(tmp_path / "wds")
    write_webdataset_shards(_docs(spark, 9), out, samples_per_shard=4)
    f = sorted(glob.glob(f"{out}/*.tar"))[0]
    with tarfile.open(f) as tf:
        names = [m.name for m in tf.getmembers()]
    assert names == ["0.txt", "1.txt", "2.txt", "3.txt"]  # sorted, complete


def test_full_training_export_pipeline(spark, tmp_path):
    """The capstone composition: prepare_corpus (gates + dedup + span
    strip) → chunk_documents → WebDataset shards → distributed
    read-back. Every stage's contract holds through the composition:
    survivors only, no repeated spans in exported text, chunk-exact
    shard contents."""
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.chunking import chunk_documents
    from spectraplex_spark.operators.corpus import prepare_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    clean, stats = prepare_corpus(docs, min_quality=0.0, strip_spans_k=6)
    assert stats.n_after_neardup > 0
    chunks = chunk_documents(clean, max_tokens=32, stride=32).withColumn(
        "chunk_key", F.col("doc_id") * 1000 + F.col("chunk_id")
    )
    n_chunks = chunks.count()
    out = str(tmp_path / "export")
    write_webdataset_shards(
        chunks, out, samples_per_shard=200, key_col="chunk_key", text_col="chunk_text"
    )
    back = read_webdataset_shards(spark, out, key_col="chunk_key", text_col="chunk_text")
    assert back.count() == n_chunks
    # chunk text survives byte-exact through the whole path
    orig = {r["chunk_key"]: r["chunk_text"] for r in chunks.collect()}
    for r in back.collect():
        assert r["chunk_text"] == orig[r["chunk_key"]]
    # every exported chunk belongs to a surviving doc
    surviving = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert {k // 1000 for k in orig} <= surviving


def test_multi_arrow_batch_shards_lose_no_samples(spark, tmp_path):
    """A shard whose rows span multiple Arrow batches must still arrive
    whole: the write is groupBy(shard).applyInPandas (whole group per
    call). The earlier mapInPandas draft rewrote the tar once per
    ~10k-row batch, keeping only the last partial batch — this test
    forces 16-row batches over 60-sample shards to pin the fix."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        out = str(tmp_path / "wds")
        n_shards = write_webdataset_shards(
            _docs(spark, 120), out, samples_per_shard=60
        )
        assert n_shards == 2
        back = read_webdataset_shards(spark, out)
        rows = {r["doc_id"] for r in back.collect()}
        assert rows == set(range(120))  # every sample present, none clobbered
        for f in glob.glob(f"{out}/*.tar"):
            with tarfile.open(f) as tf:
                assert len(tf.getmembers()) == 60  # full shards on disk
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_string_keys_roundtrip_and_bad_types_raise(spark, tmp_path):
    """key_col is a generic parameter: string keys must work verbatim
    (incl. dots in the key) and non-integral/non-string key types must
    raise up front, not as an opaque executor error mid-export."""
    import pytest

    out = str(tmp_path / "wds_str")
    df = spark.createDataFrame(
        [("doc.alpha", "t1"), ("doc.beta", "t2"), ("zz", "t3")],
        "doc_id string, text string",
    )
    n = write_webdataset_shards(df, out, samples_per_shard=2)
    assert n == 2
    back = read_webdataset_shards(spark, out, key_type="string")
    got = {(r["doc_id"], r["text"]) for r in back.collect()}
    assert got == {("doc.alpha", "t1"), ("doc.beta", "t2"), ("zz", "t3")}

    with pytest.raises(TypeError, match="integral or string"):
        write_webdataset_shards(
            spark.createDataFrame([(1.5, "t")], "doc_id double, text string"),
            str(tmp_path / "wds_bad"),
        )
    with pytest.raises(Exception, match="cannot name a tar member"):
        write_webdataset_shards(
            spark.createDataFrame([("a/b", "t")], "doc_id string, text string"),
            str(tmp_path / "wds_slash"),
        )


def test_reexport_smaller_corpus_clears_stale_shards(spark, tmp_path):
    """Re-exporting a SMALLER corpus to the same dir must not publish
    the previous export's leftover higher-numbered shards into the new
    manifest — the old behavior manifested them and read_webdataset
    returned deleted samples as valid data (r14 review finding)."""
    out = str(tmp_path / "wds_re")
    big = spark.range(0, 10).selectExpr("id AS doc_id", "concat('t', id) AS text")
    assert write_webdataset_shards(big, out, samples_per_shard=2) == 5
    small = big.filter("doc_id < 4")
    assert write_webdataset_shards(small, out, samples_per_shard=2) == 2
    assert len(glob.glob(os.path.join(out, "shard-*.tar"))) == 2
    back = read_webdataset_shards(spark, out)
    assert sorted(r["doc_id"] for r in back.collect()) == [0, 1, 2, 3]


def test_invalid_keys_raise_before_any_shard_is_written(spark, tmp_path):
    """The up-front driver-side probe: a bad key anywhere in the corpus
    raises BEFORE any shard lands on disk (the old executor-side check
    failed task N after shards 0..N-1 were already written)."""
    import pytest

    out = str(tmp_path / "wds_upfront")
    rows = [(f"ok{i:03d}", "t") for i in range(50)] + [("bad/key", "t")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    with pytest.raises(ValueError, match="cannot name a tar member"):
        write_webdataset_shards(df, out, samples_per_shard=10)
    assert glob.glob(os.path.join(out, "shard-*.tar")) == []
    # NULL keys (either key kind) are rejected the same way
    nl = spark.createDataFrame([(None, "t"), (1, "u")], "doc_id long, text string")
    with pytest.raises(ValueError, match="cannot name a tar member"):
        write_webdataset_shards(nl, str(tmp_path / "wds_null"))
