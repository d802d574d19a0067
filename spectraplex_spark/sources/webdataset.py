"""WebDataset-style tar-shard sink/source — the export format training
loaders actually consume (one sample = same-stem files inside a tar;
a dataset = numbered .tar shards streamed sequentially by dataloader
workers). The engine's last mile: after gating/dedup/packing, training
jobs want shards, not parquet.

Scale design:
  - shard assignment is DETERMINISTIC (shard = key div samples_per_shard
    over a dense rank of the sort key), so re-exports are reproducible
    byte-for-byte and a failed export re-runs idempotently;
  - one groupBy(shard) shuffle routes each shard's samples to ONE task,
    which writes its tar with stdlib tarfile (no codec deps) — entries
    sorted by key, fixed mtime/uid so the tar BYTES are deterministic,
    not just the contents;
  - the reader is fully distributed: Spark's binaryFile source lists
    and reads shards in parallel tasks, each untarred in an Arrow
    batch pass — no driver-side file handling in either direction.

Graded end to end (``webdataset_roundtrip``): documents → shards →
distributed read-back → per-shard aggregate against the SQL oracle's
independent reconstruction of the shard assignment.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    samples_per_shard: int = 1000,
    key_col: str = "doc_id",
    text_col: str = "text",
    ext: str = "txt",
) -> int:
    """Write (key, text) samples as shard-{N:06d}.tar files; returns the
    shard count. Shard id = key_rank div samples_per_shard (dense rank
    over the key order — stable under re-export regardless of input
    partitioning; keys must be UNIQUE, which post-dedup corpus ids
    are — tied keys would make shard membership partition-dependent).

    The global rank is computed WITHOUT a global window (a naive
    ``row_number() over (order by key)`` funnels the whole corpus
    through ONE task — the classic 100 TB sort anti-pattern): range
    partitioning gives the cross-partition order, a bounded
    per-partition count collect gives rank offsets, and the rank
    window runs partitioned (parallel) — the standard two-pass
    zipWithIndex recipe as DataFrame ops.

    Keys may be integral or string (the tar member stem is the key
    verbatim); any other type — or a string key tarfile can't name
    (empty, '/', NUL) — raises up front, not as an opaque executor
    error mid-export. Read back with the matching ``key_type``."""
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import Window

    from spectraplex_spark.sources.commit import MANIFEST_NAME

    # Overwrite semantics, enforced BEFORE exporting: write_commit_manifest
    # snapshots every shard-*.tar present in out_dir, so leftovers from a
    # previous larger export would be PUBLISHED into the new manifest and
    # read back as valid data — silent corpus corruption on re-export
    # (r14 review finding).  The stale manifest goes first: during the
    # export the directory is visibly uncommitted, so a reader landing
    # mid-export refuses instead of serving a half-written mix.
    stale_manifest = os.path.join(out_dir, MANIFEST_NAME)
    if os.path.exists(stale_manifest):
        os.remove(stale_manifest)
    import glob as _glob

    for old in _glob.glob(os.path.join(out_dir, "shard-*.tar")):
        os.remove(old)

    ktype = df.schema[key_col].dataType.simpleString()
    if ktype in ("tinyint", "smallint", "int", "bigint"):
        string_keys = False
    elif ktype == "string":
        string_keys = True
    else:
        raise TypeError(
            f"key_col {key_col!r} has type {ktype}; shard keys must be "
            "integral or string (the key becomes the tar member stem)"
        )
    base = df.select(F.col(key_col).alias("_k"), F.col(text_col).alias("_t"))
    # Honor the docstring's "raises up front, not as an opaque executor
    # error mid-export": one bounded driver-side probe over the key
    # column finds un-tar-able keys (NULL; for strings also empty, '/',
    # NUL) BEFORE any shard is written — the old executor-side-only
    # check failed task N after shards 0..N-1 were already on disk
    # (r14 review finding).  The executor check remains as a backstop.
    bad_key = F.col("_k").isNull()
    if string_keys:
        bad_key = (
            bad_key
            | (F.col("_k") == "")
            | F.col("_k").contains("/")
            | F.col("_k").contains("\x00")
        )
    offending = base.filter(bad_key).select("_k").limit(1).collect()
    if offending:
        raise ValueError(
            f"key_col {key_col!r} contains a value that cannot name a tar "
            f"member: {offending[0][0]!r} (NULL, empty, '/', or NUL)"
        )
    n_parts = max(base.rdd.getNumPartitions(), 1)
    # persist BEFORE the counts collect: the rank offsets and the write
    # job must read the SAME materialization — repartitionByRange
    # boundaries come from sampling, so an uncached recompute could
    # assign different partition contents than the collected counts
    # assume, corrupting the global rank (the dedup.py checkpoint
    # discipline, applied here).
    part = (
        base.repartitionByRange(n_parts, "_k")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        counts = {
            r["_pid"]: r["n"]
            for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
        }  # bounded: one row per partition
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off_map = F.create_map(
            *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])]
        )
        w = Window.partitionBy("_pid").orderBy("_k")  # parallel per-partition rank
        ranked = part.withColumn(
            "_shard",
            (
                (F.element_at(off_map, F.col("_pid")) + F.row_number().over(w) - 1)
                / samples_per_shard
            ).cast("int"),
        )

        out_schema = T.StructType(
            [
                T.StructField("shard", T.IntegerType()),
                T.StructField("n_samples", T.LongType()),
                T.StructField("n_bytes", T.LongType()),
            ]
        )

        def write_shard(pdf):
            # applyInPandas delivers the ENTIRE shard group as one frame
            # (bounded by samples_per_shard — the shard IS the unit a
            # dataloader streams, so it must fit a task by contract).
            # The earlier mapInPandas draft received ~10k-row Arrow
            # batches and rewrote shard-NNNNNN.tar once per batch — a
            # shard spanning two batches kept only the LAST partial
            # batch's samples. Whole-group delivery makes that data
            # loss structurally impossible.
            import pandas as pd

            shard = int(pdf["_shard"].iloc[0])
            grp = pdf.sort_values("_k")
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tf:
                for _, row in grp.iterrows():
                    data = str(row["_t"]).encode("utf-8")
                    if string_keys:
                        stem = str(row["_k"])
                        if not stem or "/" in stem or "\x00" in stem:
                            raise ValueError(
                                f"string key {stem!r} cannot name a tar "
                                "member (empty, '/', or NUL)"
                            )
                    else:
                        stem = str(int(row["_k"]))
                    info = tarfile.TarInfo(name=f"{stem}.{ext}")
                    info.size = len(data)
                    info.mtime = 0  # deterministic bytes
                    tf.addfile(info, io.BytesIO(data))
            payload = buf.getvalue()
            with open(os.path.join(out_dir, f"shard-{shard:06d}.tar"), "wb") as fh:
                fh.write(payload)
            return pd.DataFrame(
                {
                    "shard": [shard],
                    "n_samples": [len(grp)],
                    "n_bytes": [len(payload)],
                }
            )

        manifest = (
            ranked.groupBy("_shard")
            .applyInPandas(write_shard, out_schema)
            .collect()  # one action drives all shard writes; #shards rows
        )
    finally:
        part.unpersist()
    from spectraplex_spark.sources.commit import write_commit_manifest

    write_commit_manifest(out_dir)  # publish the shard set atomically
    return len(manifest)


def read_webdataset_shards(
    spark: SparkSession,
    in_dir: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    key_type: str = "long",
) -> DataFrame:
    """Distributed shard read: binaryFile lists/reads tars in parallel;
    each task untars its shards in an Arrow pass. Returns
    (shard, key, text). ``key_type`` must match what the writer
    sharded on: 'long' (default) or 'string' (stem kept verbatim)."""
    if key_type not in ("long", "string"):
        raise ValueError(f"key_type must be 'long' or 'string', got {key_type!r}")
    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField(
                key_col,
                T.LongType() if key_type == "long" else T.StringType(),
            ),
            T.StructField(text_col, T.StringType()),
        ]
    )

    from spectraplex_spark.sources.commit import (
        has_commit_manifest,
        validate_commit_manifest,
    )

    if has_commit_manifest(in_dir):  # exported by write_webdataset_shards
        validate_commit_manifest(in_dir)  # refuse a half-exported shard set

    def untar(pdfs):
        import pandas as pd

        for pdf in pdfs:
            for _, row in pdf.iterrows():
                name = os.path.basename(row["path"])
                shard = int(name.split("-")[1].split(".")[0])
                out = {"shard": [], key_col: [], text_col: []}
                with tarfile.open(fileobj=io.BytesIO(row["content"])) as tf:
                    for m in tf.getmembers():
                        # rsplit: only the extension comes off — string
                        # keys may themselves contain dots
                        stem = m.name.rsplit(".", 1)[0]
                        out["shard"].append(shard)
                        out[key_col].append(
                            int(stem) if key_type == "long" else stem
                        )
                        out[text_col].append(tf.extractfile(m).read().decode("utf-8"))
                yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard-*.tar")
        .load(in_dir)
        .select("path", "content")
        .mapInPandas(untar, out_schema)
    )
