"""E3 multimodal column conventions (driver-mandated extension).

Images/audio/video are opaque ``binary`` payload columns plus a typed
metadata struct — the Parquet-native way to carry blobs at 100 TB
(payloads stay columnar-compressed, metadata predicates prune row groups
without touching payload bytes; column pruning means a metadata-only
query never reads a single payload byte).

Decode/feature-extraction run as Arrow-batched ``mapInPandas`` — the
Spark-side plumbing (schema, batch shape, partition sizing) is real and
tested; the actual codec call is stubbed (image/audio libs absent in
this container) behind ``decode_stub``/a deterministic fake, clearly
marked.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video|text
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|utf-8...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, False),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Documents → multimodal convention: utf-8 payload bytes + metadata.

    Stands in for an image/audio ingest; every operation is an
    expression (encode/octet_length/sha2) — metadata derivation never
    leaves the JVM.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text").alias("media_type"),
            F.lit("utf-8").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def decode_stub(payload: bytes):
    """STUB: real image/audio decode would live here (PIL/librosa/ffmpeg
    are not in this container). Raises to make accidental use loud."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment; "
        "use extract_features(..., fake=True) for the deterministic test path"
    )


def extract_features(df: DataFrame, fake: bool = True, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over payload bytes.

    fake=True (default here): deterministic 8-dim feature derived from
    the payload's sha256 — exercises the real Arrow batch path, schema,
    and partitioning without codecs. fake=False calls decode_stub and
    raises (documented stub).
    """

    def run(batches):
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if not fake:
                    decode_stub(b)  # pragma: no cover - stub path
                digest = hashlib.sha256(b).digest()
                feats.append([x / 255.0 for x in digest[:8]])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].apply(len),
                    "feature": feats,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)
