"""E3 multimodal column conventions (driver-mandated extension).

Images/audio/video are opaque ``binary`` payload columns plus a typed
metadata struct — the Parquet-native way to carry blobs at 100 TB
(payloads stay columnar-compressed, metadata predicates prune row groups
without touching payload bytes; column pruning means a metadata-only
query never reads a single payload byte).

Decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` — the Spark-side plumbing (schema, batch
shape incl. the frame fan-out, partition sizing) is real and tested;
the actual codec call is stubbed (image/audio libs absent in this
container) behind ``decode_stub``/a deterministic fake, clearly marked.
The resize and frame fakes are deliberately SQL-expressible so their
DuckDB oracles verify the Python stages' output CONTENT, not just
shape.
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
        # meta nullable to match payload: a NULL payload (NULL source
        # text) has no metadata — NULL/NULL rows propagate through the
        # pandas stages like the expression path (r14 review finding)
        T.StructField("meta", MEDIA_META, True),
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
        # nullable: NULL payload -> NULL feature/size (r14 review finding)
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_stub(payload: bytes):
    """STUB: real image/audio decode would live here (PIL/librosa/ffmpeg
    are not in this container). Raises to make accidental use loud."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment; "
        "use extract_features(..., fake=True) for the deterministic test path"
    )


def resize_media(
    df: DataFrame, width: int = 64, height: int = 64, fake: bool = True
) -> DataFrame:
    """mapInPandas resize: payload → a width×height×3 (RGB-shaped)
    payload with fully updated metadata, in the multimodal schema.

    The Spark plumbing (Arrow batches, output schema incl. the nested
    meta struct, per-row payload rewrite) is real; the pixel work is the
    documented fake — the resized payload is the input's sha256 hex
    digest repeated/truncated to exactly width*height*3 ASCII bytes.
    That fake is deliberately SQL-expressible, so the operator is
    oracle-verified end to end INCLUDING the output content hash
    (sha256(substr(repeat(sha256(text), k), 1, n)) in DuckDB).
    fake=False calls :func:`decode_stub` and raises (no codecs here).
    """
    n_out = width * height * 3
    reps = -(-n_out // 64)  # sha256 hexdigest is 64 chars

    def run(batches):
        for pdf in batches:
            payloads, metas = [], []
            for payload in pdf["payload"]:
                if payload is None:
                    # MULTIMODAL_SCHEMA declares payload nullable
                    # (attach_binary_payload emits NULL for NULL text);
                    # propagate NULL→NULL like the expression path
                    # instead of killing the job with bytes(None)
                    # (r14 review finding).
                    payloads.append(None)
                    metas.append(None)
                    continue
                b = bytes(payload)
                if not fake:
                    decode_stub(b)  # pragma: no cover - stub path
                digest = hashlib.sha256(b).hexdigest()
                out = (digest * reps)[:n_out].encode("ascii")
                payloads.append(out)
                metas.append(
                    {
                        "media_type": "image",
                        "format": "raw-rgb8",
                        "width": width,
                        "height": height,
                        "duration_ms": None,
                        "n_bytes": len(out),
                        "sha256": hashlib.sha256(out).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return df.select("doc_id", "payload").mapInPandas(run, MULTIMODAL_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("frame_sha", T.StringType(), False),
    ]
)


def sample_frames(
    df: DataFrame,
    every_ms: int = 40,
    bytes_per_frame: int = 256,
    max_frames: int = 8,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling as a mapInPandas FAN-OUT: each payload yields
    ``clamp(n_bytes // bytes_per_frame, 1, max_frames)`` frame rows —
    the row-multiplying batch shape a real video sampler needs
    (output rows ≠ input rows, still one narrow Arrow stage, no
    shuffle).

    Frame count is metadata-driven (payload size standing in for
    duration) and the fake frame content hash is
    sha256(payload_sha_hex ‖ ':' ‖ frame_idx) — SQL-expressible, so the
    fan-out is oracle-verified per frame row. fake=False raises via
    :func:`decode_stub`.
    """

    def run(batches):
        for pdf in batches:
            ids, idxs, tss, shas = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # NULL payload has no frames: zero rows, exactly
                    # like exploding a NULL array (r14 review finding —
                    # bytes(None) killed the whole job).
                    continue
                b = bytes(payload)
                if not fake:
                    decode_stub(b)  # pragma: no cover - stub path
                digest = hashlib.sha256(b).hexdigest()
                n = min(max(len(b) // bytes_per_frame, 1), max_frames)
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    shas.append(hashlib.sha256(f"{digest}:{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "ts_ms": pd.array(tss, dtype="int64"),
                    "frame_sha": shas,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over payload bytes.

    fake=True (default here): deterministic 8-dim feature derived from
    the payload's sha256 — exercises the real Arrow batch path, schema,
    and partitioning without codecs. fake=False calls decode_stub and
    raises (documented stub).

    (The former ``batch_hint`` parameter was never read — Arrow batch
    size is governed solely by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``; a dead knob
    implying control that does not exist was worse than none, r14
    review finding.)
    """

    def run(batches):
        for pdf in batches:
            feats, sizes = [], []
            for payload in pdf["payload"]:
                if payload is None:
                    # NULL payload → NULL feature/size, the expression
                    # path's null propagation (r14 review finding).
                    feats.append(None)
                    sizes.append(None)
                    continue
                b = bytes(payload)
                if not fake:
                    decode_stub(b)  # pragma: no cover - stub path
                digest = hashlib.sha256(b).digest()
                feats.append([x / 255.0 for x in digest[:8]])
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(sizes, dtype="Int64"),
                    "feature": feats,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)
