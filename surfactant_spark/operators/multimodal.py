"""Multimodal (binary-column) operators.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, Arrow batch shape,
partition-preserving mapInPandas — is real and tested; the actual
codec decode is stubbed behind ``NotImplementedError`` (no image/audio
libraries in this container) with a deterministic fake feature
extractor so pipelines are exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real codec decode — requires an imaging library not present in
    this container. The Spark plumbing around it is complete; swap this
    body for PIL/libvips in deployment."""
    raise NotImplementedError("image codec not available in this environment")


def fake_features(payload: bytes, dim: int = 16) -> list:
    """Deterministic stand-in feature vector: a byte-histogram sketch
    seeded by content hash. Exercises the exact batch/schema path the
    real extractor would use."""
    if payload is None:
        return [0.0] * dim
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer(payload[:4096], dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype("float32") if arr.size else np.zeros(dim, "float32")
    norm = float(hist.sum()) or 1.0
    seed = np.frombuffer(h[:dim], dtype=np.uint8).astype("float32") / 255.0
    return [float(x) for x in (hist / norm + 0.001 * seed)]


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) for p in payloads],
                "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                "features": [fake_features(p) for p in payloads],
            }
        )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. The batch
    size is governed by spark.sql.execution.arrow.maxRecordsPerBatch at
    scale. Codec decode is the textbook compute-amplified pass, so a
    corpus that arrives as one scan split is spread to session
    parallelism first (session.spread_partitions — a no-op on a real
    multi-split scan, where this stays a narrow, shuffle-free plan)."""
    from ..session import spread_partitions

    return spread_partitions(media).select("media_id", "kind", "payload").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so
    the multimodal path is exercisable with the driver corpus."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: explode virtual frame indices from
    metadata (n_frames) and keep every n-th — decode itself is stubbed."""
    return (
        media.where(F.col("meta.n_frames").isNotNull())
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1)).alias("frame_idx"),
        )
        .where(F.col("frame_idx") % every_n == 0)
    )
