"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns + typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over mapInPandas. The actual codecs are NOT available in this container,
so the decode kernels are STUBS: `deterministic_fake_decode` produces a
seeded, content-derived fake (so pipelines are testable end-to-end) and
`strict` mode raises NotImplementedError where a real libjpeg/ffmpeg call
would go. The Spark-side contract — schema, batching, partitioning, UDF
signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, digest string, feature array<float>"


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic opaque binary payload per doc (test fixture:
    payload = utf-8 text bytes; metadata from content hashes)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.pmod(F.xxhash64(text_col), F.lit(512)) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64(text_col, F.lit(1)), F.lit(512)) + 32).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.lit("raw").alias("codec"),
    )


def _decode_stub(payload: bytes, kind: str, dim: int, strict: bool) -> np.ndarray:
    if strict:
        raise NotImplementedError(
            f"real {kind} decode requires an image/audio codec library "
            "not present in this container (PIL/ffmpeg); use "
            "deterministic fake mode for plumbing tests"
        )
    # deterministic content-derived fake feature
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    v = rng.rand(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def extract_features(
    media: DataFrame, dim: int = 16, strict: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over media batches.

    Real pipeline shape: one Arrow batch in, decode per row vectorized as
    far as the codec allows, one batch out — partitioning preserved, so an
    upstream repartition(media_id) controls parallelism.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(p, k, dim, strict)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "digest": [hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) —
    the explode is real Spark; the frame decode itself is the stub above."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
