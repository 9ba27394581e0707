"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride as ``binary`` columns with a metadata
struct. The Spark-side plumbing — schema, partition-friendly layout,
Arrow batch shapes, mapInPandas signatures — is real and tested; the
actual media decode is STUBBED (image/audio libs are not in this
container): `decode_image_batch` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder (seeded from
the payload bytes) produces stable features so the distributed
pipeline is testable end-to-end.
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
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

_FEAT_SCHEMA = "media_id long, kind string, feature array<double>, payload_sha string"


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features seeded from
    the payload digest. REPLACE with PIL/torchvision/ffmpeg at deploy."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM)


def decode_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batches stream through Arrow (payload bytes never hit the driver);
    output is (media_id, kind, feature, payload_sha). Real decode is
    NotImplemented in this container — `fake=True` uses the
    deterministic stub.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode needs PIL/ffmpeg — not in this container; "
                    "pass fake=True for the deterministic test decoder"
                )
            feats = [_fake_decode(p).tolist() for p in pdf["payload"]]
            shas = [hashlib.sha256(p).hexdigest() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "payload_sha": shas,
                }
            )

    return media.mapInPandas(fn, schema=_FEAT_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp —
    pure Spark arithmetic on metadata (the decode itself is the stubbed
    part; the fan-out shape is what matters at scale)."""
    n = F.greatest((F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1))
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n - 1)))
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).alias("ts_ms"),
        )
    )


def gen_fake_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for pipeline tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{kind}-{i}".encode()).digest() * 4
        rows.append(
            (i, kind, bytearray(payload), (64, 64, 5000 if kind == "video" else None, f"{kind}/fake"))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
