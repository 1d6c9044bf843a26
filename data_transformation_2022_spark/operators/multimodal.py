"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side machinery (schemas, batch shapes, partition sizing, UDF
signatures) is real and tested; the actual media decoding is stubbed —
image/audio codec libraries are not in this container, so ``decode_*``
raise ``NotImplementedError`` unless a deterministic fake is requested
(``fake=True``), which produces seeded metadata-shaped outputs so the
pipeline is exercisable end to end.

Scale notes: media blobs make rows wide — ``media_repartition`` sizes
partitions by BYTES (sum of blob lengths) rather than row count, the
knob that matters when a "row" is 5 MB; feature extraction yields
fixed-width vectors so downstream joins/ANN never touch the blobs again.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = "media_id long, width int, height int, embedding array<float>"
AUDIO_FEATURES_SCHEMA = "media_id long, sample_rate int, n_samples long, embedding array<float>"
FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_blob binary"


def media_repartition(df: DataFrame, target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Partition by accumulated blob size, not row count: estimates total
    bytes from a sample mean and repartitions so each partition carries
    ~target_bytes of media."""
    stats = df.select(
        F.count(F.lit(1)).alias("n"), F.avg(F.length("blob")).alias("avg_len")
    ).collect()[0]
    n, avg_len = stats["n"] or 0, stats["avg_len"] or 1.0
    parts = max(1, int(n * avg_len / target_bytes))
    return df.repartition(parts)


def _fake_vec(seed_bytes: bytes, dim: int) -> list[float]:
    h = hashlib.sha256(seed_bytes).digest()
    rs = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rs.normal(size=dim).astype(np.float32).tolist()


def decode_image_features(df: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Image decode → (width, height, embedding). Real decoding requires
    an image codec (not installed): fake=False raises inside the UDF,
    fake=True derives deterministic pseudo-features from the blob hash —
    same schema, same batch shape, honest plumbing."""

    def run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires a codec library (e.g. Pillow); "
                    "not available in this environment — use fake=True for plumbing tests"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [
                        (int.from_bytes(hashlib.sha256(b or b"").digest()[:2], "big") % 1920) + 1
                        for b in pdf["blob"]
                    ],
                    "height": [
                        (int.from_bytes(hashlib.sha256(b or b"").digest()[2:4], "big") % 1080) + 1
                        for b in pdf["blob"]
                    ],
                    "embedding": [_fake_vec(b or b"", dim) for b in pdf["blob"]],
                }
            )
            yield out

    return df.filter(F.col("kind") == "image").mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def decode_audio_features(df: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Audio decode → (sample_rate, n_samples, embedding); stubbed like
    decode_image_features."""

    def run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decoding requires a codec library; use fake=True for plumbing tests"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": 16000,
                    "n_samples": [len(b or b"") * 4 for b in pdf["blob"]],
                    "embedding": [_fake_vec(b or b"", dim) for b in pdf["blob"]],
                }
            )

    return df.filter(F.col("kind") == "audio").mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def sample_video_frames(df: DataFrame, every_n: int = 30, fake: bool = False) -> DataFrame:
    """Video → sampled frame blobs (one output row per sampled frame);
    stubbed decode, real explode-shaped output contract."""

    def run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decoding requires a codec library; use fake=True for plumbing tests"
                )
            rows = {"media_id": [], "frame_idx": [], "frame_blob": []}
            for mid, b in zip(pdf["media_id"], pdf["blob"]):
                n_frames = (len(b or b"") % 5) + 1
                for i in range(n_frames):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i * every_n)
                    # frame index appended as ASCII digits (not a raw
                    # byte) so SQL engines can reproduce the fake blob:
                    # sha256(blob || '0'), sha256(blob || '1'), …
                    rows["frame_blob"].append(
                        hashlib.sha256((b or b"") + str(i).encode()).digest()
                    )
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "video").mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
