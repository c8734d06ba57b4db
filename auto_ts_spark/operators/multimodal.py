"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the decode kernels are
STUBBED behind deterministic fakes (clearly marked); everything
Spark-side — schema, batching, partition sizing, UDF signatures — is
real and tested. Swapping a stub for a real decoder (PIL/librosa/av)
changes only the numpy body of the worker function.

Scale notes: media bytes ride in parquet binary columns;
``mapInPandas`` streams Arrow record batches so a partition never
materializes fully in Python memory. Metadata-only transforms
(filtering by width, codec, duration) never touch the bytes — column
pruning keeps them out of the scan entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def synthetic_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for tests (seeded bytes)."""
    rng = np.random.RandomState(7)
    rows = []
    for i in range(n):
        payload = rng.bytes(256)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                f"{kind}/fake",
                (64 + i % 8, 48 + i % 6, 1000 + i, 16000),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_image(content: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder — container has no codec libs. Deterministic fake:
    reshape a seeded-by-content byte stream to (h, w, 3). A real
    deployment replaces this body with PIL/turbojpeg."""
    seed = int.from_bytes(content[:4], "little") if content else 0
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_and_featurize(df: DataFrame) -> DataFrame:
    """image → per-channel mean/std features via mapInPandas.

    Output: (media_id, mean_r, mean_g, mean_b, std_gray). The Arrow
    batch iterator bounds Python memory regardless of partition size.
    """
    out_schema = (
        "media_id long, mean_r double, mean_g double, mean_b double, std_gray double"
    )

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                img = _fake_decode_image(
                    row["content"], meta["width"], meta["height"]
                ).astype(np.float64)
                feats.append(
                    (
                        row["media_id"],
                        img[:, :, 0].mean(),
                        img[:, :, 1].mean(),
                        img[:, :, 2].mean(),
                        img.mean(axis=2).std(),
                    )
                )
            yield pd.DataFrame(
                feats, columns=["media_id", "mean_r", "mean_g", "mean_b", "std_gray"]
            )

    return df.select("media_id", "content", "meta").mapInPandas(worker, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: re-encodes the deterministic fake at a new size;
    real deployments swap the worker body. Shows the binary-in /
    binary-out mapInPandas shape."""
    out_schema = "media_id long, content binary, width int, height int"

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                img = _fake_decode_image(row["content"], width, height)
                rows.append((row["media_id"], img.tobytes(), width, height))
            yield pd.DataFrame(rows, columns=["media_id", "content", "width", "height"])

    return df.select("media_id", "content").mapInPandas(worker, out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB video frame sampler: emits (media_id, frame_idx, ts_ms) rows
    from duration metadata — metadata-only, never decodes bytes, so the
    scan prunes the content column entirely."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    (F.col("meta.duration_ms") / every_ms).cast("int"),
                )
            ).alias("frame_idx"),
        )
        .select(
            "media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms")
        )
    )


def _fake_decode_audio(content: bytes, n_samples: int) -> np.ndarray:
    """STUB PCM decoder (no codec libs in container): deterministic
    float32 waveform seeded by content. Real deployments use
    librosa/soundfile here."""
    seed = int.from_bytes(content[:4], "little") if content else 0
    rng = np.random.RandomState(seed)
    return (rng.rand(n_samples).astype(np.float32) * 2.0) - 1.0


def audio_features(df: DataFrame, *, frame_ms: int = 250) -> DataFrame:
    """audio → (media_id, rms, zero_crossing_rate, n_samples) via
    mapInPandas; sample count derives from (duration_ms, sample_rate)
    metadata, so batching cost is predictable before decode."""
    out_schema = "media_id long, rms double, zero_crossing_rate double, n_samples long"

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                n = max(int(meta["duration_ms"] * meta["sample_rate"] / 1000), 1)
                wave = _fake_decode_audio(row["content"], n)
                zc = float(np.mean(np.abs(np.diff(np.signbit(wave).astype(np.int8)))))
                rows.append(
                    (row["media_id"], float(np.sqrt((wave**2).mean())), zc, n)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "rms", "zero_crossing_rate", "n_samples"],
            )

    return df.select("media_id", "content", "meta").mapInPandas(worker, out_schema)
