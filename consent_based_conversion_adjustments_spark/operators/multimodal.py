"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas UDFs over ``mapInPandas``. The decode step itself is
STUBBED (no codec libraries in this container — ``decode_image`` raises
``NotImplementedError`` unless the deterministic fake is requested); the
Spark-side plumbing — schema, batch iteration, partitioning, UDF signature
— is real and tested.

Scale: payload columns stay opaque bytes end-to-end (no driver collect);
``mapInPandas`` streams Arrow batches, so per-executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × payload size, and the
operator is a stateless map — no shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, list[float]]:
    """Decode an image payload → (width, height, 8-dim feature).

    Real decoding requires an image codec library not present in this
    container; ``fake=True`` selects a deterministic stand-in (dimensions
    and features derived from the payload hash) so the distributed plumbing
    is fully exercisable in tests.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires a codec library (e.g. Pillow); "
            "re-run with fake=True for the deterministic stand-in"
        )
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    feature = [digest[2 + i] / 255.0 for i in range(8)]
    return width, height, feature


def resize_image(
    payload: bytes, width: int, height: int, fake: bool = False
) -> bytes:
    """Resize an image payload to (width, height).

    STUB: real resizing needs a codec library; the deterministic fake
    re-encodes the payload hash tagged with the target dimensions, so
    downstream plumbing (bytes in → bytes out, metadata update) is real.
    """
    if not fake:
        raise NotImplementedError(
            "image resizing requires a codec library (e.g. Pillow); "
            "re-run with fake=True for the deterministic stand-in"
        )
    digest = hashlib.sha256(payload).digest()
    return b"RESZ" + width.to_bytes(2, "big") + height.to_bytes(2, "big") + digest


def sample_frames(
    payload: bytes, n_frames: int, fake: bool = False
) -> list[bytes]:
    """Sample n_frames frames from a video payload.

    STUB: the deterministic fake derives each frame from the payload hash +
    frame index; the Spark-side explode plumbing is real.
    """
    if not fake:
        raise NotImplementedError(
            "video decoding requires a codec library (e.g. PyAV); "
            "re-run with fake=True for the deterministic stand-in"
        )
    return [
        hashlib.sha256(payload + i.to_bytes(4, "big")).digest()
        for i in range(n_frames)
    ]


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, fake_decode: bool = True
) -> DataFrame:
    """mapInPandas resize over binary payloads (stateless map, no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                out = resize_image(
                    bytes(r["payload"] or b""), width, height, fake=fake_decode
                )
                rows.append(
                    {"media_id": r["media_id"], "payload": out, "n_bytes": len(out)}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_video_frames(
    media: DataFrame, n_frames: int, fake_decode: bool = True
) -> DataFrame:
    """mapInPandas frame sampling: one output row per (media, frame) — the
    fan-out shape a video pipeline feeds into per-frame feature extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                frames = sample_frames(
                    bytes(r["payload"] or b""), n_frames, fake=fake_decode
                )
                for i, fr in enumerate(frames):
                    rows.append(
                        {"media_id": r["media_id"], "frame_no": i, "frame": fr}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def attach_payloads(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media table from the documents fixture: payload = UTF-8 bytes
    of the text (a deterministic opaque blob standing in for image bytes)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """The mapInPandas decode/feature pipeline over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                width, height, feature = decode_image(payload, fake=fake_decode)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "media_type": r["media_type"],
                        "n_bytes": len(payload),
                        "content_sha": hashlib.sha256(payload).hexdigest(),
                        "width": width,
                        "height": height,
                        "feature": feature,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def binary_metadata(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Pure-Catalyst metadata over the payload (no Python): byte length +
    MD5 content hash — the checkable face of the binary-column plumbing."""
    media = attach_payloads(df, text_col, id_col)
    return media.select(
        "media_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
    )
