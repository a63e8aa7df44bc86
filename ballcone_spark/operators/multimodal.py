"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` payloads with a typed metadata struct —
the standard lakehouse layout for multimodal training data:

    media(id long, modality string, payload binary,
          meta struct<width int, height int, sample_rate int,
                      n_frames int, content_type string>)

The Spark-side machinery here is real and tested: schemas, Arrow-batched
``mapInPandas`` over binary columns, batch-shape discipline (bounded rows
per batch so a batch of payloads fits executor memory), and partition
sizing guidance. The actual codec work (JPEG decode, resampling, frame
sampling) requires image/audio libraries not present in this container,
so each ``*_impl`` hook is STUBBED: by default a clearly-marked
``NotImplementedError``, or a deterministic fake (``fake=True``) that
derives features from the payload bytes — enough to test the distributed
plumbing end-to-end.

At 100 TB: payloads dominate row size → set
``spark.sql.files.maxPartitionBytes`` so a partition holds O(100) payloads,
never project ``payload`` unless the operator needs bytes (column pruning
keeps metadata-only queries cheap), and write features to a separate
table keyed by id rather than widening the media table.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "IMAGE_FEATURE_SCHEMA",
    "decode_image_features",
    "sample_frames",
    "make_fake_media",
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)

_FEATURE_DIM = 8
_MAX_ROWS_PER_BATCH = 256  # bound payload bytes held in one Arrow batch


def _decode_image_impl(payload: bytes) -> list[float]:
    """REAL decode hook — requires an image library (PIL/opencv), absent
    in this container. Swap in: decode → resize → pooled features."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; run with fake=True for the "
        "deterministic plumbing-test path"
    )


def _fake_image_features(payload: bytes) -> list[float]:
    """Deterministic fake: md5-derived pseudo-features. Exercises the
    exact same batch shapes/schema as a real decoder."""
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:_FEATURE_DIM]]


def decode_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """payload binary → feature vector via Arrow-batched mapInPandas.

    Only ``id`` and ``payload`` are projected into the UDF (column
    pruning keeps the scan narrow); batches are re-chunked to at most
    ``_MAX_ROWS_PER_BATCH`` rows so payload bytes per batch stay bounded.
    """
    impl = _fake_image_features if fake else _decode_image_impl

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), _MAX_ROWS_PER_BATCH):
                chunk = pdf.iloc[start : start + _MAX_ROWS_PER_BATCH]
                payloads = chunk["payload"]
                yield pd.DataFrame(
                    {
                        "id": chunk["id"],
                        "n_bytes": payloads.map(
                            lambda p: len(p) if p is not None else None
                        ),
                        "content_md5": payloads.map(
                            lambda p: hashlib.md5(p).hexdigest()
                            if p is not None
                            else None
                        ),
                        "feature": payloads.map(
                            lambda p: impl(bytes(p)) if p is not None else None
                        ),
                    }
                )

    return media.select("id", "payload").mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_nth: int = 10, fake: bool = False
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index.
    Frame decode is stubbed; frame *indexing* (which frames to sample,
    from meta.n_frames) is real Spark: an exploded sequence — no UDF."""
    if not fake:
        raise NotImplementedError(
            "video decode requires av/opencv; run with fake=True for the "
            "plumbing-test path"
        )
    idx = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
        F.lit(every_nth),
    )
    return (
        media.where(F.col("modality") == "video")
        .select("id", F.explode(idx).alias("frame_idx"), "payload")
        .withColumn("frame_md5", F.md5(F.concat(F.col("payload"), F.col("frame_idx").cast("string").cast("binary"))))
        .drop("payload")
    )


def make_fake_media(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests: payload =
    UTF-8 of a seeded string, metadata filled per modality."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = f"payload-{i:06d}-{modality}".encode()
        meta = {
            "width": 64 + i % 8 if modality == "image" else None,
            "height": 64 if modality == "image" else None,
            "sample_rate": 16000 if modality == "audio" else None,
            "n_frames": 30 * (1 + i % 5) if modality == "video" else None,
            "content_type": f"x-test/{modality}",
        }
        rows.append(
            {"id": i, "modality": modality, "payload": payload, "meta": meta}
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
