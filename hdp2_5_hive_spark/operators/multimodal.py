"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as ``binary`` columns
with struct metadata; decode/feature-extraction runs as Arrow-batched
``mapInPandas``. The image/audio codec libraries are NOT in this
container, so the decode kernel is a clearly-marked stub
(``decode_image_stub``) with a deterministic fake — the Spark-side
plumbing (schema, batch iteration, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("sha", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str, id_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Build a media-shaped frame from any source column: payload =
    utf-8 bytes, metadata struct derived in-JVM (no Python)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes) -> list[float]:
    """STUB decode kernel. A real deployment would decode via
    PIL/libvips/ffmpeg here; those libs are not in this container.
    Deterministic fake: 8 floats derived from the payload's sha256 —
    stable across runs and cluster layouts."""
    if payload is None:
        raise NotImplementedError(
            "real media decode requires an image/audio codec library; "
            "this environment ships none (stubbed per round-1 spec)"
        )
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the payload column via
    mapInPandas (the §2.12 extension path: GenericUDTF/PTF →
    mapInPandas). Each batch stays columnar driver→python→driver."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": pdf["payload"].map(decode_image_stub),
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, FEATURE_SCHEMA)
