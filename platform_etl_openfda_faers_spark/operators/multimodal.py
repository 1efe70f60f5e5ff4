"""Multimodal (image/audio/video) column plumbing (beyond-reference).

Media payloads are opaque ``binary`` columns with a typed metadata struct
alongside.  The Spark-side plumbing — schemas, Arrow-batched ``mapInPandas``
UDF signatures, partitioning — is real and tested; the actual codec step is
STUBBED (decode libraries are not in this container): ``decode_media`` with
``fake=False`` raises ``NotImplementedError``, with ``fake=True`` it derives
deterministic pseudo-dimensions/features from the payload digest so the
pipeline shape can be exercised end-to-end.

Scale notes: media rows are fat — ``mapInPandas`` streams Arrow batches, so
per-task memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
(lower it for >10 MB payloads).  Repartition by a content-hash column before
heavy decode so stragglers don't concentrate.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("byte_len", T.LongType()),
                    T.StructField("sha256", T.StringType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary(
    df: DataFrame, payload_col: str, id_col: str, fmt: str = "utf8-text"
) -> DataFrame:
    """Wrap a column as an opaque media payload with typed metadata.

    All metadata is computed JVM-side (``encode``/``sha2``/``octet_length``).
    """
    content = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit(fmt).alias("format"),
            F.octet_length(content).cast("long").alias("byte_len"),
            F.sha2(F.col(payload_col), 256).alias("sha256"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, n_features: int) -> tuple[int, int, int, np.ndarray]:
    """Deterministic stand-in for a real image decoder (STUB).

    Dimensions and features derive from the sha256 digest — stable across
    runs and machines, so tests can assert exact values.
    """
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    n_channels = 1 + digest[2] % 4
    feats = (
        np.frombuffer(digest[: n_features * 2], dtype=np.uint16).astype(np.float32)
        / 65535.0
    )
    return width, height, n_channels, feats


def decode_media(
    df: DataFrame, n_features: int = 8, fake: bool = True
) -> DataFrame:
    """Decode + feature-extract media payloads via Arrow-batched mapInPandas.

    ``fake=False`` is the hook for a real codec (PIL/ffmpeg) — not available
    in this container, hence NotImplementedError.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires image/audio libs not present in "
            "this container; use fake=True for the deterministic stub"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["content"]):
                w, h, c, feats = _fake_decode(bytes(payload), n_features)
                rows.append((media_id, w, h, c, feats.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_channels", "features"]
            )

    return df.select("media_id", "content").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


def frame_sample(df: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Video frame-sampling stub: emits (media_id, frame_idx) rows.

    Real frame extraction is gated behind ``fake=False`` ->
    NotImplementedError; the fake derives a deterministic frame count from
    payload length (1 frame per 64 bytes) and samples every ``every_n``-th.
    """
    if not fake:
        raise NotImplementedError("video decoding not available in this container")
    n_frames = F.greatest(
        (F.octet_length(F.col("content")) / F.lit(64)).cast("int"), F.lit(1)
    )
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(F.col("media_id"), F.explode(idx).alias("frame_idx"))
