"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Extension over the reference (whose OBJECT fields with pluggable Hadoop
serializations — ``P/io/Schema.java:223-238,516-535`` — are the closest
analog: opaque payload + codec at the boundary).

Design for 100 TB: media bytes ride in a ``binary`` column next to typed
metadata; all decode/feature work happens in ``mapInPandas`` over Arrow
batches so bytes never round-trip through Python row-by-row, and the
pipeline partitions by size (``repartitioned_by_bytes``) so one huge video
can't skew an executor.

The actual image/audio codecs are NOT in this container, so ``decode_*``
raise ``NotImplementedError`` unless ``fake=True`` — the deterministic fake
exercises the full Spark plumbing (schema, batching, partitioning) and is
what the tests pin down.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical media-table schema: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def media_stats(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Cheap metadata pass: payload size + md5, pure column expressions."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("digest"),
    )


def repartitioned_by_bytes(df: DataFrame, payload_col: str = "payload", target_mb: int = 64) -> DataFrame:
    """Rebalance so each partition holds ~target_mb of payload bytes.

    At 100 TB, media rows are wildly skewed in size; salting by a
    byte-weighted bucket keeps decode stages even. Uses an approximate total
    from a metadata aggregate — one cheap pass — then repartitions by a
    random-ish hash (md5 of payload head) into the computed bucket count.
    """
    total = df.select(F.sum(F.length(payload_col)).alias("b")).collect()[0]["b"] or 0
    n_parts = max(1, int(total / (target_mb * 1024 * 1024)) + 1)
    return df.repartition(n_parts, F.crc32(F.substring(F.col(payload_col).cast("string"), 1, 64)))


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic fake: 8x8 grayscale derived from payload bytes."""
    seed = np.frombuffer((payload or b"\x00")[:64].ljust(64, b"\x00"), dtype=np.uint8)
    return np.tile(seed, (64 // len(seed) + 1,))[:64].reshape(8, 8).astype(np.float32)


def decode_and_featurize_images(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Decode image payloads and emit a feature vector per image.

    Real decode needs PIL/opencv (absent here) → NotImplementedError unless
    ``fake=True``. The Spark plumbing — Arrow-batched ``mapInPandas``,
    explicit output schema, per-batch vectorized numpy — is the real,
    tested scale path; swap ``_fake_decode_image`` for a real codec on a
    cluster with the libs installed.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs (PIL/opencv) are not available in this environment; "
            "pass fake=True for the deterministic stub decode"
        )

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("mean_intensity", T.DoubleType(), True),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means, feats = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = _fake_decode_image(payload)
                ids.append(mid)
                means.append(float(img.mean()))
                feats.append(img.ravel().tolist())
            yield pd.DataFrame({id_col: ids, "mean_intensity": means, "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    payload_col: str = "payload",
    duration_col: str = "duration_ms",
    fake: bool = False,
) -> DataFrame:
    """Frame-sample videos: one output row per sampled frame timestamp.

    Frame *timestamps* come from pure column expressions (sequence over the
    duration); frame *decode* is stubbed like images. This keeps the fan-out
    (rows-per-video) declarative so Catalyst sizes partitions after the
    explode.
    """
    ts = F.explode(
        F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))
    ).alias("frame_ms")
    frames = df.select(F.col(id_col), F.col(payload_col), ts)
    if not fake:
        return frames.select(id_col, "frame_ms")  # plumbing-only: no decode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_ms", T.LongType(), False),
            T.StructField("frame_feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # timestamp PREPENDED: the stub reads only the first 64 bytes,
            # so appending it would vanish for payloads >= 64B and every
            # frame of a video would get identical features
            feats = [
                _fake_decode_image(int(ms).to_bytes(8, "little") + (p or b"")).ravel().tolist()
                for p, ms in zip(pdf[payload_col], pdf["frame_ms"])
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "frame_ms": pdf["frame_ms"], "frame_feature": feats}
            )

    return frames.mapInPandas(run, schema=out_schema)
