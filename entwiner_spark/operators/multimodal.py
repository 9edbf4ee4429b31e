"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §2.14).

Images/audio/video are carried as ``binary`` columns with a metadata
struct.  The Spark-side plumbing — schema, batch iteration shape,
partition-parallel decode via mapInPandas — is real and tested; the
actual codec is stubbed (`decode_stub`) because no image/audio libs
exist in this environment.  Swapping `_decode_payload` for a PIL/ffmpeg
call is the only change needed on a real cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("width", T.LongType(), True),
                    T.StructField("height", T.LongType(), True),
                    T.StructField("channels", T.LongType(), True),
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
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("ts_ms", T.DoubleType(), True),
        T.StructField("frame_payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Wrap an arbitrary binary/string column as the canonical media
    table with deterministic fake dimensions derived from the payload
    hash (stands in for a real header parse)."""
    from entwiner_spark.functions.text import stable_hash32

    payload = F.col(payload_col).cast("binary")
    h = stable_hash32(F.col(payload_col).cast("string"))
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            (h % 1024).alias("width"),
            (F.shiftright(h, 10) % 768).alias("height"),
            F.lit(3).cast("long").alias("channels"),
        ).alias("meta"),
    )


def _decode_payload(payload: bytes) -> list[float]:
    """REAL-DECODER SLOT.  Deterministic fake: 8 byte-histogram-ish
    floats.  A real deployment raises NotImplementedError here until a
    codec (PIL, torchaudio, ffmpeg) is wired in."""
    if payload is None:
        return []
    n = len(payload)
    if n == 0:
        return [0.0] * 8
    return [sum(payload[i::8]) / max(1, len(payload[i::8])) for i in range(8)]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Partition-parallel decode/feature-extract via mapInPandas.

    Arrow-batched; each worker touches only its partition's payloads —
    the shape a 100 TB media corpus needs (payloads never move to the
    driver, decode is embarrassingly parallel)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(_decode_payload),
                }
            )
            yield out

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 64,
    stride: int = 4,
    fps: float = 30.0,
) -> DataFrame:
    """Video/audio frame sampling: one output row per sampled frame.

    Partition-parallel mapInPandas — the payload is chunked into
    fixed-size "frames" and every ``stride``-th frame is emitted with
    its byte slice and a derived timestamp.  REAL-DECODER SLOT: the
    fixed-byte chunking stands in for an ffmpeg keyframe/stride
    extractor; the Spark-side contract (fan-out row shape, binary
    slices, Arrow batching, no driver materialization) is exactly what
    a real codec plugs into.  A 100 TB video corpus fans out to frames
    without any shuffle — the expansion happens inside each task.
    """
    if frame_bytes <= 0 or stride <= 0:
        raise ValueError(f"frame_bytes={frame_bytes} and stride={stride} must be > 0")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, stride):
                    chunk = payload[idx * frame_bytes : (idx + 1) * frame_bytes]
                    recs.append(
                        (int(mid), idx, idx * 1000.0 / fps, chunk, len(chunk))
                    )
            if recs:
                yield pd.DataFrame(
                    recs,
                    columns=["media_id", "frame_idx", "ts_ms", "frame_payload", "n_bytes"],
                )

    return media.select("media_id", "payload").mapInPandas(run, FRAME_SCHEMA)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize/resample: returns the canonical media table with updated
    meta dimensions and a resampled payload.

    REAL-DECODER SLOT: the fake "resample" truncates the payload to the
    new pixel budget (width*height*channels bytes) — deterministic and
    SQL-checkable; a real deployment swaps in PIL/ffmpeg scaling.  The
    plumbing (binary in/out, meta rewrite, Arrow batches, per-partition
    parallelism) is the production shape.
    """
    if width <= 0 or height <= 0:
        raise ValueError(f"width={width} and height={height} must be > 0")

    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for r in pdf.itertuples(index=False):
                channels = r.meta["channels"] if r.meta is not None else 3
                budget = width * height * (channels or 3)
                payload = None if r.payload is None else bytes(r.payload)[:budget]
                recs.append(
                    (
                        int(r.media_id),
                        payload,
                        r.media_type,
                        {
                            "n_bytes": 0 if payload is None else len(payload),
                            "width": width,
                            "height": height,
                            "channels": channels,
                        },
                    )
                )
            if recs:
                yield pd.DataFrame(
                    recs, columns=["media_id", "payload", "media_type", "meta"]
                )

    return media.mapInPandas(run, out_schema)
