"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §2.14).

Images/audio/video are carried as ``binary`` columns with a metadata
struct.  The Spark-side plumbing — schema, batch iteration shape,
partition-parallel decode via mapInPandas — is real and tested.  Real
codecs are OPTIONAL: each operator attempts a PIL / PyAV import inside
the executor closure and uses it for non-fake media types
(``image/jpeg`` etc.); when the library is absent, or the media type is
the synthetic ``image/fake``, it falls back to the deterministic
payload arithmetic the DuckDB oracles check.  This keeps the oracle
contract byte-stable in codec-less environments while making the same
plan decode real media on a cluster that has the libs.
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


def _try_pil():
    """Import-try for Pillow.  Called INSIDE executor closures so the
    import happens per-worker, never on a driver that may lack it."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _is_real_image(media_type) -> bool:
    return (
        isinstance(media_type, str)
        and media_type.startswith("image/")
        and media_type != "image/fake"
    )


def _decode_payload(payload: bytes) -> list[float]:
    """Codec-less fallback: 8 deterministic byte-histogram-ish floats.
    Used for ``image/fake`` payloads and whenever no codec library is
    importable on the worker."""
    if payload is None:
        return []
    n = len(payload)
    if n == 0:
        return [0.0] * 8
    return [sum(payload[i::8]) / max(1, len(payload[i::8])) for i in range(8)]


def _decode_image_pil(Image, payload: bytes) -> list[float]:
    """Real decode: 8 floats = (width, height, bands, per-band means
    padded/truncated to 4, extrema span).  Deterministic for a given
    image — same contract shape as the fallback."""
    import io  # noqa: PLC0415

    with Image.open(io.BytesIO(payload)) as im:
        im.load()
        bands = len(im.getbands())
        stats = [
            float(sum(h[i] * i for i in range(len(h))) / max(1, sum(h)))
            for h in _band_histograms(im)
        ]
        stats = (stats + [0.0] * 4)[:4]
        lo, hi = im.convert("L").getextrema()
        return [float(im.width), float(im.height), float(bands), float(hi - lo)] + stats


def _band_histograms(im):
    hist = im.histogram()
    bands = max(1, len(im.getbands()))
    step = len(hist) // bands if bands else len(hist)
    return [hist[i * step : (i + 1) * step] for i in range(bands)]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Partition-parallel decode/feature-extract via mapInPandas.

    Arrow-batched; each worker touches only its partition's payloads —
    the shape a 100 TB media corpus needs (payloads never move to the
    driver, decode is embarrassingly parallel).  Real image types
    decode through PIL when importable on the worker; ``image/fake``
    and codec-less workers use the deterministic byte arithmetic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _try_pil()
        for pdf in batches:
            feats = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                if Image is not None and _is_real_image(mtype) and payload is not None:
                    try:
                        feats.append(_decode_image_pil(Image, bytes(payload)))
                        continue
                    except Exception:
                        pass  # corrupt/unsupported image -> fallback
                feats.append(_decode_payload(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": feats,
                }
            )

    return media.select("media_id", "payload", "media_type").mapInPandas(
        run, FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 64,
    stride: int = 4,
    fps: float = 30.0,
) -> DataFrame:
    """Video/audio frame sampling: one output row per sampled frame.

    Partition-parallel mapInPandas — for ``video/*`` payloads with PyAV
    importable on the worker, real container demuxing: every
    ``stride``-th decoded frame is re-encoded (PNG via PIL when
    present, else raw RGB bytes) with its true presentation timestamp.
    Otherwise the payload is chunked into fixed-size "frames" and every
    ``stride``-th chunk emitted with a derived timestamp — the
    deterministic fallback the DuckDB oracle checks.  Either way the
    contract is identical: fan-out row shape, binary slices, Arrow
    batching, no driver materialization — a 100 TB video corpus fans
    out to frames without any shuffle, the expansion happens inside
    each task.
    """
    if frame_bytes <= 0 or stride <= 0:
        raise ValueError(f"frame_bytes={frame_bytes} and stride={stride} must be > 0")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import av  # noqa: PLC0415
        except ImportError:
            av = None
        for pdf in batches:
            recs = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if payload is None:
                    continue
                payload = bytes(payload)
                if (
                    av is not None
                    and isinstance(mtype, str)
                    and mtype.startswith("video/")
                ):
                    try:
                        recs.extend(_demux_av(av, int(mid), payload, stride))
                        continue
                    except Exception:
                        pass  # corrupt/unsupported container -> fallback
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

    return media.select("media_id", "payload", "media_type").mapInPandas(
        run, FRAME_SCHEMA
    )


def _demux_av(av, mid: int, payload: bytes, stride: int) -> list[tuple]:
    """Real video path: decode with PyAV, emit every stride-th frame as
    raw RGB24 bytes with its presentation timestamp in ms."""
    import io  # noqa: PLC0415

    recs = []
    with av.open(io.BytesIO(payload)) as container:
        vstream = next(s for s in container.streams if s.type == "video")
        for i, frame in enumerate(container.decode(vstream)):
            if i % stride:
                continue
            raw = frame.to_ndarray(format="rgb24").tobytes()
            ts = float(frame.time or 0.0) * 1000.0
            recs.append((mid, i, ts, raw, len(raw)))
    return recs


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize/resample: returns the canonical media table with updated
    meta dimensions and a resampled payload.

    Real image types resize through PIL when importable on the worker
    (LANCZOS resample, re-encoded in the source format); ``image/fake``
    and codec-less workers use the deterministic fallback that
    truncates the payload to the new pixel budget
    (width*height*channels bytes) — SQL-checkable by the oracle.  The
    plumbing (binary in/out, meta rewrite, Arrow batches, per-partition
    parallelism) is identical on both paths.
    """
    if width <= 0 or height <= 0:
        raise ValueError(f"width={width} and height={height} must be > 0")

    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _try_pil()
        for pdf in batches:
            recs = []
            for r in pdf.itertuples(index=False):
                if (
                    Image is not None
                    and _is_real_image(r.media_type)
                    and r.payload is not None
                ):
                    try:
                        recs.append(
                            _resize_pil(Image, r, width, height)
                        )
                        continue
                    except Exception:
                        pass  # corrupt/unsupported image -> fallback
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


def _resize_pil(Image, r, width: int, height: int) -> tuple:
    """Real resize path: decode, LANCZOS-resample, re-encode in the
    source format (PNG if the source format is unknown)."""
    import io  # noqa: PLC0415

    with Image.open(io.BytesIO(bytes(r.payload))) as im:
        fmt = im.format or "PNG"
        resized = im.resize((width, height), Image.LANCZOS)
        buf = io.BytesIO()
        resized.save(buf, format=fmt)
        payload = buf.getvalue()
        return (
            int(r.media_id),
            payload,
            r.media_type,
            {
                "n_bytes": len(payload),
                "width": width,
                "height": height,
                "channels": len(resized.getbands()),
            },
        )


def media_byte_signatures(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    k: int = 8,
    shingle_bytes: int = 4,
) -> DataFrame:
    """MinHash signatures over raw MEDIA BYTES — byte-level near-dup
    detection for binary payloads (re-uploaded files, truncated
    copies, containers sharing most chunks), the media-table analogue
    of the d2 text path.  No decoding: the payload is hexed and
    shingled as overlapping ``shingle_bytes``-byte windows (2 hex
    chars per byte), hashed once, and fed through the SAME affine
    permutation family as the text MinHash — so the banded LSH join
    (dedup.lsh_candidate_pairs) and its salting ladder work unchanged
    on the output.  One narrow projection per row, no explode.
    """
    from entwiner_spark.functions.text import stable_hash32
    from entwiner_spark.operators.dedup import MERSENNE_P, minhash_params

    from entwiner_spark.functions.expr import let_bound

    width = 2 * shingle_bytes

    def _shingle_hashes(hx):
        # let-bound: hex(payload) evaluates once per row, not once per
        # shingle window (functions/expr.py, r8)
        n_sh = F.greatest(F.length(hx) - (width - 1), F.lit(1))
        # step 2 hex chars = ONE byte: windows stay byte-aligned (an
        # every-hex-char slide would emit nibble-misaligned artifact
        # shingles and double the hashing volume)
        sh = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_sh, F.lit(2)),
                lambda i: hx.substr(i, F.lit(width)),
            )
        )
        return F.transform(sh, stable_hash32)

    hashed = let_bound(F.hex(F.col(payload_col).cast("binary")), _shingle_hashes)
    base = media.select(F.col(id_col), hashed.alias("_hs"))

    def perm(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P)

    cols = [
        F.array_min(F.transform(F.col("_hs"), perm(a, b))).alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_params(k))
    ]
    return base.select(F.col(id_col), *cols)
