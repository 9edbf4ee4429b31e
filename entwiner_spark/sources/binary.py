"""Binary-file media ingest (SURVEY.md §2.14 multimodal north star).

``spark.read.format("binaryFile")`` is Spark's built-in distributed
reader for opaque media files (images, audio, video): each file
becomes one row ``(path, modificationTime, length, content)`` with the
bytes read executor-side — the 100 TB ingest path for a multimodal
corpus (directory listing is distributed, files are split across
tasks, partition-directory pruning applies via ``pathGlobFilter`` /
``recursiveFileLookup``).

``media_from_binary_files`` adapts that row shape to the engine's
canonical media table (``media_id, payload, media_type, meta``) so
every downstream multimodal operator (extract_features,
sample_frames, resize_media) runs unchanged on real files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension -> media type for the common cases; unknown extensions
#: fall back to application/octet-stream.
_EXT_TYPES = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "mp4": "video/mp4",
}


def media_from_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Read a directory of media files into the canonical media table.

    - ``media_id`` is the xxhash64 of the file path (stable across
      runs and executors; collision odds are negligible below ~10^9
      files — use the path itself as the join key if that matters);
    - ``media_type`` is derived from the file extension;
    - ``meta.n_bytes`` comes from the reader's length column (no
      second stat call); width/height stay NULL until a real decoder
      (operators/multimodal._try_pil) fills them in.

    The reader never materializes file contents on the driver: the
    binaryFile source lists the tree distributed and each task reads
    its own files.
    """
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    df = r.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mt = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _EXT_TYPES.items() for x in kv]
        ),
        ext,
    )
    return df.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("path"),
        F.col("content").alias("payload"),
        F.coalesce(mt, F.lit("application/octet-stream")).alias("media_type"),
        F.struct(
            F.col("length").cast("long").alias("n_bytes"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.lit(None).cast("long").alias("channels"),
        ).alias("meta"),
    )
